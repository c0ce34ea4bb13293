"""Torch checkpoint import/export parity against the REAL reference code.

These tests import /root/reference/models/networks3D.py itself (read-only;
monai is stubbed since only the 'Dynet' branch needs it) and assert output
parity via weight import for the define_G/define_D zoo, plus export →
strict torch load round-trips. The reference's instance norm is affine-free
with track_running_stats=True (reference models/networks3D.py:19), and the
reference runs inference in train mode (its test.py never calls
model.eval()), so instance statistics are always used — the torch forwards
below therefore run in train mode under no_grad, exactly like
reference test.py:159.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mra_gan_tpu.checkpoint import load_torch_network, save_torch_network  # noqa: E402
from mra_gan_tpu.models.networks import define_d, define_g  # noqa: E402

REF_NETWORKS = "/root/reference/models/networks3D.py"


@pytest.fixture(scope="module")
def ref():
    """The reference's networks3D module, loaded from the read-only tree."""
    if "monai" not in sys.modules:
        monai = types.ModuleType("monai")
        networks = types.ModuleType("monai.networks")
        nets = types.ModuleType("monai.networks.nets")

        def _no_dynunet(*a, **k):
            raise RuntimeError("monai is not installed in this environment")

        nets.DynUNet = _no_dynunet
        networks.nets = nets
        monai.networks = networks
        sys.modules["monai"] = monai
        sys.modules["monai.networks"] = networks
        sys.modules["monai.networks.nets"] = nets
    spec = importlib.util.spec_from_file_location("ref_networks3D", REF_NETWORKS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _torch_forward(net, x):
    # train mode (reference inference behavior), no_grad (base_model.py:53)
    with torch.no_grad():
        y = net(torch.tensor(np.transpose(x, (0, 4, 1, 2, 3))))
    return np.transpose(y.numpy(), (0, 2, 3, 4, 1))


def _randomize(net, seed):
    g = torch.Generator().manual_seed(seed)
    for p in net.parameters():
        p.data = torch.randn(p.shape, generator=g) * 0.1


def _assert_parity(ref_net, our_net, arch, x, rtol=1e-3, atol=1e-4):
    params = our_net.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        pth = os.path.join(d, "net.pth")
        torch.save(ref_net.state_dict(), pth)
        params = load_torch_network(pth, params, arch=arch)
    got = np.asarray(our_net.apply(params, jnp.asarray(x), train=False))
    want = _torch_forward(ref_net, x)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)
    return params


# ---------------------------------------------------------------------------
# generator zoo: output parity via weight import


@pytest.mark.parametrize("net_g,ngf,size", [
    ("resnet_6blocks", 4, 16),
    ("resnet_9blocks", 2, 16),
    ("unet_custom", 2, 32),
])
def test_generator_import_output_parity(ref, net_g, ngf, size):
    tg = ref.define_G(1, 1, ngf, net_g, norm="instance")
    _randomize(tg, seed=hash(net_g) % 2**31)
    ours = define_g(output_nc=1, ngf=ngf, net_g=net_g)
    x = np.random.RandomState(0).randn(1, size, size, size, 1).astype(np.float32)
    _assert_parity(tg, ours, net_g, x)


@pytest.mark.parametrize("net_d,n_layers,ndf,size", [
    ("basic", 3, 4, 32),  # 16^3 would reach 1^3 spatial, where torch IN errors
    ("n_layers", 2, 4, 16),
    ("n_layers", 1, 4, 16),
    ("pixel", 3, 4, 16),
])
def test_discriminator_import_output_parity(ref, net_d, n_layers, ndf, size):
    td = ref.define_D(1, ndf, net_d, n_layers_D=n_layers, norm="instance")
    _randomize(td, seed=n_layers)
    ours = define_d(ndf=ndf, net_d=net_d, n_layers_d=n_layers)
    x = np.random.RandomState(1).randn(1, size, size, size, 1).astype(np.float32)
    _assert_parity(td, ours, net_d, x)


@pytest.mark.parametrize("num_downs,arch_name", [(7, "unet_128"), (8, "unet_256")])
def test_deep_unet_structural_parity(ref, num_downs, arch_name, tmp_path):
    """7/8-down U-Nets: full forwards at 128^3/256^3 are too slow for CI, so
    assert structural parity instead — every conv key maps with matching
    shapes (import), and our export strict-loads into the reference net
    (covers the ngf*8 middle blocks that only exist at num_downs >= 6)."""
    tg = ref.UnetGenerator(1, 1, num_downs, 2, norm_layer=ref.get_norm_layer("instance"))
    pth = tmp_path / "deep.pth"
    torch.save(tg.state_dict(), pth)
    ours = define_g(output_nc=1, ngf=2, net_g=arch_name)
    size = 2 ** num_downs
    params = jax.eval_shape(
        lambda: ours.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, size, 1)),
                          train=False))
    params = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), params)
    params = load_torch_network(pth, params, arch=arch_name)  # shape-checked

    out = tmp_path / "export.pth"
    save_torch_network(params, out, arch=arch_name)
    sd = torch.load(out, weights_only=True)
    tg.load_state_dict(sd, strict=True)


@pytest.mark.slow
@pytest.mark.parametrize("num_downs,arch_name", [(7, "unet_128"), (8, "unet_256")])
def test_deep_unet_numeric_forward_parity(ref, num_downs, arch_name):
    """Full numeric forward parity for the DEEP U-Nets at their minimum
    legal spatial size (2^num_downs — reference models/networks3D.py:270-343
    halves the volume once per down). Structural parity alone (the test
    above) cannot catch a wiring error that preserves shapes, e.g. a swapped
    inner skip; this closes that hole with an end-to-end allclose at the
    §1 tolerances. ngf=2 keeps the torch CPU forward tractable."""
    tg = ref.UnetGenerator(1, 1, num_downs, 2,
                           norm_layer=ref.get_norm_layer("instance"))
    _randomize(tg, seed=num_downs)
    ours = define_g(output_nc=1, ngf=2, net_g=arch_name)
    size = 2 ** num_downs
    x = np.random.RandomState(num_downs).randn(
        1, size, size, size, 1).astype(np.float32)
    _assert_parity(tg, ours, arch_name, x)


def test_dataparallel_prefix_strip(ref, tmp_path):
    tg = ref.define_G(1, 1, 4, "resnet_6blocks", norm="instance")
    sd = {("module." + k): v for k, v in tg.state_dict().items()}
    pth = tmp_path / "dp.pth"
    torch.save(sd, pth)
    net = define_g(output_nc=1, ngf=4, net_g="resnet_6blocks")
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)), train=False)
    out = load_torch_network(pth, params, arch="resnet")
    assert out["params"]["Conv3D_0"]["kernel"].shape == (7, 7, 7, 1, 4)


def test_import_count_mismatch_raises(ref, tmp_path):
    tg = ref.define_G(1, 1, 4, "resnet_6blocks", norm="instance")
    pth = tmp_path / "bad.pth"
    torch.save(tg.state_dict(), pth)
    net = define_g(output_nc=1, ngf=4, net_g="resnet_9blocks")
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)), train=False)
    with pytest.raises(ValueError, match="conv count mismatch"):
        load_torch_network(pth, params, arch="resnet")


def test_dynet_mapping_exists(tmp_path):
    """Dynet now has a full MONAI-layout weight mapping — round-trip parity
    lives in tests/test_dynet_parity.py; here just pin that export emits the
    MONAI key set (round-2's documented error is resolved)."""
    from mra_gan_tpu.models.networks import DynUNet3D
    net = DynUNet3D(output_nc=1, sizes=(32, 32, 16))
    params = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 8, 1)),
                         train=False))
    params = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), params)
    save_torch_network(params, tmp_path / "x.pth", arch="Dynet")
    sd = torch.load(tmp_path / "x.pth", weights_only=True)
    assert "input_block.conv1.conv.weight" in sd
    assert "upsamples.0.transp_conv.conv.weight" in sd
    assert "output_block.conv.conv.bias" in sd


def test_dynet_divergent_alias_rejected(tmp_path):
    """Real MONAI checkpoints duplicate every block under skip_layers.*
    (shared modules registered twice). Identical aliases import fine;
    a DIVERGENT alias (merged/edited checkpoint) must be rejected, not
    silently resolved from the canonical half (r3 advisor finding)."""
    from mra_gan_tpu.checkpoint.io import _dynet_alias_map
    from mra_gan_tpu.models.networks import DynUNet3D

    net = DynUNet3D(output_nc=1, sizes=(32, 32, 16))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 8, 1)),
                      train=False)
    pth = tmp_path / "d.pth"
    save_torch_network(params, pth, arch="Dynet")
    sd = torch.load(pth, weights_only=True)

    n_levels = 1 + sum(1 for k in sd
                       if k.endswith("transp_conv.conv.weight"))
    # materialize the full alias set exactly as torch's state_dict would
    for apre, cpre in _dynet_alias_map(n_levels):
        for k in list(sd):
            if k.startswith(cpre + "."):
                sd[apre + k[len(cpre):]] = sd[k].clone()
    pth2 = tmp_path / "with_aliases.pth"
    torch.save(sd, pth2)
    load_torch_network(pth2, params, arch="Dynet")  # identical twins: fine

    alias_key = next(k for k in sd if k.startswith("skip_layers."))
    sd[alias_key] = sd[alias_key] + 1.0
    pth3 = tmp_path / "diverged.pth"
    torch.save(sd, pth3)
    with pytest.raises(ValueError, match="diverges from its canonical"):
        load_torch_network(pth3, params, arch="Dynet")


# ---------------------------------------------------------------------------
# export: strict load into the real reference nets + output parity


@pytest.mark.parametrize("net_g,arch,ngf,size", [
    ("resnet_6blocks", "resnet", 4, 16),
    ("unet_custom", "unet", 2, 32),
])
def test_export_strict_loads_into_reference_g(ref, net_g, arch, ngf, size, tmp_path):
    ours = define_g(output_nc=1, ngf=ngf, net_g=net_g)
    x = np.random.RandomState(3).randn(1, size, size, size, 1).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(7), jnp.asarray(x), train=False)
    pth = tmp_path / "export.pth"
    save_torch_network(params, pth, arch=arch)

    tg = ref.define_G(1, 1, ngf, net_g, norm="instance")
    sd = torch.load(pth, weights_only=True)
    tg.load_state_dict(sd, strict=True)  # reference base_model.py:148 is strict
    want = _torch_forward(tg, x)
    got = np.asarray(ours.apply(params, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("net_d,n_layers", [("n_layers", 2), ("pixel", 2)])
def test_export_strict_loads_into_reference_d(ref, net_d, n_layers, tmp_path):
    ours = define_d(ndf=4, net_d=net_d, n_layers_d=n_layers)
    x = np.random.RandomState(4).randn(1, 16, 16, 16, 1).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(8), jnp.asarray(x), train=False)
    pth = tmp_path / "export.pth"
    save_torch_network(params, pth, arch=net_d)

    td = ref.define_D(1, 4, net_d, n_layers_D=n_layers, norm="instance")
    td.load_state_dict(torch.load(pth, weights_only=True), strict=True)
    want = _torch_forward(td, x)
    got = np.asarray(ours.apply(params, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_export_dropout_index_shift(ref, tmp_path):
    """With use_dropout the reference inserts Dropout at conv_block.4,
    shifting the second conv to .6 (reference models/networks3D.py:244-256);
    export must follow or keys mismatch under strict load."""
    ours = define_g(output_nc=1, ngf=4, net_g="resnet_6blocks", use_dropout=True)
    params = ours.init(jax.random.PRNGKey(9), jnp.zeros((1, 16, 16, 16, 1)),
                       train=False)
    pth = tmp_path / "drop.pth"
    save_torch_network(params, pth, arch="resnet", use_dropout=True)
    tg = ref.define_G(1, 1, 4, "resnet_6blocks", norm="instance", use_dropout=True)
    tg.load_state_dict(torch.load(pth, weights_only=True), strict=True)

    # and the reverse: a dropout checkpoint is autodetected on import
    back = load_torch_network(pth, params, arch="resnet")
    for (pa, la), (_, lb) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-6,
                                   err_msg=str(pa))


def test_convert_checkpoint_cli_roundtrip(ref, tmp_path):
    """convert_checkpoint.py: Orbax -> reference .pth (strict-loadable by the
    real reference nets) -> Orbax, generators bit-identical."""
    import sys
    sys.path.insert(0, "/root/repo")
    import convert_checkpoint as cc
    from mra_gan_tpu.checkpoint import CheckpointManager
    from mra_gan_tpu.models.cycle_gan import CycleGANConfig, create_state

    cfg = CycleGANConfig(ngf=4, ndf=4, n_layers_d=1, pool_size=2)
    state = create_state(cfg, jax.random.PRNGKey(0), (16, 16, 16))
    CheckpointManager(tmp_path / "ck", "src").save("latest", state,
                                                   also_latest=False)
    flags = ["--ngf", "4", "--ndf", "4", "--n_layers_D", "1",
             "--patch_size", "16", "16", "16", "--pool_size", "2"]
    td = tmp_path / "torch"
    cc.main(["--to_torch", "--torch_dir", str(td), "--checkpoints_dir",
             str(tmp_path / "ck"), "--name", "src", *flags])
    for net in ("G_A", "G_B", "D_A", "D_B"):
        assert (td / f"latest_net_{net}.pth").exists()
    # the real reference code loads it strictly
    tg = ref.define_G(1, 1, 4, "resnet_6blocks", norm="instance")
    tg.load_state_dict(torch.load(td / "latest_net_G_A.pth",
                                  weights_only=True), strict=True)
    tdn = ref.define_D(1, 4, "n_layers", n_layers_D=1, norm="instance")
    tdn.load_state_dict(torch.load(td / "latest_net_D_A.pth",
                                   weights_only=True), strict=True)

    cc.main(["--from_torch", "--torch_dir", str(td), "--checkpoints_dir",
             str(tmp_path / "ck"), "--name", "back", *flags])
    template = create_state(cfg, jax.random.PRNGKey(1), (16, 16, 16))
    back = CheckpointManager(tmp_path / "ck", "back").restore("latest", template)
    for (pa, la), (_, lb) in zip(
            jax.tree_util.tree_flatten_with_path(state.g_params)[0],
            jax.tree_util.tree_flatten_with_path(back.g_params)[0]):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-6,
                                   err_msg=str(pa))


def test_export_import_roundtrip(tmp_path):
    net = define_g(output_nc=1, ngf=4, net_g="resnet_6blocks")
    params = net.init(jax.random.PRNGKey(5), jnp.zeros((1, 16, 16, 16, 1)),
                      train=False)
    pth = tmp_path / "export.pth"
    save_torch_network(params, pth, arch="resnet")
    back = load_torch_network(pth, params, arch="resnet")
    for (pa, la), (_, lb) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-6,
                                   err_msg=str(pa))
