"""Torch-oracle TRAINING-STEP parity against the real reference model.

The strongest correctness check in the suite: load the reference's actual
``CycleGANModel`` class (reference models/cycle_gan_model.py — not a
re-implementation) on torch CPU, import identical initial weights into our
framework, feed identical batches, run several full G+D optimization steps
(reference models/cycle_gan_model.py:227-240) in BOTH frameworks, and assert
that per-step losses and the post-step parameter trees agree.

This is the independent gradient oracle for the custom-VJP stack
(ops/s2d.py skinny-cell + head-stride-2 convs, ops/norm.py analytic norm
VJPs, ops/subpixel.py): the configuration below runs the cells path
(resnet_6blocks, instance norm, 16^3 % 4 == 0), so every custom VJP sits on
the differentiated path, and Adam (whose first-step update is ~sign(g))
amplifies any gradient error into a visible parameter delta.

pool_size=0 keeps the reference ImagePool out of the way (its RNG stream is
torch's, unmatchable) — pool semantics are unit-tested separately in
tests/test_cycle_gan.py.
"""
import importlib
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mra_gan_tpu.checkpoint import load_torch_network  # noqa: E402
from mra_gan_tpu.models.cycle_gan import (  # noqa: E402
    CycleGANConfig, create_state, make_train_step)

REF = "/root/reference"
LR = 2e-4
PATCH = (16, 16, 16)


def _stub_monai():
    """Install a minimal monai stand-in so the reference package imports.
    Returns the module names WE inserted (empty when real monai is present)
    so the fixture can remove them afterwards — leaking the stub into
    sys.modules would make test_dynet_parity's real-MONAI cross-check
    silently skip when the suite runs in one process with monai installed."""
    if "monai" in sys.modules:
        return ()
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
    return ("monai", "monai.networks", "monai.networks.nets")


@pytest.fixture(scope="module")
def ref_cycle_gan():
    """The reference's models package, imported for real (base_model does
    ``from models import networks3D``, so it must be importable as the
    top-level package ``models``)."""
    stubbed = _stub_monai()
    if "models" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "models", os.path.join(REF, "models", "__init__.py"),
            submodule_search_locations=[os.path.join(REF, "models")])
        pkg = importlib.util.module_from_spec(spec)
        sys.modules["models"] = pkg
        spec.loader.exec_module(pkg)
    yield importlib.import_module("models.cycle_gan_model")
    for name in stubbed:
        sys.modules.pop(name, None)


def _ref_opt(tmp_path, gan_mode: str) -> types.SimpleNamespace:
    """The option namespace the reference model reads. no_lsgan is a
    store_false flag (reference options/train_options.py:19): its DEFAULT
    True means vanilla GAN + sigmoid D (reference models/cycle_gan_model.py:
    93,103); passing --no_lsgan yields False = LSGAN."""
    return types.SimpleNamespace(
        isTrain=True, checkpoints_dir=str(tmp_path), name="parity",
        gpu_ids=[], input_nc=1, output_nc=1, ngf=4, ndf=4,
        netG="resnet_6blocks", netD="n_layers", n_layers_D=2,
        norm="instance", no_dropout=True, init_type="normal", init_gain=0.02,
        no_lsgan=(gan_mode == "vanilla"), pool_size=0, lr=LR, beta1=0.5,
        lambda_identity=0.5, lambda_A=10.0, lambda_B=10.0,
        lambda_co_A=2.0, lambda_co_B=2.0, which_direction="AtoB")


def _to_torch(x: np.ndarray) -> "torch.Tensor":
    return torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))


def _import_state(model, cfg: CycleGANConfig, tmp_path, g_arch="resnet"):
    """Identical initial weights: export the live torch nets' state dicts and
    import them into a fresh CycleGANState (Adam moments start at zero in
    both frameworks). ``g_arch`` names the checkpoint layout of the two
    generators ("resnet" here; "Dynet" for test_quality_parity's variant)."""
    state = create_state(cfg, jax.random.PRNGKey(0), PATCH)
    g_params, d_params = {}, {}
    for slot, net, arch, tree in (
            ("g_a", model.netG_A, g_arch, state.g_params),
            ("g_b", model.netG_B, g_arch, state.g_params),
            ("d_a", model.netD_A, "n_layers", state.d_params),
            ("d_b", model.netD_B, "n_layers", state.d_params)):
        pth = tmp_path / f"{slot}.pth"
        torch.save(net.state_dict(), pth)
        imported = load_torch_network(pth, tree[slot], arch=arch)
        (g_params if slot.startswith("g") else d_params)[slot] = imported
    return state.replace(g_params=g_params, d_params=d_params)


def _compare_params(model, state, tmp_path, n_steps: int):
    """Post-step parameter parity, leaf by leaf, via the same import mapping.

    Elementwise exactness after K ADAM steps is fundamentally bounded by
    noise, not by gradient correctness: Adam's per-element update is
    m_hat/(sqrt(v_hat)+eps) ≈ sign(g), so any element whose true gradient
    sits near the float32 cancellation-noise floor (instance norm makes some
    directions — conv biases, each channel's radial kernel direction —
    analytically DEAD) random-walks by ±lr per step in a summation-order-
    dependent direction; the two frameworks' walks are uncorrelated
    (measured: ~30% of the 7^3 stem-kernel elements at ngf=4 differ by ~1
    step after 3 steps, while losses still agree to 1e-4). The decisive
    elementwise check therefore lives in test_gradient_parity (raw gradients,
    pre-Adam); here we assert the walk bounds that a REAL bug (wrong update
    rule, wrong lr/beta wiring, exploding gradient) would break:
      max |ours - torch|  <= 2*K*lr  (opposite-sign walks for K steps), and
      mean |ours - torch| << K*lr    (divergence is sparse noise, not bias) —
    the mean bound is skipped for conv biases that feed a norm layer, whose
    every element is analytically dead (the checkpoint layout records which
    convs feed a norm, _Entry.norm), so their whole leaf random-walks.
    """
    from mra_gan_tpu.checkpoint.io import _layout_for
    for slot, net, arch, tree in (
            ("g_a", model.netG_A, "resnet", state.g_params),
            ("g_b", model.netG_B, "resnet", state.g_params),
            ("d_a", model.netD_A, "n_layers", state.d_params),
            ("d_b", model.netD_B, "n_layers", state.d_params)):
        pth = tmp_path / f"{slot}_after.pth"
        torch.save(net.state_dict(), pth)
        want = load_torch_network(pth, tree[slot], arch=arch)
        dead = {e.flax + ("bias",)
                for e in _layout_for(dict(want["params"]), arch,
                                     use_dropout=False)
                if e.norm is not None}
        flat_w = jax.tree_util.tree_flatten_with_path(want)[0]
        flat_g = jax.tree_util.tree_flatten_with_path(tree[slot])[0]
        for (path, lw), (_, lg) in zip(flat_w, flat_g):
            diff = np.abs(np.asarray(lg) - np.asarray(lw))
            name = f"after {n_steps} steps: {slot} {jax.tree_util.keystr(path)}"
            assert diff.max() <= 2 * n_steps * LR * 1.05, (
                f"{name}: max |Δ| {diff.max():.2e} exceeds the ±lr/step "
                f"Adam walk bound {2 * n_steps * LR:.2e}")
            if tuple(p.key for p in path)[1:] in dead:
                continue
            assert diff.mean() <= 0.15 * n_steps * LR, (
                f"{name}: mean |Δ| {diff.mean():.2e} — systematic update "
                f"divergence, not sparse sign noise")


@pytest.mark.parametrize("gan_mode", ["lsgan", "vanilla"])
def test_train_step_matches_reference(ref_cycle_gan, gan_mode, tmp_path):
    torch.manual_seed(0)
    model = ref_cycle_gan.CycleGANModel()
    model.initialize(_ref_opt(tmp_path, gan_mode))

    cfg = CycleGANConfig(ngf=4, ndf=4, net_g="resnet_6blocks",
                         net_d="n_layers", n_layers_d=2, norm="instance",
                         gan_mode=gan_mode, pool_size=0)
    assert cfg.uses_cells(PATCH), "config must exercise the cells/custom-VJP path"
    state = _import_state(model, cfg, tmp_path)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)

    rs = np.random.RandomState(42)
    for k in range(3):
        a = rs.uniform(-1.0, 1.0, (1, *PATCH, 1)).astype(np.float32)
        b = rs.uniform(-1.0, 1.0, (1, *PATCH, 1)).astype(np.float32)

        model.set_input([_to_torch(a), _to_torch(b)])
        model.optimize_parameters()
        want = model.get_current_losses()
        want["cor_coe_GA"] = float(model.loss_cor_coe_GA)
        want["cor_coe_GB"] = float(model.loss_cor_coe_GB)

        state, metrics = step(state, jnp.asarray(a), jnp.asarray(b),
                              jax.random.PRNGKey(k), LR)
        metrics = jax.device_get(metrics)
        # rtol doubles per step: float32 summation-order differences make the
        # two frameworks' parameters drift apart by O(1e-7) relative per Adam
        # step, and later losses are evaluated at those slightly-diverged
        # parameters (measured: step-0/1 losses agree to <1e-4, step 2 to
        # ~1.3e-4). A real gradient bug fails step 0 outright.
        for name, ref_val in want.items():
            np.testing.assert_allclose(
                float(metrics[name]), ref_val, rtol=1e-4 * 2 ** k, atol=1e-6,
                err_msg=f"step {k}: loss {name} ({gan_mode})")

    _compare_params(model, state, tmp_path, n_steps=3)

    # Gross-divergence guard on the post-step function: noise-dominated
    # weights walk by ±lr/step in uncorrelated directions (see
    # _compare_params), and at ngf=4 that legitimately moves 16^3 outputs by
    # ~1e-2 after 3 steps — the same would happen between two builds of ONE
    # framework with different summation order. Precision lives in the loss
    # and gradient assertions above; this only catches trajectory blow-up
    # (wrong update rule / lr wiring would move outputs by O(1)).
    x = rs.uniform(-1.0, 1.0, (1, *PATCH, 1)).astype(np.float32)
    with torch.no_grad():
        want_y = model.netG_A(_to_torch(x)).numpy()
    from mra_gan_tpu.models.cycle_gan import make_generate_fn
    got_y = np.asarray(make_generate_fn(cfg, "g_a")(state.g_params["g_a"],
                                                    jnp.asarray(x)))
    np.testing.assert_allclose(np.transpose(got_y, (0, 4, 1, 2, 3)), want_y,
                               atol=0.05)


# ---------------------------------------------------------------------------
# Raw-gradient oracle (pre-Adam, elementwise)


def _torch_grad_tree(net, template, arch, tmp_path, tag):
    """Collect torch ``p.grad`` per parameter and map it into our flax layout
    by writing it as a state dict and reusing the checkpoint import mapping
    (grads have the same keys/shapes as the parameters)."""
    sd = {k: (p.grad if p.grad is not None else torch.zeros_like(p)).clone()
          for k, p in net.named_parameters()}
    pth = tmp_path / f"grad_{tag}.pth"
    torch.save(sd, pth)
    return load_torch_network(pth, template, arch=arch)


@pytest.mark.parametrize("gan_mode", ["lsgan", "vanilla"])
def test_gradient_parity(ref_cycle_gan, gan_mode, tmp_path):
    """The independent gradient oracle proper: torch autograd of the real
    reference model (backward_G / backward_D_A / backward_D_B, reference
    models/cycle_gan_model.py:138-225) vs jax.grad THROUGH the cells-path
    nets — every custom VJP (ops/s2d.py skinny-cell and head-stride-2 convs,
    ops/norm.py analytic norm VJPs, ops/subpixel.py up2 remaps) sits on this
    differentiated path. Compared pre-Adam, the gradients agree elementwise
    to ~1e-5 of the net-wide gradient scale (measured worst leaf 1.8e-5);
    asserted at 1e-4. Norm-dead conv biases carry |g| ~ 1e-8 noise in BOTH
    frameworks and pass trivially under the scale-relative tolerance."""
    from mra_gan_tpu.ops.losses import gan_loss, l1_loss
    from mra_gan_tpu.ops.s2d import space_to_depth

    torch.manual_seed(1)
    model = ref_cycle_gan.CycleGANModel()
    model.initialize(_ref_opt(tmp_path, gan_mode))
    cfg = CycleGANConfig(ngf=4, ndf=4, net_g="resnet_6blocks",
                         net_d="n_layers", n_layers_d=2, norm="instance",
                         gan_mode=gan_mode, pool_size=0)
    state = _import_state(model, cfg, tmp_path)

    rs = np.random.RandomState(7)
    a = rs.uniform(-1.0, 1.0, (1, *PATCH, 1)).astype(np.float32)
    b = rs.uniform(-1.0, 1.0, (1, *PATCH, 1)).astype(np.float32)

    # --- torch: one un-stepped optimize_parameters worth of gradients
    model.set_input([_to_torch(a), _to_torch(b)])
    model.forward()
    model.set_requires_grad([model.netD_A, model.netD_B], False)
    model.optimizer_G.zero_grad()
    model.backward_G()
    want = {
        "g_a": _torch_grad_tree(model.netG_A, state.g_params["g_a"],
                                "resnet", tmp_path, "g_a"),
        "g_b": _torch_grad_tree(model.netG_B, state.g_params["g_b"],
                                "resnet", tmp_path, "g_b"),
    }
    model.set_requires_grad([model.netD_A, model.netD_B], True)
    model.optimizer_D.zero_grad()
    model.backward_D_A()
    model.backward_D_B()
    want["d_a"] = _torch_grad_tree(model.netD_A, state.d_params["d_a"],
                                   "n_layers", tmp_path, "d_a")
    want["d_b"] = _torch_grad_tree(model.netD_B, state.d_params["d_b"],
                                   "n_layers", tmp_path, "d_b")

    # --- ours: jax.grad through the cells_io nets (the train step's actual
    # compute path, models/cycle_gan.py train_step)
    g_a, g_b, d_a, d_b = (n.clone(cells_io=True) for n in cfg.build_nets())
    ra = space_to_depth(jnp.asarray(a), 4)
    rb = space_to_depth(jnp.asarray(b), 4)
    d_params = state.d_params

    def g_loss(gp):
        fake_b = g_a.apply(gp["g_a"], ra, train=True)
        rec_a = g_b.apply(gp["g_b"], fake_b, train=True)
        fake_a = g_b.apply(gp["g_b"], rb, train=True)
        rec_b = g_a.apply(gp["g_a"], fake_a, train=True)
        idt_a = g_a.apply(gp["g_a"], rb, train=True)
        idt_b = g_b.apply(gp["g_b"], ra, train=True)
        loss = (gan_loss(d_a.apply(d_params["d_a"], fake_b, train=True),
                         True, gan_mode)
                + gan_loss(d_b.apply(d_params["d_b"], fake_a, train=True),
                           True, gan_mode)
                + l1_loss(rec_a, ra) * 10.0 + l1_loss(rec_b, rb) * 10.0
                + l1_loss(idt_a, rb) * 5.0 + l1_loss(idt_b, ra) * 5.0)
        sg = jax.lax.stop_gradient
        return loss, (sg(fake_a), sg(fake_b))

    (loss_g, (fake_a_sg, fake_b_sg)), got = jax.jit(
        jax.value_and_grad(g_loss, has_aux=True))(state.g_params)
    np.testing.assert_allclose(float(loss_g), float(model.loss_G), rtol=1e-5,
                               err_msg=f"loss_G ({gan_mode})")

    def d_loss(dp):
        return (0.5 * (gan_loss(d_a.apply(dp["d_a"], rb, train=True),
                                True, gan_mode)
                       + gan_loss(d_a.apply(dp["d_a"], fake_b_sg, train=True),
                                  False, gan_mode))
                + 0.5 * (gan_loss(d_b.apply(dp["d_b"], ra, train=True),
                                  True, gan_mode)
                         + gan_loss(d_b.apply(dp["d_b"], fake_a_sg, train=True),
                                    False, gan_mode)))

    got.update(jax.jit(jax.grad(d_loss))(state.d_params))

    for slot in ("g_a", "g_b", "d_a", "d_b"):
        flat_w = jax.tree_util.tree_flatten_with_path(want[slot])[0]
        flat_g = jax.tree_util.tree_flatten_with_path(got[slot])[0]
        gscale = max(np.abs(np.asarray(lw)).max() for _, lw in flat_w)
        for (path, lw), (_, lg) in zip(flat_w, flat_g):
            diff = np.abs(np.asarray(lg) - np.asarray(lw)).max()
            assert diff <= 1e-4 * gscale, (
                f"{slot} {jax.tree_util.keystr(path)} ({gan_mode}): grad "
                f"maxdiff {diff:.3e} vs net gradient scale {gscale:.3e}")
