"""MONAI DynUNet architecture parity for DynUNet3D ('Dynet').

The reference's Dynet is monai.networks.nets.DynUNet(res_block=True) + Tanh
(reference models/networks3D.py:346-377). monai is not installed in this
environment, so the oracle here is a line-for-line torch replica of MONAI's
DynUNet (monai/networks/nets/dynunet.py + blocks/dynunet_block.py,
instance norm affine=True, conv bias=False, decoder = transp_conv +
cat(up, skip) + UnetBasicBlock) whose state-dict KEYS exactly match
MONAI's — so a real trained reference checkpoint migrates through the same
mapping. A true-MONAI cross-check runs automatically when monai is
importable (gated skip below).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mra_gan_tpu.checkpoint import load_torch_network, save_torch_network  # noqa: E402
from mra_gan_tpu.models.networks import DynUNet3D, dynunet_schedule  # noqa: E402

SIZES, SPACINGS = (32, 32, 16), (1.5, 1.5, 1.5)
INPUT = (16, 16, 8)  # divisible by the schedule's cumulative strides (8,8,4)


def _pad(k, s):
    return tuple(int((kk - ss + 1) / 2) for kk, ss in zip(k, s))


class _CW(torch.nn.Module):
    """MONAI Convolution wrapper: parameter key '<name>.conv.weight'."""

    def __init__(self, conv):
        super().__init__()
        self.conv = conv

    def forward(self, x):
        return self.conv(x)


class _ResBlock(torch.nn.Module):
    def __init__(self, cin, cout, k, s):
        super().__init__()
        k, s = tuple(k), tuple(s)
        self.conv1 = _CW(torch.nn.Conv3d(cin, cout, k, s, _pad(k, s), bias=False))
        self.conv2 = _CW(torch.nn.Conv3d(cout, cout, k, 1, _pad(k, (1, 1, 1)),
                                         bias=False))
        self.norm1 = torch.nn.InstanceNorm3d(cout, affine=True)
        self.norm2 = torch.nn.InstanceNorm3d(cout, affine=True)
        self.lrelu = torch.nn.LeakyReLU(0.01)
        self.downsample = cin != cout or int(np.prod(s)) != 1
        if self.downsample:
            self.conv3 = _CW(torch.nn.Conv3d(cin, cout, 1, s, bias=False))
            self.norm3 = torch.nn.InstanceNorm3d(cout, affine=True)

    def forward(self, x):
        r = x
        out = self.lrelu(self.norm1(self.conv1(x)))
        out = self.norm2(self.conv2(out))
        if self.downsample:
            r = self.norm3(self.conv3(r))
        return self.lrelu(out + r)


class _BasicBlock(torch.nn.Module):
    def __init__(self, cin, cout, k):
        super().__init__()
        k = tuple(k)
        self.conv1 = _CW(torch.nn.Conv3d(cin, cout, k, 1, _pad(k, (1, 1, 1)),
                                         bias=False))
        self.conv2 = _CW(torch.nn.Conv3d(cout, cout, k, 1, _pad(k, (1, 1, 1)),
                                         bias=False))
        self.norm1 = torch.nn.InstanceNorm3d(cout, affine=True)
        self.norm2 = torch.nn.InstanceNorm3d(cout, affine=True)
        self.lrelu = torch.nn.LeakyReLU(0.01)

    def forward(self, x):
        out = self.lrelu(self.norm1(self.conv1(x)))
        return self.lrelu(self.norm2(self.conv2(out)))


class _UpBlock(torch.nn.Module):
    def __init__(self, cin, cout, k, up):
        super().__init__()
        up = tuple(up)
        self.transp_conv = _CW(torch.nn.ConvTranspose3d(cin, cout, up, up,
                                                        bias=False))
        self.conv_block = _BasicBlock(cout + cout, cout, k)

    def forward(self, x, skip):
        out = self.transp_conv(x)
        return self.conv_block(torch.cat((out, skip), dim=1))


class _OutBlock(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = _CW(torch.nn.Conv3d(cin, cout, 1, bias=True))

    def forward(self, x):
        return self.conv(x)


class _SkipLayer(torch.nn.Module):
    """MONAI DynUNetSkipLayer: re-registers the SAME block modules under a
    skip_layers chain, so state_dict carries duplicate (aliased) keys —
    real reference checkpoints have them (monai dynunet.py create_skips)."""

    def __init__(self, downsample, upsample, next_layer):
        super().__init__()
        self.downsample = downsample
        self.next_layer = next_layer
        self.upsample = upsample


class TorchDynUNetReplica(torch.nn.Module):
    """monai.networks.nets.DynUNet(spatial_dims=3, res_block=True) + the
    reference's Tanh head, with MONAI's exact parameter-key layout
    (including the skip_layers shared-module aliases)."""

    def __init__(self, sizes, spacings, in_ch=1, out_ch=1):
        super().__init__()
        kernels, strides = dynunet_schedule(sizes, spacings)
        n = len(kernels)
        f = [min(32 * 2 ** i, 320) for i in range(n)]
        self.n = n
        self.input_block = _ResBlock(in_ch, f[0], kernels[0], strides[0])
        self.downsamples = torch.nn.ModuleList(
            [_ResBlock(f[i - 1], f[i], kernels[i], strides[i])
             for i in range(1, n - 1)])
        self.bottleneck = _ResBlock(f[n - 2], f[n - 1], kernels[n - 1],
                                    strides[n - 1])
        self.upsamples = torch.nn.ModuleList(
            [_UpBlock(f[i + 1], f[i], kernels[i + 1], strides[i + 1])
             for i in reversed(range(n - 1))])
        self.output_block = _OutBlock(f[0], out_ch)
        self.activation = torch.nn.Tanh()
        # the alias chain: outermost skip holds (input_block, top upsample),
        # deepest next_layer IS the bottleneck
        skip = self.bottleneck
        downs = [self.input_block] + list(self.downsamples)
        ups_top_first = list(self.upsamples)[::-1]
        for i in reversed(range(n - 1)):
            skip = _SkipLayer(downs[i], ups_top_first[i], skip)
        self.skip_layers = skip

    def forward(self, x):
        h = self.input_block(x)
        skips = [h]
        for d in self.downsamples:
            h = d(h)
            skips.append(h)
        h = self.bottleneck(h)
        for j, up in enumerate(self.upsamples):
            h = up(h, skips[self.n - 2 - j])
        return self.activation(self.output_block(h))


def _randomize(net, seed):
    g = torch.Generator().manual_seed(seed)
    for p in net.parameters():
        p.data = torch.randn(p.shape, generator=g) * 0.1


def _torch_forward(net, x):
    with torch.no_grad():
        y = net(torch.tensor(np.transpose(x, (0, 4, 1, 2, 3))))
    return np.transpose(y.numpy(), (0, 2, 3, 4, 1))


@pytest.fixture()
def ours():
    return DynUNet3D(output_nc=1, sizes=SIZES, spacings=SPACINGS)


def test_dynet_import_output_parity(ours, tmp_path):
    tnet = TorchDynUNetReplica(SIZES, SPACINGS)
    _randomize(tnet, 21)
    pth = tmp_path / "dynet.pth"
    torch.save(tnet.state_dict(), pth)

    x = np.random.RandomState(0).randn(1, *INPUT, 1).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = load_torch_network(pth, params, arch="Dynet")
    got = np.asarray(ours.apply(params, jnp.asarray(x), train=False))
    want = _torch_forward(tnet, x)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_dynet_export_strict_load_and_parity(ours, tmp_path):
    x = np.random.RandomState(1).randn(1, *INPUT, 1).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(3), jnp.asarray(x), train=False)
    pth = tmp_path / "export.pth"
    save_torch_network(params, pth, arch="Dynet")

    tnet = TorchDynUNetReplica(SIZES, SPACINGS)
    tnet.load_state_dict(torch.load(pth, weights_only=True), strict=True)
    want = _torch_forward(tnet, x)
    got = np.asarray(ours.apply(params, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_dynet_wrong_layout_rejected(ours, tmp_path):
    tnet = TorchDynUNetReplica(SIZES, SPACINGS)
    sd = tnet.state_dict()
    sd["input_block.conv9.conv.weight"] = sd.pop("input_block.conv1.conv.weight")
    pth = tmp_path / "bad.pth"
    torch.save(sd, pth)
    params = jax.eval_shape(
        lambda: ours.init(jax.random.PRNGKey(0), jnp.zeros((1, *INPUT, 1)),
                          train=False))
    params = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), params)
    with pytest.raises(ValueError, match="layout mismatch"):
        load_torch_network(pth, params, arch="Dynet")


def test_dynet_against_real_monai(ours, tmp_path):
    """Cross-check against the REAL monai package when available (it is not
    in this image; earlier test modules stub it, so detect the stub)."""
    monai = pytest.importorskip("monai")
    if getattr(monai, "__file__", None) is None:
        pytest.skip("monai is a test stub here, not the real package")
    net = monai.networks.nets.DynUNet(
        spatial_dims=3, in_channels=1, out_channels=1,
        kernel_size=dynunet_schedule(SIZES, SPACINGS)[0],
        strides=dynunet_schedule(SIZES, SPACINGS)[1],
        upsample_kernel_size=dynunet_schedule(SIZES, SPACINGS)[1][1:],
        res_block=True)
    net.add_module("activation", torch.nn.Tanh())
    _randomize(net, 5)
    pth = tmp_path / "monai.pth"
    torch.save(net.state_dict(), pth)
    x = np.random.RandomState(2).randn(1, *INPUT, 1).astype(np.float32)
    params = ours.init(jax.random.PRNGKey(1), jnp.asarray(x), train=False)
    params = load_torch_network(pth, params, arch="Dynet")
    got = np.asarray(ours.apply(params, jnp.asarray(x), train=False))
    want = _torch_forward(torch.nn.Sequential(net), x)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_convert_checkpoint_cli_dynet_roundtrip(tmp_path):
    """convert_checkpoint.py with --netG Dynet: Orbax -> MONAI-layout .pth
    (strict-loadable by the torch replica) -> Orbax, bit-identical."""
    import convert_checkpoint as cc
    from mra_gan_tpu.checkpoint import CheckpointManager
    from mra_gan_tpu.models.cycle_gan import CycleGANConfig, create_state

    cfg = CycleGANConfig(ngf=4, ndf=4, net_g="Dynet", n_layers_d=1,
                         pool_size=1, dynet_sizes=SIZES)
    state = create_state(cfg, jax.random.PRNGKey(0), INPUT)
    CheckpointManager(tmp_path / "ck", "src").save("latest", state,
                                                   also_latest=False)
    # --dynet_sizes sets the schedule (reference-hardcoded 128,128,64 by
    # default) independently of --patch_size, which only shapes the pools
    flags = ["--netG", "Dynet", "--ngf", "4", "--ndf", "4",
             "--n_layers_D", "1", "--dynet_sizes", "32", "32", "16",
             "--patch_size", "16", "16", "8", "--pool_size", "1"]
    td = tmp_path / "torch"
    cc.main(["--to_torch", "--torch_dir", str(td), "--checkpoints_dir",
             str(tmp_path / "ck"), "--name", "src", *flags])

    tnet = TorchDynUNetReplica(SIZES, SPACINGS)
    tnet.load_state_dict(torch.load(td / "latest_net_G_A.pth",
                                    weights_only=True), strict=True)

    cc.main(["--from_torch", "--torch_dir", str(td), "--checkpoints_dir",
             str(tmp_path / "ck"), "--name", "back", *flags])
    template = create_state(cfg, jax.random.PRNGKey(1), INPUT)
    back = CheckpointManager(tmp_path / "ck", "back").restore("latest",
                                                              template)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(state.g_params)[0],
            jax.tree_util.tree_flatten_with_path(back.g_params)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=jax.tree_util.keystr(kp))
