"""Torch checkpoint import: output parity between a torch model in the
reference's architecture and our flax network loaded with the imported
weights. The torch models here are authored in the test from the public
CycleGAN architecture description (Johnson et al. / PatchGAN)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from mra_gan_tpu.checkpoint import load_torch_network  # noqa: E402
from mra_gan_tpu.models.networks import (  # noqa: E402
    NLayerDiscriminator3D,
    ResnetGenerator3D,
)

NGF = 4
BLOCKS = 2


class TorchResBlock(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_block = tnn.Sequential(
            tnn.ReplicationPad3d(1), tnn.Conv3d(dim, dim, 3, bias=True),
            tnn.InstanceNorm3d(dim, affine=False), tnn.ReLU(True),
            tnn.ReplicationPad3d(1), tnn.Conv3d(dim, dim, 3, bias=True),
            tnn.InstanceNorm3d(dim, affine=False))

    def forward(self, x):
        return x + self.conv_block(x)


def make_torch_generator(ngf=NGF, n_blocks=BLOCKS):
    layers = [tnn.ReplicationPad3d(3), tnn.Conv3d(1, ngf, 7, bias=True),
              tnn.InstanceNorm3d(ngf, affine=False), tnn.ReLU(True)]
    for i in range(2):
        m = 2 ** i
        layers += [tnn.Conv3d(ngf * m, ngf * m * 2, 3, stride=2, padding=1, bias=True),
                   tnn.InstanceNorm3d(ngf * m * 2, affine=False), tnn.ReLU(True)]
    for _ in range(n_blocks):
        layers.append(TorchResBlock(ngf * 4))
    for i in range(2):
        m = 2 ** (2 - i)
        layers += [tnn.ConvTranspose3d(ngf * m, ngf * m // 2, 3, stride=2,
                                       padding=1, output_padding=1, bias=True),
                   tnn.InstanceNorm3d(ngf * m // 2, affine=False), tnn.ReLU(True)]
    layers += [tnn.ReplicationPad3d(3), tnn.Conv3d(ngf, 1, 7), tnn.Tanh()]
    return tnn.Sequential(*layers)


def test_resnet_generator_import_output_parity(tmp_path):
    torch.manual_seed(0)
    tg = make_torch_generator()
    # randomize weights like the reference init
    for p in tg.parameters():
        p.data.normal_(0, 0.1)
    pth = tmp_path / "latest_net_G_A.pth"
    torch.save(tg.state_dict(), pth)

    net = ResnetGenerator3D(output_nc=1, ngf=NGF, n_blocks=BLOCKS)
    x = np.random.RandomState(0).randn(1, 16, 16, 16, 1).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = load_torch_network(pth, params, arch="resnet")
    got = np.asarray(net.apply(params, jnp.asarray(x), train=False))

    with torch.no_grad():
        want = tg(torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))).numpy()
    want = np.transpose(want, (0, 2, 3, 4, 1))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_resnet_import_with_dataparallel_prefix(tmp_path):
    tg = make_torch_generator()
    sd = {("module." + k): v for k, v in tg.state_dict().items()}
    pth = tmp_path / "dp.pth"
    torch.save(sd, pth)
    net = ResnetGenerator3D(output_nc=1, ngf=NGF, n_blocks=BLOCKS)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)), train=False)
    out = load_torch_network(pth, params, arch="resnet")
    assert out["params"]["Conv3D_0"]["kernel"].shape == (7, 7, 7, 1, NGF)


def make_torch_discriminator(ndf=4, n_layers=2):
    layers = [tnn.Conv3d(1, ndf, 4, stride=2, padding=1), tnn.LeakyReLU(0.2, True)]
    nf = 1
    for n in range(1, n_layers):
        prev, nf = nf, min(2 ** n, 8)
        layers += [tnn.Conv3d(ndf * prev, ndf * nf, 4, stride=2, padding=1, bias=True),
                   tnn.InstanceNorm3d(ndf * nf, affine=False), tnn.LeakyReLU(0.2, True)]
    prev, nf = nf, min(2 ** n_layers, 8)
    layers += [tnn.Conv3d(ndf * prev, ndf * nf, 4, stride=1, padding=1, bias=True),
               tnn.InstanceNorm3d(ndf * nf, affine=False), tnn.LeakyReLU(0.2, True),
               tnn.Conv3d(ndf * nf, 1, 4, stride=1, padding=1)]
    return tnn.Sequential(*layers)


def test_discriminator_import_output_parity(tmp_path):
    torch.manual_seed(1)
    td = make_torch_discriminator()
    for p in td.parameters():
        p.data.normal_(0, 0.1)
    pth = tmp_path / "latest_net_D_A.pth"
    torch.save(td.state_dict(), pth)

    net = NLayerDiscriminator3D(ndf=4, n_layers=2)
    x = np.random.RandomState(1).randn(1, 16, 16, 16, 1).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = load_torch_network(pth, params, arch="nlayer_d")
    got = np.asarray(net.apply(params, jnp.asarray(x), train=False))
    with torch.no_grad():
        want = td(torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))).numpy()
    want = np.transpose(want, (0, 2, 3, 4, 1))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_import_count_mismatch_raises(tmp_path):
    tg = make_torch_generator(n_blocks=1)
    pth = tmp_path / "bad.pth"
    torch.save(tg.state_dict(), pth)
    net = ResnetGenerator3D(output_nc=1, ngf=NGF, n_blocks=3)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)), train=False)
    with pytest.raises(ValueError, match="conv count mismatch"):
        load_torch_network(pth, params, arch="resnet")


def test_export_import_roundtrip(tmp_path):
    from mra_gan_tpu.checkpoint import save_torch_network

    net = ResnetGenerator3D(output_nc=1, ngf=NGF, n_blocks=BLOCKS)
    x = np.random.RandomState(2).randn(1, 16, 16, 16, 1).astype(np.float32)
    params = net.init(jax.random.PRNGKey(5), jnp.asarray(x), train=False)
    pth = tmp_path / "export.pth"
    save_torch_network(params, pth, arch="resnet")
    back = load_torch_network(pth, params, arch="resnet")
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-6,
                                   err_msg=str(pa))


def test_export_loads_into_torch_model(tmp_path):
    from mra_gan_tpu.checkpoint import save_torch_network

    net = ResnetGenerator3D(output_nc=1, ngf=NGF, n_blocks=BLOCKS)
    x = np.random.RandomState(3).randn(1, 16, 16, 16, 1).astype(np.float32)
    params = net.init(jax.random.PRNGKey(7), jnp.asarray(x), train=False)
    pth = tmp_path / "export.pth"
    save_torch_network(params, pth, arch="resnet")

    tg = make_torch_generator()
    sd = torch.load(pth, weights_only=True)
    # the reference nets wrap their Sequential as self.model ("model." prefix,
    # reference models/networks3D.py:215); our test Sequential is bare
    sd = {k[len("model."):]: v for k, v in sd.items()}
    tg.load_state_dict(sd, strict=True)
    with torch.no_grad():
        want = tg(torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))).numpy()
    want = np.transpose(want, (0, 2, 3, 4, 1))
    got = np.asarray(net.apply(params, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
