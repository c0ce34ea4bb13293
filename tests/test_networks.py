"""Shape/structure tests for the network zoo, mirroring the reference's
generator/discriminator configurations (reference models/networks3D.py:84-118)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mra_gan_tpu.models.networks import (
    DynUNet3D,
    NLayerDiscriminator3D,
    PixelDiscriminator3D,
    define_d,
    define_g,
    dynunet_schedule,
)


def _init_apply(net, shape):
    x = jnp.zeros(shape, jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x, train=False)
    return net.apply(params, x, train=False), params


@pytest.mark.parametrize("name,spatial", [
    ("resnet_6blocks", 16),
    ("resnet_9blocks", 16),
    ("unet_custom", 32),
])
def test_generators_preserve_shape(name, spatial):
    net = define_g(output_nc=1, ngf=4, net_g=name)
    y, _ = _init_apply(net, (1, spatial, spatial, spatial, 1))
    assert y.shape == (1, spatial, spatial, spatial, 1)
    assert np.all(np.abs(np.asarray(y)) <= 1.0)  # Tanh head


def test_generator_norm_batch_and_none():
    for norm in ("batch", "none"):
        net = define_g(output_nc=1, ngf=4, net_g="resnet_6blocks", norm=norm)
        y, _ = _init_apply(net, (2, 12, 12, 12, 1))
        assert y.shape == (2, 12, 12, 12, 1)


def test_nlayer_discriminator_patch_output():
    # 3-layer PatchGAN on 64^3: two stride-2 (first+loop) halvings beyond the
    # first conv -> receptive-field grid output, 1 channel.
    net = define_d(ndf=4, net_d="n_layers", n_layers_d=3)
    y, _ = _init_apply(net, (1, 64, 64, 64, 1))
    assert y.shape[0] == 1 and y.shape[-1] == 1
    assert y.shape[1] == 6  # 64 -> 32 -> 16 -> 8 (3 stride-2), then two stride-1 k4 p1 convs: 8->7->6
    net_basic = define_d(ndf=4, net_d="basic")
    y2, _ = _init_apply(net_basic, (1, 64, 64, 64, 1))
    assert y2.shape == y.shape


def test_pixel_discriminator_is_per_voxel():
    net = define_d(ndf=4, net_d="pixel")
    y, _ = _init_apply(net, (1, 10, 10, 10, 1))
    assert y.shape == (1, 10, 10, 10, 1)


def test_discriminator_sigmoid_bounds():
    net = NLayerDiscriminator3D(ndf=4, n_layers=1, use_sigmoid=True)
    y, _ = _init_apply(net, (1, 16, 16, 16, 1))
    y = np.asarray(y)
    assert np.all((y >= 0) & (y <= 1))


def test_dynunet_schedule_matches_reference_algorithm():
    kernels, strides = dynunet_schedule((128, 128, 64), (1.5, 1.5, 1.5))
    assert strides[0] == [1, 1, 1]
    assert kernels[-1] == [3, 3, 3]
    assert len(kernels) == len(strides)
    # 128x128x64 @ iso spacing: 4 full halvings then anisotropy kicks in
    assert strides[1] == [2, 2, 2]


def test_dynunet_runs():
    net = DynUNet3D(output_nc=1, sizes=(32, 32, 16), spacings=(1.5, 1.5, 1.5))
    y, _ = _init_apply(net, (1, 32, 32, 16, 1))
    assert y.shape == (1, 32, 32, 16, 1)
    assert np.all(np.abs(np.asarray(y)) <= 1.0)


def test_unknown_names_raise():
    with pytest.raises(NotImplementedError):
        define_g(1, 4, "nope")
    with pytest.raises(NotImplementedError):
        define_d(4, "nope")


def test_init_types():
    for init_type in ("normal", "xavier", "kaiming", "orthogonal"):
        net = define_g(output_nc=1, ngf=4, net_g="resnet_6blocks", init_type=init_type)
        y, params = _init_apply(net, (1, 12, 12, 12, 1))
        leaves = jax.tree.leaves(params)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_normal_init_statistics():
    net = define_g(output_nc=1, ngf=8, net_g="resnet_6blocks", init_type="normal")
    x = jnp.zeros((1, 12, 12, 12, 1))
    params = net.init(jax.random.PRNGKey(1), x, train=False)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    kernels = [np.asarray(v).ravel() for p, v in flat if p[-1].key == "kernel"]
    big = np.concatenate([k for k in kernels if k.size > 1000])
    assert abs(big.std() - 0.02) < 0.002
    assert abs(big.mean()) < 0.002


def test_cells_io_matches_true_layout():
    """ResnetGenerator3D/NLayerDiscriminator3D cells_io variants compute the
    same function on S2D(4)-packed tensors with the SAME parameters."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mra_gan_tpu.models.networks import (
        NLayerDiscriminator3D,
        PixelDiscriminator3D,
        ResnetGenerator3D,
    )
    from mra_gan_tpu.ops.s2d import depth_to_space, space_to_depth

    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 16, 1)
                    .astype(np.float32))
    g = ResnetGenerator3D(output_nc=1, ngf=4, n_blocks=2)
    params = g.init(jax.random.PRNGKey(0), x, train=False)
    want = g.apply(params, x, train=False)
    gc = g.clone(cells_io=True)
    got = depth_to_space(gc.apply(params, space_to_depth(x, 4), train=False), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    for cls, kw in ((NLayerDiscriminator3D, dict(ndf=4, n_layers=2)),
                    (PixelDiscriminator3D, dict(ndf=4))):
        d = cls(**kw)
        dp = d.init(jax.random.PRNGKey(1), x, train=False)
        want = d.apply(dp, x, train=False)
        got = d.clone(cells_io=True).apply(dp, space_to_depth(x, 4), train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_unet_too_deep_raises_clear_error():
    """unet_256 (8 downs) on a 64^3 patch must fail with an actionable
    message, not a shape error deep inside the recursion (the reference
    fails the same way inside UnetSkipConnectionBlock,
    reference models/networks3D.py:270-343)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from mra_gan_tpu.models.networks import UnetGenerator3D

    net = UnetGenerator3D(output_nc=1, num_downs=8, ngf=4)
    x = jnp.zeros((1, 64, 64, 64, 1), jnp.float32)
    with pytest.raises(ValueError, match="num_downs=8"):
        net.init(jax.random.PRNGKey(0), x, train=False)


def test_single_pass_pads_to_net_granularity():
    """single_pass_apply pads to the NET's stride granularity
    (networks.spatial_granularity), not a fixed 4 — a Dynet whose schedule
    needs (8,8,4) must accept a non-divisible volume and equal the manual
    edge-pad + forward + crop."""
    from mra_gan_tpu.models.networks import DynUNet3D, spatial_granularity
    from mra_gan_tpu.parallel.spatial import single_pass_apply

    net = DynUNet3D(output_nc=1, sizes=(32, 32, 16), spacings=(1.5, 1.5, 1.5))
    assert spatial_granularity(net) == (8, 8, 4)
    vol = np.random.RandomState(0).rand(27, 30, 14).astype(np.float32) * 2 - 1
    volp = np.pad(vol, [(0, 5), (0, 2), (0, 2)], mode="edge")
    x = jnp.asarray(volp)[None, ..., None]
    params = net.init(jax.random.PRNGKey(0), x, train=False)
    want = np.asarray(net.apply(params, x, train=False))[0, :27, :30, :14, 0]
    got = single_pass_apply(net, params, vol)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_patchgan_too_small_input_raises():
    """A PatchGAN whose head would output an EMPTY map (e.g. 16 voxels deep
    at n_layers=3) must fail loudly like torch does — silently it made every
    GAN loss NaN (mean over an empty prediction) while cycle losses stayed
    finite."""
    from mra_gan_tpu.models.networks import NLayerDiscriminator3D

    d = NLayerDiscriminator3D(ndf=4, n_layers=3)
    with pytest.raises(ValueError, match="spatial dim >= 24"):
        d.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 16, 1)), train=False)
    # >= the minimum is fine
    d.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 24, 1)), train=False)
