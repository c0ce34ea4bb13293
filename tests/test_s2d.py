"""Exactness of the space-to-depth conv reformulation (ops/s2d.py) and its
integration into Conv3D's same_edge_pad dispatch."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mra_gan_tpu.ops.conv import conv3d, replication_pad3d
from mra_gan_tpu.ops.s2d import conv3d_s2d, depth_to_space, space_to_depth


def test_s2d_d2s_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 8, 3).astype(np.float32))
    for f in (2, 4):
        np.testing.assert_array_equal(
            np.asarray(depth_to_space(space_to_depth(x, f), f)), np.asarray(x))


@pytest.mark.parametrize("k,f,ci,co,sz", [
    (7, 4, 1, 32, 16), (7, 4, 32, 1, 16), (7, 2, 1, 8, 16),
    (3, 4, 2, 5, 8), (5, 2, 3, 4, 8),
])
def test_conv3d_s2d_exact(k, f, ci, co, sz):
    rng = np.random.RandomState(k * 10 + f)
    x = jnp.asarray(rng.randn(1, sz, sz, sz, ci).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, k, ci, co).astype(np.float32) * 0.1)
    ref = conv3d(replication_pad3d(x, (k - 1) // 2), w)
    got = conv3d_s2d(x, w, f=f, pad_mode="edge")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_conv3d_s2d_grad_matches_direct():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 1).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 7, 1, 4).astype(np.float32) * 0.1)

    def loss_direct(w, x):
        return jnp.sum(conv3d(replication_pad3d(x, 3), w) ** 2)

    def loss_s2d(w, x):
        return jnp.sum(conv3d_s2d(x, w, f=4) ** 2)

    gd = jax.grad(loss_direct)(w, x)
    gs = jax.grad(loss_s2d)(w, x)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), rtol=1e-3, atol=1e-3)


def test_conv3d_module_dispatch():
    from mra_gan_tpu.models.networks import Conv3D, _s2d_factor

    # auto rules: skinny head -> f4, skinny stem -> f2, fat channels -> direct
    assert _s2d_factor((7, 7, 7), 1, 32, 1, (64, 64, 64)) == 4
    assert _s2d_factor((7, 7, 7), 1, 1, 32, (64, 64, 64)) == 2
    assert _s2d_factor((7, 7, 7), 1, 32, 32, (64, 64, 64)) == 0
    assert _s2d_factor((3, 3, 3), 1, 1, 32, (64, 64, 64)) == 0
    assert _s2d_factor((7, 7, 7), 2, 1, 32, (64, 64, 64)) == 0
    # non-divisible spatial falls back
    assert _s2d_factor((7, 7, 7), 1, 1, 32, (63, 64, 64)) == 0

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 16, 16, 1).astype(np.float32))
    mod = Conv3D(8, 7, same_edge_pad=True)
    params = mod.init(jax.random.PRNGKey(0), x)
    got = mod.apply(params, x)
    k = params["params"]["kernel"]
    b = params["params"]["bias"]
    ref = conv3d(replication_pad3d(x, 3), k) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("k,p,ci,co,sz", [(4, 1, 1, 32, 16), (3, 1, 2, 8, 12), (2, 0, 1, 4, 8)])
def test_conv3d_s2d_stride2_exact(k, p, ci, co, sz):
    from mra_gan_tpu.ops.s2d import conv3d_s2d_stride2

    rng = np.random.RandomState(k + p)
    x = jnp.asarray(rng.randn(2, sz, sz + 2, sz, ci).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, k, ci, co).astype(np.float32) * 0.1)
    ref = conv3d(x, w, stride=2, padding=p)
    got = conv3d_s2d_stride2(x, w, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_conv3d_s2d_stride2_grad():
    from mra_gan_tpu.ops.s2d import conv3d_s2d_stride2

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 1).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 4, 4, 1, 4).astype(np.float32) * 0.1)
    gd = jax.grad(lambda w: jnp.sum(conv3d(x, w, stride=2, padding=1) ** 2))(w)
    gs = jax.grad(lambda w: jnp.sum(conv3d_s2d_stride2(x, w, 1) ** 2))(w)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), rtol=1e-3, atol=1e-4)
