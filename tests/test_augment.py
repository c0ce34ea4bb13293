"""On-device augmentation tests."""
import numpy as np
import jax
import jax.numpy as jnp

from mra_gan_tpu.data.augment import (
    add_gaussian_noise,
    augment_batch,
    brightness,
    bspline_deform,
    contrast,
    flip3d,
    gaussian_blur,
    random_augment,
    rotate3d,
    translate3d,
)


def _vol(seed=0, s=12):
    return jnp.asarray(np.random.RandomState(seed).rand(s, s, s).astype(np.float32) * 100)


def test_noise_changes_values_keeps_shape():
    x = _vol()
    y = add_gaussian_noise(x, jax.random.PRNGKey(0))
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(y), np.asarray(x))


def test_blur_reduces_variance():
    x = _vol()
    y = gaussian_blur(x, sigma=2.0)
    assert float(jnp.var(y)) < float(jnp.var(x))
    assert abs(float(jnp.mean(y)) - float(jnp.mean(x))) < 2.0


def test_rotate_identity_at_zero():
    x = _vol()
    y = rotate3d(x, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-3)
    z = rotate3d(x, jnp.array([0.3, 0.0, 0.0]))
    assert not np.allclose(np.asarray(z), np.asarray(x), atol=1.0)


def test_flip_is_involution_per_axis():
    x = _vol()
    # the switch picks one axis; applying numpy flips must match one of them
    y = np.asarray(flip3d(x, jax.random.PRNGKey(3)))
    assert any(np.allclose(y, np.flip(np.asarray(x), ax)) for ax in range(3))


def test_brightness_contrast_monotonic():
    x = _vol()
    b = brightness(x, gamma=1.0)
    np.testing.assert_allclose(np.asarray(b), np.asarray(x), rtol=1e-4, atol=1e-3)
    c = contrast(x, factor=1.0)
    np.testing.assert_allclose(np.asarray(c), np.asarray(x), rtol=1e-5, atol=1e-4)
    c2 = contrast(x, factor=0.5)
    assert float(jnp.std(c2)) < float(jnp.std(x))


def test_bspline_translate_smooth():
    x = _vol()
    y = bspline_deform(x, jax.random.PRNGKey(1), max_disp=1.0)
    assert y.shape == x.shape
    t = translate3d(x, jax.random.PRNGKey(2), max_shift=2)
    assert t.shape == x.shape


def test_random_augment_spatial_pairing():
    x = _vol(1)
    lbl = _vol(2)
    # choice is random; run several keys, shapes must hold and label changes
    # only under spatial choices (3,4,5)
    for i in range(8):
        yi, yl = random_augment(x, lbl, jax.random.PRNGKey(i))
        assert yi.shape == x.shape and yl.shape == lbl.shape


def test_augment_batch_jitted():
    imgs = jnp.stack([_vol(i)[..., None] for i in range(3)])
    lbls = jnp.stack([_vol(10 + i)[..., None] for i in range(3)])
    oi, ol = augment_batch(imgs, lbls, jax.random.PRNGKey(0))
    assert oi.shape == imgs.shape and ol.shape == lbls.shape
    assert np.isfinite(np.asarray(oi)).all()
