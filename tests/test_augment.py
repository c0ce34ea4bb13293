"""On-device augmentation tests, incl. reference-distribution parity
(reference utils/NiftiDataset.py:1124-1300 magnitudes)."""
import math

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
    # traced near-zero sigma must stay finite (policy draws sigma ~ U(0,1.5))
    z = gaussian_blur(x, sigma=jnp.float32(0.0))
    assert np.isfinite(np.asarray(z)).all()


def test_rotate_identity_at_zero():
    x = _vol()
    y = rotate3d(x, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-3)
    z = rotate3d(x, jnp.array([0.3, 0.0, 0.0]))
    assert not np.allclose(np.asarray(z), np.asarray(x), atol=1.0)


def test_flip_axes_match_reference():
    """The reference draws axes ~ choice{0,1} (utils/NiftiDataset.py:1210) —
    flips must be over axis 0 or 1 only (its flipit no-op bug is fixed)."""
    x = _vol()
    seen = set()
    for i in range(20):
        y = np.asarray(flip3d(x, jax.random.PRNGKey(i)))
        for ax in range(2):
            if np.allclose(y, np.flip(np.asarray(x), ax)):
                seen.add(ax)
                break
        else:
            raise AssertionError("flip was not over axis 0 or 1")
    assert seen == {0, 1}


def test_brightness_is_additive_with_clip():
    """Reference brightness is an additive shift with clipping
    (utils/NiftiDataset.py:297-318), not a gamma."""
    x = _vol()
    lo, hi = float(x.min()), float(x.max())
    b = brightness(x, shift=5.0, lo=lo, hi=hi)
    inner = np.asarray(x) + 5.0 <= hi
    np.testing.assert_allclose(np.asarray(b)[inner], (np.asarray(x) + 5.0)[inner],
                               rtol=1e-5)
    assert float(b.max()) <= hi + 1e-4
    b0 = brightness(x, shift=0.0, lo=lo, hi=hi)
    np.testing.assert_allclose(np.asarray(b0), np.asarray(x), rtol=1e-5)


def test_contrast_scales_deviations():
    x = _vol()
    c = contrast(x, factor=1.0)
    np.testing.assert_allclose(np.asarray(c), np.asarray(x), rtol=1e-4, atol=1e-3)
    c2 = contrast(x, factor=0.8)
    assert float(jnp.std(c2)) < float(jnp.std(x))
    c3 = contrast(x, factor=1.2, lo=float(x.min()), hi=float(x.max()))
    assert float(c3.max()) <= float(x.max()) + 1e-4


def test_bspline_translate_smooth():
    x = _vol()
    y = bspline_deform(x, jax.random.PRNGKey(1), max_disp=1.0)
    assert y.shape == x.shape
    t = translate3d(x, jax.random.PRNGKey(2), max_shift=2)
    assert t.shape == x.shape


def test_random_augment_shapes_and_intensity_hits_both():
    """With segmentation=False (the reference's setting), intensity augs
    apply to BOTH members (reference utils/NiftiDataset.py:21,1141-1143)."""
    x = _vol(1)
    lbl = _vol(2)
    ra = jax.jit(lambda a, b, k: random_augment(a, b, k))
    ra_seg = jax.jit(lambda a, b, k: random_augment(a, b, k, segmentation=True))
    label_changed = False
    for i in range(24):
        yi, yl = ra(x, lbl, jax.random.PRNGKey(i))
        assert yi.shape == x.shape and yl.shape == lbl.shape
        if not np.allclose(np.asarray(yl), np.asarray(lbl)):
            label_changed = True
    assert label_changed

    # segmentation=True restricts intensity augs to the image: over many keys
    # the label changes only under spatial choices, where image and label get
    # the SAME transform — verify noise-like changes never hit label alone
    for i in range(24):
        yi, yl = ra_seg(x, lbl, jax.random.PRNGKey(i))
        img_same = np.allclose(np.asarray(yi), np.asarray(x))
        lbl_same = np.allclose(np.asarray(yl), np.asarray(lbl))
        if not lbl_same:
            assert not img_same  # label only moves together with the image


def test_rotation_magnitude_distribution():
    """Rotations must explore the reference's +/-40 deg x/y, +/-180 deg z
    range (reference :1165-1167) — a +/-3 deg policy would never produce a
    large-angle result. Detect via rank correlation break on a ramp volume."""
    d = 16
    ramp = jnp.broadcast_to(jnp.arange(d, dtype=jnp.float32)[None, :, None],
                            (d, d, d))
    ra = jax.jit(lambda a, b, k: random_augment(a, b, k))
    big_rotation_seen = False
    for i in range(40):
        yi, _ = ra(ramp, ramp, jax.random.PRNGKey(1000 + i))
        # a >20 deg z-rotation of a y-ramp decorrelates columns strongly
        corr = np.corrcoef(np.asarray(yi).mean(axis=(0, 2)),
                           np.arange(d))[0, 1]
        if corr < 0.9:
            big_rotation_seen = True
            break
    assert big_rotation_seen


def test_imadjust_gamma():
    from mra_gan_tpu.data.augment import imadjust

    x = _vol(5)
    # gamma=1 is the identity remap onto [lo, hi] = own range
    y1 = np.asarray(imadjust(x, 1.0))
    np.testing.assert_allclose(y1, np.asarray(x), rtol=1e-5, atol=1e-4)
    # gamma=2 is monotone, keeps the endpoints, darkens the midtones
    y2 = np.asarray(imadjust(x, 2.0))
    assert np.isclose(y2.min(), float(x.min()), atol=1e-3)
    assert np.isclose(y2.max(), float(x.max()), atol=1e-3)
    flat_x = np.asarray(x).ravel()
    order = np.argsort(flat_x)
    assert (np.diff(y2.ravel()[order]) >= -1e-4).all()  # monotone
    mid = (flat_x > np.percentile(flat_x, 30)) & (flat_x < np.percentile(flat_x, 70))
    assert (y2.ravel()[mid] < flat_x[mid]).mean() > 0.95


def test_extended_policy_reaches_unreachable_choices():
    """extended=True enables the reference's dead choices 8-12 (reference
    utils/NiftiDataset.py:1243-1300): over many keys the 13-way draw must
    produce outcomes the 8-way policy cannot (same key, different result)."""
    x = _vol(1)
    lbl = _vol(2)
    base = jax.jit(lambda a, b, k: random_augment(a, b, k))
    ext = jax.jit(lambda a, b, k: random_augment(a, b, k, extended=True))
    diverged = 0
    image_only_change = False  # the imadjust signature: image moves, label not
    for i in range(40):
        k = jax.random.PRNGKey(500 + i)
        bi, bl = base(x, lbl, k)
        ei, el = ext(x, lbl, k)
        if not (np.allclose(np.asarray(bi), np.asarray(ei))
                and np.allclose(np.asarray(bl), np.asarray(el))):
            diverged += 1
        if (np.allclose(np.asarray(el), np.asarray(lbl))
                and not np.allclose(np.asarray(ei), np.asarray(x))
                and np.asarray(ei).std() > 0):
            image_only_change = True
        assert ei.shape == x.shape and el.shape == lbl.shape
        assert np.isfinite(np.asarray(ei)).all()
    # 13-way vs 8-way draws disagree for ~60% of keys; 40 keys make a
    # false-pass astronomically unlikely
    assert diverged >= 5
    assert image_only_change


def test_augment_batch_jitted():
    imgs = jnp.stack([_vol(i)[..., None] for i in range(3)])
    lbls = jnp.stack([_vol(10 + i)[..., None] for i in range(3)])
    oi, ol = augment_batch(imgs, lbls, jax.random.PRNGKey(0))
    assert oi.shape == imgs.shape and ol.shape == lbls.shape
    assert np.isfinite(np.asarray(oi)).all()
    # legacy convention: static value range keeps outputs in [-1,1]
    imgs11 = imgs / 60.0 - 0.8
    lbls11 = lbls / 60.0 - 0.8
    oi2, ol2 = augment_batch(imgs11, lbls11, jax.random.PRNGKey(4),
                             value_range=(-1.0, 1.0))
    assert float(oi2.max()) <= 1.0 + 1e-3 and float(oi2.min()) >= -1.0 - 1e-3
