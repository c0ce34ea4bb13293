"""On-device augmentations (JAX, jittable) + the reference's random policy.

The reference's ``Augmentation`` transform draws one of 8 active choices per
sample (reference utils/NiftiDataset.py:1113-1300, choice list :1124):
0 none, 1 additive Gaussian noise, 2 recursive Gaussian blur, 3 random
rotation about x/y/z, 4 B-spline deformation, 5 flip, 6 brightness, 7
contrast. (Choices 8-12 are unreachable in the reference — reproduced by
simply not selecting them.)

All ops run on device over (D,H,W[,C]) float volumes inside jit; the policy
is expressed with ``lax.switch`` so a batch of patches augments in one XLA
program. Recorded reference bugs intentionally FIXED here (SURVEY §2.2):
- flipit returned the un-flipped image (flip was a silent no-op); ours flips.
- imadjust's gamma was drawn once at import time; ours draws per call.
"""
from __future__ import annotations

import math
from functools import partial
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# individual augmentations (x: (D,H,W) float32)


def add_gaussian_noise(x, key, mean: float = 0.0, std: float = None):
    """Additive Gaussian noise; reference uses sitk AdditiveGaussianNoise with
    std relative to the intensity range (utils/NiftiDataset.py:1131-1139)."""
    if std is None:
        std = 0.03 * (jnp.max(x) - jnp.min(x))
    return x + mean + std * jax.random.normal(key, x.shape, x.dtype)


def _gauss_kernel1d(sigma: float, radius: int):
    t = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (t / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(x, sigma: float = 1.0, radius: int = 4):
    """Separable Gaussian smoothing with edge boundary handling (reference
    SmoothingRecursiveGaussian, utils/NiftiDataset.py:1142-1149)."""
    k = _gauss_kernel1d(sigma, radius).astype(x.dtype)
    y = x
    for axis in range(3):
        pads = [(0, 0)] * 3
        pads[axis] = (radius, radius)
        yp = jnp.pad(y, pads, mode="edge")
        yp = jnp.moveaxis(yp, axis, -1)
        # correlate along the last axis: (..., L+2r) -> (..., L)
        lhs = yp.reshape(-1, 1, yp.shape[-1])
        rhs = k.reshape(1, 1, k.size)
        out = jax.lax.conv_general_dilated(lhs, rhs, (1,), "VALID")
        y = jnp.moveaxis(out.reshape(yp.shape[:-1] + (x.shape[axis],)), -1, axis)
    return y


def _rotate_coords(shape, angles):
    """Voxel coords rotated about the volume center by Euler angles (rad)."""
    a, b, g = angles[0], angles[1], angles[2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cg, sg = jnp.cos(g), jnp.sin(g)
    rx = jnp.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]])
    ry = jnp.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]])
    rz = jnp.array([[cg, -sg, 0], [sg, cg, 0], [0, 0, 1]])
    R = rz @ ry @ rx
    d, h, w = shape
    ii, jj, kk = jnp.meshgrid(jnp.arange(d), jnp.arange(h), jnp.arange(w), indexing="ij")
    pts = jnp.stack([ii.ravel(), jj.ravel(), kk.ravel()]).astype(jnp.float32)
    c = jnp.array([[(d - 1) / 2], [(h - 1) / 2], [(w - 1) / 2]], jnp.float32)
    return R @ (pts - c) + c


def rotate3d(x, angles, order: int = 1):
    """Rotation about the center (the reference rotates each axis by a random
    angle in [-3°, 3°], utils/NiftiDataset.py:1152-1165 + rotation3d
    helpers :234-275)."""
    coords = _rotate_coords(x.shape, angles)
    out = jax.scipy.ndimage.map_coordinates(x, list(coords), order=order, mode="nearest")
    return out.reshape(x.shape)


def bspline_deform(x, key, grid_points: int = 4, max_disp: float = 3.0,
                   order: int = 1):
    """Smooth random displacement field — coarse control grid upsampled
    trilinearly (the BSplineTransform equivalent,
    reference utils/NiftiDataset.py:1168-1176, :1391-1433)."""
    d, h, w = x.shape
    disp = jax.random.uniform(key, (3, grid_points, grid_points, grid_points),
                              minval=-max_disp, maxval=max_disp)
    full = jax.image.resize(disp, (3, d, h, w), method="linear")
    ii, jj, kk = jnp.meshgrid(jnp.arange(d), jnp.arange(h), jnp.arange(w), indexing="ij")
    coords = [ii + full[0], jj + full[1], kk + full[2]]
    out = jax.scipy.ndimage.map_coordinates(x, coords, order=order, mode="nearest")
    return out.reshape(x.shape)


def flip3d(x, key):
    """Random single-axis flip. The reference's flipit is a recorded no-op
    bug (utils/NiftiDataset.py:278-294); this is the intended behavior."""
    axis = jax.random.randint(key, (), 0, 3)
    flips = [jnp.flip(x, 0), jnp.flip(x, 1), jnp.flip(x, 2)]
    return jax.lax.switch(axis, [lambda i=i: flips[i] for i in range(3)])


def brightness(x, key=None, gamma: float = None):
    """Power-law gamma adjust on the 0-255 scale (reference ``brightness``/
    imadjust, utils/NiftiDataset.py:297-318,372-387; per-call gamma, fixing
    the import-time-draw bug)."""
    if gamma is None:
        gamma = jax.random.uniform(key, (), minval=0.5, maxval=1.7)
    lo, hi = jnp.min(x), jnp.max(x)
    span = jnp.maximum(hi - lo, 1e-6)
    xn = (x - lo) / span
    return jnp.power(xn, gamma) * span + lo


def contrast(x, key=None, factor: float = None):
    """Linear contrast about the mean (reference ``contrast``,
    utils/NiftiDataset.py:321-351)."""
    if factor is None:
        factor = jax.random.uniform(key, (), minval=0.6, maxval=1.4)
    m = jnp.mean(x)
    return (x - m) * factor + m


def translate3d(x, key, max_shift: int = 5, order: int = 1):
    """Random integer-ish translation (reference translateit,
    utils/NiftiDataset.py:354-369)."""
    shift = jax.random.uniform(key, (3,), minval=-max_shift, maxval=max_shift)
    d, h, w = x.shape
    ii, jj, kk = jnp.meshgrid(jnp.arange(d), jnp.arange(h), jnp.arange(w), indexing="ij")
    coords = [ii - shift[0], jj - shift[1], kk - shift[2]]
    return jax.scipy.ndimage.map_coordinates(x, coords, order=order, mode="nearest").reshape(x.shape)


# ---------------------------------------------------------------------------
# the random policy


def random_augment(image: jax.Array, label: jax.Array, key: jax.Array,
                   paired_spatial: bool = True):
    """One random choice of the reference's 8 active augmentations applied to
    an (image, label) pair. Spatial augs use the same transform for both
    (labels nearest/linear like the reference applies to both members);
    intensity augs touch the image only. Jittable; keys split internally."""
    k_choice, k_a, k_b = jax.random.split(key, 3)
    choice = jax.random.randint(k_choice, (), 0, 8)

    def aug_none(im, lb):
        return im, lb

    def aug_noise(im, lb):
        return add_gaussian_noise(im, k_a), lb

    def aug_blur(im, lb):
        return gaussian_blur(im, sigma=1.0), lb

    def aug_rotate(im, lb):
        angles = jax.random.uniform(k_a, (3,), minval=-math.pi / 60, maxval=math.pi / 60)
        return rotate3d(im, angles), (rotate3d(lb, angles) if paired_spatial else lb)

    def aug_bspline(im, lb):
        out_i = bspline_deform(im, k_a)
        out_l = bspline_deform(lb, k_a) if paired_spatial else lb
        return out_i, out_l

    def aug_flip(im, lb):
        return flip3d(im, k_a), (flip3d(lb, k_a) if paired_spatial else lb)

    def aug_brightness(im, lb):
        return brightness(im, k_a), lb

    def aug_contrast(im, lb):
        return contrast(im, k_a), lb

    branches = [aug_none, aug_noise, aug_blur, aug_rotate, aug_bspline,
                aug_flip, aug_brightness, aug_contrast]
    return jax.lax.switch(choice, branches, image, label)


@partial(jax.jit, static_argnames=("paired_spatial",))
def augment_batch(images: jax.Array, labels: jax.Array, key: jax.Array,
                  paired_spatial: bool = True):
    """Vectorized policy over a batch of (B,D,H,W,1) patches — ONE compiled
    program per patch shape (the TPU-native replacement for the reference's
    per-sample host SimpleITK augmentation)."""
    keys = jax.random.split(key, images.shape[0])
    im = images[..., 0]
    lb = labels[..., 0]
    out_i, out_l = jax.vmap(
        lambda i, l, k: random_augment(i, l, k, paired_spatial))(im, lb, keys)
    return out_i[..., None], out_l[..., None]
