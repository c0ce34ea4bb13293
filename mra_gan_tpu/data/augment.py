"""On-device augmentations (JAX, jittable) + the reference's random policy.

The reference's ``Augmentation`` transform draws one of 8 active choices per
sample (reference utils/NiftiDataset.py:1113-1300, choice list :1124):
0 none, 1 additive Gaussian noise, 2 recursive Gaussian blur, 3 random
rotation about x/y/z, 4 B-spline deformation, 5 flip, 6 brightness, 7
contrast. Choices 8-12 — in-plane translate, single-axis z/x/y rotations,
gamma imadjust — exist in the reference but are UNREACHABLE there (the
policy draws from [0,8), :1124); the default policy reproduces that, and
``extended=True`` (train.py --augment_extended) makes them reachable as a
uniform 13-way draw.

Distribution parity with the reference, which augments 0-255-scaled volumes
(its module-level ``Segmentation = False`` at utils/NiftiDataset.py:21 makes
the intensity augs hit BOTH image and label):

- noise:      mean ~ U(0,1), std ~ U(0,2) in 0-255 units
              (reference :1135-1139), both members (:1141-1143).
- blur:       sigma ~ U(0,1.5) (reference :1150), both members (:1156-1159).
- rotation:   theta_x, theta_y ~ randint[-40,40), theta_z ~ randint[-180,180)
              (reference :1165-1167), same transform for both members.
- B-spline:   order-3 spline, 10^3 control mesh, control displacements
              ~ U(0,1)*10 (reference :1178-1202), both members. Recorded
              deviations: we warp the sampled patch (the reference's
              dormant legacy chain warps the whole volume before cropping —
              reference train.py:60-62, commented out; consequences: the
              10^3 mesh spans the patch so the deformation field has a
              higher spatial frequency than volume-domain at the same
              displacement scale, and samples displaced past the patch edge
              clamp instead of reading true neighboring voxels) and
              upsample the control grid trilinearly instead of with a
              cubic spline.
- flip:       axis ~ choice{0,1} (reference :1210). The reference's flipit
              RETURNS THE UN-FLIPPED IMAGE (recorded bug, :278-294); ours
              performs the intended flip.
- brightness: additive c ~ randint[-20,20) in 0-255 units, clipped to the
              value range (reference :297-318 — an additive shift, not a
              gamma), both members (:1225-1227).
- contrast:   c ~ randint[-20,20); deviations from the mean scaled by
              1 +/- |c|/100, clipped (reference :321-351), both members.
              (The reference int-truncates the mean on the 0-255 scale; we
              keep it float — recorded.)

Since our training data is in [-1,1] (legacy) or z-scored (monai), all
0-255-unit magnitudes are scaled by (hi-lo)/255 of the actual value range:
the static ``value_range`` when known (train.py passes (-1,1) for the legacy
convention), else each member's own min/max.

All ops run on device over (D,H,W) float volumes inside jit; the policy is a
``lax.switch`` so a whole batch of patches augments in one XLA program (the
TPU-native replacement for per-sample host SimpleITK filtering).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# individual augmentations (x: (D,H,W) float32)


def add_gaussian_noise(x, key, mean=0.0, std=None):
    """Additive Gaussian noise (reference sitk AdditiveGaussianNoise,
    utils/NiftiDataset.py:1135-1143)."""
    if std is None:
        std = 0.03 * (jnp.max(x) - jnp.min(x))
    return x + mean + std * jax.random.normal(key, x.shape, x.dtype)


def _gauss_kernel1d(sigma, radius: int):
    t = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    sigma = jnp.maximum(jnp.asarray(sigma, jnp.float32), 1e-3)
    k = jnp.exp(-0.5 * (t / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(x, sigma=1.0, radius: int = 5):
    """Separable Gaussian smoothing with edge boundary handling (reference
    RecursiveGaussian order 0, utils/NiftiDataset.py:1148-1159). ``sigma``
    may be a traced scalar (the policy draws it per sample)."""
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
    """Rotation about the center by Euler angles in radians (the reference's
    rotation3d helpers, utils/NiftiDataset.py:234-275; the policy draws the
    reference's +/-40 deg x/y and +/-180 deg z magnitudes, :1165-1167)."""
    coords = _rotate_coords(x.shape, angles)
    out = jax.scipy.ndimage.map_coordinates(x, list(coords), order=order, mode="nearest")
    return out.reshape(x.shape)


def bspline_deform(x, key, grid_points: int = 10, max_disp: float = 10.0,
                   order: int = 1):
    """Smooth random displacement field — ``grid_points``^3 control mesh with
    displacements ~ U(0, max_disp), upsampled to the volume (the reference's
    BSplineTransform with mesh 10^3 and U(0,1)*10 control displacements,
    utils/NiftiDataset.py:1178-1202). Note the reference draws all-positive
    displacements, so the field includes a net shift — reproduced."""
    d, h, w = x.shape
    disp = jax.random.uniform(key, (3, grid_points, grid_points, grid_points),
                              minval=0.0, maxval=max_disp)
    full = jax.image.resize(disp, (3, d, h, w), method="linear")
    ii, jj, kk = jnp.meshgrid(jnp.arange(d), jnp.arange(h), jnp.arange(w), indexing="ij")
    coords = [ii + full[0], jj + full[1], kk + full[2]]
    out = jax.scipy.ndimage.map_coordinates(x, coords, order=order, mode="nearest")
    return out.reshape(x.shape)


def flip3d(x, key, n_axes: int = 2):
    """Random flip over one of the first ``n_axes`` axes (the reference draws
    axes ~ choice{0,1}, utils/NiftiDataset.py:1210). The reference's flipit
    is a recorded no-op bug (:278-294); this performs the intended flip."""
    axis = jax.random.randint(key, (), 0, n_axes)
    flips = [jnp.flip(x, a) for a in range(n_axes)]
    return jax.lax.switch(axis, [lambda a=a: flips[a] for a in range(n_axes)])


def brightness(x, key=None, shift=None, lo=None, hi=None):
    """Additive brightness shift with clipping (reference ``brightness``,
    utils/NiftiDataset.py:297-318: c ~ randint[-20,20) on 0-255, clipped).
    ``shift`` is in the units of [lo, hi] (defaults to the volume range)."""
    lo = jnp.min(x) if lo is None else lo
    hi = jnp.max(x) if hi is None else hi
    if shift is None:
        c = jax.random.randint(key, (), -20, 20).astype(x.dtype)
        shift = c * (hi - lo) / 255.0
    return jnp.clip(x + shift, lo, hi)


def contrast(x, key=None, factor=None, lo=None, hi=None):
    """Contrast about the mean with clipping (reference ``contrast``,
    utils/NiftiDataset.py:321-351): deviations from the mean luminance scaled
    by 1 +/- |c|/100 with c ~ randint[-20,20)."""
    lo = jnp.min(x) if lo is None else lo
    hi = jnp.max(x) if hi is None else hi
    if factor is None:
        c = jax.random.randint(key, (), -20, 20).astype(x.dtype)
        factor = 1.0 + jnp.sign(c) * jnp.abs(c) / 100.0
    m = jnp.mean(x)
    return jnp.clip((x - m) * factor + m, lo, hi)


def translate3d(x, key, max_shift: int = 40, order: int = 1):
    """Random in-plane translation (the reference's translateit with offsets
    ~ randint[-40,40), utils/NiftiDataset.py:354-369,1243-1255 — an
    UNREACHABLE choice in the reference policy; reachable here via
    ``extended=True``)."""
    shift = jax.random.randint(key, (2,), -max_shift, max_shift).astype(jnp.float32)
    d, h, w = x.shape
    ii, jj, kk = jnp.meshgrid(jnp.arange(d), jnp.arange(h), jnp.arange(w), indexing="ij")
    coords = [ii - shift[0], jj - shift[1], kk.astype(jnp.float32)]
    return jax.scipy.ndimage.map_coordinates(x, coords, order=order, mode="nearest").reshape(x.shape)


def imadjust(x, gamma, lo=None, hi=None):
    """Power-law (gamma) intensity remap (the reference's imadjust,
    utils/NiftiDataset.py:372-387: min-max normalize, ``** gamma``, rescale
    to 0-255 — an UNREACHABLE choice 12 there, with gamma drawn ONCE at
    import time via a mutable default arg, both recorded bugs). Here the
    output rescales to [lo, hi] (the data's own convention, not hard-coded
    0-255) and gamma is drawn per sample ~ U(1,2) by the extended policy."""
    xmin, xmax = jnp.min(x), jnp.max(x)
    lo = xmin if lo is None else lo
    hi = xmax if hi is None else hi
    z = (x - xmin) / jnp.maximum(xmax - xmin, 1e-8)
    return z ** gamma * (hi - lo) + lo


# ---------------------------------------------------------------------------
# the random policy


def random_augment(image: jax.Array, label: jax.Array, key: jax.Array,
                   value_range=None, segmentation: bool = False,
                   extended: bool = False):
    """One random choice of the reference's 8 active augmentations applied to
    an (image, label) pair with reference-parity magnitudes (module
    docstring). ``segmentation=False`` (the reference's setting,
    utils/NiftiDataset.py:21) applies the intensity augs to both members;
    True restricts them to the image. Spatial augs always use the same
    transform for both. ``extended=True`` additionally enables the
    reference's five UNREACHABLE choices 8-12 (in-plane translate,
    single-axis z/x/y rotations, gamma imadjust on the image only —
    reference utils/NiftiDataset.py:1243-1300, never drawn there because the
    policy samples choice in [0,8)) as a uniform 13-way draw. Jittable."""
    k_choice, k_a, k_b = jax.random.split(key, 3)
    choice = jax.random.randint(k_choice, (), 0, 13 if extended else 8)

    if value_range is not None:
        ilo = llo = jnp.float32(value_range[0])
        ihi = lhi = jnp.float32(value_range[1])
    else:
        ilo, ihi = jnp.min(image), jnp.max(image)
        llo, lhi = jnp.min(label), jnp.max(label)
    iscale = (ihi - ilo) / 255.0
    lscale = (lhi - llo) / 255.0

    def both_intensity(im, lb, fn_im, fn_lb):
        if segmentation:
            return fn_im(im), lb
        return fn_im(im), fn_lb(lb)

    def aug_none(im, lb):
        return im, lb

    def aug_noise(im, lb):
        km, ks, kn = jax.random.split(k_a, 3)
        mean = jax.random.uniform(km, ())        # U(0,1) in 0-255 units
        std = jax.random.uniform(ks, (), maxval=2.0)  # U(0,2)
        return both_intensity(
            im, lb,
            lambda v: add_gaussian_noise(v, kn, mean * iscale, std * iscale),
            lambda v: add_gaussian_noise(v, kn, mean * lscale, std * lscale))

    def aug_blur(im, lb):
        sigma = jax.random.uniform(k_a, (), maxval=1.5)  # U(0,1.5)
        return both_intensity(im, lb,
                              lambda v: gaussian_blur(v, sigma),
                              lambda v: gaussian_blur(v, sigma))

    def aug_rotate(im, lb):
        kx, ky, kz = jax.random.split(k_a, 3)
        deg = jnp.stack([
            jax.random.randint(kx, (), -40, 40),
            jax.random.randint(ky, (), -40, 40),
            jax.random.randint(kz, (), -180, 180),
        ]).astype(jnp.float32)
        angles = deg * (math.pi / 180.0)
        return rotate3d(im, angles), rotate3d(lb, angles)

    def aug_bspline(im, lb):
        return bspline_deform(im, k_a), bspline_deform(lb, k_a)

    def aug_flip(im, lb):
        return flip3d(im, k_a), flip3d(lb, k_a)

    def aug_brightness(im, lb):
        c = jax.random.randint(k_a, (), -20, 20).astype(jnp.float32)
        return both_intensity(
            im, lb,
            lambda v: brightness(v, shift=c * iscale, lo=ilo, hi=ihi),
            lambda v: brightness(v, shift=c * lscale, lo=llo, hi=lhi))

    def aug_contrast(im, lb):
        c = jax.random.randint(k_a, (), -20, 20).astype(jnp.float32)
        factor = 1.0 + jnp.sign(c) * jnp.abs(c) / 100.0
        return both_intensity(
            im, lb,
            lambda v: contrast(v, factor=factor, lo=ilo, hi=ihi),
            lambda v: contrast(v, factor=factor, lo=llo, hi=lhi))

    def aug_translate(im, lb):
        return translate3d(im, k_a), translate3d(lb, k_a)

    def _single_axis_rot(axis_idx, lo_deg, hi_deg):
        def aug(im, lb):
            deg = jax.random.randint(k_a, (), lo_deg, hi_deg).astype(jnp.float32)
            angles = jnp.zeros(3).at[axis_idx].set(deg * (math.pi / 180.0))
            return rotate3d(im, angles), rotate3d(lb, angles)
        return aug

    def aug_imadjust(im, lb):
        gamma = jax.random.uniform(k_a, (), minval=1.0, maxval=2.0)
        return imadjust(im, gamma, lo=ilo, hi=ihi), lb  # image only (:1297)

    branches = [aug_none, aug_noise, aug_blur, aug_rotate, aug_bspline,
                aug_flip, aug_brightness, aug_contrast]
    if extended:
        branches += [aug_translate,
                     _single_axis_rot(2, -180, 180),  # choice 9: z
                     _single_axis_rot(0, -40, 40),    # choice 10: x
                     _single_axis_rot(1, -40, 40),    # choice 11: y
                     aug_imadjust]                    # choice 12
    return jax.lax.switch(choice, branches, image, label)


@partial(jax.jit, static_argnames=("value_range", "segmentation", "extended"))
def augment_batch(images: jax.Array, labels: jax.Array, key: jax.Array,
                  value_range=None, segmentation: bool = False,
                  extended: bool = False):
    """Vectorized policy over a batch of (B,D,H,W,1) patches — ONE compiled
    program per patch shape. ``value_range`` is the data's intensity
    convention (e.g. (-1.0, 1.0) for the legacy pipeline); None derives each
    member's range per sample (the monai pipeline's z-scored images).
    ``extended`` enables the reference's unreachable choices 8-12."""
    keys = jax.random.split(key, images.shape[0])
    im = images[..., 0]
    lb = labels[..., 0]
    out_i, out_l = jax.vmap(
        lambda i, l, k: random_augment(i, l, k, value_range, segmentation,
                                       extended))(im, lb, keys)
    return out_i[..., None], out_l[..., None]
