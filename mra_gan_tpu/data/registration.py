"""Affine volume registration, TPU-native.

The reference registers with SimpleITK: Sobel-gradient images + Mattes mutual
information, gradient descent, 4/2/1 multiresolution pyramid
(reference organize_folder_structure.py:99-140). Rebuild: the same
pipeline expressed as differentiable JAX — Sobel-magnitude preprocessing,
a soft-binned mutual-information loss (differentiable Parzen windowing, the
Mattes construction), rigid/affine transform parameterization, Adam descent
over a multiresolution pyramid — all jitted, so registration runs on the
accelerator instead of the host.

All volumes are treated in index space of the fixed image after an initial
center-of-mass alignment (the CenteredTransformInitializer equivalent,
reference organize_folder_structure.py:110).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage as _ndi


def sobel_magnitude(vol: np.ndarray, sigma: float = 1.0) -> np.ndarray:
    """Gradient-magnitude feature volume (the reference's
    GradientMagnitudeRecursiveGaussian, organize_folder_structure.py:103-105)."""
    g = _ndi.gaussian_filter(vol.astype(np.float32), sigma)
    gx = _ndi.sobel(g, 0)
    gy = _ndi.sobel(g, 1)
    gz = _ndi.sobel(g, 2)
    return np.sqrt(gx * gx + gy * gy + gz * gz)


def _trilinear_sample(vol: jax.Array, coords: jax.Array) -> jax.Array:
    """vol (D,H,W); coords (3, N) voxel coordinates -> (N,) values."""
    return jax.scipy.ndimage.map_coordinates(vol, list(coords), order=1, mode="constant")


def _transform_grid(shape, params, center):
    """Affine voxel map: moving = A @ (fixed - c) + c + t.
    params: (12,) = 9 matrix entries (row-major delta from identity) + 3
    translation, or (6,) rigid = 3 Euler angles + 3 translation."""
    d, h, w = shape
    ii, jj, kk = jnp.meshgrid(
        jnp.arange(d, dtype=jnp.float32),
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    pts = jnp.stack([ii.ravel(), jj.ravel(), kk.ravel()])  # (3, N)
    c = jnp.asarray(center, jnp.float32)[:, None]
    if params.shape[0] == 6:
        a, b, g = params[0], params[1], params[2]
        ca, sa = jnp.cos(a), jnp.sin(a)
        cb, sb = jnp.cos(b), jnp.sin(b)
        cg, sg = jnp.cos(g), jnp.sin(g)
        rx = jnp.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]])
        ry = jnp.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]])
        rz = jnp.array([[cg, -sg, 0], [sg, cg, 0], [0, 0, 1]])
        A = rz @ ry @ rx
        t = params[3:6][:, None]
    else:
        A = jnp.eye(3) + params[:9].reshape(3, 3)
        t = params[9:12][:, None]
    return A @ (pts - c) + c + t


def soft_mutual_information(fixed: jax.Array, moving_sampled: jax.Array,
                            n_bins: int = 32, sigma_bins: float = 1.0) -> jax.Array:
    """Differentiable MI via Parzen-windowed joint histogram (the Mattes MI
    construction). Inputs are flat intensity vectors scaled to [0, 1]."""
    centers = jnp.linspace(0.0, 1.0, n_bins)
    # soft assignments (N, B)
    def soft_hist(x):
        d = (x[:, None] - centers[None, :]) * (n_bins - 1) / sigma_bins
        w = jnp.exp(-0.5 * d * d)
        return w / (jnp.sum(w, axis=1, keepdims=True) + 1e-8)

    wa = soft_hist(fixed)
    wb = soft_hist(moving_sampled)
    joint = wa.T @ wb  # (B, B)
    joint = joint / (jnp.sum(joint) + 1e-8)
    pa = jnp.sum(joint, axis=1)
    pb = jnp.sum(joint, axis=0)
    eps = 1e-10
    mi = jnp.sum(joint * (jnp.log(joint + eps) - jnp.log(pa[:, None] + eps)
                          - jnp.log(pb[None, :] + eps)))
    return mi


def _normalize01(x):
    lo, hi = jnp.min(x), jnp.max(x)
    return (x - lo) / (hi - lo + 1e-8)


@partial(jax.jit, static_argnames=("shape", "n_iters", "sample_frac"))
def _register_level(fixed, moving, params, lr, shape, n_iters=100,
                    sample_frac=0.1, seed=0):
    center = jnp.array([(s - 1) / 2.0 for s in shape], jnp.float32)
    fixed01 = _normalize01(fixed)
    moving01 = _normalize01(moving)
    n_total = int(np.prod(shape))
    n_sample = max(1024, int(n_total * sample_frac))

    # Per-block step scaling: Adam's per-element normalization walks every
    # parameter at ~lr per iteration regardless of its natural scale, but a
    # useful matrix perturbation is ~0.02 (a degree or two of rotation)
    # while a useful translation is ~1 voxel. Optimizing the raw 12-vector
    # lets the 9 matrix entries wander 50x too fast on the noisy sampled-MI
    # gradient and overfit the coarse pyramid levels (measured: |A-I| blown
    # to 0.4 for a 3-degree ground truth). Internally optimize q with
    # params = q * block_scale so one Adam step moves each block by a
    # sensible amount.
    if params.shape[0] == 6:
        block_scale = jnp.array([0.02] * 3 + [1.0] * 3, jnp.float32)
    else:
        block_scale = jnp.array([0.02] * 9 + [1.0] * 3, jnp.float32)

    def loss_fn(q, key):
        grid = _transform_grid(shape, q * block_scale, center)  # (3, N)
        idx = jax.random.randint(key, (n_sample,), 0, n_total)
        f = fixed01.ravel()[idx]
        m = _trilinear_sample(moving01, grid[:, idx])
        return -soft_mutual_information(f, m)

    import optax

    opt = optax.adam(lr)

    def body(carry, key):
        q, opt_state = carry
        loss, g = jax.value_and_grad(loss_fn)(q, key)
        updates, opt_state = opt.update(g, opt_state, q)
        return (optax.apply_updates(q, updates), opt_state), loss

    keys = jax.random.split(jax.random.PRNGKey(seed), n_iters)
    q0 = params / block_scale
    (q, _), losses = jax.lax.scan(body, (q0, opt.init(q0)), keys)
    return q * block_scale, losses


def center_of_mass_init(fixed: np.ndarray, moving: np.ndarray) -> np.ndarray:
    cf = np.array(_ndi.center_of_mass(np.abs(fixed)))
    cm = np.array(_ndi.center_of_mass(np.abs(moving)))
    t = cm - cf
    params = np.zeros(12, np.float32)
    params[9:12] = t
    return params


def register_affine(
    fixed: np.ndarray,
    moving: np.ndarray,
    mode: str = "affine",
    levels: Tuple[int, ...] = (4, 2, 1),
    iters_per_level: int = 100,
    lr: float = 0.05,
    use_gradient_features: bool = True,
    seed: int = 0,
) -> np.ndarray:
    """Estimate params mapping fixed-voxel -> moving-voxel coordinates.
    Returns the (12,) affine parameter vector (delta-from-identity matrix +
    translation)."""
    if use_gradient_features:
        ff, mf = sobel_magnitude(fixed), sobel_magnitude(moving)
    else:
        ff, mf = fixed.astype(np.float32), moving.astype(np.float32)
    params = center_of_mass_init(ff, mf)
    if mode == "rigid":
        p = np.zeros(6, np.float32)
        p[3:6] = params[9:12]
        params = p
    for li, level in enumerate(levels):
        f = ff[::level, ::level, ::level] if level > 1 else ff
        m = mf[::level, ::level, ::level] if level > 1 else mf
        scaled = params.copy()
        if params.shape[0] == 6:
            scaled[3:6] = params[3:6] / level
        else:
            scaled[9:12] = params[9:12] / level
        p, losses = _register_level(
            jnp.asarray(f), jnp.asarray(m), jnp.asarray(scaled),
            lr / (li + 1), tuple(f.shape), n_iters=iters_per_level, seed=seed + li)
        # np.array (copy): np.asarray of a jax array is a read-only view,
        # and the rescale below mutates in place
        params = np.array(p)
        if params.shape[0] == 6:
            params[3:6] *= level
        else:
            params[9:12] *= level
    return params


def apply_transform(moving: np.ndarray, params: np.ndarray,
                    out_shape: Tuple[int, int, int],
                    interpolation: str = "linear") -> np.ndarray:
    """Resample moving into the fixed grid under the estimated transform."""
    center = np.array([(s - 1) / 2.0 for s in out_shape], np.float32)
    grid = np.asarray(_transform_grid(out_shape, jnp.asarray(params), center))
    order = {"nearest": 0, "linear": 1, "bspline": 3}[interpolation]
    out = _ndi.map_coordinates(moving.astype(np.float32), grid.reshape(3, -1),
                               order=order, mode="constant")
    return out.reshape(out_shape)
