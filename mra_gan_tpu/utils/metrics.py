"""Image-quality metrics (jittable JAX): PSNR, 3D SSIM, MAE/MSE, Pearson r.

The reference publishes no quantitative metrics (qualitative JPEGs only,
reference README.md:85-87); BASELINE.md's contract asks for SSIM/PSNR parity,
so the framework ships them. SSIM follows Wang et al. 2004 with a uniform
(box) window over 3D neighborhoods, matching skimage's
``structural_similarity`` defaults for volumetric data."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def mae(a, b):
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def mse(a, b):
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.mean(d * d)


def psnr(a, b, data_range: float | None = None):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if data_range is None:
        data_range = jnp.maximum(jnp.max(b) - jnp.min(b), 1e-8)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse(a, b), 1e-20))


def pearson_r(a, b):
    a = a.astype(jnp.float32).ravel()
    b = b.astype(jnp.float32).ravel()
    ac = a - jnp.mean(a)
    bc = b - jnp.mean(b)
    return jnp.sum(ac * bc) / jnp.maximum(
        jnp.sqrt(jnp.sum(ac * ac)) * jnp.sqrt(jnp.sum(bc * bc)), 1e-12)


def _uniform_filter3d(x, win: int):
    # separable box filter, VALID (interior windows only, like skimage)
    k = jnp.ones((win,), x.dtype) / win
    y = x[None, None]  # (1,1,D,H,W)
    for axis in range(3):
        shape = [1, 1, 1]
        shape[axis] = win
        rhs = k.reshape(1, 1, *shape)
        y = jax.lax.conv_general_dilated(y, rhs, (1, 1, 1), "VALID")
    return y[0, 0]


@partial(jax.jit, static_argnames=("use_mask",))
def volume_metrics(a, b, mask=None, *, use_mask: bool = False):
    """All four volume metrics as ONE compiled program.

    evaluate.py calls this instead of the four eager functions above: eager
    jnp dispatches each op separately (a one-off dispatch costs 1.5-3.5 ms
    over the tunneled backend, and the first call compiles each op chain —
    ~14 s for the four metrics on a 256x256x128 pair, measured), while the
    fused bundle uploads each volume once and runs one executable
    (~0.3 s/pair warm).

    ``use_mask``: restrict the intensity metrics (PSNR/MAE/Pearson) to
    ``mask`` — the weighted-sum equivalent of the boolean-indexed
    ``a[mask]`` forms (which cannot jit: dynamic shapes). SSIM is always
    computed over the full volumes, matching evaluate.py's eager semantics.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if use_mask:
        w = mask.astype(jnp.float32)
        n = jnp.maximum(jnp.sum(w), 1.0)
        wmean = lambda x: jnp.sum(x * w) / n  # noqa: E731
        bmax = jnp.max(jnp.where(w > 0, b, -jnp.inf))
        bmin = jnp.min(jnp.where(w > 0, b, jnp.inf))
    else:
        wmean = jnp.mean
        bmax, bmin = jnp.max(b), jnp.min(b)
    d = a - b
    mae_v = wmean(jnp.abs(d))
    mse_v = wmean(d * d)
    data_range = jnp.maximum(bmax - bmin, 1e-8)
    psnr_v = 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse_v, 1e-20))
    ac = a - wmean(a)
    bc = b - wmean(b)
    if use_mask:
        ac, bc = ac * w, bc * w  # zero non-mask terms out of the sums
    r_v = jnp.sum(ac * bc) / jnp.maximum(
        jnp.sqrt(jnp.sum(ac * ac)) * jnp.sqrt(jnp.sum(bc * bc)), 1e-12)
    return {"ssim": _ssim3d(a, b, None, 7), "psnr": psnr_v,
            "mae": mae_v, "pearson_r": r_v}


@partial(jax.jit, static_argnames=("win",))
def ssim3d(a, b, data_range: float | None = None, win: int = 7):
    """Mean SSIM over a 3D volume with a win^3 uniform window."""
    return _ssim3d(a, b, data_range, win)


def _ssim3d(a, b, data_range, win):
    # raw (traceable) implementation, shared by ssim3d and volume_metrics
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if data_range is None:
        data_range = jnp.maximum(jnp.max(b) - jnp.min(b), 1e-8)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a = _uniform_filter3d(a, win)
    mu_b = _uniform_filter3d(b, win)
    # sample (unbiased) covariances like skimage (N/(N-1) correction)
    n = win ** 3
    cov_norm = n / (n - 1)
    ex2 = _uniform_filter3d(a * a, win)
    ey2 = _uniform_filter3d(b * b, win)
    exy = _uniform_filter3d(a * b, win)
    va = cov_norm * (ex2 - mu_a * mu_a)
    vb = cov_norm * (ey2 - mu_b * mu_b)
    cab = cov_norm * (exy - mu_a * mu_b)
    num = (2 * mu_a * mu_b + c1) * (2 * cab + c2)
    den = (mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)
    return jnp.mean(num / den)
