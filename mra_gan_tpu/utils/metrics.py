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


@partial(jax.jit, static_argnames=("win",))
def ssim3d(a, b, data_range: float | None = None, win: int = 7):
    """Mean SSIM over a 3D volume with a win^3 uniform window."""
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
