"""Loss functions for CycleGAN training.

Equivalents of the reference's GANLoss (LSGAN=MSE / vanilla=BCE,
reference models/networks3D.py:130-150), L1 cycle/identity criteria
(reference models/cycle_gan_model.py:104-105), and the Pearson
correlation-coefficient loss ``1 - r**2``
(reference models/networks3D.py:156-166).

All reductions are float32 regardless of compute dtype.

Under ``core.spatial_ctx.spatial_sharding`` (volumes depth-sharded across a
mesh axis inside shard_map) every reduction becomes global: local means are
``pmean``-ed and local sums ``psum``-ed across the shard axis, so the loss
values — and therefore the gradients — match the unsharded computation
exactly (shards are uniform by construction).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _f32(x):
    return x.astype(jnp.float32)


def _shard_axes():
    from ..core.spatial_ctx import data_shard_info, spatial_shard_info

    axes = [i[0] for i in (spatial_shard_info(), data_shard_info())
            if i is not None]
    return tuple(axes) or None


def _gmean(x):
    """Global mean: plain mean, pmean-ed across the spatial (and, on a 2-D
    dp x sp mesh, batch) shard axes when tracing inside spatial_sharding
    (uniform shards)."""
    m = jnp.mean(x)
    axes = _shard_axes()
    if axes is not None:
        m = jax.lax.pmean(m, axes)
    return m


def _gsum(x):
    s = jnp.sum(x)
    axes = _shard_axes()
    if axes is not None:
        s = jax.lax.psum(s, axes)
    return s


def gan_loss(pred, target_is_real: bool, mode: str = "lsgan"):
    """LSGAN: MSE against a 0/1 target; vanilla: BCE (pred is a probability,
    i.e. the discriminator ends in sigmoid, matching use_sigmoid=no_lsgan)."""
    pred = _f32(pred)
    target = 1.0 if target_is_real else 0.0
    if mode == "lsgan":
        return _gmean(jnp.square(pred - target))
    if mode == "vanilla":
        # Select the live BCE branch statically: the two-term form
        # t*log(p) + (1-t)*log(1-p) evaluates the dead term too, and a
        # sigmoid saturated to exactly 0/1 in f32 makes it 0 * -inf = NaN.
        # eps must also sit above the f32 ulp at 1.0 (1e-12 does not — the
        # clip would round back to 1.0). torch's BCELoss survives the same
        # saturation by clamping log to -100 (torch BCELoss docs).
        eps = 1e-6
        p = jnp.clip(pred, eps, 1.0 - eps)
        nll = -jnp.log(p) if target_is_real else -jnp.log1p(-p)
        return _gmean(nll)
    raise ValueError(f"unknown gan loss mode {mode!r}")


def l1_loss(pred, target):
    return _gmean(jnp.abs(_f32(pred) - _f32(target)))


def cor_coe_loss(y_pred, y_target):
    """1 - Pearson r^2 ("absolute constraint" variant the reference uses)."""
    x = _f32(y_pred)
    y = _f32(y_target)
    xc = x - _gmean(x)
    yc = y - _gmean(y)
    r_num = _gsum(xc * yc)
    r_den = jnp.sqrt(_gsum(xc * xc)) * jnp.sqrt(_gsum(yc * yc))
    r = r_num / r_den
    return 1.0 - r * r
