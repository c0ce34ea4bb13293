"""Normalization ops for NDHWC 3D volumes.

Instance norm matches torch ``nn.InstanceNorm3d(affine=False)`` numerics
(biased variance over spatial dims, eps=1e-5 inside the sqrt) — the
reference's default norm (reference models/networks3D.py:19).

The reference sets ``track_running_stats=True`` but never switches nets to
eval mode at inference (reference test.py never calls model.eval()), so the
running stats are dead state; we deliberately do not carry them (recorded
deviation; the torch-import shim drops those keys).

Stats are always computed in float32 even under bfloat16 compute.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

SPATIAL_AXES = (1, 2, 3)  # D,H,W of NDHWC


def instance_norm(
    x: jax.Array,
    eps: float = 1e-5,
    scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-sample, per-channel normalization over the spatial dims."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=SPATIAL_AXES, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=SPATIAL_AXES, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    return y.astype(dtype)


def _apply_act(z, act: str, slope: float):
    if act == "none":
        return z
    if act == "relu":
        return jax.nn.relu(z)
    if act == "leaky_relu":
        return jax.nn.leaky_relu(z, slope)
    if act == "tanh":
        return jnp.tanh(z)
    raise ValueError(f"unknown activation {act!r}")


def _act_grad(z, act: str, slope: float):
    if act == "none":
        return jnp.float32(1.0)
    if act == "relu":
        return (z >= 0).astype(jnp.float32)
    if act == "leaky_relu":
        return jnp.where(z >= 0, 1.0, slope).astype(jnp.float32)
    if act == "tanh":
        return 1.0 - jnp.square(jnp.tanh(z))
    raise ValueError(act)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def instance_norm_act(
    x: jax.Array,
    eps: float = 1e-5,
    act: str = "none",
    negative_slope: float = 0.2,
) -> jax.Array:
    """Instance norm fused with the trailing activation of a conv block,
    with an analytic custom VJP.

    ``act`` in {'none','relu','leaky_relu','tanh'}. Autodiff of the naive
    composition materializes ~6 f32 passes in the backward (measured 1.4 ms
    fwd+bwd at 64^3x32 on v5e); the analytic gradient
    ``dx = r*(g' - mean(g') - z*mean(g'*z))`` with z recomputed from saved
    (mean, rstd) lets XLA fuse it into ~3 sweeps. The Pallas streaming
    variant lives in ops/pallas/instance_norm.py (opt-in).
    """
    z, _, _ = _in_fwd_core(x, eps)
    return _apply_act(z, act, negative_slope).astype(x.dtype)


def _in_fwd_core(x, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=SPATIAL_AXES, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=SPATIAL_AXES, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return (xf - mean) * rstd, mean, rstd


def _in_vjp_fwd(x, eps, act, slope):
    z, mean, rstd = _in_fwd_core(x, eps)
    y = _apply_act(z, act, slope).astype(x.dtype)
    return y, (x, mean, rstd)


def _in_vjp_bwd(eps, act, slope, res, g):
    x, mean, rstd = res
    z = (x.astype(jnp.float32) - mean) * rstd
    gp = g.astype(jnp.float32) * _act_grad(z, act, slope)
    gmean = jnp.mean(gp, axis=SPATIAL_AXES, keepdims=True)
    gzmean = jnp.mean(gp * z, axis=SPATIAL_AXES, keepdims=True)
    dx = rstd * (gp - gmean - z * gzmean)
    return (dx.astype(g.dtype),)


instance_norm_act.defvjp(_in_vjp_fwd, _in_vjp_bwd)


# ---------------------------------------------------------------------------
# cell-domain (grouped-lane) instance norm
#
# For S2D(f) cell-domain tensors (N, D/f, H/f, W/f, f^3*C) the true channel
# is c = lane % C and the parity offset is lane // C; per-channel instance
# statistics are therefore means over (spatial, parity-group) — numerically
# identical to the true-domain norm, but the big tensor is only touched in
# full-128-lane tiles (C=32 true-domain tensors pay a 4x lane-padding tax).


def _group_mean(t: jax.Array, groups: int) -> jax.Array:
    """Mean over spatial dims and the parity groups of the lane dim:
    (N,...,groups*C) -> (N,1,1,1,groups*C) with per-(n,c) values tiled."""
    m = jnp.mean(t, axis=SPATIAL_AXES)  # (N, groups*C)
    n, L = m.shape
    c = L // groups
    m = jnp.mean(m.reshape(n, groups, c), axis=1)  # (N, C)
    return jnp.tile(m, (1, groups))[:, None, None, None, :]


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def instance_norm_act_grouped(
    x: jax.Array,
    groups: int,
    eps: float = 1e-5,
    act: str = "none",
    negative_slope: float = 0.2,
) -> jax.Array:
    """instance_norm_act for cell-domain tensors (see module note)."""
    z, _, _ = _ing_fwd_core(x, groups, eps)
    return _apply_act(z, act, negative_slope).astype(x.dtype)


def _ing_fwd_core(x, groups, eps):
    xf = x.astype(jnp.float32)
    mean = _group_mean(xf, groups)
    var = _group_mean(jnp.square(xf - mean), groups)
    rstd = jax.lax.rsqrt(var + eps)
    return (xf - mean) * rstd, mean, rstd


def _ing_vjp_fwd(x, groups, eps, act, slope):
    z, mean, rstd = _ing_fwd_core(x, groups, eps)
    y = _apply_act(z, act, slope).astype(x.dtype)
    return y, (x, mean, rstd)


def _ing_vjp_bwd(groups, eps, act, slope, res, g):
    x, mean, rstd = res
    z = (x.astype(jnp.float32) - mean) * rstd
    gp = g.astype(jnp.float32) * _act_grad(z, act, slope)
    gmean = _group_mean(gp, groups)
    gzmean = _group_mean(gp * z, groups)
    dx = rstd * (gp - gmean - z * gzmean)
    return (dx.astype(g.dtype),)


instance_norm_act_grouped.defvjp(_ing_vjp_fwd, _ing_vjp_bwd)


def instance_norm_act_auto(
    x: jax.Array,
    act: str = "none",
    negative_slope: float = 0.2,
) -> jax.Array:
    """Dispatch between the Pallas streaming kernel and the XLA norm.

    Status (measured on v5e, full CycleGAN step): the standalone Pallas
    kernel wins at isolated fat-channel shapes but LOSES in the full traced
    step — XLA fuses the norm's elementwise tail into neighbors for free and
    the extra kernel launches cost more than they save (181ms -> 228ms).
    Default is therefore XLA; set MRA_GAN_TPU_PALLAS_NORM=1 to opt in."""
    import os

    import jax as _jax

    use_pallas = (
        os.environ.get("MRA_GAN_TPU_PALLAS_NORM") == "1"
        and _jax.default_backend() not in ("cpu",)
        and x.shape[-1] >= 64
    )
    if use_pallas:
        from .pallas.instance_norm import instance_norm_act_tpu

        return instance_norm_act_tpu(x, act, negative_slope)
    return instance_norm_act(x, act=act, negative_slope=negative_slope)
