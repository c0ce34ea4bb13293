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


def _flat_spatial_mean_f32(t: jax.Array) -> jax.Array:
    """Mean over spatial dims -> (N, C) float32.

    Measured dead end (round 5, v5e): reformulating this as a ones-vector
    dot_general with preferred_element_type=f32 — hoping the MXU's f32
    accumulation of the bf16 operand would kill the f32 materialize+copy
    the batch-1 backward stats pay (134 copies, 1.57 GB/step) — compiles to
    the IDENTICAL program: XLA canonicalizes the vector contraction back to
    convert+reduce (f32 copy count/bytes and step times unchanged to 0.4%
    in an interleaved A/B). Don't retry via jnp-level rewrites."""
    return jnp.mean(t, axis=SPATIAL_AXES, dtype=jnp.float32)


def _spatial_mean(t: jax.Array, dtype=None) -> jax.Array:
    """Mean over the spatial dims; under core.spatial_ctx.spatial_sharding
    the local mean is pmean-ed across the depth-shard axis (uniform shards),
    giving exact global per-(sample, channel) statistics."""
    from ..core.spatial_ctx import spatial_shard_info

    if dtype == jnp.float32:
        m = _flat_spatial_mean_f32(t)[:, None, None, None, :]
    else:
        m = jnp.mean(t, axis=SPATIAL_AXES, keepdims=True, dtype=dtype)
    info = spatial_shard_info()
    if info is not None:
        m = jax.lax.pmean(m, info[0])
    return m


def instance_norm(
    x: jax.Array,
    eps: float = 1e-5,
    scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-sample, per-channel normalization over the spatial dims.
    Stats accumulate in float32; elementwise stays in the input dtype."""
    mean = _spatial_mean(x, dtype=jnp.float32)
    var = _spatial_mean(jnp.square(x - mean.astype(x.dtype)), dtype=jnp.float32)
    y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(var + eps).astype(x.dtype)
    if scale is not None:
        y = y * scale.astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


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
    # Stats accumulate in float32; the big elementwise tensors stay in the
    # input dtype (an f32 upcast would double the HBM traffic of every
    # norm's forward AND materialize f32 cotangent-sized tensors in the
    # backward — measured ~3 ms/step at bf16 on v5e).
    mean = _spatial_mean(x, dtype=jnp.float32)
    var = _spatial_mean(jnp.square(x - mean.astype(x.dtype)), dtype=jnp.float32)
    rstd = jax.lax.rsqrt(var + eps)
    return (x - mean.astype(x.dtype)) * rstd.astype(x.dtype), mean, rstd


def _in_vjp_fwd(x, eps, act, slope):
    z, mean, rstd = _in_fwd_core(x, eps)
    y = _apply_act(z, act, slope).astype(x.dtype)
    return y, (x, mean, rstd)


def _in_vjp_bwd(eps, act, slope, res, g):
    x, mean, rstd = res
    z = (x - mean.astype(x.dtype)) * rstd.astype(x.dtype)
    gp = g * _act_grad(z, act, slope).astype(g.dtype)
    gmean = _spatial_mean(gp, dtype=jnp.float32)
    gzmean = _spatial_mean(gp * z, dtype=jnp.float32)
    dx = rstd.astype(g.dtype) * (gp - gmean.astype(g.dtype)
                                 - z * gzmean.astype(g.dtype))
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
    (N,...,groups*C) -> (N,1,1,1,groups*C) float32, per-(n,c) values tiled.
    The float32 accumulation fuses into the reduce — the big tensor is never
    upcast in memory."""
    m = _flat_spatial_mean_f32(t)  # (N, groups*C)
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
    # float32 stats, input-dtype elementwise (see _in_fwd_core)
    mean = _group_mean(x, groups)
    xm = x - mean.astype(x.dtype)
    var = _group_mean(jnp.square(xm), groups)
    rstd = jax.lax.rsqrt(var + eps)
    return xm * rstd.astype(x.dtype), mean, rstd


def _ing_vjp_fwd(x, groups, eps, act, slope):
    z, mean, rstd = _ing_fwd_core(x, groups, eps)
    y = _apply_act(z, act, slope).astype(x.dtype)
    return y, (x, mean, rstd)


def _ing_vjp_bwd(groups, eps, act, slope, res, g):
    x, mean, rstd = res
    z = (x - mean.astype(x.dtype)) * rstd.astype(x.dtype)
    gp = g * _act_grad(z, act, slope).astype(g.dtype)
    gmean = _group_mean(gp, groups)
    gzmean = _group_mean(gp * z, groups)
    dx = rstd.astype(g.dtype) * (gp - gmean.astype(g.dtype)
                                 - z * gzmean.astype(g.dtype))
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

    from ..core.spatial_ctx import spatial_shard_info

    use_pallas = (
        os.environ.get("MRA_GAN_TPU_PALLAS_NORM") == "1"
        and _jax.default_backend() not in ("cpu",)
        and x.shape[-1] >= 64
        and spatial_shard_info() is None
    )
    if use_pallas:
        from .pallas.instance_norm import instance_norm_act_tpu

        return instance_norm_act_tpu(x, act, negative_slope)
    return instance_norm_act(x, act=act, negative_slope=negative_slope)
