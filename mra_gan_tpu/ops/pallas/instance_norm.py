"""Fused InstanceNorm(+activation) Pallas TPU kernels with custom VJP.

The XLA instance norm (ops/norm.py) costs ~400 us per call at 64^3x32 on
v5e — f32 up-casts and lane-padded (C=32 -> 128) traffic. Here the op is two
streaming kernels (a Pallas output block may only stay resident across
*consecutive* grid steps, so a single two-phase kernel would force the whole
volume into VMEM):

1. stats pass — stream x tiles, accumulate per-channel sum/sumsq in an f32
   VMEM block (output (N,2,C), resident across the tile loop);
2. apply pass — stream x tiles again, normalize + activation, one bf16 write.

Forward:  y = act((x - mean_c) * rsqrt(var_c + eps))
Backward: dx = r * (g' - mean(g') - z * mean(g' * z)),  g' = g * act'(z)
computed by the same two-pass structure, recomputing z from x and the saved
(mean, rstd) — no activation buffer is stored.

act in {'none', 'relu', 'leaky_relu', 'tanh'}.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5


def _interpret() -> bool:
    # run the kernel in interpreter mode off-TPU (CPU tests / fake meshes)
    return jax.default_backend() == "cpu"


def _act_fn(act: str, slope: float):
    if act == "none":
        return lambda z: z
    if act == "relu":
        return lambda z: jnp.maximum(z, 0.0)
    if act == "leaky_relu":
        return lambda z: jnp.where(z >= 0, z, slope * z)
    if act == "tanh":
        return jnp.tanh
    raise ValueError(f"unknown activation {act!r}")


def _act_grad_fn(act: str, slope: float):
    # derivative as a function of the *pre-activation* z
    if act == "none":
        return lambda z: jnp.float32(1.0)
    if act == "relu":
        return lambda z: (z >= 0).astype(jnp.float32)
    if act == "leaky_relu":
        return lambda z: jnp.where(z >= 0, 1.0, slope).astype(jnp.float32)
    if act == "tanh":
        return lambda z: 1.0 - jnp.square(jnp.tanh(z))
    raise ValueError(act)


def _pick_tile(d: int, h: int, w: int, c: int, budget_mb: float = 3.0) -> int:
    limit = budget_mb * 1024 * 1024
    td = d
    while td > 1 and td * h * w * c * 2 > limit:
        td //= 2
    while d % td:
        td -= 1
    return max(td, 1)


def _tile_spec(td, h, w, c):
    return pl.BlockSpec((1, td, h, w, c), lambda b, t: (b, t, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _stats_spec(c):
    return pl.BlockSpec((1, 2, c), lambda b, t: (b, 0, 0),
                        memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# forward


def _sum_kernel(x_ref, acc_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xf = x_ref[...].astype(jnp.float32)
    c = xf.shape[-1]
    flat = xf.reshape(-1, c)
    acc_ref[0, 0, :] += jnp.sum(flat, axis=0)
    acc_ref[0, 1, :] += jnp.sum(flat * flat, axis=0)


def _apply_kernel(x_ref, stats_ref, o_ref, *, nvox, act, slope):
    s = stats_ref[0, 0, :] / nvox
    var = stats_ref[0, 1, :] / nvox - s * s
    rstd = jax.lax.rsqrt(var + EPS)
    z = (x_ref[...].astype(jnp.float32) - s) * rstd
    o_ref[...] = _act_fn(act, slope)(z).astype(o_ref.dtype)


def _fwd(x: jax.Array, act: str, slope: float):
    n, d, h, w, c = x.shape
    td = _pick_tile(d, h, w, c)
    nt = d // td
    stats = pl.pallas_call(
        _sum_kernel,
        grid=(n, nt),
        in_specs=[_tile_spec(td, h, w, c)],
        out_specs=_stats_spec(c),
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x)
    y = pl.pallas_call(
        functools.partial(_apply_kernel, nvox=float(d * h * w), act=act, slope=slope),
        grid=(n, nt),
        in_specs=[_tile_spec(td, h, w, c), _stats_spec(c)],
        out_specs=_tile_spec(td, h, w, c),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, stats)
    return y, stats


# ---------------------------------------------------------------------------
# backward


def _bwd_sum_kernel(x_ref, g_ref, stats_ref, acc_ref, *, nvox, act, slope):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    mean = stats_ref[0, 0, :] / nvox
    var = stats_ref[0, 1, :] / nvox - mean * mean
    rstd = jax.lax.rsqrt(var + EPS)
    xf = x_ref[...].astype(jnp.float32)
    z = (xf - mean) * rstd
    gp = g_ref[...].astype(jnp.float32) * _act_grad_fn(act, slope)(z)
    c = xf.shape[-1]
    acc_ref[0, 0, :] += jnp.sum(gp.reshape(-1, c), axis=0)
    acc_ref[0, 1, :] += jnp.sum((gp * z).reshape(-1, c), axis=0)


def _bwd_apply_kernel(x_ref, g_ref, stats_ref, gstats_ref, dx_ref, *, nvox, act, slope):
    mean = stats_ref[0, 0, :] / nvox
    var = stats_ref[0, 1, :] / nvox - mean * mean
    rstd = jax.lax.rsqrt(var + EPS)
    xf = x_ref[...].astype(jnp.float32)
    z = (xf - mean) * rstd
    gp = g_ref[...].astype(jnp.float32) * _act_grad_fn(act, slope)(z)
    gmean = gstats_ref[0, 0, :] / nvox
    gzmean = gstats_ref[0, 1, :] / nvox
    dx_ref[...] = (rstd * (gp - gmean - z * gzmean)).astype(dx_ref.dtype)


def _bwd(act: str, slope: float, res, g):
    x, stats = res
    n, d, h, w, c = x.shape
    td = _pick_tile(d, h, w, c, budget_mb=2.0)
    nt = d // td
    nvox = float(d * h * w)
    gstats = pl.pallas_call(
        functools.partial(_bwd_sum_kernel, nvox=nvox, act=act, slope=slope),
        grid=(n, nt),
        in_specs=[_tile_spec(td, h, w, c), _tile_spec(td, h, w, c), _stats_spec(c)],
        out_specs=_stats_spec(c),
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, g, stats)
    dx = pl.pallas_call(
        functools.partial(_bwd_apply_kernel, nvox=nvox, act=act, slope=slope),
        grid=(n, nt),
        in_specs=[_tile_spec(td, h, w, c), _tile_spec(td, h, w, c),
                  _stats_spec(c), _stats_spec(c)],
        out_specs=_tile_spec(td, h, w, c),
        out_shape=jax.ShapeDtypeStruct(x.shape, g.dtype),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, g, stats, gstats)
    return (dx,)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def instance_norm_act_tpu(x: jax.Array, act: str = "none",
                          slope: float = 0.2) -> jax.Array:
    """Fused affine-free InstanceNorm3d + activation on NDHWC (TPU Pallas)."""
    y, _ = _fwd(x, act, slope)
    return y


def _vjp_fwd(x, act, slope):
    y, stats = _fwd(x, act, slope)
    return y, (x, stats)


instance_norm_act_tpu.defvjp(_vjp_fwd, _bwd)
