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


def instance_norm_act(
    x: jax.Array,
    eps: float = 1e-5,
    act: str = "none",
    negative_slope: float = 0.2,
) -> jax.Array:
    """Instance norm fused with the trailing activation of a conv block.

    ``act`` in {'none','relu','leaky_relu','tanh'}. XLA fuses the elementwise
    tail into the normalization already; the Pallas streaming variant lives
    in ops/pallas/instance_norm.py (dispatched by the network layer on TPU).
    """
    y = instance_norm(x, eps=eps)
    if act == "relu":
        y = jax.nn.relu(y)
    elif act == "leaky_relu":
        y = jax.nn.leaky_relu(y, negative_slope)
    elif act == "tanh":
        y = jnp.tanh(y)
    elif act != "none":
        raise ValueError(f"unknown activation {act!r}")
    return y


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
