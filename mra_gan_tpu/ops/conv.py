"""3D convolution primitives, TPU-native layout.

All ops use channels-last NDHWC (the TPU-friendly layout: the channel dim maps
to the 128-lane minor dimension and XLA tiles the contraction onto the MXU).
The reference uses torch NCDHW Conv3d/ConvTranspose3d
(reference models/networks3D.py:186,205); these primitives reproduce the exact
arithmetic (verified vs torch to ~1e-14 in f64) without the layout.

Transposed conv follows torch semantics:
``out = (in-1)*stride - 2*pad + k + output_padding`` implemented as an
input-dilated correlation with the spatially-flipped kernel and asymmetric
padding (k-1-p, k-1-p+output_padding).
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

IntOr3 = Union[int, Sequence[int]]

_DIMNUMS = ("NDHWC", "DHWIO", "NDHWC")


def _triple(v: IntOr3) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(int(x) for x in v)
    assert len(t) == 3
    return t


def conv3d(
    x: jax.Array,
    kernel: jax.Array,
    stride: IntOr3 = 1,
    padding: Union[str, IntOr3, Sequence[Tuple[int, int]]] = 0,
    feature_group_count: int = 1,
    precision=None,
) -> jax.Array:
    """x: (N,D,H,W,Cin); kernel: (kd,kh,kw,Cin,Cout) -> (N,D',H',W',Cout)."""
    if isinstance(padding, str):
        pad = padding
    elif isinstance(padding, int):
        p = _triple(padding)
        pad = [(pi, pi) for pi in p]
    elif padding and isinstance(padding[0], (tuple, list)):
        pad = [tuple(p) for p in padding]
    else:
        pad = [(pi, pi) for pi in _triple(padding)]
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=_triple(stride),
        padding=pad,
        dimension_numbers=_DIMNUMS,
        feature_group_count=feature_group_count,
        precision=precision,
        preferred_element_type=x.dtype,
    )


def conv_transpose3d(
    x: jax.Array,
    kernel: jax.Array,
    stride: IntOr3 = 2,
    padding: IntOr3 = 1,
    output_padding: IntOr3 = 0,
    precision=None,
) -> jax.Array:
    """Torch-compatible ConvTranspose3d.

    x: (N,D,H,W,Cin); kernel: (kd,kh,kw,Cin,Cout) stored in *forward*
    orientation (as initialized); flipped internally.
    """
    s = _triple(stride)
    p = _triple(padding)
    op = _triple(output_padding)
    k = kernel.shape[:3]
    pad = [(k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i]) for i in range(3)]
    flipped = kernel[::-1, ::-1, ::-1, :, :]
    return lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1, 1, 1),
        padding=pad,
        lhs_dilation=s,
        dimension_numbers=_DIMNUMS,
        precision=precision,
        preferred_element_type=x.dtype,
    )


def extend_sharded_d(x: jax.Array, lo: int, hi: int,
                     boundary: str = "edge") -> jax.Array:
    """Extend the depth axis of a depth-sharded (N, D/n, H, W, C) shard by
    ``lo``/``hi`` rows: interior rows come from the mesh neighbors over ICI
    (``ppermute``), global-boundary rows replicate the edge ('edge') or are
    zero ('zero') — the sharded equivalent of padding the full volume.
    Requires lo, hi <= local shard depth. Only valid while tracing inside
    core.spatial_ctx.spatial_sharding."""
    from ..core.spatial_ctx import spatial_shard_info

    info = spatial_shard_info()
    assert info is not None, "extend_sharded_d needs spatial_sharding()"
    axis, n = info
    idx = lax.axis_index(axis)
    parts = []
    if lo:
        from_above = lax.ppermute(x[:, -lo:], axis,
                                  [(i, i + 1) for i in range(n - 1)])
        if boundary == "edge":
            bound = jnp.broadcast_to(x[:, :1], from_above.shape)
        else:
            bound = jnp.zeros_like(from_above)
        parts.append(jnp.where(idx == 0, bound, from_above))
    parts.append(x)
    if hi:
        from_below = lax.ppermute(x[:, :hi], axis,
                                  [(i + 1, i) for i in range(n - 1)])
        if boundary == "edge":
            bound = jnp.broadcast_to(x[:, -1:], from_below.shape)
        else:
            bound = jnp.zeros_like(from_below)
        parts.append(jnp.where(idx == n - 1, bound, from_below))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def replication_pad3d(x: jax.Array, pad: IntOr3) -> jax.Array:
    """Edge-replicate padding on the three spatial dims of NDHWC.

    Equivalent of torch nn.ReplicationPad3d (reference
    models/networks3D.py:185,211,233). Under spatial_sharding, the depth
    padding becomes a halo exchange with edge handling at the global ends.
    """
    from ..core.spatial_ctx import spatial_shard_info

    p = _triple(pad)
    if spatial_shard_info() is not None:
        x = extend_sharded_d(x, p[0], p[0], "edge")
        return jnp.pad(
            x, ((0, 0), (0, 0), (p[1], p[1]), (p[2], p[2]), (0, 0)),
            mode="edge")
    return jnp.pad(
        x,
        ((0, 0), (p[0], p[0]), (p[1], p[1]), (p[2], p[2]), (0, 0)),
        mode="edge",
    )
