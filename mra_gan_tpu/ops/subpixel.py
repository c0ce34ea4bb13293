"""Subpixel (pixel-shuffle) reformulation of stride-2 transposed convs.

``conv_transpose3d`` via input dilation makes XLA compute over inserted
zeros: for k=3/s=2 only 8 of the 27 taps per output are real (3.4x wasted
FLOPs) and the spatial-dilated shapes lower poorly (measured 4.3-4.7 ms per
up-conv on v5e). Exact algebra: with o = 2O + q (cell O, parity q) and
i = O + (q + p - t)/2,

    convT(x, w)[o] = sum_{t : q+p-t even} w[t] * x[O + (q+p-t)/2]

so each of the 8 output parity classes is a small dense conv over input
cells; stacking the parities into channels gives ONE matmul-friendly conv
(cin -> 8*cout) followed by a depth-to-space interleave. Weight remap is a
single gather+mask (k,k,k,ci,co) -> (k',k',k', ci, 8*co).

Supports stride 2 with the generator/UNet configs (k=3,p=1,op=1 and
k=4,p=1,op=0 — any (k,p,op) with op in {0,1} and output 2*in works).
"""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .s2d import depth_to_space


@lru_cache(maxsize=None)
def _subpixel_map(k: int, p: int) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Per-axis tap table T[q, u_idx] = t (or 0 with mask False).
    u = (q + p - t)/2 for even (q+p-t); returns (T, mask, k', pad_lo)."""
    entries = {0: {}, 1: {}}
    us = []
    for q in (0, 1):
        for t in range(k):
            num = q + p - t
            if num % 2 == 0:
                u = num // 2
                entries[q][u] = t
                us.append(u)
    u_min, u_max = min(us), max(us)
    ku = u_max - u_min + 1
    T = np.zeros((2, ku), np.int32)
    M = np.zeros((2, ku), bool)
    for q in (0, 1):
        for u, t in entries[q].items():
            T[q, u - u_min] = t
            M[q, u - u_min] = True
    # conv computes out[O] = sum_j w'[j] x[O - pad_lo + j]; tap at O+u means
    # j = u - u_min with pad_lo = -u_min
    return T, M, ku, -u_min


def remap_weight_subpixel(w: jax.Array, p: int) -> Tuple[jax.Array, Tuple[int, int, int], int]:
    """(k,k,k,ci,co) -> (k',k',k', ci, 8*co); returns (W', pads, k').
    One-hot contractions instead of a gather (see s2d.remap_weight_s2d)."""
    from .s2d import _onehot

    k = w.shape[0]
    ci, co = w.shape[3], w.shape[4]
    T, M, ku, pad_lo = _subpixel_map(k, p)
    A = _onehot(T, M, k, w.dtype)  # (2*ku, k)
    wg = jnp.einsum("at,bs,cr,tsrio->abcio", A, A, A, w)
    wg = wg.reshape(2, ku, 2, ku, 2, ku, ci, co)
    # (q_d,u_d, q_h,u_h, q_w,u_w, ci, co) -> (u_d, u_h, u_w, ci, q_d, q_h, q_w, co)
    wg = wg.transpose(1, 3, 5, 6, 0, 2, 4, 7)
    return wg.reshape(ku, ku, ku, ci, 8 * co), pad_lo, ku


def _f4_from_bq_perm(co: int) -> np.ndarray:
    """Permutation taking lanes (b_d,b_h,b_w,(q_d,q_h,q_w,co)) to the f4 cell
    order ((p4_d,p4_h,p4_w),co) with p4 = 2b + q."""
    src = np.arange(64 * co).reshape(2, 2, 2, 2, 2, 2, co)  # bd,bh,bw,qd,qh,qw,c
    tgt = np.empty_like(src)
    for bd in range(2):
        for bh in range(2):
            for bw in range(2):
                for qd in range(2):
                    for qh in range(2):
                        for qw in range(2):
                            p4 = ((2 * bd + qd) * 4 + (2 * bh + qh)) * 4 + (2 * bw + qw)
                            tgt.reshape(64, co)[p4] = src[bd, bh, bw, qd, qh, qw]
    return tgt.reshape(-1)


def conv_transpose3d_subpixel_cells(xc: jax.Array, w: jax.Array,
                                    padding: int = 1,
                                    output_padding: int = 1) -> jax.Array:
    """Stride-2 transposed conv, f2-cells in -> f4-cells out, with ZERO
    activation relayout: the subpixel conv (a stride-1 conv over the output's
    half grid) is itself cell-domain-remapped (ops/s2d.remap_weight_s2d), and
    the output lane order (input-cell offset b, subpixel parity q, co) is
    permuted to the f4 convention p4 = 2b + q on the WEIGHT's channel axis.

    xc: (N, S, S, S, 8*ci) = S2D(2) cells of the (2S)^3 input grid;
    returns (N, S, S, S, 64*co) = S2D(4) cells of the (4S)^3 output."""
    from .s2d import remap_weight_s2d

    k = w.shape[0]
    ci, co = w.shape[3], w.shape[4]
    assert (k + output_padding - 2 * padding) == 2
    wsub, pad_lo, ku = remap_weight_subpixel(w, padding)  # (ku.., ci, 8co)
    # cell-domain-ify the stride-1 subpixel conv with pads (pad_lo, pad_hi):
    # pl whole zero cells on the left; fold the residual shift into the taps
    pl = -(-pad_lo // 2)
    shift = 2 * pl - pad_lo
    wz = jnp.pad(wsub, ((shift, 0),) * 3 + ((0, 0), (0, 0))) if shift else wsub
    wp = remap_weight_s2d(wz, 2)  # (ku2.., 8ci, 8*(8co))
    ku2 = wp.shape[0]
    pr = ku2 - 1 - pl  # right zero cells so out cells == in cells
    perm = _f4_from_bq_perm(co)
    wp = wp[..., perm]
    out = jax.lax.conv_general_dilated(
        xc, wp, (1, 1, 1), [(pl, pr)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=xc.dtype)
    return out


def conv_transpose3d_subpixel_f4(x: jax.Array, w: jax.Array,
                                 padding: int = 1,
                                 output_padding: int = 1) -> jax.Array:
    """Stride-2 transposed conv, TRUE-layout input -> S2D(4) cell output,
    as ONE stride-2 conv (no activation relayout): block pairs of subpixel
    grid positions into the output channels. z[2C+b, (q,co)] =
    sum_u Wsub[u] x[2C + b - pad_lo + u]  =>  a stride-2 conv with taps
    tau = b + u (span ku+1) and channels (b, q, co), lane-permuted to the
    f4 convention p4 = 2b + q.

    x: (N, S, S, S, ci) -> (N, S/2, S/2, S/2, 64*co) (cells of the (2S)^3
    output). Costs (ku+1)^3/(2*ku^3/..) more MXU FLOPs than the plain
    subpixel conv in exchange for zero relayouts."""
    k = w.shape[0]
    ci, co = w.shape[3], w.shape[4]
    assert (k + output_padding - 2 * padding) == 2
    wsub, pad_lo, ku = remap_weight_subpixel(w, padding)  # (ku.., ci, 8co)
    # block: tau = b + u, b in {0,1}: W3[tau, ci, (b, qco)] = wsub[tau-b]
    kk = ku + 1
    T = np.zeros((kk, 2), np.int32)
    M = np.zeros((kk, 2), bool)
    for tau in range(kk):
        for b in range(2):
            u = tau - b
            if 0 <= u < ku:
                T[tau, b] = u
                M[tau, b] = True
    from .s2d import _onehot

    A = _onehot(T, M, ku, w.dtype)  # (kk*2, ku)
    w3 = jnp.einsum("at,bs,cr,tsrio->abcio", A, A, A, wsub)
    w3 = w3.reshape(kk, 2, kk, 2, kk, 2, ci, 8 * co)
    # (tau_d,b_d, .., ci, qco) -> (tau_d,tau_h,tau_w, ci, b_d,b_h,b_w, qco)
    w3 = w3.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    w3 = w3.reshape(kk, kk, kk, ci, 64 * co)
    perm = _f4_from_bq_perm(co)
    w3 = w3[..., perm]
    # input coverage: position 2C + b - pad_lo + u = 2C + tau - pad_lo;
    # tau in [0, kk) -> pads (pad_lo, pad_hi) with stride 2
    n, d, h, wd, _ = x.shape
    pad_hi = kk - 1 - pad_lo - 1  # last block start 2(S/2-1), tau max kk-1
    need_hi = (d - 2) + (kk - 1) - pad_lo - (d - 1)
    pad_hi = max(need_hi, 0)
    out = jax.lax.conv_general_dilated(
        x, w3, (2, 2, 2), [(pad_lo, pad_hi)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)
    return out


def conv_transpose3d_blocked(x: jax.Array, w: jax.Array,
                             cells_out: bool = False) -> jax.Array:
    """Exact torch ConvTranspose3d for the kernel==stride, padding=0,
    output_padding=0 case (MONAI DynUNet's UnetUpBlock upsampler,
    reference models/networks3D.py:365-375 via monai UnetUpBlock), with
    PER-AXIS strides — e.g. the (2,2,1) levels of the auto-schedule.

    With k==s and p==0 the output blocks are disjoint:
    ``out[d*sd+i, h*sh+j, w*sw+l, co] = sum_ci x[d,h,w,ci] * K[i,j,l,ci,co]``
    — a 1x1x1 conv to (sd*sh*sw*co) lanes followed by a local per-axis
    interleave. No input dilation, no halo: every output voxel depends on
    exactly one input voxel, so the op is shard-local along a sharded depth
    axis (parallel/spatial.py) and MXU-friendly everywhere.

    x: (N,D,H,W,ci); w: (sd,sh,sw,ci,co) -> (N, D*sd, H*sh, W*sw, co).

    ``cells_out=True`` (stride (2,2,2) only) skips the interleave and returns
    the pre-interleave tensor (N,D,H,W,8*co): its parity-major lane order
    ((i*sh+j)*sw+l)*co+c is exactly the S2D(2) cell convention of the doubled
    grid, so cell-domain consumers (ops/s2d.py) take it with zero relayout.
    """
    sd, sh, sw, ci, co = w.shape
    # (sd,sh,sw,ci,co) -> (1,1,1, ci, sd*sh*sw*co), lane = ((i*sh+j)*sw+l)*co+c
    wp = w.transpose(3, 0, 1, 2, 4).reshape(1, 1, 1, ci, sd * sh * sw * co)
    y = jax.lax.conv_general_dilated(
        x, wp, (1, 1, 1), [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)
    if cells_out:
        assert (sd, sh, sw) == (2, 2, 2), (sd, sh, sw)
        return y
    n, d, h, wd, _ = y.shape
    y = y.reshape(n, d, h, wd, sd, sh, sw, co)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(n, d * sd, h * sh, wd * sw, co)


def conv_transpose3d_subpixel(x: jax.Array, w: jax.Array, padding: int = 1,
                              output_padding: int = 1,
                              d2s: bool = True) -> jax.Array:
    """Exact stride-2 torch ConvTranspose3d via subpixel conv + D2S.
    x: (N,D,H,W,ci); w: (kd,kh,kw,ci,co); output (N,2D,2H,2W,co).

    ``d2s=False`` returns the pre-interleave cell-domain tensor
    (N,D,H,W,8*co) — the subpixel conv's parity-major channel order is
    exactly the S2D(2) cell convention, so downstream cell-domain consumers
    (ops/s2d.py) can skip the D2S relayout entirely."""
    k = w.shape[0]
    out_len = 2  # out = 2*in requires (in-1)*2 - 2p + k + op == 2*in
    assert (k + output_padding - 2 * padding) == 2, (
        f"subpixel path needs out=2*in; got k={k} p={padding} op={output_padding}")
    wp, pad_lo, ku = remap_weight_subpixel(w, padding)
    pad_hi = ku - 1 - pad_lo
    out = jax.lax.conv_general_dilated(
        x, wp, (1, 1, 1), [(pad_lo, pad_hi)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)
    return depth_to_space(out, 2) if d2s else out
