"""Space-to-depth conv reformulation for skinny-channel 3D convs.

XLA's TPU lowering of ``conv3d`` collapses when the channel dims are far
below the 128-lane MXU width: the reference generator's 7^3 stem conv
(1->ngf @64^3) and head conv (ngf->1) each cost ~4-7 ms while the fat
trunk convs cost ~0.2 ms (measured on v5e). The fix is algebraic, not
approximate: run the convolution in space-to-depth domain.

For a stride-1, odd-k conv with f | spatial size (here f=4, k=7):

    y = conv_k(x)  ==  D2S_f( conv_k'( S2D_f(pad_edge(x, (k-1)/2 .. f)), W' ) )

with k' = ceil((k - 1 + f) / f) cells and the dense remapped weight

    W'[u, pi, po, ci, co] = w[f*u + pi - po]  (per axis, 0 <= f*u+pi-po < k)

so the op becomes one MXU-friendly matmul-conv with channels f^3*cin ->
f^3*cout (64 -> 2048 for the stem). Equivalence is exact (verified to bf16
rounding); the remap is a single gather+mask on the (k,k,k,ci,co) weight —
a few tiny ops per apply.

This reformulation exists purely for speed; the stored parameters remain in
the reference layout (checkpoint / torch-import compatible).
"""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jax.Array, f: int) -> jax.Array:
    """(N,D,H,W,C) -> (N,D/f,H/f,W/f,f^3*C); channel index = ((pd*f+ph)*f+pw)*C+c."""
    n, d, h, w, c = x.shape
    x = x.reshape(n, d // f, f, h // f, f, w // f, f, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(n, d // f, h // f, w // f, f * f * f * c)


def depth_to_space(x: jax.Array, f: int) -> jax.Array:
    n, d, h, w, fc = x.shape
    c = fc // (f * f * f)
    x = x.reshape(n, d, h, w, f, f, f, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(n, d * f, h * f, w * f, c)


@lru_cache(maxsize=None)
def _remap_indices(k: int, f: int) -> Tuple[np.ndarray, np.ndarray, int]:
    """Per-axis tap index T[u, pi, po] = f*u + pi - po and validity mask."""
    ku = int(np.ceil((k - 1 + f) / f))  # cells spanned
    u = np.arange(ku)[:, None, None]
    pi = np.arange(f)[None, :, None]
    po = np.arange(f)[None, None, :]
    t = f * u + pi - po
    valid = (t >= 0) & (t < k)
    return np.where(valid, t, 0).astype(np.int32), valid, ku


def remap_weight_s2d(w: jax.Array, f: int) -> jax.Array:
    """(k,k,k,ci,co) -> (ku,ku,ku, f^3*ci, f^3*co) dense S2D weight."""
    k, _, _, ci, co = w.shape
    T, valid, ku = _remap_indices(k, f)
    # gather per axis then combine; result axes:
    # (ud,pid,pod, uh,pih,poh, uw,piw,pow, ci, co)
    wg = w[T[:, :, :, None, None, None, None, None, None],
           T[None, None, None, :, :, :, None, None, None],
           T[None, None, None, None, None, None, :, :, :], :, :]
    m = (valid[:, :, :, None, None, None, None, None, None]
         & valid[None, None, None, :, :, :, None, None, None]
         & valid[None, None, None, None, None, None, :, :, :])
    wg = jnp.where(m[..., None, None], wg, 0)
    # -> (ud,uh,uw, pid,pih,piw, ci, pod,poh,pow, co)
    wg = wg.transpose(0, 3, 6, 1, 4, 7, 9, 2, 5, 8, 10)
    return wg.reshape(ku, ku, ku, f ** 3 * ci, f ** 3 * co)


def conv3d_s2d(x: jax.Array, w: jax.Array, f: int = 4,
               pad_mode: str = "edge") -> jax.Array:
    """Exact stride-1 'same' conv (k odd) with ``pad_mode`` boundary,
    computed in S2D(f) domain. x: (N,D,H,W,ci), w: (k,k,k,ci,co).
    Spatial dims must be divisible by f."""
    k = w.shape[0]
    half = (k - 1) // 2
    n, d, h, wd, ci = x.shape
    assert d % f == 0 and h % f == 0 and wd % f == 0, (x.shape, f)
    # pad up to a whole number of cells; extra positions beyond `half` hit
    # only zero entries of W' (taps outside [0,k)), so edge values there are
    # harmless — exactness preserved.
    pad = f * int(np.ceil(half / f))
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (pad, pad), (0, 0)),
                 mode=pad_mode)
    # alignment: with pad cells P=pad//f, output cell O covers input cells
    # O..O+ku-1 only if the first tap (t=0 -> pos o-half) lands in cell
    # O + (pad - half)//f ... handled implicitly because pos = o + t - half
    # + pad = f*(O + u) + pi with u = (po + t - half + pad)//f; our remap
    # assumed pos = f*u + pi - po + ... : shift w taps so that t'=t holds:
    # we need pad ≡ half (mod f) for T to be exact; enforce by re-deriving:
    shift = pad - half  # extra left padding beyond the true half
    if shift:
        # fold the shift into the tap index: pos = o + t - half + pad
        #                                        = f*O + po + t + shift
        # so effective tap t_eff = t + shift in a virtual kernel of size
        # k + shift (left-padded with zeros)
        wz = jnp.pad(w, ((shift, 0),) * 3 + ((0, 0), (0, 0)))
    else:
        wz = w
    wp = remap_weight_s2d(wz, f)
    xs = space_to_depth(xp, f)
    out = jax.lax.conv_general_dilated(
        xs, wp, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)
    return depth_to_space(out, f)


@lru_cache(maxsize=None)
def _stride2_map(k: int, p: int) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Per-axis tap table for stride-2 convs in S2D(2) domain:
    out[o] = sum_t w[t] x[2o + t - p]  =>  cell offset u = floor((t-p)/2),
    input parity pi = (t-p) mod 2, i.e. t = 2*u + pi + p."""
    u_min = (0 - p) // 2  # floor(-p/2)
    u_max = (k - 1 - p) // 2
    ku = u_max - u_min + 1
    T = np.zeros((ku, 2), np.int32)
    M = np.zeros((ku, 2), bool)
    for ui in range(ku):
        for pi in range(2):
            t = 2 * (ui + u_min) + pi + p
            if 0 <= t < k:
                T[ui, pi] = t
                M[ui, pi] = True
    return T, M, ku, -u_min


def remap_weight_s2d_stride2(w: jax.Array, p: int):
    """(k,k,k,ci,co) -> (k',k',k', 8*ci, co) for stride-2 conv on S2D(2)."""
    k = w.shape[0]
    T, M, ku, pad_lo = _stride2_map(k, p)
    # axes: (u_d,pi_d, u_h,pi_h, u_w,pi_w, ci, co)
    wg = w[T[:, :, None, None, None, None],
           T[None, None, :, :, None, None],
           T[None, None, None, None, :, :], :, :]
    m = (M[:, :, None, None, None, None]
         & M[None, None, :, :, None, None]
         & M[None, None, None, None, :, :])
    wg = jnp.where(m[..., None, None], wg, 0)
    # -> (u_d, u_h, u_w, pi_d, pi_h, pi_w, ci, co)
    wg = wg.transpose(0, 2, 4, 1, 3, 5, 6, 7)
    return wg.reshape(ku, ku, ku, 8 * w.shape[3], w.shape[4]), pad_lo, ku


def conv3d_s2d_stride2(x: jax.Array, w: jax.Array, padding: int = 1) -> jax.Array:
    """Exact stride-2 zero-padded conv computed on the S2D(2) grid — the
    output grid IS the cell grid, so the conv becomes stride-1 with channels
    8*ci (MXU-friendly for skinny ci like the PatchGAN's first layer).
    x: (N,D,H,W,ci) with even spatial dims; w: (k,k,k,ci,co)."""
    n, d, h, wd, ci = x.shape
    assert d % 2 == 0 and h % 2 == 0 and wd % 2 == 0, x.shape
    k = w.shape[0]
    p = padding
    wp, pad_lo, ku = remap_weight_s2d_stride2(w, p)
    xs = space_to_depth(x, 2)
    n_outs = [(s_ + 2 * p - k) // 2 + 1 for s_ in (d, h, wd)]
    pads = [(pad_lo, max((n_o - 1 + (ku - 1 - pad_lo)) - (s_ // 2 - 1), 0))
            for n_o, s_ in zip(n_outs, (d, h, wd))]
    out = jax.lax.conv_general_dilated(
        xs, wp, (1, 1, 1), pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)
    return out[:, :n_outs[0], :n_outs[1], :n_outs[2], :]
