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

from functools import lru_cache, partial as _partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jax.Array, f: int) -> jax.Array:
    """(N,D,H,W,C) -> (N,D/f,H/f,W/f,f^3*C); channel index = ((pd*f+ph)*f+pw)*C+c.

    BATCH-GATED decomposition (same pattern as the head-dx form): at small
    batch the per-axis interleave (W a pure reshape, then H and D each
    fold one spatial factor out of the leading lane position) lowers far
    better than the single rank-8 transpose (batch-1 step 69.4 -> 68.4 ms);
    at batch > 4 the monolithic transpose wins (per-axis form regressed
    batch-8 227 -> 233 ms) — XLA's layout choices flip with the batch
    dimension, both measured on v5e."""
    from ..core.spatial_ctx import dp_batch_divisor

    n, d, h, w, c = x.shape
    if n // dp_batch_divisor() > 4:  # gate on the PER-DEVICE batch
        x = x.reshape(n, d // f, f, h // f, f, w // f, f, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        return x.reshape(n, d // f, h // f, w // f, f * f * f * c)
    x = x.reshape(n, d, h, w // f, f * c)
    x = x.reshape(n, d, h // f, f, w // f, f * c)
    x = x.transpose(0, 1, 2, 4, 3, 5).reshape(n, d, h // f, w // f, f * f * c)
    x = x.reshape(n, d // f, f, h // f, w // f, f * f * c)
    x = x.transpose(0, 1, 3, 4, 2, 5)
    return x.reshape(n, d // f, h // f, w // f, f * f * f * c)


def depth_to_space(x: jax.Array, f: int) -> jax.Array:
    """Inverse of space_to_depth; same batch-gated decomposition."""
    from ..core.spatial_ctx import dp_batch_divisor

    n, d, h, w, fc = x.shape
    c = fc // (f * f * f)
    if n // dp_batch_divisor() > 4:
        x = x.reshape(n, d, h, w, f, f, f, c)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return x.reshape(n, d * f, h * f, w * f, c)
    x = x.reshape(n, d, h, w, f, f * f * c)
    x = x.transpose(0, 1, 4, 2, 3, 5).reshape(n, f * d, h, w, f * f * c)
    x = x.reshape(n, f * d, h, w, f, f * c)
    x = x.transpose(0, 1, 2, 4, 3, 5).reshape(n, f * d, f * h, w, f * c)
    return x.reshape(n, f * d, f * h, f * w, c)


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


def _onehot(T: np.ndarray, valid: np.ndarray, k: int, dtype) -> jax.Array:
    """Flatten a tap table (.., entries) + mask into a ((..), k) one-hot
    matrix. Each row has at most one 1, so contracting with it reproduces the
    gather exactly (no summation error, any dtype)."""
    A = (np.arange(k)[None, :] == T.reshape(-1, 1)) & valid.reshape(-1, 1)
    return jnp.asarray(A.astype(np.float32)).astype(dtype)


def remap_weight_s2d(w: jax.Array, f: int) -> jax.Array:
    """(k,k,k,ci,co) -> (ku,ku,ku, f^3*ci, f^3*co) dense S2D weight.

    Implemented as three per-axis one-hot contractions instead of a
    fancy-index gather: the gather lowers to a slow random-access fusion on
    TPU (~0.8 ms for the f=4 head remap, plus a scatter-add in the backward),
    while the one-hot matmuls are MXU-trivial and their VJP is the transposed
    matmul."""
    k, _, _, ci, co = w.shape
    T, valid, ku = _remap_indices(k, f)
    A = _onehot(T, valid, k, w.dtype)  # (ku*f*f, k)
    # contract each spatial axis of w with A: (t,s,r,ci,co) -> (Ad,Ah,Aw,ci,co)
    wg = jnp.einsum("at,bs,cr,tsrio->abcio", A, A, A, w)
    wg = wg.reshape(ku, f, f, ku, f, f, ku, f, f, ci, co)
    # (ud,pid,pod, uh,pih,poh, uw,piw,pow, ci, co)
    # -> (ud,uh,uw, pid,pih,piw, ci, pod,poh,pow, co)
    wg = wg.transpose(0, 3, 6, 1, 4, 7, 9, 2, 5, 8, 10)
    return wg.reshape(ku, ku, ku, f ** 3 * ci, f ** 3 * co)


def _edge_pad_cells_concat(xc: jax.Array, f: int, pad_cells: int,
                           c: int) -> jax.Array:
    """Per-axis concatenate form of edge_pad_cells — kept as the ADJOINT
    shape (its transpose is slices + slab reduce-adds, which XLA lowers
    well); the forward uses the frame form below."""
    for ax in (1, 2, 3):
        def boundary(idx: int, par: int) -> jax.Array:
            slab = jax.lax.slice_in_dim(xc, idx, idx + 1, axis=ax)
            full = slab.shape[:-1] + (f, f, f, c)
            s = slab.reshape(full)
            pi = [slice(None)] * len(full)
            pi[len(full) - 4 + (ax - 1)] = slice(par, par + 1)
            sel = jnp.broadcast_to(s[tuple(pi)], full)
            return sel.reshape(slab.shape)

        lo = boundary(0, 0)
        hi = boundary(xc.shape[ax] - 1, f - 1)
        xc = jnp.concatenate([lo] * pad_cells + [xc] + [hi] * pad_cells,
                             axis=ax)
    return xc


def _edge_pad_cells_frame(xc: jax.Array, f: int, p: int, c: int) -> jax.Array:
    """Frame form: ONE zero-pad into the final buffer plus six in-place face
    writes (dynamic_update_slice chain on one buffer). The concat chain
    staged the full ~380 MB tensor once per axis at the reference batch-8
    workload (XLA lowers each concat as DUS fusions into a NEW buffer);
    this writes the full tensor once and each face slab once. Faces are read
    from the in-progress buffer (axis order 1,2,3), so corner regions
    replicate exactly like sequential per-axis padding."""
    out = jnp.pad(xc, ((0, 0),) + ((p, p),) * 3 + ((0, 0),))
    for ax in (1, 2, 3):
        def face(idx: int, par: int) -> jax.Array:
            slab = jax.lax.slice_in_dim(out, idx, idx + 1, axis=ax)
            full = slab.shape[:-1] + (f, f, f, c)
            s = slab.reshape(full)
            pi = [slice(None)] * len(full)
            pi[len(full) - 4 + (ax - 1)] = slice(par, par + 1)
            sel = jnp.broadcast_to(s[tuple(pi)], full).reshape(slab.shape)
            if p > 1:  # p-cell-thick slab, same replicated values
                thick = list(sel.shape)
                thick[ax] = p
                sel = jnp.broadcast_to(sel, thick)
            return sel

        lo = face(p, 0)
        hi = face(out.shape[ax] - 1 - p, f - 1)
        idx_hi = [0] * 5
        idx_hi[ax] = out.shape[ax] - p
        out = jax.lax.dynamic_update_slice(out, lo, (0,) * 5)
        out = jax.lax.dynamic_update_slice(out, hi, tuple(idx_hi))
    return out


@_partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def edge_pad_cells(xc: jax.Array, f: int, pad_cells: int, c: int) -> jax.Array:
    """Edge-replication padding of a cell-domain tensor by whole cells.

    A pad cell replicates the true edge value, so along each axis it is the
    boundary parity slice (p=0 low / p=f-1 high) of the adjacent edge cell,
    broadcast over that axis's parity — exactly what true-domain edge
    padding by a multiple of f produces after space_to_depth.

    Mixed lowering, BATCH-GATED like the other cell relayouts (round 5,
    interleaved A/B on v5e, 3 reps, per-form minima): at per-device batch
    > 4 the FORWARD uses the frame form — one zero-pad + six in-place face
    DUS writes, where the per-axis concat chain staged the full ~380 MB
    tensor once per axis (batch-8 step 226.2 -> 222.3 ms) — while at batch
    <= 4 the concat chain lowers better and the frame form REGRESSES
    (68.6 -> 70.6 ms), mirroring the s2d/d2s per-axis gates. The BACKWARD
    is always the transpose of the concat form (slices + slab reduce-adds)
    — autodiff of the frame form would emit a full-size zero-window tensor
    per DUS (6 extra full-tensor writes, measured +4 ms at batch 1). The op
    is linear, so the exact adjoint pairs with either forward; equality of
    the two forms and of the custom VJP against concat-form autodiff is
    pinned in tests/test_s2d.py."""
    if pad_cells == 0:
        return xc
    return _epc_form(xc, f, pad_cells, c)


def _epc_form(xc, f, pad_cells, c):
    from ..core.spatial_ctx import dp_batch_divisor

    if xc.shape[0] // dp_batch_divisor() > 4:
        return _edge_pad_cells_frame(xc, f, pad_cells, c)
    return _edge_pad_cells_concat(xc, f, pad_cells, c)


def _epc_fwd(xc, f, pad_cells, c):
    y = xc if pad_cells == 0 else _epc_form(xc, f, pad_cells, c)
    return y, (jax.ShapeDtypeStruct(xc.shape, xc.dtype),)


def _epc_bwd(f, pad_cells, c, res, g):
    (aval,) = res
    if pad_cells == 0:
        return (g,)
    lt = jax.linear_transpose(
        lambda x: _edge_pad_cells_concat(x, f, pad_cells, c), aval)
    (dx,) = lt(g)
    return (dx,)


edge_pad_cells.defvjp(_epc_fwd, _epc_bwd)


def _valid_cell_conv(xp: jax.Array, wp: jax.Array, pad: int = 0) -> jax.Array:
    """Stride-1 cell-domain conv. ``pad`` cells of ZERO padding ride the conv
    custom-call's window padding — the TPU conv handles boundary zeros
    internally, so no padded copy of the operand is ever materialized (the
    explicit zero_pad_cells form staged the full padded tensor as
    constant+DUS fusions: 16+ GB/step across the batch-8 resnet program)."""
    return jax.lax.conv_general_dilated(
        xp, wp, (1, 1, 1), [(pad, pad)] * 3 if pad else "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=xp.dtype)


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def _skinny_cell_conv(xp: jax.Array, wp: jax.Array, pad: int = 0) -> jax.Array:
    """Cell-domain conv (``pad`` cells of window zero-padding) with a fast
    input-gradient for skinny input lanes (the generator stem: 8 lanes). XLA
    lowers the transposed conv for dx as a slow 8-lane VPU fusion (~2.7 ms
    per chain apply at 64^3 on v5e); here dx is computed in the
    S2D(2)-of-cells (= f4) domain where both operand lane counts are
    MXU-wide, then split back — the identity VALID-conv(grid) ==
    VALID-conv(cell pairs, remapped kernel). The weight gradient reuses
    XLA's own (fast) lowering via jax.vjp."""
    return _valid_cell_conv(xp, wp, pad)


def _scc_fwd(xp, wp, pad):
    return _valid_cell_conv(xp, wp, pad), (xp, wp)


def _scc_bwd(pad, res, gy):
    xp, wp = res
    _, vjp_w = jax.vjp(lambda W: _valid_cell_conv(xp, W, pad), wp)
    (dwp,) = vjp_w(gy)

    K = wp.shape[0]
    fi = xp.shape[-1]
    fo = wp.shape[-1]
    # dxpad[p] = sum_u wp[u] gy[p - u]  (full correlation, gy zero outside)
    #          = conv(gy, flip(wp)^T, window-pad K-1) — the gradient wrt the
    # zero-PADDED input; the window-pad cells are then sliced back off.
    # Computed over paired cells: (K-1)/2 pair-cells of window padding.
    gy4 = space_to_depth(gy, 2)  # pair the grid cells: lanes (offset, fo)
    wt = jnp.flip(wp, (0, 1, 2)).transpose(0, 1, 2, 4, 3)  # (K.., fo, fi)
    w2 = remap_weight_s2d(wt, 2)  # (ku2.., 8*fo, 8*fi)
    dxp4 = _valid_cell_conv(gy4, w2, (K - 1) // 2)
    dxp = depth_to_space(dxp4, 2)  # lanes (pair parity, fi) -> f2 cells
    if pad:
        dxp = dxp[:, pad:-pad, pad:-pad, pad:-pad, :]
    return dxp.astype(xp.dtype), dwp


_skinny_cell_conv.defvjp(_scc_fwd, _scc_bwd)


def conv3d_s2d_cells(xc: jax.Array, w: jax.Array, f: int = 4,
                     pad_mode: str = "edge", d2s: bool = True,
                     ci_split: Tuple[int, ...] = ()) -> jax.Array:
    """conv3d_s2d on an input ALREADY in cell domain; optionally keep the
    output in cell domain (``d2s=False``) so downstream elementwise/norm ops
    run with full 128-lane tiles instead of lane-padded skinny channels.
    xc: (N, D/f, H/f, W/f, f^3*ci); w: (k,k,k,ci,co) in the reference layout.

    ``ci_split``: the input is a LANE concatenation of separate cell-domain
    tensors (cells(a) ++ cells(b), lanes (parity, c) per block) — e.g. a
    U-Net skip concat kept in cells — with these true-channel counts. The
    weight remap is separable over input-channel blocks, so the conv over
    the permuted concat equals one VALID conv with the per-block remaps
    concatenated along the input-lane axis. Zero padding only (edge-pad
    needs per-block true channels)."""
    k = w.shape[0]
    half = (k - 1) // 2
    ci = w.shape[3]
    # pad by whole cells; extra positions beyond `half` only hit zero entries
    # of W' (taps outside [0,k)) — exactness preserved.
    pad = f * int(np.ceil(half / f))
    if pad_mode == "edge":
        assert not ci_split, "ci_split supports zero padding only"
        xp = edge_pad_cells(xc, f, pad // f, ci)
        wpad = 0
    else:
        xp = xc  # zero padding rides the conv's window padding (no copy)
        wpad = pad // f
    shift = pad - half  # folded into the tap index (see conv3d_s2d)
    wz = jnp.pad(w, ((shift, 0),) * 3 + ((0, 0), (0, 0))) if shift else w
    if ci_split:
        assert sum(ci_split) == ci, (ci_split, ci)
        parts, off = [], 0
        for cb in ci_split:
            parts.append(remap_weight_s2d(wz[..., off:off + cb, :], f))
            off += cb
        wp = jnp.concatenate(parts, axis=3)
    else:
        wp = remap_weight_s2d(wz, f)
    out_cells = xp.shape[1] + 2 * wpad - wp.shape[0] + 1
    if (f == 2 and xp.shape[-1] <= 16 and wp.shape[0] % 2 == 1
            and out_cells % 2 == 0):
        # skinny input lanes (the generator stem): fast custom-VJP dx
        out = _skinny_cell_conv(xp, wp, wpad)
    else:
        out = _valid_cell_conv(xp, wp, wpad)
    return depth_to_space(out, f) if d2s else out


# (A mixed-domain head VJP — dw on the f2 graph — was tried and measured
# WORSE: the f2 weight-grad's 8-lane output hits the same slow-fusion
# pathology as the stem dx, 85 vs 77 ms/step. Removed.)


# ---------------------------------------------------------------------------
# stride-2 head conv: S2D(2) cells in -> S2D(4) cells out with no activation
# relayout.
#
# The f4-domain head path (regroup f2->f4, pad, 3^3 VALID conv with 2048->64
# lanes) was the most expensive corner of the train step on v5e: the f2->f4
# regroup is a LANE relayout XLA lowers as slow T(2,128) copy chains
# (~4.7 ms/step across the 6 generator applies), and the f4 dW fusions run at
# ~55 TF/s on a 5x-blown-up FLOP count (~3.7 ms/step). Here the parity split
# folds into the conv itself: one stride-2 VALID conv over the padded f2-cell
# grid with a (2q + r - po)-tap remapped kernel. Exact (one-hot remap).
#
# (A batch_group_count=8 parity-split formulation — cell-parity classes on
# the batch axis, sublane-only splits — was measured WORSE: XLA lowers the
# grouped conv with batch-1-per-group as T(2,128) fusions, 79 vs 74 ms/step.
# Removed.)


@lru_cache(maxsize=None)
def _head_stride2_map(k: int):
    """Per-axis tap table for the stride-2 head form: out o = 4O + po reads
    padded-input cell 2O + q, parity r; tap t = 2q + r - po - shift."""
    half = (k - 1) // 2
    pc = -(-half // 2)
    shift = 2 * pc - half
    qmax = (3 + (k - 1) + shift) // 2
    q = np.arange(qmax + 1)[:, None, None]
    r = np.arange(2)[None, :, None]
    po = np.arange(4)[None, None, :]
    t = 2 * q + r - po - shift
    valid = (t >= 0) & (t < k)
    return np.where(valid, t, 0).astype(np.int32), valid, qmax + 1, pc


def remap_weight_head_stride2(w: jax.Array) -> jax.Array:
    """(k,k,k,ci,co) -> (qs,qs,qs, 8*ci, 64*co) for the stride-2 head conv
    on the f2-cell grid. Lane orders: in (rd,rh,rw,ci) = S2D(2), out
    (pod,poh,pow,co) = S2D(4)."""
    k, _, _, ci, co = w.shape
    T, valid, qs, _ = _head_stride2_map(k)
    A = _onehot(T, valid, k, w.dtype)  # (qs*2*4, k)
    wg = jnp.einsum("at,bs,cr,tsrio->abcio", A, A, A, w)
    wg = wg.reshape(qs, 2, 4, qs, 2, 4, qs, 2, 4, ci, co)
    # (qd,rd,pod, qh,rh,poh, qw,rw,pow, ci, co)
    # -> (qd,qh,qw, rd,rh,rw,ci, pod,poh,pow,co)
    wg = wg.transpose(0, 3, 6, 1, 4, 7, 9, 2, 5, 8, 10)
    return wg.reshape(qs, qs, qs, 8 * ci, 64 * co)


def _head_s2_impl(xp: jax.Array, w: jax.Array) -> jax.Array:
    Wq = remap_weight_head_stride2(w)
    return jax.lax.conv_general_dilated(
        xp, Wq, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=xp.dtype)


@jax.custom_vjp
def _head_s2_conv(xp: jax.Array, w: jax.Array) -> jax.Array:
    """Stride-2 head conv on padded f2 cells with a mixed-domain VJP.

    Forward and dW use the stride-2 form (XLA's stride-2 rhs-transpose dW
    measured 2.7 ms/step vs 3.7 for the f4 form on v5e); dx uses the f4 form
    (XLA's native input-dilated dx of the stride-2 conv lowered as ~9.5
    ms/step of T(2,128) fusions — the f4 VALID conv + one f4->f2 regroup is
    ~3x cheaper)."""
    return _head_s2_impl(xp, w)


def _head_s2_fwd(xp, w):
    return _head_s2_impl(xp, w), (xp, w)


def _head_s2_bwd(res, gy):
    from ..core.spatial_ctx import dp_batch_divisor

    xp, w = res
    k = w.shape[0]
    ci, co = w.shape[3], w.shape[4]
    _, vjp_w = jax.vjp(lambda W: _head_s2_impl(xp, W), w)
    (dw,) = vjp_w(gy)

    # dx in the f4 domain: y = VALID-conv(xp_f4, W4) with W4 the f4 remap of
    # the shift-padded kernel, so dxp_f4 = VALID-conv(zeropad(gy, ku-1),
    # flip(W4)^T); the f2 gradient is the regroup (a permutation, so its
    # adjoint is the inverse regroup).
    half = (k - 1) // 2
    pad4 = 4 * int(np.ceil(half / 4))
    _, _, _, pc = _head_stride2_map(k)
    if (2 * pc != pad4 or any(s % 2 for s in xp.shape[1:4])
            or xp.shape[0] // dp_batch_divisor() > 4):
        # f2 and f4 padded grids only coincide for k=7 (pad 4 true either
        # way); elsewhere fall back to XLA's native dx of the stride-2 form.
        # Also at PER-DEVICE batch > 4 (the traced batch divided by the
        # data-parallel axis size, like the space_to_depth gate above —
        # under pjit-DP each device sees batch/ndev):
        # the f4 conv's f4->f2 regroup is a lane relayout
        # whose cost scales superlinearly with batch (batch-16 reshapes ran
        # 6.4 ms EACH on v5e — 25 ms/step across the applies; the native dx
        # lowered fine there: 273 -> 233 ms/step at batch 8), while at
        # batch 1-2 the f4 form is ~3x cheaper than the native one.
        _, vjp_x = jax.vjp(lambda X: _head_s2_impl(X, w), xp)
        (dxp,) = vjp_x(gy)
        return dxp.astype(xp.dtype), dw
    shift4 = pad4 - half
    w4src = jnp.pad(w, ((shift4, 0),) * 3 + ((0, 0), (0, 0))) if shift4 else w
    W4 = remap_weight_s2d(w4src, 4)  # (ku,ku,ku, 64*ci, 64*co)
    ku = W4.shape[0]
    WT = jnp.flip(W4, (0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dxp4 = _valid_cell_conv(gy, WT, ku - 1)  # (N, half-cells.., 64*ci)
    dxp = regroup_cells(dxp4, 4, 2, ci)
    # (A Pallas kernel fusing this conv + the f4->f2 regroup ran at 0.45
    # ms/elem — 3x faster than this pair in isolation — but its layout
    # constraints destabilized XLA's global layout assignment: the head
    # forward and the stem backward re-lowered 2-3x slower, 77.8 vs 73.6
    # ms/step net. Measured dead end; keep the XLA pair.)
    return dxp.astype(xp.dtype), dw


_head_s2_conv.defvjp(_head_s2_fwd, _head_s2_bwd)


def conv3d_head_stride2_cells(xc: jax.Array, w: jax.Array,
                              d2s: bool = True) -> jax.Array:
    """Head conv as ONE stride-2 VALID conv on the (edge-padded) f2-cell
    grid: no activation relayout at all — the stride folds the cell-parity
    split into the conv itself. xc: (N,S/2,S/2,S/2,8*ci); w (k,k,k,ci,co)."""
    k = w.shape[0]
    ci = w.shape[3]
    _, _, _, pc = _head_stride2_map(k)
    xp = edge_pad_cells(xc, 2, pc, ci)
    y = _head_s2_conv(xp, w)
    return depth_to_space(y, 4) if d2s else y


def conv3d_s2d(x: jax.Array, w: jax.Array, f: int = 4,
               pad_mode: str = "edge") -> jax.Array:
    """Exact stride-1 'same' conv (k odd) with ``pad_mode`` boundary,
    computed in S2D(f) domain. x: (N,D,H,W,ci), w: (k,k,k,ci,co).
    Spatial dims must be divisible by f.

    Alignment note: with pad = f*ceil(half/f) cells of padding, the first
    tap lands `shift = pad - half` positions into the padded region; the
    shift is folded into the tap index by left-padding w with zeros (a
    virtual kernel of size k+shift), keeping the cell remap exact."""
    n, d, h, wd, ci = x.shape
    assert d % f == 0 and h % f == 0 and wd % f == 0, (x.shape, f)
    return conv3d_s2d_cells(space_to_depth(x, f), w, f, pad_mode, d2s=True)


def regroup_cells(xc: jax.Array, f_from: int, f_to: int, c: int) -> jax.Array:
    """(N, D/f_from, ..., f_from^3*c) -> (N, D/f_to, ..., f_to^3*c).

    Coarsening (f_to > f_from) merges r^3 = (f_to/f_from)^3 neighboring
    cells: true position i = f_to*C + f_from*b + p (b = within-group cell
    offset), so the coarse parity is p' = f_from*b + p. Refining
    (f_to < f_from) is the inverse split. One transpose either way, no
    full-res intermediate."""
    n, d, h, w, L = xc.shape
    if f_to >= f_from:
        assert f_to % f_from == 0
        r = f_to // f_from
        x = xc.reshape(n, d // r, r, h // r, r, w // r, r,
                       f_from, f_from, f_from, c)
        x = x.transpose(0, 1, 3, 5, 2, 7, 4, 8, 6, 9, 10)
        return x.reshape(n, d // r, h // r, w // r, f_to ** 3 * c)
    r = f_from // f_to
    # Refine (p_coarse = f_to*b + p_fine per axis) ONE AXIS AT A TIME: three
    # simple interleaves instead of one rank-11 transpose. Identical result;
    # XLA lowers the per-axis form measurably faster on TPU (2.5 -> 2.0 ms
    # at [1,18^3,2048] bf16) because each step only splits the leading lane
    # factor into the adjacent spatial dim.
    ft3 = f_to ** 3
    x = xc.reshape(n, d, h, w, r, L // r)
    x = x.transpose(0, 1, 4, 2, 3, 5).reshape(n, r * d, h, w, L // r)
    x = x.reshape(n, r * d, h, w, f_to, r, L // (r * r * f_to))
    x = x.transpose(0, 1, 2, 5, 3, 4, 6).reshape(n, r * d, r * h, w,
                                                 L // (r * r))
    x = x.reshape(n, r * d, r * h, w, f_to * f_to, r, f_to * c)
    x = x.transpose(0, 1, 2, 3, 5, 4, 6)
    return x.reshape(n, r * d, r * h, r * w, ft3 * c)


@lru_cache(maxsize=None)
def _strided_map(k: int, f: int) -> Tuple[np.ndarray, np.ndarray, int]:
    """Per-axis tap table for the strided S2D form: tap index
    T[tau, po] = tau - po with validity 0 <= tau-po < k; kernel span
    K'' = k + f - 1."""
    kk = k + f - 1
    tau = np.arange(kk)[:, None]
    po = np.arange(f)[None, :]
    t = tau - po
    valid = (t >= 0) & (t < k)
    return np.where(valid, t, 0).astype(np.int32), valid, kk


def remap_weight_strided(w: jax.Array, f: int) -> jax.Array:
    """(k,k,k,ci,co) -> (K'',K'',K'', ci, f^3*co) for the strided S2D form."""
    k, _, _, ci, co = w.shape
    T, valid, kk = _strided_map(k, f)
    A = _onehot(T, valid, k, w.dtype)  # (kk*f, k)
    wg = jnp.einsum("at,bs,cr,tsrio->abcio", A, A, A, w)
    wg = wg.reshape(kk, f, kk, f, kk, f, ci, co)
    # (td,pod, th,poh, tw,pow, ci, co) -> (td, th, tw, ci, pod, poh, pow, co)
    wg = wg.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return wg.reshape(kk, kk, kk, ci, f ** 3 * co)


def conv3d_s2d_strided(x: jax.Array, w: jax.Array, f: int = 4,
                       pad_mode: str = "edge") -> jax.Array:
    """Exact stride-1 'same' conv (k odd) computed as ONE stride-f conv on
    the ORIGINAL layout — the no-input-relayout variant of conv3d_s2d.

    y[f*O+po] = sum_t w[t] xp[f*O+po+t]  (xp = x padded by half=(k-1)/2)
    is a stride-f VALID conv with kernel span K''=k+f-1 producing all f^3
    parity offsets as output channels, un-interleaved by depth_to_space.
    vs conv3d_s2d: no space_to_depth copy of x, true `half` padding only
    (no f-alignment), (K''/k)^3 FLOP blowup instead of (ku*f/k)^3, and the
    backward is XLA's standard strided-conv autodiff (MXU-lowered) rather
    than gather-remap fusions. Measured in the full CycleGAN step on v5e it
    replaces ~12 ms of backward fusions + pad/copy traffic."""
    k = w.shape[0]
    half = (k - 1) // 2
    n, d, h, wd, ci = x.shape
    assert d % f == 0 and h % f == 0 and wd % f == 0, (x.shape, f)
    xp = jnp.pad(x, ((0, 0), (half, half), (half, half), (half, half), (0, 0)),
                 mode=pad_mode)
    wp = remap_weight_strided(w, f)
    out = jax.lax.conv_general_dilated(
        xp, wp, (f, f, f), "VALID",
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
    """(k,k,k,ci,co) -> (k',k',k', 8*ci, co) for stride-2 conv on S2D(2).
    One-hot contractions instead of a gather (see remap_weight_s2d)."""
    k = w.shape[0]
    T, M, ku, pad_lo = _stride2_map(k, p)
    A = _onehot(T, M, k, w.dtype)  # (ku*2, k)
    wg = jnp.einsum("at,bs,cr,tsrio->abcio", A, A, A, w)
    wg = wg.reshape(ku, 2, ku, 2, ku, 2, w.shape[3], w.shape[4])
    # (u_d,pi_d, u_h,pi_h, u_w,pi_w, ci, co) -> (u_d,u_h,u_w, pi_d,pi_h,pi_w, ci, co)
    wg = wg.transpose(0, 2, 4, 1, 3, 5, 6, 7)
    return wg.reshape(ku, ku, ku, 8 * w.shape[3], w.shape[4]), pad_lo, ku


def conv3d_stride2_cells(xs: jax.Array, w: jax.Array,
                         padding: int = 1) -> jax.Array:
    """Stride-2 zero-padded conv consuming an S2D(2) cell-domain input —
    the output grid IS the cell grid, so the conv is stride-1 with channels
    8*ci. xs: (N, D/2, H/2, W/2, 8*ci); w: (k,k,k,ci,co)."""
    k = w.shape[0]
    p = padding
    true = tuple(2 * s for s in xs.shape[1:4])
    wp, pad_lo, ku = remap_weight_s2d_stride2(w, p)
    n_outs = [(s_ + 2 * p - k) // 2 + 1 for s_ in true]
    pads = [(pad_lo, max((n_o - 1 + (ku - 1 - pad_lo)) - (s_ // 2 - 1), 0))
            for n_o, s_ in zip(n_outs, true)]
    out = jax.lax.conv_general_dilated(
        xs, wp, (1, 1, 1), pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=xs.dtype)
    return out[:, :n_outs[0], :n_outs[1], :n_outs[2], :]


def conv3d_s2d_stride2(x: jax.Array, w: jax.Array, padding: int = 1) -> jax.Array:
    """Exact stride-2 zero-padded conv computed on the S2D(2) grid
    (MXU-friendly for skinny ci like the PatchGAN's first layer).
    x: (N,D,H,W,ci) with even spatial dims; w: (k,k,k,ci,co)."""
    n, d, h, wd, ci = x.shape
    assert d % 2 == 0 and h % 2 == 0 and wd % 2 == 0, x.shape
    return conv3d_stride2_cells(space_to_depth(x, 2), w, padding)
