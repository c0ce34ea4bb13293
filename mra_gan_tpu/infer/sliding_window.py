"""Full-volume sliding-window inference.

The reference loops patches through the generator one at a time from host
memory and scatter-adds into numpy (reference test.py:108-178). TPU-native
redesign: the whole decode — patch gather (dynamic_slice), generator forward,
blend-window weighting, scatter-add accumulation — runs as ONE jitted
``lax.scan`` over patch batches, so the volume stays on device and there is
exactly one host round-trip.

Blending: 'uniform' matches the reference's raw averaging (test.py:173);
'gaussian' adds the MONAI-style importance map (sigma = patch/8) that removes
seam artifacts. The reference's "+0.01 after dividing" bias (test.py:178,
SURVEY §2.2 #5) is a recorded bug and is NOT reproduced — we use an epsilon
inside the division instead.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def compute_grid_starts(size: int, patch: int, stride: int) -> list:
    """Start offsets covering [0, size) with the last window clamped flush to
    the edge (the reference's boundary handling, test.py:111-145)."""
    if size <= patch:
        return [0]
    starts = list(range(0, size - patch + 1, stride))
    if starts[-1] != size - patch:
        starts.append(size - patch)
    return starts


def gaussian_window(patch_size: Sequence[int], sigma_scale: float = 0.125) -> np.ndarray:
    wins = []
    for p in patch_size:
        sigma = max(p * sigma_scale, 1.0)
        x = np.arange(p, dtype=np.float64) - (p - 1) / 2.0
        wins.append(np.exp(-0.5 * (x / sigma) ** 2))
    w = wins[0][:, None, None] * wins[1][None, :, None] * wins[2][None, None, :]
    w = np.maximum(w / w.max(), 1e-4)
    return w.astype(np.float32)


def sliding_window_inference(
    volume: np.ndarray,
    generate_fn: Callable,
    patch_size: Sequence[int] = (64, 64, 64),
    stride_inplane: int = 32,
    stride_layer: int = 32,
    blend: str = "gaussian",
    batch: int = 4,
    transfer_dtype=np.float32,
    input_transfer_dtype=None,
) -> np.ndarray:
    """volume: (X, Y, Z) float32 (NIfTI axis order) in the generator's input
    range; stride_inplane covers X/Y and stride_layer covers Z, like the
    reference. generate_fn: jittable (B, px, py, pz, 1) -> same shape.
    Returns (X, Y, Z) float32 in the generator's output range. Streaming
    (below) chunks along the leading X axis.

    When every stride divides its patch dim (the reference's default 64/32),
    the decode uses the overlap-add fast path: a regular patch grid, one scan
    of batched generator calls, then r^3 parity-class reshape-adds — no
    per-patch scatter (which copies the whole accumulator each iteration and
    dominated wall-clock: 24s -> ~patch-compute-bound for a 256^2x128
    volume on v5e). With two or more depth rows the decode is additionally
    STREAMED: the volume goes host->device in stride-thick depth chunks, each
    row of patches is decoded as its input lands, and finished output chunks
    are blended/divided on device and fetched while later rows still compute
    — so PCIe/tunnel transfer overlaps decode instead of serializing
    around one monolithic jit call.

    transfer_dtype bounds only the HOST->DEVICE->HOST wire precision
    (compute and blending stay float32 on device); default float32 is
    bit-faithful. input_transfer_dtype (default: transfer_dtype) narrows
    only the input leg: for a bfloat16-compute generator, jnp.bfloat16 here
    is EXACT — the network's first op casts the input to bfloat16 anyway, so
    pre-quantizing on the host changes nothing — while halving upload bytes.
    transfer_dtype=np.float16 on the output leg is a pure ~5e-4 quantization
    of the final [-1,1] values. (np.float16 on the INPUT leg is not
    recommended: f16(x) != bf16(x), so the tiny input perturbation is
    amplified by the network's instance norms into O(1e-2) output drift.)"""
    patch = tuple(int(p) for p in patch_size)
    # volumes arrive in NIfTI (X, Y, Z) axis order (data/nifti.py): the
    # reference strides X/Y by stride_inplane and Z by stride_layer
    # (reference test.py:111-113), so stride_layer maps to the LAST axis
    strides = (int(stride_inplane), int(stride_inplane), int(stride_layer))
    if all(p % s == 0 for p, s in zip(patch, strides)):
        if volume.shape[0] > patch[0]:
            return _streaming_overlap_add(volume, generate_fn, patch, strides,
                                          blend, batch, transfer_dtype,
                                          input_transfer_dtype)
        return _overlap_add_inference(volume, generate_fn, patch, strides,
                                      blend, batch, transfer_dtype,
                                      input_transfer_dtype)
    return _scan_inference(volume, generate_fn, patch, strides, blend, batch)


# compiled decode programs, keyed by (generate_fn id, geometry): without this
# every sliding_window_inference call would re-trace and re-compile the
# unrolled decode graph (~15 s on v5e), dwarfing the actual compute
_DECODE_CACHE: dict = {}


def _axis_classes(size, patch, stride):
    """Per-axis decomposition of the reference's clamped grid
    (compute_grid_starts) into DENSE accumulation classes: within a class
    the selected patches are non-overlapping and contiguous (spacing ==
    patch), so their outputs concatenate into one dense slab — the
    reshape-add trick. Regular starts split into patch//stride residue
    classes; the clamped flush start (present when stride doesn't divide
    size-patch) is its own singleton class. Returns (starts, classes) with
    classes = [(first_idx, idx_step, count, offset), ...] indexing into
    starts. Using the clamped grid — not a zero-padded regular grid — keeps
    the decode binary-identical to the reference decoder (reference
    test.py:111-145): every patch sees only real voxels, which matters
    because the generator's instance-norm statistics are patch-global."""
    starts = compute_grid_starts(size, patch, stride)
    rs = max(1, patch // stride)
    n_reg = len(starts)
    if starts[-1] != (len(starts) - 1) * stride:
        n_reg -= 1  # last start is flush-clamped, not on the regular comb
    classes = []
    for a in range(min(rs, n_reg)):
        cnt = len(range(a, n_reg, rs))
        classes.append((a, rs, cnt, a * stride))
    if n_reg < len(starts):
        classes.append((n_reg, 1, 1, starts[-1]))
    return starts, classes


def _weight_volume(patch, strides, blend, padded, starts, win):
    """Overlap-add of the blend window at every start. Cached per geometry —
    recomputing it was ~3 s of host time per 256x256x128 call, dwarfing the
    ~0.8 s device decode."""
    # key on the CONTENT of the start set: with flush rows, volumes of
    # different sizes can share (padded, len(starts)) but have different
    # grids — a stale weight volume would silently mis-blend seams. The raw
    # bytes (not their hash) go in the key: the starts array is tiny, and an
    # exact match rules out even a hash collision reusing a wrong blend.
    wkey = ("wsum", patch, strides, blend, tuple(padded),
            np.asarray(starts, np.int32).tobytes())
    wsum = _DECODE_CACHE.get(wkey)
    if wsum is None:
        wsum = np.zeros(padded, np.float32)
        for (a, b, c) in starts:
            wsum[a:a + patch[0], b:b + patch[1], c:c + patch[2]] += win
        _DECODE_CACHE[wkey] = wsum
    return wsum


def _overlap_add_inference(volume, generate_fn, patch, strides, blend, batch,
                           transfer_dtype=np.float32, input_transfer_dtype=None):
    in_dtype = transfer_dtype if input_transfer_dtype is None else input_transfer_dtype
    vshape = volume.shape
    padded = [max(v, p) for v, p in zip(vshape, patch)]
    vol = np.pad(np.asarray(volume).astype(in_dtype),
                 [(0, pd - v) for pd, v in zip(padded, vshape)])

    axes = [_axis_classes(padded[a], patch[a], strides[a]) for a in range(3)]
    axis_starts = [ax[0] for ax in axes]
    classes = [ax[1] for ax in axes]
    ns = [len(s) for s in axis_starts]
    starts = np.array([(a, b, c) for a in axis_starts[0]
                       for b in axis_starts[1] for c in axis_starts[2]],
                      np.int32)
    n = len(starts)
    n_pad = (-n) % batch
    if n_pad:
        starts = np.concatenate([starts, np.zeros((n_pad, 3), np.int32)])
    starts_b = starts.reshape(-1, batch, 3)

    win = gaussian_window(patch) if blend == "gaussian" else np.ones(patch, np.float32)
    wsum = _weight_volume(patch, strides, blend, padded, starts[:n], win)

    # blending division runs on device (wsum cached there per geometry) so
    # the result can travel in transfer_dtype
    dwkey = ("dwsum", patch, strides, blend, tuple(padded), n)
    dwsum = _DECODE_CACHE.get(dwkey)
    if dwsum is None:
        dwsum = jnp.asarray(np.maximum(wsum, 1e-8))
        _DECODE_CACHE[dwkey] = dwsum

    key = ("oa", id(generate_fn), patch, strides, blend, batch,
           tuple(padded), n, np.dtype(transfer_dtype).name,
           np.dtype(in_dtype).name)
    decode = _DECODE_CACHE.get(key)
    if decode is None:
        @jax.jit
        def decode(vol, starts_b, win, dwsum):
            vol = vol.astype(jnp.float32)

            def body(_, sb):
                patches = jax.vmap(
                    lambda s: jax.lax.dynamic_slice(vol, (s[0], s[1], s[2]), patch)
                )(sb)
                out = generate_fn(patches[..., None])[..., 0].astype(jnp.float32)
                return None, out * win

            _, outs = jax.lax.scan(body, None, starts_b)
            outs = outs.reshape(-1, *patch)[:n].reshape(*ns, *patch)

            acc = jnp.zeros(tuple(padded), jnp.float32)
            for i0, st0, c0, off0 in classes[0]:
                for i1, st1, c1, off1 in classes[1]:
                    for i2, st2, c2, off2 in classes[2]:
                        sel = outs[i0:i0 + st0 * c0:st0,
                                   i1:i1 + st1 * c1:st1,
                                   i2:i2 + st2 * c2:st2]
                        dense = sel.transpose(0, 3, 1, 4, 2, 5).reshape(
                            c0 * patch[0], c1 * patch[1], c2 * patch[2])
                        off = (off0, off1, off2)
                        pad_cfg = [(off[i], padded[i] - off[i] - dense.shape[i])
                                   for i in range(3)]
                        acc = acc + jnp.pad(dense, pad_cfg)
            return (acc / dwsum).astype(jnp.dtype(transfer_dtype))

        _DECODE_CACHE[key] = decode

    out = np.asarray(decode(jnp.asarray(vol), jnp.asarray(starts_b),
                            jnp.asarray(win), dwsum)).astype(np.float32)
    return out[: vshape[0], : vshape[1], : vshape[2]]


def _streaming_overlap_add(volume, generate_fn, patch, strides, blend, batch,
                           transfer_dtype=np.float32, input_transfer_dtype=None):
    """Depth-streamed overlap-add decode.

    The monolithic fast path serializes [H2D whole volume] -> [decode] ->
    [D2H whole volume]; over PCIe (or this image's TPU tunnel) the transfers
    rival the compute. Here the depth axis is cut into stride-thick chunks:
    chunk k goes host->device asynchronously, each depth-row of patches
    (rs[0] consecutive chunks) decodes as soon as its input lands, and output
    chunk k — which only depends on rows k-rs[0]+1..k — is blended, divided
    by the cached weight volume, and copied back while later rows are still
    computing. All compute/accumulation is float32 on device; only the wire
    format is transfer_dtype."""
    in_dtype = transfer_dtype if input_transfer_dtype is None else input_transfer_dtype
    vshape = volume.shape
    sd, rsd = strides[0], patch[0] // strides[0]
    # leading-axis clamped grid: regular rows at a*sd plus (when stride
    # doesn't divide vshape[0]-patch[0]) one FLUSH row at f0 = v0 - p0 —
    # the reference's boundary patch. The volume zero-pads only up to the
    # chunk granularity; no patch ever reads padding (the flush row ends
    # exactly at the volume edge).
    f0 = vshape[0] - patch[0]
    has_flush = f0 % sd != 0
    n_reg = f0 // sd + 1
    padded = [-(-vshape[0] // sd) * sd,
              max(vshape[1], patch[1]), max(vshape[2], patch[2])]
    m_chunks = padded[0] // sd

    vol = np.pad(np.asarray(volume).astype(in_dtype),
                 [(0, pd - v) for pd, v in zip(padded, vshape)])

    axes12 = [_axis_classes(padded[a], patch[a], strides[a]) for a in (1, 2)]
    ns12 = [len(ax[0]) for ax in axes12]
    classes12 = [ax[1] for ax in axes12]

    # in-plane grid (leading-axis start is implicit per row)
    starts2 = np.array([(b, c) for b in axes12[0][0] for c in axes12[1][0]],
                       np.int32)
    n2 = len(starts2)
    n2_pad = (-n2) % batch
    if n2_pad:
        starts2 = np.concatenate([starts2, np.zeros((n2_pad, 2), np.int32)])
    starts2_b = starts2.reshape(-1, batch, 2)

    win = gaussian_window(patch) if blend == "gaussian" else np.ones(patch, np.float32)
    row_starts = [a * sd for a in range(n_reg)] + ([f0] if has_flush else [])
    starts3 = np.array([(a, b, c)
                        for a in row_starts for (b, c) in starts2[:n2]],
                       np.int32)
    wsum = _weight_volume(patch, strides, blend, padded, starts3, win)

    # f0 pins the leading-axis row layout: padded[0] alone is ambiguous
    # once flush rows exist (65 and 70 both chunk-pad to 96)
    geom = (patch, strides, blend, tuple(padded), f0, batch,
            np.dtype(transfer_dtype).name, np.dtype(in_dtype).name)

    dwkey = ("stream-wsum", geom)
    dwchunks = _DECODE_CACHE.get(dwkey)
    if dwchunks is None:
        dwchunks = [jnp.asarray(np.maximum(wsum[k * sd:(k + 1) * sd], 1e-8))
                    for k in range(m_chunks)]
        _DECODE_CACHE[dwkey] = dwchunks

    def decode_row_for(q0: int):
        """Row decoder reading its patch slab at static offset q0 into the
        concatenated input chunks (0 for regular rows; the sub-chunk
        remainder for the flush row, which receives rsd+1 chunks)."""
        rkey = ("stream-row", id(generate_fn), geom, q0)
        fn = _DECODE_CACHE.get(rkey)
        if fn is None:
            @jax.jit
            def fn(chunks, starts2_b, win):
                vol_row = jnp.concatenate(chunks, axis=0).astype(jnp.float32)
                vol_row = jax.lax.slice_in_dim(vol_row, q0, q0 + patch[0], axis=0)

                def body(_, sb):
                    patches = jax.vmap(
                        lambda s: jax.lax.dynamic_slice(
                            vol_row, (0, s[0], s[1]), patch)
                    )(sb)
                    out = generate_fn(patches[..., None])[..., 0].astype(jnp.float32)
                    return None, out * win

                _, outs = jax.lax.scan(body, None, starts2_b)
                outs = outs.reshape(-1, *patch)[:n2].reshape(*ns12, *patch)

                acc = jnp.zeros((patch[0], padded[1], padded[2]), jnp.float32)
                for i1, st1, c1, off1 in classes12[0]:
                    for i2, st2, c2, off2 in classes12[1]:
                        sel = outs[i1:i1 + st1 * c1:st1, i2:i2 + st2 * c2:st2]
                        dense = sel.transpose(2, 0, 3, 1, 4).reshape(
                            patch[0], c1 * patch[1], c2 * patch[2])
                        off = (off1, off2)
                        pad_cfg = [(0, 0)] + [
                            (off[i], padded[i + 1] - off[i] - dense.shape[i + 1])
                            for i in range(2)]
                        acc = acc + jnp.pad(dense, pad_cfg)
                return acc

            _DECODE_CACHE[rkey] = fn
        return fn

    def combine_for(spec):
        """spec: per contributing row (start_in_row, pad_lo, length) — all
        static; length < sd only for the flush row's partial first/last
        chunk, which is zero-padded into the chunk frame."""
        ckey = ("stream-combine", geom, spec)
        fn = _DECODE_CACHE.get(ckey)
        if fn is None:
            @jax.jit
            def fn(rows, dw):
                acc = None
                for r, (start, pad_lo, ln) in zip(rows, spec):
                    piece = jax.lax.slice_in_dim(r, start, start + ln, axis=0)
                    if ln != sd:
                        piece = jnp.pad(piece, [(pad_lo, sd - pad_lo - ln),
                                                (0, 0), (0, 0)])
                    acc = piece if acc is None else acc + piece
                return (acc / dw).astype(jnp.dtype(transfer_dtype))

            _DECODE_CACHE[ckey] = fn
        return fn

    # async pipeline: H2D chunks, rows as inputs land, combined output chunks
    # D2H while later rows compute. Dispatch order interleaves compute with
    # both transfer directions.
    dchunks = [jax.device_put(vol[k * sd:(k + 1) * sd]) for k in range(m_chunks)]
    dstarts = jax.device_put(starts2_b)
    dwin = jax.device_put(win)

    k0 = f0 // sd  # first chunk the flush row reads
    n_rows = n_reg + (1 if has_flush else 0)
    rows = [None] * n_rows
    outs = []
    for k in range(m_chunks):
        # (row index, start_in_row, pad_lo, length) for output chunk k
        contrib = []
        for a in range(max(0, k - rsd + 1), min(k, n_reg - 1) + 1):
            contrib.append((a, (k - a) * sd, 0, sd))
        if has_flush:
            lo = max(k * sd, f0)
            hi = min((k + 1) * sd, vshape[0])
            if lo < hi:
                contrib.append((n_reg, lo - f0, lo - k * sd, hi - lo))
        for a, _, _, _ in contrib:
            if rows[a] is None:
                if has_flush and a == n_reg:
                    rows[a] = decode_row_for(f0 - k0 * sd)(
                        tuple(dchunks[k0:k0 + rsd + 1]), dstarts, dwin)
                else:
                    rows[a] = decode_row_for(0)(
                        tuple(dchunks[a:a + rsd]), dstarts, dwin)
        fn = combine_for(tuple(c[1:] for c in contrib))
        out = fn(tuple(rows[a] for a, *_ in contrib), dwchunks[k])
        try:
            out.copy_to_host_async()
        except AttributeError:
            pass
        outs.append(out)

    full = np.concatenate([np.asarray(o) for o in outs], axis=0)
    return full[: vshape[0], : vshape[1], : vshape[2]].astype(np.float32)


def _scan_inference(volume, generate_fn, patch, strides, blend, batch):
    vshape = volume.shape
    padded = [max(v, p) for v, p in zip(vshape, patch)]
    pads = [(0, pd - v) for pd, v in zip(padded, vshape)]
    vol = np.pad(volume.astype(np.float32), pads)

    starts = [compute_grid_starts(padded[a], patch[a], strides[a])
              for a in range(3)]
    grid = np.array(
        [(a, b, c) for a in starts[0] for b in starts[1] for c in starts[2]],
        np.int32,
    )
    n = len(grid)
    n_pad = (-n) % batch
    # Batch-padding duplicates the last start; a per-entry validity flag
    # zeroes the duplicates' window so overlapped voxels aren't skewed
    # toward the repeated patch.
    valid = np.ones(n + n_pad, np.float32)
    if n_pad:
        grid = np.concatenate([grid, np.repeat(grid[-1:], n_pad, axis=0)])
        valid[n:] = 0.0
    grid = grid.reshape(-1, batch, 3)
    valid = valid.reshape(-1, batch)

    if blend == "gaussian":
        win = gaussian_window(patch)
    else:
        win = np.ones(patch, np.float32)

    @partial(jax.jit, static_argnames=())
    def decode(vol, grid, valid, win):
        acc0 = jnp.zeros_like(vol)
        wsum0 = jnp.zeros_like(vol)

        def body(carry, inp):
            starts_b, valid_b = inp
            acc, wsum = carry
            patches = jax.vmap(
                lambda s: jax.lax.dynamic_slice(vol, (s[0], s[1], s[2]), patch)
            )(starts_b)
            out = generate_fn(patches[..., None])[..., 0].astype(jnp.float32)
            out = out * win * valid_b[:, None, None, None]

            def scatter(carry, i):
                acc, wsum = carry
                s = starts_b[i]
                w = win * valid_b[i]
                cur = jax.lax.dynamic_slice(acc, (s[0], s[1], s[2]), patch)
                acc = jax.lax.dynamic_update_slice(acc, cur + out[i], (s[0], s[1], s[2]))
                curw = jax.lax.dynamic_slice(wsum, (s[0], s[1], s[2]), patch)
                wsum = jax.lax.dynamic_update_slice(wsum, curw + w, (s[0], s[1], s[2]))
                return (acc, wsum), None

            (acc, wsum), _ = jax.lax.scan(scatter, (acc, wsum), jnp.arange(batch))
            return (acc, wsum), None

        (acc, wsum), _ = jax.lax.scan(body, (acc0, wsum0), (grid, valid))
        return acc / jnp.maximum(wsum, 1e-8)

    out = np.asarray(decode(jnp.asarray(vol), jnp.asarray(grid),
                            jnp.asarray(valid), jnp.asarray(win)))
    return out[: vshape[0], : vshape[1], : vshape[2]]
