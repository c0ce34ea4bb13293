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
) -> np.ndarray:
    """volume: (D, H, W) float32 in the generator's input range.
    generate_fn: jittable (B, pd, ph, pw, 1) -> (B, pd, ph, pw, 1).
    Returns (D, H, W) float32 in the generator's output range.

    When every stride divides its patch dim (the reference's default 64/32),
    the decode uses the overlap-add fast path: a regular patch grid, one scan
    of batched generator calls, then r^3 parity-class reshape-adds — no
    per-patch scatter (which copies the whole accumulator each iteration and
    dominated wall-clock: 24s -> ~patch-compute-bound for a 256^2x128
    volume on v5e)."""
    patch = tuple(int(p) for p in patch_size)
    strides = (int(stride_layer), int(stride_inplane), int(stride_inplane))
    if all(p % s == 0 for p, s in zip(patch, strides)):
        return _overlap_add_inference(volume, generate_fn, patch, strides,
                                      blend, batch)
    return _scan_inference(volume, generate_fn, patch, strides, blend, batch)


# compiled decode programs, keyed by (generate_fn id, geometry): without this
# every sliding_window_inference call would re-trace and re-compile the
# unrolled decode graph (~15 s on v5e), dwarfing the actual compute
_DECODE_CACHE: dict = {}


def _overlap_add_inference(volume, generate_fn, patch, strides, blend, batch):
    vshape = volume.shape
    # pad to a regular grid: size = patch + k*stride
    padded = []
    for v, p, s in zip(vshape, patch, strides):
        k = max(0, -(-(v - p) // s))
        padded.append(p + k * s)
    vol = np.pad(volume.astype(np.float32),
                 [(0, pd - v) for pd, v in zip(padded, vshape)])
    ns = [(pd - p) // s + 1 for pd, p, s in zip(padded, patch, strides)]
    rs = [p // s for p, s in zip(patch, strides)]

    starts = np.array([(a * strides[0], b * strides[1], c * strides[2])
                       for a in range(ns[0]) for b in range(ns[1])
                       for c in range(ns[2])], np.int32)
    n = len(starts)
    n_pad = (-n) % batch
    if n_pad:
        starts = np.concatenate([starts, np.zeros((n_pad, 3), np.int32)])
    starts_b = starts.reshape(-1, batch, 3)

    win = gaussian_window(patch) if blend == "gaussian" else np.ones(patch, np.float32)

    # weight volume: overlap-add of the window at every start. Cached per
    # geometry — recomputing it was ~3 s of host time per 256x256x128 call,
    # dwarfing the ~0.8 s device decode.
    wkey = ("wsum", patch, strides, blend, tuple(padded), n)
    wsum = _DECODE_CACHE.get(wkey)
    if wsum is None:
        wsum = np.zeros(padded, np.float32)
        for (a, b, c) in starts[:n]:
            wsum[a:a + patch[0], b:b + patch[1], c:c + patch[2]] += win
        _DECODE_CACHE[wkey] = wsum

    key = ("oa", id(generate_fn), patch, strides, blend, batch,
           tuple(padded), n)
    decode = _DECODE_CACHE.get(key)
    if decode is None:
        @jax.jit
        def decode(vol, starts_b, win):
            def body(_, sb):
                patches = jax.vmap(
                    lambda s: jax.lax.dynamic_slice(vol, (s[0], s[1], s[2]), patch)
                )(sb)
                out = generate_fn(patches[..., None])[..., 0].astype(jnp.float32)
                return None, out * win

            _, outs = jax.lax.scan(body, None, starts_b)
            outs = outs.reshape(-1, *patch)[:n].reshape(ns[0], ns[1], ns[2], *patch)

            acc = jnp.zeros(tuple(padded), jnp.float32)
            for a in range(rs[0]):
                for b in range(rs[1]):
                    for c in range(rs[2]):
                        sel = outs[a::rs[0], b::rs[1], c::rs[2]]
                        m = sel.shape[:3]
                        dense = sel.transpose(0, 3, 1, 4, 2, 5).reshape(
                            m[0] * patch[0], m[1] * patch[1], m[2] * patch[2])
                        off = (a * strides[0], b * strides[1], c * strides[2])
                        pad_cfg = [(off[i], padded[i] - off[i] - dense.shape[i])
                                   for i in range(3)]
                        acc = acc + jnp.pad(dense, pad_cfg)
            return acc

        _DECODE_CACHE[key] = decode

    acc = np.asarray(decode(jnp.asarray(vol), jnp.asarray(starts_b), jnp.asarray(win)))
    out = acc / np.maximum(wsum, 1e-8)
    return out[: vshape[0], : vshape[1], : vshape[2]]


def _scan_inference(volume, generate_fn, patch, strides, blend, batch):
    stride_layer, stride_inplane, _ = strides
    vshape = volume.shape
    padded = [max(v, p) for v, p in zip(vshape, patch)]
    pads = [(0, pd - v) for pd, v in zip(padded, vshape)]
    vol = np.pad(volume.astype(np.float32), pads)

    starts = [
        compute_grid_starts(padded[0], patch[0], stride_layer),
        compute_grid_starts(padded[1], patch[1], stride_inplane),
        compute_grid_starts(padded[2], patch[2], stride_inplane),
    ]
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
