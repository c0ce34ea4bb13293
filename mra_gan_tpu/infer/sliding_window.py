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
    Returns (D, H, W) float32 in the generator's output range."""
    patch = tuple(int(p) for p in patch_size)
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
    if n_pad:
        grid = np.concatenate([grid, np.repeat(grid[-1:], n_pad, axis=0)])
    grid = grid.reshape(-1, batch, 3)

    if blend == "gaussian":
        win = gaussian_window(patch)
    else:
        win = np.ones(patch, np.float32)

    @partial(jax.jit, static_argnames=())
    def decode(vol, grid, win):
        acc0 = jnp.zeros_like(vol)
        wsum0 = jnp.zeros_like(vol)

        def body(carry, starts_b):
            acc, wsum = carry
            patches = jax.vmap(
                lambda s: jax.lax.dynamic_slice(vol, (s[0], s[1], s[2]), patch)
            )(starts_b)
            out = generate_fn(patches[..., None])[..., 0].astype(jnp.float32) * win

            def scatter(carry, i):
                acc, wsum = carry
                s = starts_b[i]
                cur = jax.lax.dynamic_slice(acc, (s[0], s[1], s[2]), patch)
                acc = jax.lax.dynamic_update_slice(acc, cur + out[i], (s[0], s[1], s[2]))
                curw = jax.lax.dynamic_slice(wsum, (s[0], s[1], s[2]), patch)
                wsum = jax.lax.dynamic_update_slice(wsum, curw + win, (s[0], s[1], s[2]))
                return (acc, wsum), None

            (acc, wsum), _ = jax.lax.scan(scatter, (acc, wsum), jnp.arange(batch))
            return (acc, wsum), None

        (acc, wsum), _ = jax.lax.scan(body, (acc0, wsum0), grid)
        return acc / jnp.maximum(wsum, 1e-8)

    out = np.asarray(decode(jnp.asarray(vol), jnp.asarray(grid), jnp.asarray(win)))
    return out[: vshape[0], : vshape[1], : vshape[2]]
