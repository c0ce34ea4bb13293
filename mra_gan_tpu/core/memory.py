"""Compile-only HBM preflight for jitted steps.

A device OOM (RESOURCE_EXHAUSTED) permanently poisons the process on the
tunneled TPU backend — every later op fails until restart — and even on a
healthy runtime the reference's failure mode is a mid-epoch CUDA OOM after
minutes of setup (the torch reference has no equivalent check; it dies at
the first batch, reference train.py:52 onward). The TPU-native answer is to
ask the COMPILER for the step's footprint before touching the device:
``jit(f).lower(*args).compile().memory_analysis()`` performs NO allocation,
and JAX reuses the executable for the first real call (measured: first call
0.4 s after a 15 s AOT compile), so the preflight costs nothing.

Measured on v5e (64^3 patches, bf16 resnet_6blocks CycleGAN step):
batch 1 ~2.0 GiB, batch 8 ~5.5 GiB (peak + resident arguments) of 16 GiB.
"""
from __future__ import annotations

from typing import Optional

import jax


def step_memory_estimate(jitted, *args) -> Optional[dict]:
    """Bytes the compiled program needs: {'peak', 'args', 'temp', 'out'}.

    'peak' is XLA's scheduler peak for temporaries plus the resident
    argument buffers (arguments stay live for the whole program; donated
    ones alias outputs, so this slightly over-counts — acceptable for a
    preflight bound). Returns None when the backend can't report it."""
    try:
        ma = jitted.lower(*args).compile().memory_analysis()
    except Exception:
        return None
    if ma is None or ma.argument_size_in_bytes is None:
        return None
    peak = max(int(ma.peak_memory_in_bytes), int(ma.temp_size_in_bytes))
    return {
        "peak": peak + int(ma.argument_size_in_bytes),
        "args": int(ma.argument_size_in_bytes),
        "temp": int(ma.temp_size_in_bytes),
        "out": int(ma.output_size_in_bytes),
    }


def device_memory_limit() -> Optional[int]:
    """Per-device HBM in bytes, when the runtime reports it (the tunneled
    axon backend returns None from memory_stats)."""
    try:
        stats = jax.devices()[0].memory_stats()
    except Exception:
        return None
    return (stats or {}).get("bytes_limit")


def preflight(jitted, *args, what: str = "train step",
              limit_bytes: Optional[int] = None) -> Optional[dict]:
    """Print the compiled footprint; SystemExit with actionable advice when
    a known device limit would be exceeded (no limit known -> print only).
    The compile is reused by the first real call, so this is free."""
    est = step_memory_estimate(jitted, *args)
    if est is None:
        return None
    lim = limit_bytes if limit_bytes is not None else device_memory_limit()
    gib = 2.0 ** 30
    line = (f"{what}: compiled device memory ~{est['peak'] / gib:.2f} GiB "
            f"(temps {est['temp'] / gib:.2f} + args {est['args'] / gib:.2f})")
    if lim:
        line += f" of {lim / gib:.2f} GiB"
    print(line)
    if lim and est["peak"] > lim:
        raise SystemExit(
            f"estimated device memory {est['peak'] / gib:.2f} GiB exceeds "
            f"the {lim / gib:.2f} GiB limit — reduce --batch_size or "
            "--patch_size, enable --remat, or depth-shard the step with "
            "--spatial_parallel")
    return est
