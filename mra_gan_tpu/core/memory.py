"""Compile-only HBM preflight for jitted steps.

A device OOM (RESOURCE_EXHAUSTED) permanently poisons the process on the
tunneled TPU backend — every later op fails until restart — and even on a
healthy runtime the reference's failure mode is a mid-epoch CUDA OOM after
minutes of setup (the torch reference has no equivalent check; it dies at
the first batch, reference train.py:52 onward). The TPU-native answer is to
ask the COMPILER for the step's footprint before touching the device:
``jit(f).lower(*args).compile().memory_analysis()`` performs NO allocation.
With the persistent XLA compile cache (enabled by all the CLIs,
core/compile_cache.py) the first real call's compile is then a cache hit
(measured: 0.4 s after a 15 s AOT compile); with the cache disabled
(MRA_GAN_TPU_NO_COMPILE_CACHE=1) the preflight costs one extra compile —
skip it with --no_mem_check / MRA_GAN_TPU_NO_MEM_CHECK=1 if that matters.

Measured on v5e (64^3 patches, bf16 resnet_6blocks CycleGAN step):
batch 1 ~2.1 GiB, batch 8 ~6.4 GiB (scheduler peak + resident arguments)
of 16 GiB — full table in README.md "Memory".
"""
from __future__ import annotations

import os
import sys
from typing import Optional

import jax

TRAIN_ADVICE = ("reduce --batch_size or --patch_size, enable --remat, or "
                "depth-shard the step with --spatial_parallel")


def step_memory_estimate(jitted, *args) -> Optional[dict]:
    """Bytes the compiled program needs: {'peak', 'args', 'temp', 'out'}.

    'peak' is XLA's scheduler peak for temporaries plus the resident
    argument buffers (arguments stay live for the whole program; donated
    ones alias outputs, so this slightly over-counts — acceptable for a
    preflight bound). Returns None when the callable has no AOT path or the
    backend can't report the analysis. Compile/trace errors PROPAGATE — the
    first real call would hit the identical error, and an over-HBM program
    can already fail at compile time (measured: 128^3 x batch-8 on v5e), so
    swallowing them would silently skip exactly the case the preflight
    exists for."""
    try:
        lower = jitted.lower
    except AttributeError:  # plain function / validating wrapper
        return None
    compiled = lower(*args).compile()
    try:
        ma = compiled.memory_analysis()
    except Exception:  # backend can't report (e.g. some PJRT plugins)
        return None
    if ma is None:
        return None
    vals = {}
    for key, name in (("peakm", "peak_memory_in_bytes"),
                      ("args", "argument_size_in_bytes"),
                      ("temp", "temp_size_in_bytes"),
                      ("out", "output_size_in_bytes")):
        v = getattr(ma, name, None)
        if v is None:  # partial reports exist — treat as unreportable
            return None
        vals[key] = int(v)
    # some backends put the scheduler peak in peak_memory, others report it
    # only through temp_size — take the larger
    peak = max(vals["peakm"], vals["temp"])
    return {
        "peak": peak + vals["args"],
        "args": vals["args"],
        "temp": vals["temp"],
        "out": vals["out"],
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
              limit_bytes: Optional[int] = None,
              advice: str = TRAIN_ADVICE,
              exit_on_over: bool = True) -> Optional[dict]:
    """Print the compiled footprint; when a known device limit would be
    exceeded, raise SystemExit (CLI entry points) or RuntimeError
    (exit_on_over=False — library/decode paths where the caller may want to
    continue with other work) carrying ``advice``. No limit known -> print
    only. A program that fails to COMPILE gets the advice printed on stderr
    and the compiler error re-raised (compile-time resource exhaustion is
    the over-HBM failure mode on some backends).

    MRA_GAN_TPU_NO_MEM_CHECK=1 skips the check everywhere (the CLI-level
    --no_mem_check only covers train.py's call site)."""
    if os.environ.get("MRA_GAN_TPU_NO_MEM_CHECK"):
        return None
    try:
        est = step_memory_estimate(jitted, *args)
    except Exception:
        print(f"{what}: failed to compile. If the error below reports "
              f"resource exhaustion: {advice}", file=sys.stderr)
        raise
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
        msg = (f"estimated device memory {est['peak'] / gib:.2f} GiB exceeds "
               f"the {lim / gib:.2f} GiB limit — {advice}")
        raise SystemExit(msg) if exit_on_over else RuntimeError(msg)
    return est
