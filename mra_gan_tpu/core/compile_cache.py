"""Persistent XLA compilation cache for the CLI entry points.

The full CycleGAN train step takes ~20-40 s to compile on TPU; the
reference has no equivalent cost, so repeated CLI invocations (resume,
inference, evaluation sweeps) would pay it every time. Enabling JAX's
persistent compilation cache makes every accelerator invocation after the
first load the compiled program from disk in ~1 s. (CPU runs are excluded:
XLA:CPU AOT results are machine-feature-sensitive and CPU compiles are
cheap.)

Opt out with MRA_GAN_TPU_NO_COMPILE_CACHE=1; override the location with
JAX_COMPILATION_CACHE_DIR (the standard JAX env var, honored by JAX itself).
"""
from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache() -> None:
    if os.environ.get("MRA_GAN_TPU_NO_COMPILE_CACHE") == "1":
        return
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # JAX picks it up itself
    try:
        backend = jax.default_backend()
    except Exception:
        # default_backend() is this process's FIRST device contact; on the
        # tunneled TPU pool it can raise UNAVAILABLE if the grant queue is
        # wedged (round-3 driver bench died exactly here). The cache is an
        # optimization — never let enabling it be the thing that kills a
        # run. Callers that need the device will hit (and may retry) the
        # real error at their own first device op.
        return
    if backend == "cpu":
        # XLA:CPU caches AOT machine code keyed loosely on host features;
        # reloading on a slightly different CPU risks SIGILL and CPU
        # compiles are cheap anyway — cache only accelerator programs
        return
    cache_dir = Path(
        os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache")
    ) / "mra_gan_tpu" / "xla_cache"
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass  # cache is best-effort; never block the run
