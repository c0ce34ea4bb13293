"""Spatial-sharding trace context.

When a network is applied inside ``spatial_sharding(axis, n_devices)`` (set
around a ``shard_map`` call whose volume is sharded along depth), the conv /
pad / norm ops become shard-aware: depth padding turns into ICI halo
exchanges (``ppermute``) with true edge/zero handling at the global
boundaries, and instance-norm statistics are ``pmean``-ed across the axis.
This lets a single generator forward run over a volume too large for one
chip's HBM — the TPU-native "long context" mechanism of this domain
(SURVEY §5), one pass instead of sliding-window patching.

The context is consulted at TRACE time (inside shard_map tracing), so the
same flax modules serve both modes with the same parameters.
"""
from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Tuple

_CTX: contextvars.ContextVar = contextvars.ContextVar(
    "mra_spatial_shard", default=None)


def spatial_shard_info() -> Optional[Tuple[str, int]]:
    """(axis_name, n_devices) when tracing inside spatial_sharding, else None."""
    return _CTX.get()


@contextlib.contextmanager
def spatial_sharding(axis_name: str, n_devices: int):
    tok = _CTX.set((str(axis_name), int(n_devices)))
    try:
        yield
    finally:
        _CTX.reset(tok)


@contextlib.contextmanager
def spatial_unsharded():
    """Temporarily clear the spatial-sharding context — for subgraphs that
    run replicated on gathered (full-depth) tensors inside an otherwise
    depth-sharded trace (e.g. the PatchGAN discriminators in the spatial
    train step, whose even-kernel stride-1 convs don't shard uniformly)."""
    tok = _CTX.set(None)
    try:
        yield
    finally:
        _CTX.reset(tok)
