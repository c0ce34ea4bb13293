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
_DP_CTX: contextvars.ContextVar = contextvars.ContextVar(
    "mra_data_shard", default=None)


def spatial_shard_info() -> Optional[Tuple[str, int]]:
    """(axis_name, n_devices) when tracing inside spatial_sharding, else None."""
    return _CTX.get()


def data_shard_info() -> Optional[Tuple[str, int]]:
    """(axis_name, n_devices) of the BATCH mesh axis when the spatial step
    also shards the batch (2-D dp x sp mesh), else None. Consulted by loss
    reductions and the train step's pool/grad handling — never by conv/norm
    (per-sample semantics are unaffected by batch sharding)."""
    return _DP_CTX.get()


@contextlib.contextmanager
def spatial_sharding(axis_name: str, n_devices: int,
                     data_axis: Optional[Tuple[str, int]] = None):
    tok = _CTX.set((str(axis_name), int(n_devices)))
    tok2 = _DP_CTX.set((str(data_axis[0]), int(data_axis[1]))
                       if data_axis is not None else None)
    try:
        yield
    finally:
        _CTX.reset(tok)
        _DP_CTX.reset(tok2)


@contextlib.contextmanager
def data_sharding(axis_name: str, n_devices: int):
    """Batch-only shard context (pure-DP shard_map step): loss reductions
    pmean across the batch axis and the train step psums grads / gathers
    pool fakes; conv/norm stay single-device (per-sample semantics)."""
    tok = _DP_CTX.set((str(axis_name), int(n_devices)))
    try:
        yield
    finally:
        _DP_CTX.reset(tok)


_DP_BATCH_HINT: contextvars.ContextVar = contextvars.ContextVar(
    "mra_dp_batch_hint", default=1)


def dp_batch_divisor() -> int:
    """How many ways the batch axis is GSPMD-sharded during this trace (1
    when not data-parallel). Batch-gated op variants (ops/s2d.py) divide
    the traced global batch by this to recover the per-device batch the
    single-chip measurements were made at."""
    return _DP_BATCH_HINT.get()


@contextlib.contextmanager
def dp_batch_sharded(n_devices: int):
    tok = _DP_BATCH_HINT.set(max(1, int(n_devices)))
    try:
        yield
    finally:
        _DP_BATCH_HINT.reset(tok)


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
