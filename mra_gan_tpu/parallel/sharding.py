"""Data-parallel CycleGAN over a JAX mesh.

The reference's only parallelism is a commented-out torch DataParallel
(reference models/networks3D.py:69-75); the TPU-native equivalent is SPMD
over an ICI mesh: batch sharded on the ``data`` axis, params/optimizer state
replicated, gradient all-reduce inserted by XLA from sharding annotations —
no explicit collectives in user code.

Pool note: the ImagePool ring buffers are replicated and the pool scan runs
over the *global* batch (XLA gathers the per-device fakes — they are small
patches), preserving the reference's exact sequential pool semantics
regardless of device count.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS
from ..models.cycle_gan import CycleGANConfig, CycleGANState, make_train_step


def shard_state(state: CycleGANState, mesh: Mesh) -> CycleGANState:
    """Replicate params/opt/pool state across the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def make_sharded_train_step(cfg: CycleGANConfig, mesh: Mesh):
    """Jit the train step with batch inputs sharded over the data axis and
    all state replicated. Returns (step_fn, batch_sharding)."""
    from ..core.spatial_ctx import dp_batch_sharded

    base_step = make_train_step(cfg)
    rep = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    n_dp = mesh.shape[DATA_AXIS]

    def hinted_step(state, a, b, rng, lr):
        # trace-time hint: ops see GLOBAL (pjit) shapes, but batch-gated
        # variants should key on the PER-DEVICE batch GSPMD gives each chip
        with dp_batch_sharded(n_dp):
            return base_step(state, a, b, rng, lr)

    step = jax.jit(
        hinted_step,
        in_shardings=(rep, batch_sh, batch_sh, rep, None),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )
    return step, batch_sh
