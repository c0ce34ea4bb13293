"""Data-parallel CycleGAN over a JAX mesh.

The reference's only parallelism is a commented-out torch DataParallel
(reference models/networks3D.py:69-75); the TPU-native equivalent is SPMD
over an ICI mesh: batch sharded on the ``data`` axis, params/optimizer
state replicated.

Two implementations, same semantics (both match the single-device step's
loss trajectory, tests/test_parallel.py):

- shard_map (default): per-device bodies with an EXPLICIT psum on the base
  parameter-gradient tree. Measured on the lowered production step, this
  all-reduces exactly the 69.3 MB of parameter gradients.
- jit + sharding annotations (fallback, used when dropout is on): GSPMD
  places the reduce at the batch contraction, which for the one-hot
  cell-domain weight remaps (ops/s2d.py) is the EXPANDED dW — measured
  184 MB/step all-reduced, 2.7x the ideal (docs/DESIGN.md §6.1). Kept for
  dropout configs because the shard_map body would reuse one rng key per
  device and repeat masks across batch shards.

Pool note: the ImagePool ring buffers are replicated and the pool scan runs
over the *global* batch (the shard_map body all-gathers the per-device
fakes — they are small patches), preserving the reference's exact
sequential pool semantics regardless of device count.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS
from ..models.cycle_gan import (CycleGANConfig, CycleGANState, PoolState,
                                make_train_step)


def shard_state(state: CycleGANState, mesh: Mesh) -> CycleGANState:
    """Replicate params/opt/pool state across the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def make_sharded_train_step(cfg: CycleGANConfig, mesh: Mesh):
    """Data-parallel train step: batch sharded over the data axis, state
    replicated. Returns (step_fn, batch_sharding)."""
    if cfg.no_dropout:
        return _make_shard_map_step(cfg, mesh)
    return _make_gspmd_step(cfg, mesh)


def _make_shard_map_step(cfg: CycleGANConfig, mesh: Mesh):
    """shard_map DP: the body runs the single-device step on the local batch
    with the data_sharding context set, so loss reductions pmean across the
    batch axis and the step psums the BASE gradient tree + all-gathers the
    pool fakes (models/cycle_gan.py train_step) — no GSPMD placement
    choices, no expanded-dW all-reduce."""
    from ..core.spatial_ctx import data_sharding

    base_step = make_train_step(cfg)
    nd = mesh.shape[DATA_AXIS]
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))

    pool_spec = PoolState(images=P(), count=P())
    state_spec = CycleGANState(
        g_params=P(), d_params=P(), opt_g=P(), opt_d=P(),
        pool_fake_a=pool_spec, pool_fake_b=pool_spec, step=P())

    def body(state, a, b, rng, lr):
        with data_sharding(DATA_AXIS, nd):
            return base_step(state, a, b, rng, lr)

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(state_spec, P(DATA_AXIS), P(DATA_AXIS), P(), P()),
        out_specs=(state_spec, P()),
        check_vma=False)

    jitted = jax.jit(sharded, donate_argnums=0)

    def step(state, a, b, rng, lr):
        return jitted(state, a, b, rng, jnp.float32(lr))

    # AOT lowering hook for core.memory.preflight (jnp.float32 coercion
    # matches what step() passes at run time)
    step.lower = lambda state, a, b, rng, lr: jitted.lower(
        state, a, b, rng, jnp.float32(lr))
    return step, batch_sh


def _make_gspmd_step(cfg: CycleGANConfig, mesh: Mesh):
    """jit-annotation DP (dropout fallback — GSPMD gives each device an
    independent slice of one global dropout mask)."""
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
