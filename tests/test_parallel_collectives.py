"""Op-level collective inventory of the lowered DP and SP train steps.

The trajectory tests in tests/test_parallel.py prove the sharded steps
compute the right NUMBERS; these tests pin what the compiler actually
EMITS, so a silent resharding regression (XLA deciding to all-gather
activations, a lost sharding annotation turning the gradient all-reduce
into per-device divergence, a halo exchange becoming a full-volume
gather) fails loudly instead of shipping as a 10x ICI bill.

The asserted budgets mirror docs/DESIGN.md §6.1's arithmetic:
- DP (shard_map, the default): the explicit base-tree psum all-reduces
  exactly the trainable gradients; the pool's fake gathers are the only
  batch-sized transfers; no partitioner resharding ops at all.
- SP: collective-permute volume tracks the analytic conv-halo model
  (boundary planes per conv per G application) within tens of percent.
"""
import re

import numpy as np
import pytest
import jax

from mra_gan_tpu.core.mesh import SPACE_AXIS, make_mesh
from mra_gan_tpu.models.cycle_gan import CycleGANConfig, create_state

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

_COLL_RE = re.compile(
    r"= (\([^)]*\)|\S+) "
    r"(all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter)\(")
_SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|s8|u8|pred|f64)\[([0-9,]*)\]")


def _collectives(hlo_text):
    """{op kind: [result element count per op]} from optimized HLO text."""
    kinds = {}
    for m in _COLL_RE.finditer(hlo_text):
        shapes, kind = m.group(1), m.group(2)
        elems = 0
        for sm in _SHAPE_RE.finditer(shapes):
            dims = sm.group(2)
            elems += 1 if dims == "" else int(
                np.prod([int(d) for d in dims.split(",")]))
        kinds.setdefault(kind, []).append(elems)
    return kinds


def _n_params(state):
    return sum(int(np.prod(l.shape))
               for l in jax.tree.leaves((state.g_params, state.d_params)))


def test_dp_step_collective_inventory():
    from mra_gan_tpu.parallel.sharding import make_sharded_train_step, shard_state

    cfg = CycleGANConfig(ngf=4, ndf=4, n_layers_d=1, pool_size=2)
    patch = (12, 12, 12)
    mesh = make_mesh(jax.devices()[:8])
    state = shard_state(create_state(cfg, jax.random.PRNGKey(0), patch), mesh)
    step, batch_sh = make_sharded_train_step(cfg, mesh)
    a = jax.device_put(np.zeros((8, *patch, 1), np.float32), batch_sh)
    hlo = step.lower(state, a, a, jax.random.PRNGKey(1), 2e-4) \
              .compile().as_text()
    coll = _collectives(hlo)
    n_params = _n_params(state)
    batch_elems = int(np.prod(a.shape))

    # The shard_map DP step psums the BASE gradient tree explicitly, so the
    # all-reduce volume is exactly the trainable params minus the
    # stop_gradient'd norm-dead conv biases, plus a few scalar metric
    # pmeans (measured r4: 194,352 vs 194,780 params — the jit-GSPMD
    # fallback used to all-reduce the EXPANDED one-hot dW instead,
    # 3,940,830 elems / 20x, docs/DESIGN.md §6.1). A collapse below 0.9x
    # means gradients stopped being reduced (silent DP divergence); growth
    # past 1.1x means something activation-sized joined the reduce.
    ar = sum(coll.get("all-reduce", []))
    assert 0.9 * n_params <= ar <= 1.1 * n_params, (
        f"all-reduce volume {ar} outside [0.9, 1.1] x params ({n_params}) — "
        f"inventory: { {k: (len(v), sum(v)) for k, v in coll.items()} }")

    # all-gathers are exactly the pool's fake gathers (fake_A + fake_B, one
    # global batch each); nothing else may be gathered.
    ag = sum(coll.get("all-gather", []))
    assert 0 < ag <= 2 * batch_elems, (
        f"all-gather volume {ag} != pool-fake budget (2 x {batch_elems}) — "
        "an activation or parameter tree is being gathered")

    # Explicit shard_map collectives only — the partitioner must not add
    # resharding traffic.
    assert "all-to-all" not in coll and "collective-permute" not in coll, (
        f"unexpected resharding ops: "
        f"{ {k: (len(v), sum(v)) for k, v in coll.items()} }")


def _resnet6_halo_elems(patch, ngf):
    """Analytic per-device halo elements for one sharded resnet_6blocks
    application (docs/DESIGN.md §6.1): each conv exchanges
    2·halo_planes·(in-plane res)·C_in elements (both directions, one
    neighbor each)."""
    p = patch[1]  # in-plane resolution
    convs = ([(7, 1, 1), (3, 1, ngf), (3, 2, 2 * ngf)]
             + [(3, 4, 4 * ngf)] * 12          # 6 residual blocks x 2 convs
             + [(3, 4, 4 * ngf), (3, 2, 2 * ngf)]  # up1, up2 (transp)
             + [(7, 1, ngf)])                  # head
    return sum(2 * ((k - 1) // 2) * (p // f) ** 2 * cin
               for k, f, cin in convs)


def test_sp_step_collective_inventory():
    from mra_gan_tpu.parallel.spatial import (make_spatial_train_step,
                                              shard_spatial_state)

    cfg = CycleGANConfig(ngf=4, ndf=4, n_layers_d=1, pool_size=2,
                         net_g="resnet_6blocks")
    patch = (16, 16, 16)
    mesh = make_mesh(jax.devices()[:4], data=1, space=4)
    state = shard_spatial_state(create_state(cfg, jax.random.PRNGKey(0), patch),
                                mesh, SPACE_AXIS, cfg)
    step, vol_sh = make_spatial_train_step(cfg, mesh, SPACE_AXIS)
    a = jax.device_put(np.zeros((1, *patch, 1), np.float32), vol_sh)
    hlo = step.lower(state, a, a, jax.random.PRNGKey(1), 2e-4) \
              .compile().as_text()
    coll = _collectives(hlo)
    n_params = _n_params(state)
    vol_elems = int(np.prod(a.shape))

    # Halo volume: ~10 G application-equivalents per step (6 forwards +
    # 4 backward-dx passes). Measured 205,824 elems vs the 184,320 analytic
    # (ratio 1.12 — the backward re-exchanges a couple of cotangent planes
    # the model books as one). A collapse to ~0 means halos were replaced
    # by full gathers; a blow-up means XLA stopped reusing exchanged planes.
    cp = sum(coll.get("collective-permute", []))
    analytic = 10 * _resnet6_halo_elems(patch, cfg.ngf)
    assert 0.7 * analytic <= cp <= 1.6 * analytic, (
        f"halo collective-permute volume {cp} outside "
        f"[0.7, 1.6] x analytic {analytic} — the depth-halo structure "
        "changed; re-derive DESIGN.md §6.1 if intentional")

    # Gradient/stat psums cover the params (+ norm stats, replicated-D term).
    ar = sum(coll.get("all-reduce", []))
    assert n_params <= ar <= 1.3 * n_params + 64 * vol_elems, (
        f"all-reduce volume {ar} vs params {n_params} — grads must be "
        "psum-ed exactly once and stats stay sub-volume-sized")

    # D runs replicated on gathered volumes: the all-gather budget is a
    # handful of volumes (real/fake per direction + pool), never params.
    ag = sum(coll.get("all-gather", []))
    assert 0 < ag <= 24 * vol_elems, (
        f"all-gather volume {ag} outside the gathered-D-input budget "
        f"(<= 24 volumes of {vol_elems}) — "
        f"inventory: { {k: (len(v), sum(v)) for k, v in coll.items()} }")

    assert "all-to-all" not in coll, (
        "the SP step should never all-to-all — a resharding crept in")
