

def test_restore_across_pool_layouts(tmp_path):
    """A checkpoint saved by the single-chip step (cell-layout pools) must
    restore into a spatial-parallel run (plain-layout pools): params/opt/step
    adopted exactly, pool history reset with a warning."""
    import warnings

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mra_gan_tpu.checkpoint import CheckpointManager
    from mra_gan_tpu.models.cycle_gan import (CycleGANConfig, PoolState,
                                              create_state)

    cfg = CycleGANConfig(ngf=4, ndf=4, n_layers_d=1, pool_size=2)
    state = create_state(cfg, jax.random.PRNGKey(0), (16, 16, 16))
    assert state.pool_fake_a.images.shape[-1] == 64  # cell layout
    ck = CheckpointManager(tmp_path, "x")
    ck.save("latest", state.replace(step=jnp.int32(7)))

    # template with plain-layout pools (what the spatial step uses)
    plain = PoolState(images=jnp.zeros((2, 16, 16, 16, 1), cfg.dtype),
                      count=jnp.zeros((), jnp.int32))
    tmpl = create_state(cfg, jax.random.PRNGKey(1), (16, 16, 16)).replace(
        pool_fake_a=plain, pool_fake_b=plain)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = ck.restore("latest", tmpl)
    assert any("pool history reset" in str(x.message) for x in w)
    assert int(got.step) == 7
    for a, b in zip(jax.tree.leaves(got.g_params), jax.tree.leaves(state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert got.pool_fake_a.images.shape == (2, 16, 16, 16, 1)
    assert int(got.pool_fake_a.count) == 0


def test_restore_into_sharded_template_keeps_shardings(tmp_path):
    """train.py restores AFTER shard_spatial_state, so resuming a single-chip
    checkpoint into a --spatial_parallel run hands the relayout fallback a
    MESH-SHARDED template: every adopted leaf (params/opt replicated, pool
    buffers depth-sharded, reset or not) must come back with the template's
    sharding, or the jitted shard_map step resharded silently every resume."""
    import warnings

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mra_gan_tpu.checkpoint import CheckpointManager
    from mra_gan_tpu.models.cycle_gan import CycleGANConfig, create_state
    from mra_gan_tpu.parallel.spatial import shard_spatial_state

    cfg = CycleGANConfig(ngf=4, ndf=4, n_layers_d=1, pool_size=2)
    state = create_state(cfg, jax.random.PRNGKey(0), (16, 16, 16))
    assert state.pool_fake_a.images.shape[-1] == 64  # single-chip cell layout
    ck = CheckpointManager(tmp_path, "x")
    ck.save("latest", state.replace(step=jnp.int32(3)))

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("space",))
    tmpl = shard_spatial_state(
        create_state(cfg, jax.random.PRNGKey(1), (16, 16, 16)), mesh,
        "space", cfg)
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        got = ck.restore("latest", tmpl)

    rep = NamedSharding(mesh, P())
    psh = NamedSharding(mesh, P(None, "space"))
    for leaf in jax.tree.leaves((got.g_params, got.d_params, got.opt_g,
                                 got.opt_d)):
        assert leaf.sharding.is_equivalent_to(rep, leaf.ndim), leaf.sharding
    for pool in (got.pool_fake_a, got.pool_fake_b):
        assert pool.images.sharding.is_equivalent_to(psh, pool.images.ndim)
        assert pool.count.sharding.is_equivalent_to(rep, 0)
    assert got.step.sharding.is_equivalent_to(rep, 0)
    for a, b in zip(jax.tree.leaves(got.g_params),
                    jax.tree.leaves(state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_rejects_renamed_module_layout(tmp_path):
    """Identically-shaped-but-differently-named param trees must NOT adopt
    positionally through the relayout fallback — key paths are verified."""
    import jax
    import jax.numpy as jnp
    import pytest

    from mra_gan_tpu.checkpoint import CheckpointManager
    from mra_gan_tpu.models.cycle_gan import CycleGANConfig, PoolState, create_state

    cfg = CycleGANConfig(ngf=4, ndf=4, n_layers_d=1, pool_size=2)
    state = create_state(cfg, jax.random.PRNGKey(0), (16, 16, 16))
    ck = CheckpointManager(tmp_path, "x")
    ck.save("latest", state)

    def _rename(tree):
        inner = dict(tree["g_a"]["params"])
        inner["Imposter_0"] = inner.pop("Conv3D_0")
        return {"g_a": {"params": inner}, "g_b": tree["g_b"]}

    # force the fallback with a pool-shape mismatch AND a renamed module
    plain = PoolState(images=jnp.zeros((2, 16, 16, 16, 1), cfg.dtype),
                      count=jnp.zeros((), jnp.int32))
    tmpl = create_state(cfg, jax.random.PRNGKey(1), (16, 16, 16)).replace(
        g_params=_rename(state.g_params),
        pool_fake_a=plain, pool_fake_b=plain)
    # the fallback rejects with "missing key path ... different module
    # layout"; restore() then surfaces the ORIGINAL strict-restore error
    with pytest.raises(Exception, match="do not match|module layout"):
        ck.restore("latest", tmpl)
