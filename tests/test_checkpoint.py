

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
