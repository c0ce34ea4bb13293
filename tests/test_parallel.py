"""Multi-device tests on the 8-virtual-CPU-device mesh: DP train step,
sharded sliding window, halo-exchange conv."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mra_gan_tpu.core.mesh import make_mesh
from mra_gan_tpu.models.cycle_gan import CycleGANConfig, create_state, make_train_step
from mra_gan_tpu.parallel.sharding import make_sharded_train_step, shard_state
from mra_gan_tpu.parallel.spatial import halo_conv3d, sharded_sliding_window

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_dp_train_step_matches_single_device():
    cfg = CycleGANConfig(ngf=4, ndf=4, n_layers_d=1, pool_size=0)
    patch = (12, 12, 12)
    rng = jax.random.PRNGKey(0)
    state0 = create_state(cfg, rng, patch)
    a = jax.random.uniform(jax.random.PRNGKey(1), (8, *patch, 1), minval=-1, maxval=1)
    b = jax.random.uniform(jax.random.PRNGKey(2), (8, *patch, 1), minval=-1, maxval=1)

    single = jax.jit(make_train_step(cfg))
    mesh = make_mesh(jax.devices()[:8])
    state_sh = shard_state(create_state(cfg, rng, patch), mesh)
    step, batch_sh = make_sharded_train_step(cfg, mesh)
    a_sh = jax.device_put(a, batch_sh)
    b_sh = jax.device_put(b, batch_sh)

    # loss trajectories over 3 steps must agree — this checks grads/updates
    # end-to-end without amplifying near-zero-gradient sign noise through
    # Adam's normalization
    s1, s8 = state0, state_sh
    for i in range(3):
        s1, m1 = single(s1, a, b, jax.random.PRNGKey(3 + i), 2e-4)
        s8, m8 = step(s8, a_sh, b_sh, jax.random.PRNGKey(3 + i), 2e-4)
        # tolerance widens with step count: Adam normalizes near-zero grads
        # to full-lr updates, so f32 reduction-order dust grows chaotically
        rtol = (1e-3, 2e-3, 2e-2)[i]
        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=rtol,
                                       atol=1e-4, err_msg=f"step{i}:{k}")


def test_sharded_sliding_window_matches_identity():
    mesh = make_mesh(jax.devices()[:8])
    vol = np.random.RandomState(0).rand(20, 20, 20).astype(np.float32)
    out = sharded_sliding_window(mesh, vol, lambda x: x, patch_size=(8, 8, 8),
                                 stride_inplane=4, stride_layer=4, batch=2)
    np.testing.assert_allclose(out, vol, atol=1e-4)


def test_sharded_vs_local_sliding_window():
    from mra_gan_tpu.infer import sliding_window_inference

    mesh = make_mesh(jax.devices()[:8])
    vol = np.random.RandomState(1).rand(16, 16, 16).astype(np.float32)
    gen = lambda x: jnp.tanh(x * 1.7)
    a = sharded_sliding_window(mesh, vol, gen, patch_size=(8, 8, 8),
                               stride_inplane=4, stride_layer=4)
    b = sliding_window_inference(vol, gen, patch_size=(8, 8, 8),
                                 stride_inplane=4, stride_layer=4)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_halo_conv_matches_dense():
    from mra_gan_tpu.ops.conv import conv3d

    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 32, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 4, 6).astype(np.float32) * 0.2)
    want = conv3d(x, w, stride=1, padding=1)
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x, NamedSharding(mesh, P(None, "data")))
    got = halo_conv3d(mesh, xs, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_sharded_generator_apply_matches_unsharded():
    """Single-pass depth-sharded generator forward (halo convs + pmean'd
    instance norms) equals the unsharded forward."""
    import jax
    import jax.numpy as jnp

    from mra_gan_tpu.core.mesh import make_mesh
    from mra_gan_tpu.models.networks import ResnetGenerator3D
    from mra_gan_tpu.parallel.spatial import sharded_generator_apply

    mesh = make_mesh(jax.devices()[:8])
    net = ResnetGenerator3D(output_nc=1, ngf=4, n_blocks=2)
    vol = np.random.RandomState(0).rand(32, 16, 16).astype(np.float32) * 2 - 1
    x = jnp.asarray(vol)[None, ..., None]
    params = net.init(jax.random.PRNGKey(0), x, train=False)
    want = np.asarray(net.apply(params, x, train=False))[0, ..., 0]
    got = sharded_generator_apply(mesh, net, params, vol)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_spatial_train_step_matches_single_device():
    """Depth-sharded train step (generators sharded with halo exchange +
    pmean-ed norms/losses; Ds replicated on gathered volumes; psum-ed grads)
    must track the single-device step's loss trajectory."""
    from mra_gan_tpu.core.mesh import SPACE_AXIS
    from mra_gan_tpu.parallel.spatial import (make_spatial_train_step,
                                              shard_spatial_state)

    cfg = CycleGANConfig(ngf=4, ndf=4, n_layers_d=1, pool_size=2,
                         net_g="resnet_6blocks")
    patch = (16, 16, 16)  # depth 16 = 4*n with n=4 -> shard depth 4
    rng = jax.random.PRNGKey(0)
    state0 = create_state(cfg, rng, patch)
    a = jax.random.uniform(jax.random.PRNGKey(1), (1, *patch, 1), minval=-1, maxval=1)
    b = jax.random.uniform(jax.random.PRNGKey(2), (1, *patch, 1), minval=-1, maxval=1)

    single = jax.jit(make_train_step(cfg))
    mesh = make_mesh(jax.devices()[:4], data=1, space=4)
    step, vol_sh = make_spatial_train_step(cfg, mesh, SPACE_AXIS)
    state_sp = shard_spatial_state(create_state(cfg, rng, patch), mesh,
                                   SPACE_AXIS, cfg)
    a_sh = jax.device_put(a, vol_sh)
    b_sh = jax.device_put(b, vol_sh)

    s1, sn = state0, state_sp
    for i in range(3):
        s1, m1 = single(s1, a, b, jax.random.PRNGKey(3 + i), 2e-4)
        sn, mn = step(sn, a_sh, b_sh, jax.random.PRNGKey(3 + i), 2e-4)
        rtol = (1e-3, 2e-3, 2e-2)[i]
        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(mn[k]), rtol=rtol,
                                       atol=1e-4, err_msg=f"step{i}:{k}")

    # (No per-parameter comparison: like the DP test above, Adam normalizes
    # near-zero grads to full-lr updates, so f32 reduction-order dust flips
    # update signs chaotically — the 3-step loss trajectory is the
    # end-to-end check.) Pool state advanced and stayed finite:
    assert int(sn.pool_fake_a.count) > 0
    assert np.isfinite(np.asarray(sn.pool_fake_a.images, np.float32)).all()


def test_spatial_train_step_rejects_bad_depth():
    from mra_gan_tpu.core.mesh import SPACE_AXIS
    from mra_gan_tpu.parallel.spatial import make_spatial_train_step

    cfg = CycleGANConfig(ngf=4, ndf=4, n_layers_d=1, pool_size=0)
    mesh = make_mesh(jax.devices()[:4], data=1, space=4)
    step, _ = make_spatial_train_step(cfg, mesh, SPACE_AXIS)
    a = jnp.zeros((1, 12, 16, 16, 1))
    with pytest.raises(ValueError, match="divisible"):
        step(None, a, a, jax.random.PRNGKey(0), 2e-4)


def test_dp_x_sp_train_step_matches_single_device():
    """2-D mesh: batch sharded over 'data' x depth sharded over 'space'.
    Loss trajectory must match the single-device step (pool all-gather keeps
    the reference's exact sequential pool semantics)."""
    from mra_gan_tpu.core.mesh import DATA_AXIS, SPACE_AXIS
    from mra_gan_tpu.parallel.spatial import (make_spatial_train_step,
                                              shard_spatial_state)

    cfg = CycleGANConfig(ngf=4, ndf=4, n_layers_d=1, pool_size=3,
                         net_g="resnet_6blocks")
    patch = (16, 16, 16)
    rng = jax.random.PRNGKey(0)
    state0 = create_state(cfg, rng, patch)
    a = jax.random.uniform(jax.random.PRNGKey(1), (2, *patch, 1), minval=-1, maxval=1)
    b = jax.random.uniform(jax.random.PRNGKey(2), (2, *patch, 1), minval=-1, maxval=1)

    single = jax.jit(make_train_step(cfg))
    mesh = make_mesh(jax.devices()[:8], data=2, space=4)
    step, vol_sh = make_spatial_train_step(cfg, mesh, SPACE_AXIS,
                                           data_axis=DATA_AXIS)
    state_sp = shard_spatial_state(create_state(cfg, rng, patch), mesh,
                                   SPACE_AXIS, cfg)
    a_sh = jax.device_put(a, vol_sh)
    b_sh = jax.device_put(b, vol_sh)

    s1, sn = state0, state_sp
    for i in range(3):
        s1, m1 = single(s1, a, b, jax.random.PRNGKey(3 + i), 2e-4)
        sn, mn = step(sn, a_sh, b_sh, jax.random.PRNGKey(3 + i), 2e-4)
        rtol = (1e-3, 2e-3, 2e-2)[i]
        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(mn[k]), rtol=rtol,
                                       atol=1e-4, err_msg=f"step{i}:{k}")
    with pytest.raises(ValueError, match="not divisible"):
        step(sn, a_sh[:1], b_sh[:1], jax.random.PRNGKey(9), 2e-4)


def test_sharded_generator_apply_bf16_net():
    """bf16-compute generator: the bf16 upload is the net's own input cast,
    so the sharded forward still equals the unsharded one."""
    from mra_gan_tpu.models.networks import ResnetGenerator3D
    from mra_gan_tpu.parallel.spatial import sharded_generator_apply

    mesh = make_mesh(jax.devices()[:8])
    net = ResnetGenerator3D(output_nc=1, ngf=4, n_blocks=2, dtype=jnp.bfloat16)
    vol = np.random.RandomState(2).rand(32, 16, 16).astype(np.float32) * 2 - 1
    x = jnp.asarray(vol, jnp.bfloat16)[None, ..., None]
    params = net.init(jax.random.PRNGKey(0), x, train=False)
    want = np.asarray(net.apply(params, x, train=False), np.float32)[0, ..., 0]
    got = np.asarray(sharded_generator_apply(mesh, net, params, vol), np.float32)
    # bf16 compute: pmean'd norm statistics reassociate reductions, so
    # differences are bf16-rounding scale (1 ulp at 1.0 is ~8e-3)
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-2)
    assert np.abs(got - want).mean() < 5e-3


def test_spatial_step_matches_single_device_unet():
    """Spatial-parallel is net-agnostic at the Conv3D/norm level: verify the
    depth-sharded step also reproduces the single-device step for the U-Net
    generator (per-shard depth must satisfy the net's >=32 minimum, so
    128 deep over 4 devices)."""
    import jax
    import jax.numpy as jnp

    from mra_gan_tpu.core.mesh import SPACE_AXIS, make_mesh
    from mra_gan_tpu.models.cycle_gan import (CycleGANConfig, create_state,
                                              make_train_step)
    from mra_gan_tpu.parallel.spatial import (make_spatial_train_step,
                                              shard_spatial_state)

    cfg = CycleGANConfig(ngf=2, ndf=2, net_g="unet_custom", n_layers_d=1,
                         pool_size=0)
    patch = (128, 32, 32)
    a = jax.random.uniform(jax.random.PRNGKey(1), (1, *patch, 1),
                           minval=-1, maxval=1)
    b = jax.random.uniform(jax.random.PRNGKey(2), (1, *patch, 1),
                           minval=-1, maxval=1)

    ref_state = create_state(cfg, jax.random.PRNGKey(0), patch)
    ref_step = jax.jit(make_train_step(cfg))
    for i in range(2):
        ref_state, rm = ref_step(ref_state, a, b, jax.random.PRNGKey(i), 2e-4)

    mesh = make_mesh(jax.devices()[:4], data=1, space=4)
    sp_state = shard_spatial_state(
        create_state(cfg, jax.random.PRNGKey(0), patch), mesh, SPACE_AXIS, cfg)
    step, sh = make_spatial_train_step(cfg, mesh, SPACE_AXIS)
    ash, bsh = jax.device_put(a, sh), jax.device_put(b, sh)
    for i in range(2):
        sp_state, sm = step(sp_state, ash, bsh, jax.random.PRNGKey(i), 2e-4)

    for k, rv in rm.items():
        assert abs(float(rv) - float(sm[k])) / (abs(float(rv)) + 1e-8) < 2e-3, k


def test_spatial_step_matches_single_device_dynet():
    """Depth-sharded Dynet: the auto-schedule's mixed (2,2,1) stride level
    and kernel=stride upsamplers run sharded via per-axis halo padding and
    the blocked (shard-local) transposed conv. Loss trajectory must match
    the single-device step."""
    from mra_gan_tpu.core.mesh import SPACE_AXIS
    from mra_gan_tpu.parallel.spatial import (make_spatial_train_step,
                                              shard_spatial_state)

    # sizes (32,32,16) -> strides [[1,1,1],[2,2,2],[2,2,2],[2,2,1]]:
    # granularity (8,8,4); depth 32 over 4 devices = shard depth 8,
    # bottleneck local depth 1 (halo 1 still legal)
    cfg = CycleGANConfig(ngf=4, ndf=4, n_layers_d=1, pool_size=2,
                         net_g="Dynet", dynet_sizes=(32, 32, 16),
                         dynet_spacings=(1.5, 1.5, 1.5))
    patch = (32, 32, 16)
    a = jax.random.uniform(jax.random.PRNGKey(1), (1, *patch, 1),
                           minval=-1, maxval=1)
    b = jax.random.uniform(jax.random.PRNGKey(2), (1, *patch, 1),
                           minval=-1, maxval=1)

    ref_state = create_state(cfg, jax.random.PRNGKey(0), patch)
    ref_step = jax.jit(make_train_step(cfg))
    mesh = make_mesh(jax.devices()[:4], data=1, space=4)
    sp_state = shard_spatial_state(
        create_state(cfg, jax.random.PRNGKey(0), patch), mesh, SPACE_AXIS, cfg)
    step, sh = make_spatial_train_step(cfg, mesh, SPACE_AXIS)
    ash, bsh = jax.device_put(a, sh), jax.device_put(b, sh)
    for i in range(2):
        ref_state, rm = ref_step(ref_state, a, b, jax.random.PRNGKey(i), 2e-4)
        sp_state, sm = step(sp_state, ash, bsh, jax.random.PRNGKey(i), 2e-4)
        for k, rv in rm.items():
            rel = abs(float(rv) - float(sm[k])) / (abs(float(rv)) + 1e-8)
            assert rel < 2e-3, (i, k, rel)

    # a depth that breaks the schedule's shard granularity must be rejected
    bad = jnp.zeros((1, 20, 32, 16, 1))
    with pytest.raises(ValueError, match="divisible"):
        step(sp_state, bad, bad, jax.random.PRNGKey(9), 2e-4)


def test_sharded_generator_apply_unet():
    """Whole-volume depth-sharded U-Net forward equals the unsharded one —
    the --spatial_shard decode path is per-net via spatial_depth_rule, not
    resnet-only (its depth granularity is 2^n_downs per shard)."""
    from mra_gan_tpu.models.networks import define_g
    from mra_gan_tpu.parallel.spatial import sharded_generator_apply

    mesh = make_mesh(jax.devices()[:2])
    net = define_g(output_nc=1, ngf=2, net_g="unet_custom")  # 5 downs
    vol = np.random.RandomState(5).rand(64, 32, 32).astype(np.float32) * 2 - 1
    x = jnp.asarray(vol)[None, ..., None]
    params = net.init(jax.random.PRNGKey(0), x, train=False)
    want = np.asarray(net.apply(params, x, train=False))[0, ..., 0]
    got = sharded_generator_apply(mesh, net, params, vol)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sharded_generator_apply_dynet():
    """Whole-volume depth-sharded Dynet forward equals the unsharded one."""
    from mra_gan_tpu.models.networks import DynUNet3D
    from mra_gan_tpu.parallel.spatial import sharded_generator_apply

    mesh = make_mesh(jax.devices()[:4])
    net = DynUNet3D(output_nc=1, sizes=(32, 32, 16),
                    spacings=(1.5, 1.5, 1.5))
    vol = np.random.RandomState(3).rand(32, 32, 16).astype(np.float32) * 2 - 1
    x = jnp.asarray(vol)[None, ..., None]
    params = net.init(jax.random.PRNGKey(0), x, train=False)
    want = np.asarray(net.apply(params, x, train=False))[0, ..., 0]
    got = sharded_generator_apply(mesh, net, params, vol)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
