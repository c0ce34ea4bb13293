"""Compile-only memory preflight (core/memory.py): footprint estimation
without allocation, and the limit check's SystemExit with actionable advice.
The reference has no equivalent — it discovers OOM at the first batch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mra_gan_tpu.core.memory import (device_memory_limit, preflight,
                                     step_memory_estimate)


def _jitted_sum():
    return jax.jit(lambda x: jnp.tanh(x @ x).sum())


def test_step_memory_estimate_reports_bytes():
    est = step_memory_estimate(_jitted_sum(), jnp.zeros((128, 128)))
    assert est is not None
    # 128x128 f32 argument = 64 KiB; temps at least one buffer
    assert est["args"] == 128 * 128 * 4
    assert est["temp"] > 0
    assert est["peak"] >= est["args"]


def test_step_memory_estimate_none_on_unlowerable():
    def plain_fn(x):  # no .lower — e.g. a validating wrapper
        return x

    assert step_memory_estimate(plain_fn, jnp.zeros(4)) is None


def test_preflight_prints_and_passes_under_limit(capsys):
    est = preflight(_jitted_sum(), jnp.zeros((64, 64)), what="toy step",
                    limit_bytes=1 << 30)
    out = capsys.readouterr().out
    assert est is not None
    assert "toy step" in out and "GiB" in out


def test_preflight_exits_over_limit():
    with pytest.raises(SystemExit) as ei:
        preflight(_jitted_sum(), jnp.zeros((256, 256)), limit_bytes=1024)
    msg = str(ei.value)
    assert "--remat" in msg and "--spatial_parallel" in msg


def test_preflight_on_real_step_and_spatial_wrapper():
    """Both the plain jitted CycleGAN step and the spatial wrapper (which
    exposes .lower through its validation shim) must be preflightable."""
    from mra_gan_tpu.models.cycle_gan import (CycleGANConfig, create_state,
                                              make_train_step)

    cfg = CycleGANConfig(ngf=4, ndf=4, net_g="resnet_6blocks",
                         net_d="n_layers", n_layers_d=1, pool_size=2,
                         dtype=jnp.float32, no_dropout=True)
    state = create_state(cfg, jax.random.PRNGKey(0), (16, 16, 16))
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    a = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    est = step_memory_estimate(step, state, a, a, jax.random.PRNGKey(1), 2e-4)
    assert est is not None and est["peak"] > est["args"] > 0

    if len(jax.devices()) >= 2:
        from mra_gan_tpu.core.mesh import SPACE_AXIS, make_mesh
        from mra_gan_tpu.parallel.spatial import (make_spatial_train_step,
                                                  shard_spatial_state)

        mesh = make_mesh(jax.devices()[:2], space=2)
        sstate = shard_spatial_state(state, mesh, SPACE_AXIS, cfg)
        sstep, vol_sh = make_spatial_train_step(cfg, mesh, SPACE_AXIS)
        ex = jax.device_put(np.zeros((1, 16, 16, 16, 1), np.float32), vol_sh)
        est2 = step_memory_estimate(sstep, sstate, ex, ex,
                                    jax.random.PRNGKey(1), 2e-4)
        assert est2 is not None and est2["temp"] > 0


def test_device_memory_limit_optional():
    lim = device_memory_limit()  # None on CPU/axon; int on reporting runtimes
    assert lim is None or lim > 0

def test_step_memory_estimate_propagates_compile_errors():
    """Trace/compile failures must NOT be swallowed into None — an over-HBM
    program can fail at compile time, which is exactly the case the
    preflight exists to surface early (with advice, before device work)."""
    bad = jax.jit(lambda x: x @ jnp.zeros((3, 3)))  # contract dim mismatch
    with pytest.raises(TypeError):
        step_memory_estimate(bad, jnp.zeros((4, 4)))


def test_preflight_compile_failure_prints_advice(capsys):
    bad = jax.jit(lambda x: x @ jnp.zeros((3, 3)))
    with pytest.raises(TypeError):
        preflight(bad, jnp.zeros((4, 4)), what="bad step",
                  advice="do-the-decode-thing")
    assert "do-the-decode-thing" in capsys.readouterr().err


def test_preflight_runtime_error_mode_and_env_skip(monkeypatch):
    """exit_on_over=False (decode paths) raises a catchable RuntimeError
    with the caller's advice; MRA_GAN_TPU_NO_MEM_CHECK skips everywhere."""
    with pytest.raises(RuntimeError) as ei:
        preflight(_jitted_sum(), jnp.zeros((256, 256)), limit_bytes=1024,
                  advice="shard it with --spatial_shard", exit_on_over=False)
    assert "--spatial_shard" in str(ei.value)
    monkeypatch.setenv("MRA_GAN_TPU_NO_MEM_CHECK", "1")
    assert preflight(_jitted_sum(), jnp.zeros((256, 256)),
                     limit_bytes=1024) is None


def test_single_pass_over_limit_raises_decode_advice(monkeypatch):
    """single_pass_apply's preflight must carry decode-applicable advice
    (sliding-window / --spatial_shard, NOT train flags), raise a catchable
    error (directory batch mode continues with other volumes), and keep
    raising on a repeat call (over-limit geometries are not recorded as
    preflighted, else the second call would run into a real device OOM)."""
    from mra_gan_tpu.core import memory
    from mra_gan_tpu.models.networks import ResnetGenerator3D
    from mra_gan_tpu.parallel.spatial import single_pass_apply

    monkeypatch.setattr(memory, "device_memory_limit", lambda: 1024)
    net = ResnetGenerator3D(output_nc=1, ngf=2, n_blocks=1)
    vol = np.zeros((12, 12, 12), np.float32)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 12, 12, 12, 1), net.dtype), train=False)
    for _ in range(2):
        with pytest.raises(RuntimeError) as ei:
            single_pass_apply(net, params, vol)
        msg = str(ei.value)
        assert "--spatial_shard" in msg and "--remat" not in msg
