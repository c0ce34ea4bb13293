"""Unit tests for the small observability/caching utilities: the
reference-format loss logger (reference utils/visualizer.py:6-27), step
timers, and the persistent-compile-cache switch (which the CPU-forced e2e
tests never reach)."""
import argparse
import re
import time

import jax


def test_visualizer_reference_line_format(tmp_path, capsys):
    """Line format must match the reference's print_current_losses
    (reference utils/visualizer.py:20-27): '(epoch: E, iters: I, time: T,
    data: D) k: v.vvv k: v.vvv' — loss_log.txt consumers parse it."""
    from mra_gan_tpu.utils.visualizer import Visualizer

    opt = argparse.Namespace(name="exp", checkpoints_dir=str(tmp_path))
    vis = Visualizer(opt)
    vis.print_current_losses(3, 40, {"D_A": 0.5, "G_A": 1.25}, 0.123, 0.004)
    line = capsys.readouterr().out.strip()
    assert re.fullmatch(
        r"\(epoch: 3, iters: 40, time: 0\.123, data: 0\.004\) "
        r"D_A: 0\.500 G_A: 1\.250", line), line
    log = (tmp_path / "exp" / "loss_log.txt").read_text()
    assert "================ Training Loss (" in log
    assert line in log
    # append-mode: a resumed run keeps the old log
    Visualizer(opt).print_current_losses(4, 2, {"D_A": 0.1}, 0.1, 0.0)
    log2 = (tmp_path / "exp" / "loss_log.txt").read_text()
    assert line in log2 and "epoch: 4" in log2


def test_step_timer_splits_data_and_compute():
    from mra_gan_tpu.utils.timers import StepTimer

    t = StepTimer()
    time.sleep(0.02)
    t.data_ready()
    time.sleep(0.01)
    t.step_done()
    assert t.t_data >= 0.015
    assert 0.005 <= t.t_comp < t.t_data  # split, not cumulative


def test_compile_cache_accelerator_path(monkeypatch, tmp_path):
    """On an accelerator backend the cache dir must be configured under
    XDG_CACHE_HOME/mra_gan_tpu; MRA_GAN_TPU_NO_COMPILE_CACHE and an
    explicit JAX_COMPILATION_CACHE_DIR both leave the config untouched."""
    from mra_gan_tpu.core import compile_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))

        monkeypatch.setenv("MRA_GAN_TPU_NO_COMPILE_CACHE", "1")
        compile_cache.enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == prev

        monkeypatch.delenv("MRA_GAN_TPU_NO_COMPILE_CACHE")
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "own"))
        compile_cache.enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == prev

        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")
        compile_cache.enable_compilation_cache()
        want = tmp_path / "mra_gan_tpu" / "xla_cache"
        assert jax.config.jax_compilation_cache_dir == str(want)
        assert want.is_dir()
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_count_params_and_print_networks_shapes(capsys):
    from mra_gan_tpu.utils.timers import count_params

    tree = {"a": jax.numpy.zeros((2, 3)), "b": {"c": jax.numpy.zeros((4,))}}
    assert count_params(tree) == 10
