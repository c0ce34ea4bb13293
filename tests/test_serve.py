"""serve.py daemon: drain-once serving over a watched directory — checkpoint
restored once, per-volume decode, atomic writes, per-file failure isolation.
(The TPU-native replacement for running the reference's one-shot test.py per
volume, reference test.py:38-218.)"""
import numpy as np
import pytest

from mra_gan_tpu.data import nifti

SMALL = ["--patch_size", "16", "16", "16", "--ngf", "4", "--ndf", "4",
         "--n_layers_D", "1", "--precision", "float32"]


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """A tiny checkpoint + a watch dir with two good volumes and one corrupt
    file, drained by serve.py --once."""
    import sys

    sys.path.insert(0, "/root/repo")
    tmp_path = tmp_path_factory.mktemp("serve")
    import jax
    import jax.numpy as jnp

    import serve as serve_cli
    from mra_gan_tpu.checkpoint import CheckpointManager
    from mra_gan_tpu.models.cycle_gan import CycleGANConfig, create_state

    cfg = CycleGANConfig(ngf=4, ndf=4, net_g="resnet_6blocks",
                         net_d="n_layers", n_layers_d=1, pool_size=2,
                         dtype=jnp.float32)
    state = create_state(cfg, jax.random.PRNGKey(0), (16, 16, 16))
    CheckpointManager(str(tmp_path / "ck"), "srv").save(
        "latest", state, also_latest=False)

    watch = tmp_path / "watch"
    watch.mkdir()
    rng = np.random.RandomState(0)
    aff = np.diag([1.0, 1.0, 2.0, 1.0])
    for i, suffix in enumerate((".nii", ".nii.gz")):
        nifti.save(nifti.NiftiImage(
            data=rng.rand(20, 18, 16).astype(np.float32) * 90, affine=aff),
            watch / f"v{i}{suffix}")
    (watch / "corrupt.nii").write_bytes(b"not a nifti at all")
    out_dir = tmp_path / "out"

    served_n, failures = serve_cli.main(
        ["--watch", str(watch), "--result", str(out_dir),
         "--checkpoints_dir", str(tmp_path / "ck"), "--name", "srv",
         "--model_suffix", "_A", *SMALL, "--stride_inplane", "8",
         "--stride_layer", "8", "--once", "--poll_secs", "0.05"])
    return watch, out_dir, aff, served_n, failures


def test_serve_once_drains_directory(served):
    watch, out_dir, aff, served_n, failures = served
    assert served_n == 2 and failures == 1
    for name in ("v0.nii", "v1.nii.gz"):
        res = nifti.load(out_dir / name)
        inp = nifti.load(watch / name)
        assert res.data.shape == inp.data.shape
        assert np.allclose(res.affine, aff)
        assert np.isfinite(res.data).all()
        # tanh-range decode mapped back to the 0-255 convention
        assert 0 <= float(res.data.min()) and float(res.data.max()) <= 255.0


def test_ready_gate_semantics():
    """Pure scheduling rules: two-scan stability, per-signature done (a file
    that changes after being served is served again), --once drain test."""
    import sys

    sys.path.insert(0, "/root/repo")
    from serve import _drained, _ready

    done = {}
    # first sighting: not stable yet
    assert _ready({"a.nii": (10, 1.0)}, {}, done) == []
    # second identical sighting: ready
    assert _ready({"a.nii": (10, 1.0)}, {"a.nii": (10, 1.0)}, done) == ["a.nii"]
    done["a.nii"] = (10, 1.0)
    # served signature never re-serves
    assert _ready({"a.nii": (10, 1.0)}, {"a.nii": (10, 1.0)}, done) == []
    assert _drained({"a.nii": (10, 1.0)}, done)
    # the stalled-copy case: the file grows after being served (the partial
    # looked stable), so the completed upload must be served again
    assert not _drained({"a.nii": (99, 2.0)}, done)
    assert _ready({"a.nii": (99, 2.0)}, {"a.nii": (10, 1.0)}, done) == []
    assert _ready({"a.nii": (99, 2.0)}, {"a.nii": (99, 2.0)}, done) == ["a.nii"]
    # a still-growing file keeps --once polling
    done["a.nii"] = (99, 2.0)
    assert not _drained({"a.nii": (120, 3.0)}, done)


def test_serve_reserves_deleted_then_restored_file(tmp_path):
    """Live polling loop: a watched file deleted and later restored with an
    IDENTICAL (size, mtime) signature — e.g. mv'd out and back — must be
    served again ('done' is pruned for vanished names), and --stop_file
    still produces the drain + summary."""
    import os
    import sys
    import threading
    import time

    sys.path.insert(0, "/root/repo")
    import jax
    import jax.numpy as jnp

    import serve as serve_cli
    from mra_gan_tpu.checkpoint import CheckpointManager
    from mra_gan_tpu.models.cycle_gan import CycleGANConfig, create_state

    cfg = CycleGANConfig(ngf=4, ndf=4, net_g="resnet_6blocks",
                         net_d="n_layers", n_layers_d=1, pool_size=2,
                         dtype=jnp.float32)
    state = create_state(cfg, jax.random.PRNGKey(0), (16, 16, 16))
    CheckpointManager(str(tmp_path / "ck"), "srv").save(
        "latest", state, also_latest=False)
    watch = tmp_path / "watch"
    watch.mkdir()
    out_dir = tmp_path / "out"
    stop = tmp_path / "stop"
    nifti.save(nifti.NiftiImage(
        data=np.random.RandomState(0).rand(20, 18, 16).astype(np.float32) * 90,
        affine=np.eye(4)), watch / "a.nii")

    result = {}

    def run():
        result["rv"] = serve_cli.main(
            ["--watch", str(watch), "--result", str(out_dir),
             "--checkpoints_dir", str(tmp_path / "ck"), "--name", "srv",
             "--model_suffix", "_A", *SMALL, "--stride_inplane", "8",
             "--stride_layer", "8", "--poll_secs", "0.05",
             "--stop_file", str(stop)])

    t = threading.Thread(target=run, daemon=True)
    t.start()

    def wait_for(cond, timeout=120):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if cond():
                return True
            time.sleep(0.05)
        return False

    try:
        assert wait_for(lambda: (out_dir / "a.nii").exists())
        sig = (watch / "a.nii").stat()
        data = (watch / "a.nii").read_bytes()
        (out_dir / "a.nii").unlink()
        (watch / "a.nii").unlink()
        time.sleep(0.5)  # several polls with the file absent -> done pruned
        (watch / "a.nii").write_bytes(data)
        os.utime(watch / "a.nii", (sig.st_atime, sig.st_mtime))
        assert (watch / "a.nii").stat().st_size == sig.st_size
        assert wait_for(lambda: (out_dir / "a.nii").exists()), \
            "identically-restored file was never re-served"
    finally:
        stop.write_text("")
        t.join(timeout=120)
    assert not t.is_alive()
    assert result["rv"] == (2, 0)  # served twice, no failures


def test_serve_isolates_corrupt_inputs(served):
    _, out_dir, _, _, failures = served
    assert failures == 1
    log = (out_dir / "failed.log").read_text()
    assert "corrupt.nii" in log and "decode" in log
    assert not (out_dir / "corrupt.nii").exists()
    # no temp litter from the atomic writer
    assert not [p for p in out_dir.iterdir() if p.name.startswith(".tmp-")]


def test_scan_skips_hidden_files(tmp_path):
    """Hidden names (our own .tmp-* partials, editor swap files) never reach
    the decoder even when they carry a .nii suffix."""
    import sys

    sys.path.insert(0, "/root/repo")
    from serve import _scan

    (tmp_path / "good.nii").write_bytes(b"x")
    (tmp_path / ".tmp-123-0-good.nii").write_bytes(b"x")
    (tmp_path / ".hidden.nii.gz").write_bytes(b"x")
    assert sorted(_scan(tmp_path)) == ["good.nii"]


def test_serve_rejects_watch_equals_result(tmp_path):
    """--watch == --result would make the daemon decode its own outputs in an
    endless loop; it must refuse to start."""
    import sys

    sys.path.insert(0, "/root/repo")
    import pytest

    import serve as serve_cli

    d = tmp_path / "dir"
    d.mkdir()
    with pytest.raises(SystemExit, match="different directories"):
        serve_cli.main(
            ["--watch", str(d), "--result", str(d),
             "--checkpoints_dir", str(tmp_path / "ck"), "--name", "x",
             "--model_suffix", "_A", *SMALL, "--once"])


def test_transient_decode_failure_is_retried(tmp_path, monkeypatch):
    """A decode/runtime error (e.g. a TPU tunnel drop) must NOT permanently
    retire the volume's signature: the next poll retries it, bounded by
    MAX_DECODE_ATTEMPTS. Load/parse failures stay permanent (see the corrupt
    -input test)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import jax
    import jax.numpy as jnp

    import serve as serve_cli
    import test as test_cli
    from mra_gan_tpu.checkpoint import CheckpointManager
    from mra_gan_tpu.models.cycle_gan import CycleGANConfig, create_state

    cfg = CycleGANConfig(ngf=4, ndf=4, net_g="resnet_6blocks",
                         net_d="n_layers", n_layers_d=1, pool_size=2,
                         dtype=jnp.float32)
    state = create_state(cfg, jax.random.PRNGKey(0), (16, 16, 16))
    CheckpointManager(str(tmp_path / "ck"), "srv").save(
        "latest", state, also_latest=False)
    watch = tmp_path / "watch"
    watch.mkdir()
    out_dir = tmp_path / "out"
    nifti.save(nifti.NiftiImage(
        data=np.random.RandomState(0).rand(20, 18, 16).astype(np.float32) * 90,
        affine=np.eye(4)), watch / "a.nii")

    real_inference = test_cli.inference
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated tunnel drop")
        return real_inference(*a, **kw)

    monkeypatch.setattr(test_cli, "inference", flaky)
    served_n, failures = serve_cli.main(
        ["--watch", str(watch), "--result", str(out_dir),
         "--checkpoints_dir", str(tmp_path / "ck"), "--name", "srv",
         "--model_suffix", "_A", *SMALL, "--stride_inplane", "8",
         "--stride_layer", "8", "--once", "--poll_secs", "0.01"])
    assert calls["n"] == 2, "failed decode was never retried"
    assert (served_n, failures) == (1, 1)
    assert (out_dir / "a.nii").exists()
    log = (out_dir / "failed.log").read_text()
    assert "will retry" not in log  # retry annotation goes to stdout only


def test_stop_file_breaks_mid_batch(tmp_path, monkeypatch):
    """--stop_file is honored BETWEEN volumes of one ready batch — a large
    backlog must not fully drain before the stop is noticed."""
    import sys

    sys.path.insert(0, "/root/repo")
    import jax
    import jax.numpy as jnp

    import serve as serve_cli
    import test as test_cli
    from mra_gan_tpu.checkpoint import CheckpointManager
    from mra_gan_tpu.models.cycle_gan import CycleGANConfig, create_state

    cfg = CycleGANConfig(ngf=4, ndf=4, net_g="resnet_6blocks",
                         net_d="n_layers", n_layers_d=1, pool_size=2,
                         dtype=jnp.float32)
    state = create_state(cfg, jax.random.PRNGKey(0), (16, 16, 16))
    CheckpointManager(str(tmp_path / "ck"), "srv").save(
        "latest", state, also_latest=False)
    watch = tmp_path / "watch"
    watch.mkdir()
    out_dir = tmp_path / "out"
    stop = tmp_path / "stop"
    rng = np.random.RandomState(0)
    for i in range(3):  # a 3-volume backlog
        nifti.save(nifti.NiftiImage(
            data=rng.rand(20, 18, 16).astype(np.float32) * 90,
            affine=np.eye(4)), watch / f"v{i}.nii")

    real_inference = test_cli.inference

    def stopping_inference(*a, **kw):
        out = real_inference(*a, **kw)
        stop.write_text("")  # stop requested while the batch is draining
        return out

    monkeypatch.setattr(test_cli, "inference", stopping_inference)
    served_n, failures = serve_cli.main(
        ["--watch", str(watch), "--result", str(out_dir),
         "--checkpoints_dir", str(tmp_path / "ck"), "--name", "srv",
         "--model_suffix", "_A", *SMALL, "--stride_inplane", "8",
         "--stride_layer", "8", "--poll_secs", "0.05",
         "--stop_file", str(stop)])
    # stop appeared during volume 1 of 3: volume 2 must never start
    assert (served_n, failures) == (1, 0)
    assert (out_dir / "v0.nii").exists()
    assert not (out_dir / "v2.nii").exists()


def test_concurrent_saves_to_same_target_do_not_corrupt(tmp_path):
    """_atomic_save tmp names are unique per call: two concurrent writers to
    the SAME output path each complete, and the surviving file is one intact
    result (never an interleaved half-write, never an unlinked-under-writer
    tmp)."""
    import sys
    import threading

    sys.path.insert(0, "/root/repo")
    import serve as serve_cli

    rng = np.random.RandomState(0)
    a = nifti.NiftiImage(data=rng.rand(12, 10, 8).astype(np.float32),
                         affine=np.eye(4))
    b = nifti.NiftiImage(data=rng.rand(12, 10, 8).astype(np.float32),
                         affine=np.eye(4))
    target = tmp_path / "same.nii"
    errs = []

    def run(img):
        try:
            serve_cli._atomic_save(img, target)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=run, args=(img,)) for img in (a, b)
          for _ in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    got = nifti.load(target)
    assert (np.array_equal(got.data, a.data)
            or np.array_equal(got.data, b.data))
    assert not [p for p in tmp_path.iterdir() if p.name.startswith(".tmp-")]
