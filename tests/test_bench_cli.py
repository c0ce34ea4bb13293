"""bench.py resilience: the round-3 driver bench died rc=1 with no JSON when
the TPU pool was UNAVAILABLE (BENCH_r03.json). These tests pin the r4
contract: bounded retry on first device contact, then ONE parseable JSON
line with an ``error`` field and rc=0 — never a bare traceback."""
import io
import json
import sys
from contextlib import redirect_stdout

import pytest


@pytest.fixture()
def bench_mod(monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench

    monkeypatch.setenv("MRA_GAN_TPU_BENCH_ATTEMPTS", "2")
    monkeypatch.setenv("MRA_GAN_TPU_BENCH_BACKOFF_SECS", "0.01")
    return bench


def test_backend_failure_emits_error_json(bench_mod, monkeypatch):
    import jax

    calls = {"n": 0}

    def boom():
        calls["n"] += 1
        raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")

    monkeypatch.setattr(jax, "devices", boom)
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench_mod.main()  # must not raise
    assert calls["n"] == 2  # bounded retry actually retried
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    rec = json.loads(lines[-1])
    assert rec["metric"] == bench_mod.METRIC_NAME
    assert rec["value"] is None
    assert "UNAVAILABLE" in rec["error"]


def test_sub_bench_failures_reported_not_swallowed(bench_mod, monkeypatch):
    """A dead decode path must be distinguishable from a skipped one: the
    JSON carries per-section errors while the headline metric still lands."""
    monkeypatch.setattr(bench_mod, "WARMUP", 1)
    monkeypatch.setattr(bench_mod, "ITERS", 2)
    monkeypatch.setattr(bench_mod, "PATCH", (24, 24, 24))

    def dead(*a, **k):
        raise RuntimeError("decode exploded")

    monkeypatch.setattr(bench_mod, "_bench_inference", dead)
    monkeypatch.setattr(bench_mod, "_bench_loader", dead)

    # keep the runtime sane on CPU: fail the batch-8 section fast by making
    # the SECOND create_state call raise (the first builds the batch-1
    # state). bench._run imports create_state at call time, so patch the
    # source module.
    import mra_gan_tpu.models.cycle_gan as cg

    real_create = cg.create_state
    calls = {"n": 0}

    def create_once(*a, **k):
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("batch8 skipped for test speed")
        return real_create(*a, **k)

    monkeypatch.setattr(cg, "create_state", create_once)

    buf = io.StringIO()
    with redirect_stdout(buf):
        bench_mod.main()
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    rec = json.loads(lines[-1])
    assert rec["value"] is not None and rec["value"] > 0
    assert "decode exploded" in rec["errors"]["inference"]
    assert "decode exploded" in rec["errors"]["loader"]
    assert "batch8" in rec["errors"]
