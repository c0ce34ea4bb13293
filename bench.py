"""Benchmark: full CycleGAN train step at the reference's default workload
(batch 1, 64^3 patches, ngf=ndf=32, resnet_6blocks G, 3-layer PatchGAN D —
reference options/base_options.py:17,20,31-37) on one chip, bfloat16 compute.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the V100
anchor is an estimate of its per-step wall time derived from the measured
compute of the same workload: the reference runs ~10 separate eager torch
graphs per iteration (6 G fwd + G bwd, 4 D fwd + D bwd,
reference models/cycle_gan_model.py:227-240) totalling ~3.3 TFLOP(f32-equiv);
at an optimistic 25% of V100's 15.7 TF/s fp32 (cuDNN 3D convs + eager
overheads) that is ~0.85 s/step => ~1.18 pairs/s. vs_baseline is measured
pairs/s divided by that anchor.
"""
from __future__ import annotations

import json
import os
import sys
import time
import traceback
from pathlib import Path

import jax
import jax.numpy as jnp

V100_PAIRS_PER_SEC_EST = 1.18

BATCH = 1
PATCH = (64, 64, 64)
WARMUP = 3
ITERS = 20

METRIC_NAME = "64^3-patch pairs/sec/chip (full CycleGAN train step, bf16)"


def _acquire_backend():
    """First device contact, with bounded retry + backoff.

    The tunneled TPU pool grants the chip exclusively; if the queue is
    wedged by a recently killed client or another process holds the grant,
    backend init raises UNAVAILABLE (this killed the round-3 driver bench,
    BENCH_r03.json rc=1). Per the back-off guidance in CLAUDE.md we make a
    few well-spaced attempts — never a tight loop, which re-wedges the
    queue — and let the caller emit an error JSON on final failure.
    """
    attempts = int(os.environ.get("MRA_GAN_TPU_BENCH_ATTEMPTS", "3"))
    backoff = float(os.environ.get("MRA_GAN_TPU_BENCH_BACKOFF_SECS", "240"))
    for i in range(attempts):
        try:
            return jax.devices()
        except Exception:
            traceback.print_exc(file=sys.stderr)
            if i + 1 == attempts:
                raise
            print(f"[bench] backend unavailable (attempt {i + 1}/{attempts});"
                  f" backing off {backoff:.0f}s before retrying",
                  file=sys.stderr, flush=True)
            time.sleep(backoff)


def _bench_inference(cfg, state):
    """Secs/volume: depth-streamed sliding-window decode of a 256x256x128
    volume with the trained-generator forward (the reference test.py
    workflow, BASELINE.json 'secs/volume' metric).

    Wire formats: input bfloat16 (EXACT for the bf16-compute generator — its
    first op casts the input to bf16 anyway), output float32 (exact) for the
    primary number, plus a float16-output serving variant (pure ~5e-4
    quantization of the final [-1,1] values)."""
    import numpy as np

    from mra_gan_tpu.infer import sliding_window_inference
    from mra_gan_tpu.models.cycle_gan import make_generate_fn

    gen = make_generate_fn(cfg, "g_a")
    params = state.g_params["g_a"]
    gen_fn = jax.jit(lambda x: gen(params, x))
    vol = np.random.RandomState(0).rand(128, 256, 256).astype(np.float32) * 2 - 1

    def run(out_dtype):
        return sliding_window_inference(vol, gen_fn, patch_size=PATCH,
                                        stride_inplane=32, stride_layer=32,
                                        blend="gaussian", batch=8,
                                        transfer_dtype=out_dtype,
                                        input_transfer_dtype=jnp.bfloat16)

    # The two wire legs are INTERLEAVED (exact, f16, exact, f16, ...) and we
    # keep per-leg minima: the tunnel's D2H bandwidth dips in multi-second
    # windows (CLAUDE.md records 2x day-to-day swings), and timing the legs
    # in separate blocks let one window land entirely on one leg — BENCH_r04
    # once read f16 at 3.5 s vs exact 2.1 s, which is physically backwards
    # (f16 downloads half the bytes; r3 measured it 0.97-1.2 s vs 1.4-1.5).
    legs = (("exact", np.float32), ("f16_out", np.float16))
    for _, dt_ in legs:
        run(dt_)  # compile + warm
    secs = {label: float("inf") for label, _ in legs}
    for _ in range(3):
        for label, dt_ in legs:
            t0 = time.perf_counter()
            out = run(dt_)
            secs[label] = min(secs[label], time.perf_counter() - t0)
            assert np.isfinite(out).all()

    # --single_pass equivalent: whole-volume forward, no patching
    from mra_gan_tpu.parallel.spatial import single_pass_apply

    g_a, _, _, _ = cfg.build_nets()
    single_pass_apply(g_a, params, vol)  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = single_pass_apply(g_a, params, vol)
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(out).all()
    secs["single_pass"] = best
    return secs


def _bench_loader():
    """Host input-pipeline throughput (patch pairs/s from PatchLoader on
    synthetic NIfTIs), cache-cold and cache-warm — proves the host can feed
    the batch-8 device throughput (the reference's DataLoader equivalent,
    reference train.py:52). Pure host benchmark; no device involvement."""
    import shutil
    import tempfile

    import numpy as np

    from mra_gan_tpu.data import nifti
    from mra_gan_tpu.data.dataset import PatchLoader, UnpairedVolumeDataset

    root = Path(tempfile.mkdtemp(prefix="bench_loader_"))
    try:
        rs = np.random.RandomState(0)
        for sub in ("images", "labels"):
            (root / "train" / sub).mkdir(parents=True)
        for i in range(6):
            for sub in ("images", "labels"):
                vol = rs.rand(128, 128, 128).astype(np.float32) * 100
                nifti.save(nifti.NiftiImage(data=vol, affine=np.eye(4)),
                           root / "train" / sub / f"{i}.nii")

        def run(workers, epoch):
            ds = UnpairedVolumeDataset(root / "train", patch_size=PATCH,
                                       pipeline="monai", num_samples=8,
                                       cache_dir=str(root / "cache"))
            loader = PatchLoader(ds, batch_size=8, workers=workers)
            t0 = time.perf_counter()
            n = 0
            for img, lbl in loader.epoch(epoch):
                n += img.shape[0]
            return n / (time.perf_counter() - t0)

        cold = run(4, 0)       # populates the .npy cache (writes are async)
        from mra_gan_tpu.data.dataset import flush_cache_writes

        flush_cache_writes()   # steady-state warm: don't overlap the drain
        warm_w4 = run(4, 1)
        warm_w1 = run(1, 2)
        return {"cold_w4": round(cold, 1), "warm_w4": round(warm_w4, 1),
                "warm_w1": round(warm_w1, 1)}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    errors: dict[str, str] = {}
    try:
        _run(errors)
    except Exception as e:
        # Final failure: one parseable JSON line with the error instead of
        # rc=1 and no data (the round-3 failure mode).
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": METRIC_NAME,
            "value": None,
            "unit": "pairs/s",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}",
            "errors": errors or None,
        }))


def _run(errors: dict[str, str]) -> None:
    from mra_gan_tpu.core.compile_cache import enable_compilation_cache
    from mra_gan_tpu.models.cycle_gan import CycleGANConfig, create_state, make_train_step

    _acquire_backend()
    enable_compilation_cache()

    cfg = CycleGANConfig(ngf=32, ndf=32, net_g="resnet_6blocks", net_d="n_layers",
                         n_layers_d=3, pool_size=50, dtype=jnp.bfloat16,
                         # pinned: the benchmarked program has been LSGAN
                         # since r1 (the library default moved to the
                         # reference-faithful "vanilla" in r5)
                         gan_mode="lsgan")
    state = create_state(cfg, jax.random.PRNGKey(0), PATCH)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)

    a = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, *PATCH, 1),
                           minval=-1, maxval=1, dtype=jnp.float32)
    b = jax.random.uniform(jax.random.PRNGKey(2), (BATCH, *PATCH, 1),
                           minval=-1, maxval=1, dtype=jnp.float32)

    def hard_sync(tree):
        # block_until_ready can return before execution completes on the
        # tunneled axon backend; a device_get of a value is a true barrier.
        jax.device_get(jax.tree.leaves(tree)[0])

    for i in range(WARMUP):
        state, metrics = step(state, a, b, jax.random.PRNGKey(i), 2e-4)
    hard_sync(metrics)

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = step(state, a, b, jax.random.PRNGKey(100 + i), 2e-4)
    hard_sync(metrics)
    dt = time.perf_counter() - t0

    try:
        secs = _bench_inference(cfg, state)
        infer_secs = round(secs["exact"], 3)
        infer_secs_f16 = round(secs["f16_out"], 3)
        infer_secs_sp = round(secs["single_pass"], 3)
    except Exception as e:
        traceback.print_exc(file=sys.stderr)
        errors["inference"] = f"{type(e).__name__}: {e}"
        infer_secs = infer_secs_f16 = infer_secs_sp = None

    # throughput mode: batch 8 (the production configuration; same model,
    # same step — amortizes the per-step bandwidth-bound tails)
    try:
        state8 = create_state(cfg, jax.random.PRNGKey(3), PATCH)
        a8 = jax.random.uniform(jax.random.PRNGKey(4), (8, *PATCH, 1),
                                minval=-1, maxval=1, dtype=jnp.float32)
        b8 = jax.random.uniform(jax.random.PRNGKey(5), (8, *PATCH, 1),
                                minval=-1, maxval=1, dtype=jnp.float32)
        for i in range(2):
            state8, m8 = step(state8, a8, b8, jax.random.PRNGKey(200 + i), 2e-4)
        hard_sync(m8)
        t0 = time.perf_counter()
        for i in range(8):
            state8, m8 = step(state8, a8, b8, jax.random.PRNGKey(300 + i), 2e-4)
        hard_sync(m8)
        batch8_pairs = round(8 * 8 / (time.perf_counter() - t0), 3)
    except Exception as e:
        traceback.print_exc(file=sys.stderr)
        errors["batch8"] = f"{type(e).__name__}: {e}"
        batch8_pairs = None

    try:
        loader = _bench_loader()
    except Exception as e:
        traceback.print_exc(file=sys.stderr)
        errors["loader"] = f"{type(e).__name__}: {e}"
        loader = None

    pairs_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": METRIC_NAME,
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / V100_PAIRS_PER_SEC_EST, 2),
        "inference_secs_per_volume_256x256x128": infer_secs,
        "inference_secs_per_volume_f16_output_wire": infer_secs_f16,
        "inference_secs_per_volume_single_pass": infer_secs_sp,
        "batch8_pairs_per_sec": batch8_pairs,
        "loader_patch_pairs_per_sec": loader,
        "errors": errors or None,
    }))


if __name__ == "__main__":
    main()
