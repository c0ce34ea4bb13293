"""Two-framework TRAINING-OUTCOME parity: the BASELINE.md north star.

tests/test_torch_parity_step.py proves per-step equality (losses 1e-4,
gradients 2e-5); this test closes the remaining gap to "a model TRAINED in
this framework reaches reference-equal SSIM/PSNR": train the reference's
real CycleGANModel (torch CPU) and our jitted step side by side — identical
initial weights, identical data order, identical hyperparameters — for
several hundred full G+D steps on a tiny synthetic paired task, then decode
held-out volumes with both trained G_As and compare SSIM/PSNR/MAE.

Task design: B == A (paired identity translation) with the supervised
losses boosted (lambda_A/B=50, identity=1) so the optimization outcome is
stable enough to compare; the GAN machinery (D updates, LSGAN grads through
D, Adam chains) still runs in full — a wrong loss weight, update rule, or
LR wiring in EITHER framework breaks the agreement. Pure-GAN-pressure
configs oscillate without converging at this scale in both frameworks
(measured: MAE wanders 0.35-0.45 over 1200 steps with the default lambdas
in torch itself), which would make an outcome comparison vacuous.

Runtime: ~4-6 min on CPU (the longest test in the suite; the reference side
alone is ~90 s of un-jitted torch).
"""
import importlib
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mra_gan_tpu.models.cycle_gan import (  # noqa: E402
    CycleGANConfig, create_state, make_train_step, make_generate_fn)
from mra_gan_tpu.utils.metrics import psnr, ssim3d  # noqa: E402

from test_torch_parity_step import (  # noqa: E402
    _import_state, _ref_opt, _stub_monai, _to_torch, ref_cycle_gan)  # noqa: F401

PATCH = (16, 16, 16)
LR = 2e-4
N_STEPS = int(os.environ.get("MRA_GAN_TPU_PARITY_STEPS", "600"))


def _smooth_noise(rs, shape, sigma=2.0):
    from scipy.ndimage import gaussian_filter

    x = gaussian_filter(rs.randn(*shape).astype(np.float32), sigma)
    x = (x - x.min()) / (x.max() - x.min() + 1e-8)
    return (x * 2 - 1).astype(np.float32)


def test_trained_quality_matches_reference(ref_cycle_gan, tmp_path):
    rs = np.random.RandomState(0)
    train_a = [_smooth_noise(rs, PATCH) for _ in range(8)]
    held_a = [_smooth_noise(rs, PATCH) for _ in range(4)]

    torch.manual_seed(0)
    model = ref_cycle_gan.CycleGANModel()
    opt = _ref_opt(tmp_path, "lsgan")
    opt.lambda_A = opt.lambda_B = 50.0
    opt.lambda_identity = 1.0
    model.initialize(opt)
    cfg = CycleGANConfig(ngf=4, ndf=4, net_g="resnet_6blocks",
                         net_d="n_layers", n_layers_d=2, norm="instance",
                         gan_mode="lsgan", pool_size=0,
                         lambda_a=50.0, lambda_b=50.0, lambda_identity=1.0)
    state = _import_state(model, cfg, tmp_path)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)

    order = np.random.RandomState(1).randint(0, len(train_a), size=N_STEPS)
    for i, k in enumerate(order):
        a = train_a[k][None, ..., None]
        model.set_input([_to_torch(a), _to_torch(a)])
        model.optimize_parameters()
    for i, k in enumerate(order):
        a = jnp.asarray(train_a[k][None, ..., None])
        state, metrics = step(state, a, a, jax.random.PRNGKey(i), LR)
    jax.block_until_ready(metrics)

    gen = make_generate_fn(cfg, "g_a")
    rows = []
    for ha in held_a:
        with torch.no_grad():
            ref_out = model.netG_A(_to_torch(ha[None, ..., None])).numpy()[0, 0]
        ours_out = np.asarray(gen(state.g_params["g_a"],
                                  jnp.asarray(ha[None, ..., None])))[0, ..., 0]
        rows.append({
            "ssim_ref": float(ssim3d(ref_out, ha, data_range=2.0)),
            "ssim_ours": float(ssim3d(ours_out, ha, data_range=2.0)),
            "psnr_ref": float(psnr(ref_out, ha, data_range=2.0)),
            "psnr_ours": float(psnr(ours_out, ha, data_range=2.0)),
            "mae_ref": float(np.abs(ref_out - ha).mean()),
            "mae_ours": float(np.abs(ours_out - ha).mean()),
        })
    print("quality parity:", rows)

    # Averaged over the held-out volumes (per-volume GAN noise averages down)
    m = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}

    # 1. BOTH frameworks actually learned (random init scores MAE ~0.5,
    #    SSIM ~0 on this task; measured trained values: MAE 0.236-0.241,
    #    SSIM 0.11-0.16, PSNR 16.6-16.9) — a dead training loop fails here.
    assert m["mae_ref"] < 0.32 and m["mae_ours"] < 0.32, m
    assert m["ssim_ref"] > 0.04 and m["ssim_ours"] > 0.04, m
    assert m["psnr_ref"] > 15.0 and m["psnr_ours"] > 15.0, m

    # 2. The frameworks agree on the OUTCOME (measured deltas with these
    #    seeds: MAE 0.006, PSNR 0.22 dB, SSIM 0.051 — the windows leave
    #    3-10x margin). Per-step trajectories decorrelate chaotically after
    #    ~50 steps (float noise through Adam), so this reflects two
    #    independent runs of the same algorithm, not numerical identity;
    #    a mis-wired loss weight, update rule, or LR on either side moves
    #    these metrics far outside the windows.
    assert abs(m["ssim_ours"] - m["ssim_ref"]) < 0.15, m
    assert abs(m["psnr_ours"] - m["psnr_ref"]) < 2.0, m
    assert abs(m["mae_ours"] - m["mae_ref"]) < 0.06, m
