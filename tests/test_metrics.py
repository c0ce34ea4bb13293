"""Metrics tests — SSIM validated against skimage when available."""
import numpy as np
import pytest
import jax.numpy as jnp

from mra_gan_tpu.utils.metrics import mae, pearson_r, psnr, ssim3d


def test_identical_volumes():
    x = np.random.RandomState(0).rand(16, 16, 16).astype(np.float32)
    assert float(ssim3d(jnp.asarray(x), jnp.asarray(x))) == pytest.approx(1.0, abs=1e-5)
    assert float(psnr(jnp.asarray(x), jnp.asarray(x))) > 100
    assert float(mae(jnp.asarray(x), jnp.asarray(x))) == 0
    assert float(pearson_r(jnp.asarray(x), jnp.asarray(x))) == pytest.approx(1.0, abs=1e-5)


def test_noise_degrades_metrics():
    rng = np.random.RandomState(0)
    x = rng.rand(16, 16, 16).astype(np.float32)
    y = x + rng.randn(16, 16, 16).astype(np.float32) * 0.2
    s = float(ssim3d(jnp.asarray(y), jnp.asarray(x)))
    assert 0 < s < 0.95
    assert float(psnr(jnp.asarray(y), jnp.asarray(x))) < 25


def test_psnr_known_value():
    x = np.zeros((8, 8, 8), np.float32)
    y = x + 0.1
    # with data_range 1: psnr = 10*log10(1/0.01) = 20
    assert float(psnr(jnp.asarray(y), jnp.asarray(x), data_range=1.0)) == pytest.approx(20.0, abs=1e-3)


def test_ssim_matches_skimage():
    skimage = pytest.importorskip("skimage.metrics")
    rng = np.random.RandomState(1)
    x = rng.rand(20, 20, 20).astype(np.float32)
    y = np.clip(x + rng.randn(20, 20, 20).astype(np.float32) * 0.1, 0, 1)
    want = skimage.structural_similarity(x, y, win_size=7, data_range=float(x.max() - x.min()))
    got = float(ssim3d(jnp.asarray(y), jnp.asarray(x), data_range=float(x.max() - x.min())))
    assert got == pytest.approx(want, abs=0.02)
