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


def test_volume_metrics_bundle_matches_eager():
    """volume_metrics (the fused one-program bundle evaluate.py uses) equals
    the individual eager metrics, including the --mask-fg weighted forms vs
    the boolean-indexed originals."""
    from mra_gan_tpu.utils.metrics import volume_metrics

    rng = np.random.RandomState(3)
    a = rng.rand(12, 14, 10).astype(np.float32) * 200
    b = np.clip(a + rng.randn(12, 14, 10).astype(np.float32) * 10, -50, 250)
    b[b < 60] = 0.0  # real background zeros for the mask case

    out = volume_metrics(jnp.asarray(a), jnp.asarray(b))
    assert float(out["ssim"]) == pytest.approx(float(ssim3d(a, b)), abs=1e-5)
    assert float(out["psnr"]) == pytest.approx(float(psnr(a, b)), abs=1e-3)
    assert float(out["mae"]) == pytest.approx(float(mae(a, b)), rel=1e-5)
    assert float(out["pearson_r"]) == pytest.approx(float(pearson_r(a, b)),
                                                    abs=1e-5)

    m = b > 0
    out_m = volume_metrics(jnp.asarray(a), jnp.asarray(b),
                           mask=jnp.asarray(m), use_mask=True)
    assert float(out_m["ssim"]) == pytest.approx(float(ssim3d(a, b)), abs=1e-5)
    assert float(out_m["psnr"]) == pytest.approx(float(psnr(a[m], b[m])),
                                                 abs=1e-3)
    assert float(out_m["mae"]) == pytest.approx(float(mae(a[m], b[m])),
                                                rel=1e-4)
    assert float(out_m["pearson_r"]) == pytest.approx(
        float(pearson_r(a[m], b[m])), abs=1e-5)
