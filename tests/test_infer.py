"""Sliding-window inference tests."""
import numpy as np

from mra_gan_tpu.infer import compute_grid_starts, sliding_window_inference
from mra_gan_tpu.infer.sliding_window import gaussian_window


def test_grid_starts_cover_and_clamp():
    starts = compute_grid_starts(100, 64, 32)
    assert starts[0] == 0 and starts[-1] == 36  # clamped flush to edge
    assert all(s + 64 <= 100 for s in starts)
    assert compute_grid_starts(32, 64, 32) == [0]


def test_gaussian_window_properties():
    w = gaussian_window((8, 8, 8))
    assert w.shape == (8, 8, 8)
    assert w.max() == 1.0
    c = w[4, 4, 4]
    assert c > w[0, 0, 0]


def test_identity_generator_reconstructs_volume():
    vol = np.random.RandomState(0).rand(20, 24, 28).astype(np.float32)
    out = sliding_window_inference(
        vol, lambda x: x, patch_size=(8, 8, 8),
        stride_inplane=4, stride_layer=4, blend="gaussian", batch=2)
    np.testing.assert_allclose(out, vol, atol=1e-4)
    out_u = sliding_window_inference(
        vol, lambda x: x, patch_size=(8, 8, 8),
        stride_inplane=4, stride_layer=4, blend="uniform", batch=3)
    np.testing.assert_allclose(out_u, vol, atol=1e-4)


def test_small_volume_padded():
    vol = np.random.RandomState(0).rand(5, 6, 30).astype(np.float32)
    out = sliding_window_inference(
        vol, lambda x: x, patch_size=(8, 8, 8),
        stride_inplane=8, stride_layer=8, batch=2)
    assert out.shape == vol.shape
    np.testing.assert_allclose(out, vol, atol=1e-4)


def test_constant_shift_generator():
    vol = np.zeros((16, 16, 16), np.float32)
    out = sliding_window_inference(
        vol, lambda x: x + 0.5, patch_size=(8, 8, 8),
        stride_inplane=4, stride_layer=4, batch=4)
    np.testing.assert_allclose(out, 0.5, atol=1e-5)
