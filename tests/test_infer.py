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


def test_overlap_add_matches_scan_path():
    from mra_gan_tpu.infer.sliding_window import _overlap_add_inference, _scan_inference

    vol = np.random.RandomState(2).rand(20, 24, 28).astype(np.float32)
    gen = lambda x: x * 0.5 + 0.1
    fast = _overlap_add_inference(vol, gen, (8, 8, 8), (4, 4, 4), "gaussian", 2)
    slow = _scan_inference(vol, gen, (8, 8, 8), (4, 4, 4), "gaussian", 2)
    np.testing.assert_allclose(fast, slow, atol=2e-4)


def test_scan_path_batch_padding_unbiased():
    """Batch padding duplicates the last grid start; the duplicate's window
    must be masked or overlapped voxels skew toward the repeated patch."""
    import jax.numpy as jnp

    from mra_gan_tpu.infer.sliding_window import _scan_inference, compute_grid_starts

    vol = (np.arange(16 ** 3, dtype=np.float32).reshape(16, 16, 16)
           / 16 ** 3)
    patch, strides = (8, 8, 8), (3, 5, 5)

    # patch-mean generator: per-patch-constant output makes duplicate bias visible
    def gen(x):
        return jnp.zeros_like(x) + jnp.mean(x, axis=(1, 2, 3, 4), keepdims=True)

    # numpy oracle without any batch padding
    starts = [compute_grid_starts(16, patch[i], strides[i]) for i in range(3)]
    grid = [(a, b, c) for a in starts[0] for b in starts[1] for c in starts[2]]
    acc = np.zeros_like(vol)
    wsum = np.zeros_like(vol)
    for (a, b, c) in grid:
        p = vol[a:a + 8, b:b + 8, c:c + 8]
        acc[a:a + 8, b:b + 8, c:c + 8] += p.mean()
        wsum[a:a + 8, b:b + 8, c:c + 8] += 1.0
    want = acc / np.maximum(wsum, 1e-8)

    # batch=7 with len(grid)=36 forces 6 padded duplicates
    assert len(grid) % 7 != 0
    got = _scan_inference(vol, gen, patch, strides, "uniform", batch=7)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_non_divisible_stride_falls_back():
    vol = np.random.RandomState(3).rand(16, 16, 16).astype(np.float32)
    out = sliding_window_inference(vol, lambda x: x, patch_size=(8, 8, 8),
                                   stride_inplane=5, stride_layer=3, batch=2)
    np.testing.assert_allclose(out, vol, atol=1e-4)


def test_streaming_matches_monolithic():
    from mra_gan_tpu.infer.sliding_window import (_overlap_add_inference,
                                                  _streaming_overlap_add)

    vol = np.random.RandomState(5).rand(20, 24, 28).astype(np.float32) * 2 - 1
    gen = lambda x: x * 0.5 + 0.1
    mono = _overlap_add_inference(vol, gen, (8, 8, 8), (4, 4, 4), "gaussian", 2)
    stream = _streaming_overlap_add(vol, gen, (8, 8, 8), (4, 4, 4), "gaussian", 2)
    np.testing.assert_allclose(stream, mono, atol=1e-5)
    # uniform blend + batch padding of the in-plane grid
    mono_u = _overlap_add_inference(vol, gen, (8, 8, 8), (4, 4, 4), "uniform", 5)
    stream_u = _streaming_overlap_add(vol, gen, (8, 8, 8), (4, 4, 4), "uniform", 5)
    np.testing.assert_allclose(stream_u, mono_u, atol=1e-5)


def test_transfer_dtype_f16_bounded_error():
    """float16 wire format: compute stays f32, output quantization stays
    within ~2^-10 on a [-1,1]-scaled volume."""
    vol = np.random.RandomState(6).rand(20, 16, 16).astype(np.float32) * 2 - 1
    exact = sliding_window_inference(vol, lambda x: x, patch_size=(8, 8, 8),
                                     stride_inplane=4, stride_layer=4, batch=2)
    f16 = sliding_window_inference(vol, lambda x: x, patch_size=(8, 8, 8),
                                   stride_inplane=4, stride_layer=4, batch=2,
                                   transfer_dtype=np.float16)
    assert f16.dtype == np.float32
    np.testing.assert_allclose(f16, exact, atol=2e-3)
    assert float(np.abs(f16 - exact).mean()) < 5e-4


def test_bf16_input_wire_exact_for_bf16_generator():
    """Pre-quantizing the input to bfloat16 on the host is a no-op for a
    generator whose first op casts to bfloat16: outputs are bit-identical."""
    import jax.numpy as jnp

    def gen(x):  # stand-in for a bf16-compute network
        h = x.astype(jnp.bfloat16)
        return (jnp.tanh(h * 1.7 + 0.3)).astype(jnp.float32)

    vol = np.random.RandomState(7).rand(20, 16, 16).astype(np.float32) * 2 - 1
    base = sliding_window_inference(vol, gen, patch_size=(8, 8, 8),
                                    stride_inplane=4, stride_layer=4, batch=2)
    bf16_in = sliding_window_inference(vol, gen, patch_size=(8, 8, 8),
                                       stride_inplane=4, stride_layer=4, batch=2,
                                       input_transfer_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(bf16_in, base)


def test_streaming_flush_row_matches_monolithic():
    """Non-divisible leading axis ((21-8)%4 != 0) streams with a FLUSH row;
    the result must equal the monolithic clamped-grid overlap-add and the
    per-patch scan path bit-for-bit (same grid, same math). A non-identity
    spatially-varying generator catches mis-placed flush contributions."""
    from mra_gan_tpu.infer.sliding_window import (_overlap_add_inference,
                                                  _scan_inference,
                                                  _streaming_overlap_add)

    vol = np.random.RandomState(5).rand(21, 14, 18).astype(np.float32)

    def gen(x):  # per-patch normalization: sensitive to patch placement
        m = x.mean(axis=(1, 2, 3, 4), keepdims=True)
        return (x - m) * 0.5 + x ** 2 * 0.1

    patch, strides = (8, 8, 8), (4, 4, 4)
    for blend in ("uniform", "gaussian"):
        want = _overlap_add_inference(vol, gen, patch, strides, blend, 2)
        got = _streaming_overlap_add(vol, gen, patch, strides, blend, 2)
        np.testing.assert_allclose(got, want, atol=2e-6,
                                   err_msg=f"stream vs monolithic ({blend})")
        scan = _scan_inference(vol, gen, patch, strides, blend, 2)
        np.testing.assert_allclose(got, scan, atol=1e-5,
                                   err_msg=f"stream vs scan ({blend})")


def test_streaming_flush_row_via_public_api():
    """The dispatcher now streams non-divisible leading axes too; identity
    reconstruction through the public entry point."""
    vol = np.random.RandomState(6).rand(23, 16, 16).astype(np.float32)
    out = sliding_window_inference(vol, lambda x: x, patch_size=(8, 8, 8),
                                   stride_inplane=8, stride_layer=4, batch=2)
    np.testing.assert_allclose(out, vol, atol=1e-4)


def test_weight_cache_not_shared_across_flush_geometries():
    """Two volumes whose leading sizes differ but chunk-pad identically
    (65 and 70 -> 96 with patch 64/stride 32... scaled down here: 17 and 22
    with patch 16/stride 8) must NOT share a cached blend-weight volume —
    their flush rows sit at different offsets, and a stale weight volume
    silently mis-blends the seam band (round-3 review finding)."""
    for lead in (17, 22, 19):  # same padded leading size, different grids
        vol = np.random.RandomState(lead).rand(lead, 16, 16).astype(np.float32)
        out = sliding_window_inference(vol, lambda x: x, patch_size=(16, 16, 16),
                                       stride_inplane=8, stride_layer=8,
                                       blend="uniform", batch=2)
        np.testing.assert_allclose(out, vol, atol=1e-4,
                                   err_msg=f"lead={lead}")
