"""Transform-library tests."""
import numpy as np


def test_adaptive_equalize_is_local():
    """Tiled CLAHE: a dim half and a bright half must each be stretched
    toward full range LOCALLY (a purely global equalization leaves the dim
    half compressed)."""
    from mra_gan_tpu.data.transforms import adaptive_equalize

    rng = np.random.RandomState(0)
    vol = np.empty((32, 16, 16), np.float32)
    vol[:16] = rng.rand(16, 16, 16) * 20          # dim half: [0, 20]
    vol[16:] = 200 + rng.rand(16, 16, 16) * 55    # bright half: [200, 255]
    out = adaptive_equalize(vol, alpha=1.0)
    assert out.shape == vol.shape
    assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 255
    # local contrast: the dim half's output spread approaches the bright
    # half's, unlike global equalization where it stays pinned together
    spread_dim = np.percentile(out[:12], 95) - np.percentile(out[:12], 5)
    spread_bright = np.percentile(out[20:], 95) - np.percentile(out[20:], 5)
    assert spread_dim > 0.4 * spread_bright
    # monotone within a tile: ordering of values is preserved locally
    a, b = vol[2, 3, 4], vol[2, 3, 5]
    oa, ob = out[2, 3, 4], out[2, 3, 5]
    assert (a - b) * (oa - ob) >= 0


def test_align_to_copies_affine_only():
    from mra_gan_tpu.data.nifti import NiftiImage
    from mra_gan_tpu.data.transforms import align_to

    img = NiftiImage(data=np.arange(8, dtype=np.float32).reshape(2, 2, 2),
                     affine=np.eye(4))
    aff = np.diag([2.0, 2.0, 2.0, 1.0]); aff[:3, 3] = [1, 2, 3]
    ref = NiftiImage(data=np.zeros((2, 2, 2), np.float32), affine=aff)
    out = align_to(img, ref)
    np.testing.assert_array_equal(out.data, img.data)
    np.testing.assert_array_equal(out.affine, ref.affine)

def _brute_ahe(vol, alpha, beta, r):
    """Per-voxel literal transcription of the Stark/ITK windowed cumulation
    (see transforms.adaptive_equalize_itk docstring) — the oracle for the
    vectorized implementation."""
    x = vol.astype(np.float32)
    u = (x - x.min()) / (x.max() - x.min())
    up = np.pad(u, r, mode="edge")
    f = np.zeros_like(u)
    D, H, W = u.shape
    for i in range(D):
        for j in range(H):
            for k in range(W):
                win = up[i:i + 2 * r + 1, j:j + 2 * r + 1, k:k + 2 * r + 1]
                d = u[i, j, k] - win
                c = 0.5 * np.sign(d) * np.abs(2.0 * d) ** alpha + beta * win
                f[i, j, k] = c.mean() + 0.5
    return (f - f.min()) / (f.max() - f.min()) * 255.0


def test_adaptive_equalize_itk_matches_bruteforce():
    from mra_gan_tpu.data.transforms import adaptive_equalize_itk

    rng = np.random.RandomState(1)
    vol = (rng.rand(7, 6, 5) * 100 + 3).astype(np.float32)
    for alpha, beta in ((0.7, 0.8), (0.0, 0.0), (0.3, 0.5)):
        got = adaptive_equalize_itk(vol, alpha=alpha, beta=beta, radius=2)
        np.testing.assert_allclose(got, _brute_ahe(vol, alpha, beta, 2),
                                   atol=2e-3)


def test_adaptive_equalize_itk_documented_limits():
    """ITK documents three limit behaviors that pin down the algorithm:
    alpha=1,beta=1 pass-through; alpha=1,beta=0 unsharp mask (local-mean
    subtraction); alpha=0 classical windowed equalization (rank mapping).
    All three must hold exactly (up to the trailing min-max rescale)."""
    from mra_gan_tpu.data.transforms import adaptive_equalize_itk

    rng = np.random.RandomState(2)
    vol = (rng.rand(6, 6, 6) * 50 + 10).astype(np.float32)
    r = 2
    span = vol.max() - vol.min()
    u = (vol - vol.min()) / span

    # pass-through: output is exactly the min-max rescale of the input
    out = adaptive_equalize_itk(vol, alpha=1.0, beta=1.0, radius=r)
    np.testing.assert_allclose(out, u * 255.0, atol=1e-2)

    # unsharp mask: f = u - boxmean(u), up to the rescale
    up = np.pad(u, r, mode="edge")
    n = 2 * r + 1
    mean = np.zeros_like(u)
    for i in range(u.shape[0]):
        for j in range(u.shape[1]):
            for k in range(u.shape[2]):
                mean[i, j, k] = up[i:i + n, j:j + n, k:k + n].mean()
    f = u - mean
    want = (f - f.min()) / (f.max() - f.min()) * 255.0
    out = adaptive_equalize_itk(vol, alpha=1.0, beta=0.0, radius=r)
    np.testing.assert_allclose(out, want, atol=1e-2)

    # classical windowed equalization: the sgn-sum is the window rank, so
    # within any window the mapping is monotone in the voxel value
    out = adaptive_equalize_itk(vol, alpha=0.0, beta=0.0, radius=r)
    a, b = vol[2, 3, 3], vol[2, 3, 4]
    if a != b:
        assert (out[2, 3, 3] < out[2, 3, 4]) == (a < b)
