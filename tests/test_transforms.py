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
