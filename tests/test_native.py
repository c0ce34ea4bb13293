"""Native C++ data-path library tests (skipped if the toolchain is absent)."""
import numpy as np
import pytest

from mra_gan_tpu.data import native, nifti

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _img(shape=(20, 24, 18), seed=0):
    rng = np.random.RandomState(seed)
    aff = np.array([[0, -1.1, 0, 5], [1.2, 0, 0, -3], [0, 0, 2.0, 7], [0, 0, 0, 1]])
    return nifti.NiftiImage(data=(rng.rand(*shape) * 500).astype(np.float32),
                            affine=aff)


@pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
def test_native_reader_matches_python(tmp_path, ext):
    img = _img()
    p = tmp_path / ("x" + ext)
    nifti.save(img, p)
    data, affine = native.load_nifti(p)
    np.testing.assert_allclose(data, img.data, rtol=1e-6)
    np.testing.assert_allclose(affine, img.affine, atol=1e-5)


@pytest.mark.parametrize("dtype", [np.int16, np.uint8, np.float64])
def test_native_reader_dtypes(tmp_path, dtype):
    img = _img()
    p = tmp_path / "x.nii"
    nifti.save(img.with_data(img.data.astype(dtype)), p)
    data, _ = native.load_nifti(p)
    np.testing.assert_allclose(data, img.data.astype(dtype).astype(np.float32))


def test_native_reader_rejects_garbage(tmp_path):
    p = tmp_path / "bad.nii"
    p.write_bytes(b"x" * 400)
    assert native.load_nifti(p) is None


def test_patch_extraction_matches_numpy():
    rng = np.random.RandomState(0)
    vol = rng.rand(30, 28, 26).astype(np.float32)
    starts = np.stack([rng.randint(0, 30 - 8, 50), rng.randint(0, 28 - 8, 50),
                       rng.randint(0, 26 - 8, 50)], 1)
    out = native.extract_patches(vol, starts, (8, 8, 8), n_threads=3)
    for i, s in enumerate(starts):
        np.testing.assert_array_equal(
            out[i], vol[s[0]:s[0] + 8, s[1]:s[1] + 8, s[2]:s[2] + 8])


def test_patch_extraction_bounds_check():
    vol = np.zeros((8, 8, 8), np.float32)
    with pytest.raises(ValueError):
        native.extract_patches(vol, np.array([[4, 0, 0]]), (8, 8, 8))
