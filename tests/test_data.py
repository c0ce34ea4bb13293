"""Data layer tests: NIfTI round-trips, transforms, dataset/loader."""
import numpy as np
import pytest

from mra_gan_tpu.data import nifti
from mra_gan_tpu.data.transforms import (
    crop_foreground,
    from_tanh_range,
    orientation_codes,
    pad_to_size,
    rand_crop_by_pos_neg,
    random_crop,
    rescale_0_255,
    resample_to_reference,
    resample_to_spacing,
    to_ras,
    to_tanh_range,
    zscore_normalize,
)


def _img(shape=(12, 14, 10), affine=None, seed=0):
    rng = np.random.RandomState(seed)
    data = rng.rand(*shape).astype(np.float32) * 100
    if affine is None:
        affine = np.diag([1.0, 1.0, 1.0, 1.0])
    return nifti.NiftiImage(data=data, affine=np.asarray(affine, float))


def test_nifti_roundtrip(tmp_path):
    aff = np.array([[0, -1.1, 0, 5], [1.2, 0, 0, -3], [0, 0, 2.0, 7], [0, 0, 0, 1]])
    img = _img(affine=aff)
    for name in ("a.nii", "b.nii.gz"):
        p = tmp_path / name
        nifti.save(img, p)
        back = nifti.load(p)
        np.testing.assert_allclose(back.data, img.data, rtol=1e-6)
        np.testing.assert_allclose(back.affine, img.affine, atol=1e-5)


def test_nifti_dtypes_and_scaling(tmp_path):
    img = _img()
    for dt in (np.int16, np.uint8, np.float64):
        p = tmp_path / "x.nii"
        nifti.save(img.with_data(img.data.astype(dt)), p)
        back = nifti.load(p)
        assert back.data.dtype == dt
    # qform-only fallback
    p = tmp_path / "q.nii"
    nifti.save(img, p)
    raw = bytearray(p.read_bytes())
    import struct

    struct.pack_into("<h", raw, 254, 0)  # zero sform_code -> qform path
    p.write_bytes(bytes(raw))
    back = nifti.load(p)
    np.testing.assert_allclose(back.affine, img.affine, atol=1e-4)


def test_nifti_rejects_garbage(tmp_path):
    p = tmp_path / "bad.nii"
    p.write_bytes(b"not a nifti at all, definitely not 348 bytes of header")
    with pytest.raises(ValueError):
        nifti.load(p)


def test_to_ras_permutes_and_flips():
    # LPS affine (flip x and y)
    aff = np.diag([-1.0, -1.0, 1.0, 1.0])
    img = _img(affine=aff)
    assert orientation_codes(img.affine) == "LPS"
    ras = to_ras(img)
    assert orientation_codes(ras.affine) == "RAS"
    # same physical payload: voxel (0,0,0) of LPS is voxel (-1,-1,0) of RAS
    np.testing.assert_allclose(ras.data[-1, -1, 0], img.data[0, 0, 0])
    # round trip world coordinates of a corner agree
    w_old = img.affine @ np.array([2, 3, 4, 1.0])
    ijk = np.linalg.inv(ras.affine) @ w_old
    np.testing.assert_allclose(
        ras.data[tuple(np.round(ijk[:3]).astype(int))], img.data[2, 3, 4])


def test_normalizations():
    x = np.random.RandomState(0).randn(8, 8, 8).astype(np.float32) * 7 + 3
    z = zscore_normalize(x)
    assert abs(z.mean()) < 1e-4 and abs(z.std() - 1) < 1e-4
    r = rescale_0_255(x)
    assert r.min() >= 0 and r.max() <= 255
    t = to_tanh_range(r)
    assert t.min() >= -1 and t.max() <= 1
    np.testing.assert_allclose(from_tanh_range(t), r, atol=1e-3)


def test_crop_foreground():
    img = np.zeros((10, 10, 10), np.float32)
    img[2:5, 3:7, 4:6] = 5.0
    lbl = np.ones_like(img)
    ci, cl, sl = crop_foreground(img, lbl)
    assert ci.shape == (3, 4, 2)
    assert cl.shape == (3, 4, 2)
    assert (ci > 0).all()


def test_pad_to_size_modes():
    x = np.ones((4, 5, 6), np.float32)
    p = pad_to_size(x, (8, 8, 8))
    assert p.shape == (8, 8, 8)
    p2 = pad_to_size(x, (2, 2, 2))  # never crops
    assert p2.shape == (4, 5, 6)


def test_pad_to_size_end_mode_reference_parity():
    """'end' padding = the reference Padding's same-spacing BSpline resample
    (zero at the high side, content anchored at the origin,
    reference utils/NiftiDataset.py:876-932)."""
    x = np.random.RandomState(0).rand(5, 8, 3).astype(np.float32)
    p = pad_to_size(x, (8, 8, 8), where="end")
    assert p.shape == (8, 8, 8)
    np.testing.assert_array_equal(p[:5, :, :3], x)
    assert (p[5:] == 0).all() and (p[:, :, 3:] == 0).all()
    # un-pad is the plain leading slice — content alignment preserved
    np.testing.assert_array_equal(p[:5, :8, :3], x)
    # symmetric mode centers instead
    s = pad_to_size(x, (8, 8, 8), where="symmetric")
    f = [(8 - 5) // 2, 0, (8 - 3) // 2]
    np.testing.assert_array_equal(
        s[f[0]:f[0] + 5, :, f[2]:f[2] + 3], x)


def test_rand_crop_pos_sampling():
    rng = np.random.default_rng(0)
    img = np.random.default_rng(1).random((20, 20, 20), np.float32).astype(np.float32)
    lbl = np.zeros((20, 20, 20), np.float32)
    lbl[10:14, 10:14, 10:14] = 1.0
    crops = rand_crop_by_pos_neg(img, lbl, (8, 8, 8), rng, num_samples=4,
                                 pos=20, neg=0)
    assert len(crops) == 4
    for ip, lp in crops:
        assert ip.shape == (8, 8, 8)
        assert lp.sum() > 0  # pos-only sampling must include label voxels


def test_random_crop_min_pixel():
    rng = np.random.default_rng(0)
    img = np.random.default_rng(1).random((16, 16, 16)).astype(np.float32)
    lbl = np.zeros((16, 16, 16), np.float32)
    lbl[0:4, 0:4, 0:4] = 1.0
    ip, lp = random_crop(img, lbl, (4, 4, 4), rng, drop_ratio=0.0, min_pixel=10)
    assert np.count_nonzero(lp) >= 10


def test_resample_spacing_and_reference():
    # a smooth ramp is preserved exactly by linear resampling, so this checks
    # the affine/grid bookkeeping, not interpolation quality
    ii, jj, kk = np.mgrid[0:16, 0:16, 0:16].astype(np.float32)
    ramp = 2 * ii + 3 * jj + 5 * kk
    img = nifti.NiftiImage(data=ramp, affine=np.diag([2.0, 2.0, 2.0, 1.0]))
    fine = resample_to_spacing(img, (1.0, 1.0, 1.0))
    assert fine.data.shape == (32, 32, 32)
    np.testing.assert_allclose(fine.spacing, [1, 1, 1], atol=1e-6)
    back = resample_to_reference(fine, img)
    assert back.data.shape == img.data.shape
    err = np.abs(back.data[1:-2, 1:-2, 1:-2] - img.data[1:-2, 1:-2, 1:-2])
    assert err.max() < 0.5


def test_dataset_and_loader(tmp_path):
    from mra_gan_tpu.data.dataset import PatchLoader, UnpairedVolumeDataset

    rng = np.random.RandomState(0)
    for sub in ("images", "labels"):
        (tmp_path / sub).mkdir()
    for i in range(3):
        vol = rng.rand(24, 24, 24).astype(np.float32) * 100 + 1
        for sub in ("images", "labels"):
            nifti.save(nifti.NiftiImage(data=vol + rng.rand(), affine=np.eye(4)),
                       tmp_path / sub / f"{i}.nii")
    ds = UnpairedVolumeDataset(tmp_path, patch_size=(8, 8, 8), pipeline="monai",
                               num_samples=2, cache_dir=str(tmp_path / "cache"))
    assert len(ds) == 3
    patches = ds.sample_patches(0, epoch=0)
    assert len(patches) == 2
    assert patches[0][0].shape == (8, 8, 8, 1)
    # determinism per (epoch, idx)
    again = ds.sample_patches(0, epoch=0)
    np.testing.assert_array_equal(patches[0][0], again[0][0])
    other_epoch = ds.sample_patches(0, epoch=1)
    assert not np.array_equal(patches[0][0], other_epoch[0][0])
    # cache hit path (writes are async — flush before checking disk)
    from mra_gan_tpu.data.dataset import flush_cache_writes

    flush_cache_writes()
    assert len(list((tmp_path / "cache").glob("*.image.npy"))) > 0

    loader = PatchLoader(ds, batch_size=2, workers=1)
    batches = list(loader.epoch(0))
    assert len(batches) == 3  # 3 vols * 2 samples / batch 2
    assert batches[0][0].shape == (2, 8, 8, 8, 1)

    # legacy pipeline produces [-1,1]
    ds2 = UnpairedVolumeDataset(tmp_path, patch_size=(8, 8, 8), pipeline="legacy",
                                shuffle_labels=True)
    (ip, lp), _ = ds2.sample_patches(1, epoch=0)[0], None
    assert ip.min() >= -1 and ip.max() <= 1


def test_loader_workers_deterministic_and_parallel(tmp_path):
    """workers=N must (a) yield the exact batch stream of workers=0 and
    (b) actually overlap volume preprocessing (reference
    train.py:52 DataLoader(num_workers))."""
    import time

    from mra_gan_tpu.data.dataset import PatchLoader, UnpairedVolumeDataset

    rng = np.random.RandomState(1)
    for sub in ("images", "labels"):
        (tmp_path / sub).mkdir()
    for i in range(8):
        vol = rng.rand(16, 16, 16).astype(np.float32) * 50 + 1
        for sub in ("images", "labels"):
            nifti.save(nifti.NiftiImage(data=vol, affine=np.eye(4)),
                       tmp_path / sub / f"{i}.nii")
    ds = UnpairedVolumeDataset(tmp_path, patch_size=(8, 8, 8), num_samples=2)

    def stream(workers):
        return list(PatchLoader(ds, batch_size=2, workers=workers).epoch(3))

    base = stream(0)
    for w in (1, 4):
        got = stream(w)
        assert len(got) == len(base)
        for (bi, bl), (gi, gl) in zip(base, got):
            np.testing.assert_array_equal(bi, gi)
            np.testing.assert_array_equal(bl, gl)

    # concurrency: a slow sample_patches must overlap across workers
    class SlowDS:
        num_samples = 1
        seed = 0

        def __len__(self):
            return 8

        def sample_patches(self, idx, epoch=0):
            time.sleep(0.1)
            x = np.full((4, 4, 4, 1), float(idx), np.float32)
            return [(x, x)]

    t0 = time.perf_counter()
    seq = list(PatchLoader(SlowDS(), batch_size=1, shuffle=False, workers=0).epoch(0))
    t_seq = time.perf_counter() - t0
    t0 = time.perf_counter()
    par = list(PatchLoader(SlowDS(), batch_size=1, shuffle=False, workers=4).epoch(0))
    t_par = time.perf_counter() - t0
    assert [b[0][0, 0, 0, 0, 0] for b in seq] == [b[0][0, 0, 0, 0, 0] for b in par]
    assert t_par < t_seq * 0.6, (t_seq, t_par)


def test_native_gather_matches_numpy():
    from mra_gan_tpu.data.dataset import UnpairedVolumeDataset

    vol = np.random.RandomState(2).rand(20, 18, 16).astype(np.float32)
    starts = np.array([[0, 0, 0], [12, 10, 8], [5, 3, 1]], np.int64)
    got = UnpairedVolumeDataset._gather(vol, starts, (8, 8, 8))
    want = np.stack([vol[a:a + 8, b:b + 8, c:c + 8] for a, b, c in starts])
    np.testing.assert_array_equal(got, want)


def test_lr_schedules():
    from mra_gan_tpu.training.schedules import LRScheduler

    s = LRScheduler("lambda", 2e-4, niter=500, niter_decay=100, epoch_count=1)
    assert s.lr_for_epoch(1) == pytest.approx(2e-4)
    assert s.lr_for_epoch(499) == pytest.approx(2e-4)
    # torch steps the scheduler at epoch end, so epoch `niter` is the first
    # decayed epoch: lambda(499) = 1 - 1/101
    assert s.lr_for_epoch(500) == pytest.approx(2e-4 * 100 / 101)
    assert s.lr_for_epoch(600) == pytest.approx(0.0, abs=1e-12)
    s = LRScheduler("step", 1e-3, lr_decay_iters=50)
    assert s.lr_for_epoch(1) == pytest.approx(1e-3)
    assert s.lr_for_epoch(51) == pytest.approx(1e-4)
    s = LRScheduler("cosine", 1e-3, niter=100)
    assert s.lr_for_epoch(1) == pytest.approx(1e-3)
    assert s.lr_for_epoch(51) == pytest.approx(5e-4, rel=0.1)
    s = LRScheduler("plateau", 1e-3)
    lr = 1e-3
    for e in range(1, 10):
        lr = s.lr_for_epoch(e, metric=5.0)  # never improves
    assert lr == pytest.approx(1e-3 * 0.2, rel=1e-6)


def test_crop_background_and_confidence_crop():
    from mra_gan_tpu.data.transforms import confidence_crop, crop_background

    rng = np.random.default_rng(0)
    img = np.zeros((20, 20, 20), np.float32)
    img[5:15, 5:15, 5:15] = 10.0
    lbl = np.zeros_like(img)
    lbl[8:12, 8:12, 8:12] = 1.0
    ci, cl = crop_background(img, lbl, (8, 8, 8))
    assert ci.shape == (8, 8, 8)
    assert ci.mean() > img.mean()  # centered on foreground
    ci2, cl2 = confidence_crop(img, lbl, (8, 8, 8), rng)
    assert ci2.shape == (8, 8, 8) and cl2.shape == (8, 8, 8)
    assert cl2.sum() > 0  # crop lands near label foreground

def test_cache_writer_flush_drains_after_dead_thread(tmp_path):
    """flush() must publish queued writes even when the drain thread is
    gone — a silent early return would make flush_cache_writes() lie and
    warm-cache consumers (bench, tests) measure a cold cache."""
    from mra_gan_tpu.data.dataset import _AsyncCacheWriter

    w = _AsyncCacheWriter()
    path = tmp_path / "x.npy"
    arr = np.arange(6, dtype=np.float32)
    # enqueue as submit() would, but with no drain thread ever started
    # (equivalent to the thread having died before the write)
    with w._lock:
        w._pending[path] = arr
    w._q.put((path, arr))
    w.flush()
    assert path.exists()
    np.testing.assert_array_equal(np.load(path), arr)
    assert w.get_pending(path) is None


def test_preprocess_mixed_pending_and_disk(tmp_path):
    """Cache lookup is per-file across {pending, disk}: with the image half
    already published and the label half still in the async writer, the
    sampler must NOT re-run full preprocessing (re-reading the NIfTI and
    re-submitting writes) — the exact window the async writer creates."""
    from mra_gan_tpu.data import dataset as dsmod
    from mra_gan_tpu.data.dataset import (UnpairedVolumeDataset,
                                          flush_cache_writes)

    rng = np.random.RandomState(0)
    for sub in ("images", "labels"):
        (tmp_path / sub).mkdir()
        vol = rng.rand(12, 12, 12).astype(np.float32) * 100 + 1
        nifti.save(nifti.NiftiImage(data=vol, affine=np.eye(4)),
                   tmp_path / sub / "0.nii")
    ds = UnpairedVolumeDataset(tmp_path, patch_size=(8, 8, 8),
                               pipeline="monai",
                               cache_dir=str(tmp_path / "cache"))
    img, lbl = ds._preprocess(0, 0)
    flush_cache_writes()
    ck = ds._cache_key(ds.image_paths[0], ds.label_paths[0])
    lp = ck.with_suffix(".label.npy")
    assert lp.exists()
    # re-create the half-published state: label only pending, image on disk
    lbl_arr = np.array(lbl)
    lp.unlink()
    with dsmod._CACHE_WRITER._lock:
        dsmod._CACHE_WRITER._pending[lp] = lbl_arr
    try:
        ds._load = _boom  # any reprocess would re-read the NIfTI
        img2, lbl2 = ds._preprocess(0, 0)
        np.testing.assert_array_equal(np.asarray(img2), np.asarray(img))
        np.testing.assert_array_equal(np.asarray(lbl2), lbl_arr)
    finally:
        with dsmod._CACHE_WRITER._lock:
            dsmod._CACHE_WRITER._pending.pop(lp, None)


def _boom(*a, **k):
    raise AssertionError("full preprocessing re-ran on a cached pair")
