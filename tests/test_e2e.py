"""End-to-end CLI test: organize -> train -> resume -> infer -> evaluate on
synthetic NIfTIs (the BASELINE 'Smoke' config scale)."""
import shutil

import numpy as np
import pytest

from mra_gan_tpu.data import nifti


@pytest.fixture()
def data_root(tmp_path):
    rng = np.random.RandomState(0)
    for sub in ("train/images", "train/labels", "test/images"):
        (tmp_path / sub).mkdir(parents=True)
    for i in range(2):
        base = rng.rand(24, 24, 24).astype(np.float32) * 80 + 10
        nifti.save(nifti.NiftiImage(data=base, affine=np.eye(4)),
                   tmp_path / f"train/images/{i}.nii")
        nifti.save(nifti.NiftiImage(data=base * 0.7 + 5, affine=np.eye(4)),
                   tmp_path / f"train/labels/{i}.nii")
    nifti.save(nifti.NiftiImage(data=rng.rand(26, 24, 22).astype(np.float32) * 80,
                                affine=np.diag([1.0, 1.0, 2.0, 1.0])),
               tmp_path / "test/images/0.nii")
    return tmp_path


SMALL = ["--patch_size", "16", "16", "16", "--ngf", "4", "--ndf", "4",
         "--n_layers_D", "1", "--precision", "float32"]


def test_train_resume_infer_evaluate(data_root):
    import sys
    sys.path.insert(0, "/root/repo")
    import train as train_cli
    import test as test_cli
    import evaluate as eval_cli

    ck = str(data_root / "ck")
    common = ["--data_path", str(data_root / "train"), "--checkpoints_dir", ck,
              "--name", "e2e", *SMALL, "--pool_size", "2", "--batch_size", "2",
              "--print_freq", "2", "--save_epoch_freq", "1"]
    train_cli.main(common + ["--niter", "1", "--niter_decay", "0",
                             "--dump_patches", "3"])
    assert (data_root / "ck/e2e/ckpt_latest").exists()
    assert (data_root / "ck/e2e/loss_log.txt").read_text().count("epoch: 1") >= 1
    assert (data_root / "ck/e2e/opt.txt").exists()

    # --dump_patches: first N sampled pairs written as NIfTI (the mechanized
    # form of the reference's commented dump blocks, reference train.py:83-107)
    dumps = sorted((data_root / "ck/e2e/patch_dumps").glob("*.nii.gz"))
    assert [p.name for p in dumps] == [
        f"patch_{i:04d}_{t}.nii.gz" for i in range(3) for t in ("A", "B")]
    d0 = nifti.load(dumps[0])
    assert d0.data.shape == (16, 16, 16)  # the training patch size
    assert np.isfinite(d0.data).all()

    # exact resume: continue one more epoch from 'latest'
    train_cli.main(common + ["--niter", "2", "--niter_decay", "0",
                             "--continue_train", "--epoch_count", "2"])

    out = str(data_root / "fake.nii")
    test_cli.main(["--image", str(data_root / "test/images/0.nii"),
                   "--result", out, "--checkpoints_dir", ck, "--name", "e2e",
                   *SMALL, "--stride_inplane", "8", "--stride_layer", "8"])
    res = nifti.load(out)
    inp = nifti.load(data_root / "test/images/0.nii")
    assert res.data.shape == inp.data.shape
    np.testing.assert_allclose(res.affine, inp.affine, atol=1e-5)

    # --wire f16 on a float32 net must only quantize the DOWNLOAD leg
    # (an f16 upload would be amplified ~100x by the instance norms)
    out_w = str(data_root / "fake_w16.nii")
    test_cli.main(["--image", str(data_root / "test/images/0.nii"),
                   "--result", out_w, "--checkpoints_dir", ck, "--name", "e2e",
                   *SMALL, "--stride_inplane", "8", "--stride_layer", "8",
                   "--wire", "f16"])
    res_w = nifti.load(out_w)
    # pure f16 output quantization on [-1,1] rescaled to 0-255: <= ~0.1
    assert float(np.abs(res_w.data - res.data).max()) < 0.2

    metrics = eval_cli.main(["--pred", out,
                             "--target", str(data_root / "test/images/0.nii")])
    assert set(metrics) == {"ssim", "psnr", "mae", "pearson_r"}
    assert np.isfinite(list(metrics.values())).all()

    # single-pass depth-sharded whole-volume decode over the 8-device mesh
    out_ss = str(data_root / "fake_shard.nii")
    test_cli.main(["--image", str(data_root / "test/images/0.nii"),
                   "--result", out_ss, "--checkpoints_dir", ck, "--name", "e2e",
                   *SMALL, "--spatial_shard"])
    res_ss = nifti.load(out_ss)
    assert res_ss.data.shape == inp.data.shape

    # one-chip whole-volume single pass: same generator, no patching — must
    # closely match the sharded single pass (identical math up to sharding
    # reassociation and the depth padding granularity)
    out_1p = str(data_root / "fake_single.nii")
    test_cli.main(["--image", str(data_root / "test/images/0.nii"),
                   "--result", out_1p, "--checkpoints_dir", ck, "--name", "e2e",
                   *SMALL, "--single_pass"])
    res_1p = nifti.load(out_1p)
    assert res_1p.data.shape == inp.data.shape
    assert np.isfinite(res_1p.data).all()
    # the sharded single pass and the sliding-window decode agree where the
    # window decode is seam-free (identical generator, full-volume context
    # differs only through instance-norm stats — loose tolerance)
    assert np.isfinite(res_ss.data).all()

    # sub-patch volume: reference-parity end-padding must round-trip the
    # original field of view (both pad modes)
    small = data_root / "test/images/small.nii"
    nifti.save(nifti.NiftiImage(
        data=np.random.RandomState(1).rand(10, 12, 14).astype(np.float32) * 80,
        affine=np.eye(4)), small)
    for mode in ("reference", "symmetric"):
        out_s = str(data_root / f"fake_small_{mode}.nii")
        test_cli.main(["--image", str(small), "--result", out_s,
                       "--checkpoints_dir", ck, "--name", "e2e", *SMALL,
                       "--stride_inplane", "8", "--stride_layer", "8",
                       "--pad_mode", mode])
        res_s = nifti.load(out_s)
        assert res_s.data.shape == (10, 12, 14)
        assert np.isfinite(res_s.data).all()


def test_train_data_parallel_cli(data_root):
    """train.py --data_parallel end-to-end on the 8-virtual-device CPU mesh
    (conftest), incl. the batch-divisibility guard."""
    import sys
    sys.path.insert(0, "/root/repo")
    import train as train_cli

    ck = str(data_root / "ck_dp")
    common = ["--data_path", str(data_root / "train"), "--checkpoints_dir", ck,
              "--name", "dp", *SMALL, "--pool_size", "2", "--data_parallel",
              "--num_samples", "4", "--niter", "1", "--niter_decay", "0",
              "--save_epoch_freq", "1", "--augment", "--workers", "2"]
    with pytest.raises(SystemExit, match="divisible"):
        train_cli.main(common + ["--batch_size", "3"])
    train_cli.main(common + ["--batch_size", "8"])
    assert (data_root / "ck_dp/dp/ckpt_latest").exists()
    assert (data_root / "ck_dp/dp/loss_log.txt").exists()


def test_organize_and_check_patches(data_root, tmp_path):
    import sys
    sys.path.insert(0, "/root/repo")
    import organize_folder_structure as org
    import check_loader_patches as chk

    out_root = tmp_path / "organized"
    org.main(["--images", str(data_root / "train/images"),
              "--labels", str(data_root / "train/labels"),
              "--out", str(out_root), "--split", "1", "--no-register"])
    assert (out_root / "train/images/0.nii").exists()
    assert (out_root / "test/images/0.nii").exists()

    png = tmp_path / "patches.png"
    chk.main(["--data_path", str(out_root / "train"), "--patch_size", "8", "8", "8",
              "--index", "0", "--out", str(png)])
    assert png.exists() and png.stat().st_size > 1000


def test_train_spatial_parallel_cli(data_root):
    """train.py --spatial_parallel end-to-end on the 8-virtual-device CPU
    mesh: every patch depth-sharded across devices (32 = 4*8), incl. the
    depth-divisibility guard."""
    import sys
    sys.path.insert(0, "/root/repo")
    import train as train_cli

    ck = str(data_root / "ck_sp")
    common = ["--data_path", str(data_root / "train"), "--checkpoints_dir", ck,
              "--name", "sp", "--ngf", "4", "--ndf", "4", "--n_layers_D", "1",
              "--precision", "float32", "--pool_size", "2",
              "--spatial_parallel", "--batch_size", "1", "--niter", "1",
              "--niter_decay", "0", "--save_epoch_freq", "1",
              "--print_freq", "2"]
    with pytest.raises(SystemExit, match="divisible"):
        train_cli.main(common + ["--patch_size", "16", "16", "16"])
    train_cli.main(common + ["--patch_size", "32", "16", "16"])
    assert (data_root / "ck_sp/sp/ckpt_latest").exists()
    log = (data_root / "ck_sp/sp/loss_log.txt").read_text()
    assert "cycle_A" in log


def test_train_dp_x_sp_cli(data_root):
    """train.py --data_parallel --spatial_parallel --space_devices 4: 2-D
    mesh (2 data x 4 space) on the 8-virtual-device CPU mesh."""
    import sys
    sys.path.insert(0, "/root/repo")
    import train as train_cli

    ck = str(data_root / "ck_dpsp")
    common = ["--data_path", str(data_root / "train"), "--checkpoints_dir", ck,
              "--name", "dpsp", "--ngf", "4", "--ndf", "4", "--n_layers_D", "1",
              "--precision", "float32", "--pool_size", "2",
              "--data_parallel", "--spatial_parallel", "--batch_size", "2",
              "--patch_size", "16", "16", "16", "--niter", "1",
              "--niter_decay", "0", "--save_epoch_freq", "1",
              "--print_freq", "2"]
    with pytest.raises(SystemExit, match="space_devices"):
        train_cli.main(common)
    train_cli.main(common + ["--space_devices", "4"])
    assert (data_root / "ck_dpsp/dpsp/ckpt_latest").exists()
    assert "cycle_A" in (data_root / "ck_dpsp/dpsp/loss_log.txt").read_text()


def test_batch_directory_inference(data_root):
    """test.py --image <dir> decodes every volume into the result dir."""
    import sys
    sys.path.insert(0, "/root/repo")
    import test as test_cli
    import train as train_cli

    ck = str(data_root / "ck_dir")
    train_cli.main(["--data_path", str(data_root / "train"),
                    "--checkpoints_dir", ck, "--name", "d", *SMALL,
                    "--pool_size", "2", "--niter", "1", "--niter_decay", "0",
                    "--save_epoch_freq", "1"])
    # a corrupt volume in the directory must be skipped (any load/decode
    # exception, not just RuntimeError), never abort the sweep
    in_dir = data_root / "batch_in"
    in_dir.mkdir()
    for p in (data_root / "train/images").iterdir():
        shutil.copy(p, in_dir / p.name)
    (in_dir / "corrupt.nii").write_bytes(b"not a nifti")
    out_dir = data_root / "batch_out"
    test_cli.main(["--image", str(in_dir),
                   "--result", str(out_dir), "--checkpoints_dir", ck,
                   "--name", "d", *SMALL, "--stride_inplane", "8",
                   "--stride_layer", "8"])
    assert not (out_dir / "corrupt.nii").exists()
    for i in range(2):
        res = nifti.load(out_dir / f"{i}.nii")
        assert res.data.shape == (24, 24, 24)
        assert np.isfinite(res.data).all()


def test_evaluate_directory_mode(data_root):
    """evaluate.py with directories: per-file rows + a mean row."""
    import sys
    sys.path.insert(0, "/root/repo")
    import evaluate as eval_cli

    out = eval_cli.main(["--pred", str(data_root / "train/images"),
                         "--target", str(data_root / "train/labels")])
    assert set(out) == {"ssim", "psnr", "mae", "pearson_r"}
    assert np.isfinite(list(out.values())).all()


def test_organize_register_default_path(tmp_path):
    """The organizer's DEFAULT path (--register) end-to-end on structured,
    deliberately misaligned volumes: after organizing, each written image
    must be realigned to its label (reference
    organize_folder_structure.py:199-200 registers label->reference then
    image->label)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import organize_folder_structure as org
    from scipy import ndimage as ndi

    rs = np.random.RandomState(2)
    shape = (24, 24, 24)
    ii, jj, kk = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape],
                             indexing="ij")

    def scene(shift):
        vol = ndi.gaussian_filter(rs.rand(*shape).astype(np.float32), 2.5) * 20
        for c, amp in (((8, 14, 10), 80), ((16, 9, 15), 60), ((12, 17, 7), 70)):
            r2 = ((ii - c[0] - shift[0]) ** 2 + (jj - c[1] - shift[1]) ** 2
                  + (kk - c[2] - shift[2]) ** 2)
            vol += amp * np.exp(-r2 / 10.0)
        return vol

    for sub in ("raw/images", "raw/labels"):
        (tmp_path / sub).mkdir(parents=True)
    for i in range(2):
        nifti.save(nifti.NiftiImage(data=scene((2.0, -1.5, 1.0)),
                                    affine=np.eye(4)),
                   tmp_path / f"raw/images/{i}.nii")
        nifti.save(nifti.NiftiImage(data=scene((0.0, 0.0, 0.0)),
                                    affine=np.eye(4)),
                   tmp_path / f"raw/labels/{i}.nii")

    out_root = tmp_path / "organized"
    org.main(["--images", str(tmp_path / "raw/images"),
              "--labels", str(tmp_path / "raw/labels"),
              "--out", str(out_root), "--split", "1", "--iters", "80"])

    for split in ("train", "test"):
        img = nifti.load(out_root / split / "images/0.nii").data
        lbl = nifti.load(out_root / split / "labels/0.nii").data
        assert np.isfinite(img).all() and np.isfinite(lbl).all()
        sl = tuple(slice(4, -4) for _ in range(3))
        r = np.corrcoef(np.asarray(img)[sl].ravel(),
                        np.asarray(lbl)[sl].ravel())[0, 1]
        # the raw pairs start visibly misaligned (r ~ 0.5-0.7 between the
        # shifted scenes); registration must bring them into alignment
        assert r > 0.93, f"{split}: post-registration correlation {r:.3f}"


def test_plateau_metric_decoupled_from_print_freq(data_root, monkeypatch):
    """The plateau scheduler's metric is the epoch mean of every step's
    total loss — with print_freq far above the epoch's step count the
    scheduler must still receive a real metric (round-2 bug: last_metric
    only updated on print steps, so plateau saw None/stale values; the
    reference's own plateau is unusable — base_model.py:66-67 calls
    scheduler.step() without a metric, a TypeError for ReduceLROnPlateau)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import train as train_cli
    from mra_gan_tpu.training.schedules import LRScheduler

    seen = []

    class Recording(LRScheduler):
        def lr_for_epoch(self, epoch, metric=None):
            seen.append((epoch, metric))
            return super().lr_for_epoch(epoch, metric=metric)

    monkeypatch.setattr(train_cli, "LRScheduler", Recording)
    ck = str(data_root / "ck_plateau")
    train_cli.main(["--data_path", str(data_root / "train"),
                    "--checkpoints_dir", ck, "--name", "pl", *SMALL,
                    "--pool_size", "2", "--batch_size", "2",
                    "--lr_policy", "plateau", "--print_freq", "100000",
                    "--niter", "2", "--niter_decay", "0",
                    "--save_epoch_freq", "2"])
    by_epoch = dict(seen)
    assert by_epoch[1] is None  # nothing measured before the first epoch
    assert by_epoch[2] is not None and np.isfinite(by_epoch[2])
