"""Dataset organization CLI — the reference's offline data prep
(reference organize_folder_structure.py:143-253): list raw image/label
NIfTIs, register label->reference then image->label (gradient-feature
mutual-information affine — here run as jitted JAX optimization instead of
SimpleITK), force a common spacing, and write
``train|test/images|labels/<i>.nii``.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from mra_gan_tpu.data import nifti
from mra_gan_tpu.data.dataset import list_nifti
from mra_gan_tpu.data.registration import apply_transform, register_affine
from mra_gan_tpu.data.transforms import resample_to_spacing


def parse_args(argv=None):
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--images", type=str, required=True, help="directory of raw image volumes")
    p.add_argument("--labels", type=str, required=True, help="directory of raw label volumes")
    p.add_argument("--out", type=str, default="./Data_folder", help="output root")
    p.add_argument("--split", type=int, default=2, help="number of volumes held out for test")
    p.add_argument("--resolution", type=float, nargs=3, default=None,
                   help="force this voxel spacing on outputs")
    p.add_argument("--register", action="store_true", default=True,
                   help="affine-register label->reference and image->label")
    p.add_argument("--no-register", dest="register", action="store_false")
    p.add_argument("--iters", type=int, default=100, help="registration iters per pyramid level")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    images = list_nifti(args.images)
    labels = list_nifti(args.labels)
    if len(images) != len(labels):
        raise SystemExit(f"count mismatch: {len(images)} images vs {len(labels)} labels")
    n = len(images)
    n_train = n - args.split
    print(f"{n} pairs -> {n_train} train / {args.split} test")

    reference = nifti.load(labels[0])

    out = Path(args.out)
    for split, lo, hi in (("train", 0, n_train), ("test", n_train, n)):
        for sub in ("images", "labels"):
            (out / split / sub).mkdir(parents=True, exist_ok=True)
        for i in range(lo, hi):
            img = nifti.load(images[i])
            lbl = nifti.load(labels[i])
            if args.register:
                # label -> reference frame, then image -> registered label
                # (reference organize_folder_structure.py:199-200)
                p1 = register_affine(reference.data.astype(np.float32),
                                     lbl.data.astype(np.float32),
                                     iters_per_level=args.iters)
                lbl_data = apply_transform(lbl.data.astype(np.float32), p1,
                                           reference.data.shape[:3])
                lbl = nifti.NiftiImage(data=lbl_data, affine=reference.affine.copy())
                p2 = register_affine(lbl.data, img.data.astype(np.float32),
                                     iters_per_level=args.iters)
                img_data = apply_transform(img.data.astype(np.float32), p2,
                                           lbl.data.shape[:3])
                img = nifti.NiftiImage(data=img_data, affine=reference.affine.copy())
            if args.resolution:
                img = resample_to_spacing(img, args.resolution)
                lbl = resample_to_spacing(lbl, args.resolution)
            j = i - lo
            nifti.save(img, out / split / "images" / f"{j}.nii")
            nifti.save(lbl, out / split / "labels" / f"{j}.nii")
            print(f"[{split}] wrote pair {j} (shape {img.data.shape})")


if __name__ == "__main__":
    main()
