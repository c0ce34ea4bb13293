"""Evaluation CLI: SSIM / PSNR / MAE / Pearson-r between two NIfTI volumes
(e.g. a synthesized fake vs. the ground-truth target). The reference only
offers visual inspection (reference README.md:85-92); this is the
quantitative counterpart BASELINE.md's contract requires.

Usage: python evaluate.py --pred fake_B.nii --target real_B.nii [--mask-fg]
"""
from __future__ import annotations

import argparse
import json

import numpy as np

from mra_gan_tpu.data import nifti
from mra_gan_tpu.data.transforms import resample_to_reference
from mra_gan_tpu.utils.metrics import mae, pearson_r, psnr, ssim3d


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pred", required=True, help="synthesized volume (.nii)")
    p.add_argument("--target", required=True, help="reference volume (.nii)")
    p.add_argument("--mask-fg", action="store_true",
                   help="restrict intensity metrics to target>0 foreground")
    args = p.parse_args(argv)

    pred = nifti.load(args.pred)
    targ = nifti.load(args.target)
    if pred.data.shape != targ.data.shape:
        pred = resample_to_reference(pred, targ)
    a = pred.data.astype(np.float32)
    b = targ.data.astype(np.float32)
    if args.mask_fg:
        m = b > 0
        a_m, b_m = a[m], b[m]
    else:
        a_m, b_m = a, b

    out = {
        "ssim": float(ssim3d(a, b)),
        "psnr": float(psnr(a_m, b_m)),
        "mae": float(mae(a_m, b_m)),
        "pearson_r": float(pearson_r(a_m, b_m)),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
