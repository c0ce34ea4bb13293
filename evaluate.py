"""Evaluation CLI: SSIM / PSNR / MAE / Pearson-r between two NIfTI volumes
(e.g. a synthesized fake vs. the ground-truth target). The reference only
offers visual inspection (reference README.md:85-92); this is the
quantitative counterpart BASELINE.md's contract requires.

Usage: python evaluate.py --pred fake_B.nii --target real_B.nii [--mask-fg]
       python evaluate.py --pred fakes_dir/ --target reals_dir/   (batch:
       pairs matched by filename; prints per-file lines + a 'mean' row)
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

from mra_gan_tpu.data import nifti
from mra_gan_tpu.data.transforms import resample_to_reference
from mra_gan_tpu.utils.metrics import volume_metrics


def _evaluate_pair(pred_path, targ_path, mask_fg: bool) -> dict:
    pred = nifti.load(pred_path)
    targ = nifti.load(targ_path)
    if pred.data.shape != targ.data.shape:
        pred = resample_to_reference(pred, targ)
    a = pred.data.astype(np.float32)
    b = targ.data.astype(np.float32)
    # ONE compiled program per pair (same-shape directories reuse it) —
    # the previous eager per-metric calls dispatched each op separately and
    # recompiled op-by-op on the first pair (~14 s vs ~0.3 s warm, measured
    # on 256x256x128). --mask-fg restricts the intensity metrics to the
    # b>0 foreground via the weighted-sum forms (jit-safe dynamic masks).
    out = volume_metrics(a, b, mask=(b > 0) if mask_fg else None,
                         use_mask=mask_fg)
    return {k: float(v) for k, v in out.items()}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pred", required=True,
                   help="synthesized volume (.nii), or a directory of them")
    p.add_argument("--target", required=True,
                   help="reference volume (.nii), or a directory (pairs "
                        "matched by filename)")
    p.add_argument("--mask-fg", action="store_true",
                   help="restrict intensity metrics to target>0 foreground")
    args = p.parse_args(argv)
    # persistent XLA compile cache like the other CLIs: the fused metrics
    # program costs ~43 s to compile over the tunnel on first use
    from mra_gan_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    pred_path, targ_path = Path(args.pred), Path(args.target)
    if pred_path.is_dir():
        def _stem(name):
            # match basenames modulo the .nii/.nii.gz suffix difference
            return name[:-7] if name.endswith(".nii.gz") else name[:-4]

        def _index(d):
            out = {}
            for f in sorted(d.iterdir()):
                if not f.name.endswith((".nii", ".nii.gz")):
                    continue
                stem = _stem(f.name)
                if stem in out:
                    # a.nii AND a.nii.gz present: refusing beats silently
                    # evaluating only one of them
                    raise SystemExit(
                        f"ambiguous pair in {d}: {out[stem].name} and "
                        f"{f.name} share the basename {stem!r}")
                out[stem] = f
            return out

        preds, targs = _index(pred_path), _index(targ_path)
        stems = sorted(preds.keys() & targs.keys())
        # never silently average over a subset: name every unmatched file
        for side, only in (("prediction", sorted(preds.keys() - targs.keys())),
                           ("target", sorted(targs.keys() - preds.keys()))):
            if only:
                print(f"WARNING: {len(only)} {side} file(s) without a "
                      f"counterpart, excluded from the mean: "
                      f"{', '.join(only[:10])}"
                      f"{' ...' if len(only) > 10 else ''}", file=sys.stderr)
        if not stems:
            raise SystemExit(
                f"no matching .nii pairs between {pred_path} and {targ_path}")
        rows = []
        for s in stems:
            row = _evaluate_pair(preds[s], targs[s], args.mask_fg)
            print(json.dumps({"file": preds[s].name, **row}))
            rows.append(row)
        out = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
        print(json.dumps({"file": "mean", **out}))
        return out

    out = _evaluate_pair(pred_path, targ_path, args.mask_fg)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
