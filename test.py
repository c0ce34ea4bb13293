"""Inference CLI — the reference's ``python test.py`` full-volume workflow
(reference test.py:38-218) rebuilt TPU-native:

read NIfTI → 0-255 normalize → optional resample → pad to patch →
sliding-window decode (ONE jitted scan on device, Gaussian or uniform
blending) → rescale → resample back to the original grid → write NIfTI in
the original physical space.

Direction selection is --model_suffix _A (A->B) or _B (B->A), the mechanized
version of the reference's checkpoint-renaming instruction
(reference README.md:82-83, models/test_model.py:17).
"""
from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mra_gan_tpu.checkpoint import CheckpointManager
from mra_gan_tpu.data import nifti
from mra_gan_tpu.data.transforms import (
    from_tanh_range,
    pad_to_size,
    resample_to_reference,
    resample_to_spacing,
    rescale_0_255,
    to_tanh_range,
)
from mra_gan_tpu.infer import sliding_window_inference
from mra_gan_tpu.models.cycle_gan import make_generate_fn
from mra_gan_tpu.options import TestOptions


def load_generator(opt):
    """Restore the requested generator once: (cfg, jitted forward, params,
    net module). Raw restore — inference must not depend on the
    discriminator/optimizer config the model was trained with. The net
    module is built HERE, once: single_pass_apply and
    sharded_generator_apply cache compiled programs on the module's
    identity, so directory batch mode must hand every volume the same
    object or it re-traces per volume."""
    from train import config_from_opt

    cfg = config_from_opt(opt)
    ckpt = CheckpointManager(opt.checkpoints_dir, opt.name)
    tree = ckpt.restore_raw(opt.which_epoch)
    which = {"_A": "g_a", "_B": "g_b"}[opt.model_suffix]
    gen = make_generate_fn(cfg, which)
    params = jax.tree.map(jnp.asarray, tree["g_params"][which])
    gen_fn = jax.jit(lambda x: gen(params, x))
    g_a, g_b, _, _ = cfg.build_nets()
    net = {"_A": g_a, "_B": g_b}[opt.model_suffix]
    return cfg, gen_fn, params, net


def inference(opt, loaded=None, img=None, save_pool=None, save_futures=None,
              save=True):
    # `loaded` lets batch (directory) mode restore the checkpoint and build
    # gen_fn ONCE — the decode-program cache keys on id(gen_fn), so reusing
    # it is what makes same-geometry volumes decode without re-tracing.
    # `img` is an optional pre-loaded NiftiImage (directory mode prefetches
    # the next volume's read on a thread while the current one decodes);
    # `save_pool`/`save_futures` likewise move the output write (~1.4 s of
    # host gzip per .nii.gz volume — longer than the decode) off the
    # critical path: the (result path, Future) pairs land in save_futures
    # and the caller drains them.
    cfg, gen_fn, params, net = loaded if loaded is not None else load_generator(opt)
    patch = tuple(int(p) for p in opt.patch_size)

    # --- read + preprocess (legacy convention: 0-255 then [-1,1],
    #     reference test.py:56,152) ---
    if img is None:
        img = nifti.load(opt.image)
    original = img
    data = rescale_0_255(img.data)
    work = nifti.NiftiImage(data=data, affine=img.affine)
    if opt.resample:
        work = resample_to_spacing(work, opt.new_resolution, "bspline")
    pre_pad_shape = work.data.shape
    # 'reference' = zero-extend at the high side of each axis, the exact
    # numeric equivalent of the reference's same-spacing BSpline Padding
    # (reference utils/NiftiDataset.py:876-932, see transforms.pad_to_size);
    # 'symmetric' centers the content instead.
    pad_where = "end" if opt.pad_mode == "reference" else "symmetric"
    fronts = [0, 0, 0]
    if pad_where == "symmetric":
        fronts = [max(0, patch[a] - pre_pad_shape[a]) // 2 for a in range(3)]
    vol = pad_to_size(work.data, patch, where=pad_where)
    # the reference additionally edge-pads an odd Z dim to even BEFORE
    # building the patch grid and crops the extra slice after decoding
    # (reference test.py:96-103,181-182) — reproduce under pad_mode
    # 'reference' so the grids (and therefore the overlap averages) match
    odd_z = pad_where == "end" and vol.shape[2] % 2 == 1
    if odd_z:
        vol = np.pad(vol, ((0, 0), (0, 0), (0, 1)), mode="edge")
    vol = to_tanh_range(vol)

    # --- decode ---
    t0 = time.time()
    if getattr(opt, "single_pass", False):
        # whole-volume generator forward on one chip (~256^2x128 at ngf=32
        # fits; use --spatial_shard to split larger volumes over a mesh)
        from mra_gan_tpu.parallel.spatial import single_pass_apply

        out = single_pass_apply(net, params, vol)
    elif opt.spatial_shard and len(jax.devices()) > 1:
        # single-pass whole-volume forward, volume depth-sharded over the
        # mesh with halo-exchange convs (no patching, no seams)
        from mra_gan_tpu.core.mesh import make_mesh
        from mra_gan_tpu.parallel.spatial import sharded_generator_apply

        from mra_gan_tpu.models.networks import spatial_granularity

        mesh = make_mesh()
        n = mesh.shape["data"]
        shp = vol.shape
        g = spatial_granularity(net)
        mult = (g[0] * n, g[1], g[2])
        pads = [(-len_ % m) for len_, m in zip(shp, mult)]
        volp = np.pad(vol, [(0, p) for p in pads], mode="edge")
        out = sharded_generator_apply(mesh, net, params, volp)
        out = out[: shp[0], : shp[1], : shp[2]]
    elif opt.data_parallel and len(jax.devices()) > 1:
        from mra_gan_tpu.core.mesh import make_mesh
        from mra_gan_tpu.parallel.spatial import sharded_sliding_window

        out = sharded_sliding_window(
            make_mesh(), vol, gen_fn, patch_size=patch,
            stride_inplane=opt.stride_inplane, stride_layer=opt.stride_layer,
            blend=opt.blend)
    else:
        # bfloat16 upload is only a no-op when the generator computes in
        # bfloat16 (its first op casts the input anyway); under
        # --precision float32 every mode must upload float32 — an f16
        # UPLOAD would perturb the input by ~2e-4, which instance norms
        # amplify to O(1e-2) output drift (see sliding_window docstring).
        # Only the DOWNLOAD leg is ever f16.
        bf16_net = getattr(opt, "precision", "bfloat16") == "bfloat16"
        up = jnp.bfloat16 if bf16_net else np.float32
        wire = {"exact": (np.float32, up),
                "f32": (np.float32, np.float32),
                "f16": (np.float16, up)}[getattr(opt, "wire", "exact")]
        out = sliding_window_inference(
            vol,
            gen_fn,
            patch_size=patch,
            stride_inplane=opt.stride_inplane,
            stride_layer=opt.stride_layer,
            blend=opt.blend,
            batch=getattr(opt, "decode_batch", 8),
            transfer_dtype=wire[0],
            input_transfer_dtype=wire[1],
        )
    out = from_tanh_range(out)
    mode = ("single-pass" if getattr(opt, "single_pass", False) else
            "sharded single-pass" if opt.spatial_shard and len(jax.devices()) > 1
            else "sliding-window")
    print(f"{mode} decode: {time.time() - t0:.2f}s "
          f"({vol.shape} vol, {patch} patches)")

    # --- un-pad (offset by any front padding), restore physical space, write ---
    out = out[fronts[0]: fronts[0] + pre_pad_shape[0],
              fronts[1]: fronts[1] + pre_pad_shape[1],
              fronts[2]: fronts[2] + pre_pad_shape[2]]
    result = nifti.NiftiImage(data=np.asarray(out, np.float32),
                              affine=work.affine)
    if opt.resample:
        result = resample_to_reference(result, original, "bspline")
    if not save:
        pass  # caller owns the write (serve.py's atomic path)
    elif save_pool is not None:
        save_futures.append((opt.result,
                             save_pool.submit(nifti.save, result, opt.result)))
    else:
        nifti.save(result, opt.result)
        print(f"wrote {opt.result}")
    return result


def main(argv=None):
    # parse before any backend-initializing call (see train.py main)
    opt = TestOptions().parse(argv)
    from mra_gan_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    img_path = Path(opt.image)
    if img_path.is_dir():
        # batch mode: decode every NIfTI in the directory into the result
        # directory (same filenames). Same-geometry volumes reuse the cached
        # compiled decode, so throughput is ~per-volume decode time after
        # the first. (The reference's test.py handles one image per run.)
        out_dir = Path(opt.result)
        out_dir.mkdir(parents=True, exist_ok=True)
        files = sorted(p for p in img_path.iterdir()
                       if p.name.endswith((".nii", ".nii.gz")))
        if not files:
            raise SystemExit(f"no .nii/.nii.gz files in {img_path}")
        import argparse
        from concurrent.futures import ThreadPoolExecutor

        loaded = load_generator(opt)
        failed = []
        # Two IO threads overlap the host legs with the device decode: one
        # prefetches the NEXT volume's read while the current one decodes,
        # the other drains output writes (gzip of a 256^2x128 .nii.gz costs
        # ~1.4 s host-side — more than the decode itself, so serial IO more
        # than halves directory throughput). nifti's gzip/numpy work releases
        # the GIL for its bulk, so the threads genuinely run beside the
        # decode's host loop.
        with ThreadPoolExecutor(max_workers=2) as io_pool:
            save_futures = []

            def finish_save(res_path, fut):
                try:
                    fut.result()
                    print(f"wrote {res_path}")
                except Exception as e:
                    print(f"FAILED WRITE {res_path}: {e}")
                    failed.append(Path(res_path).name)

            def drain_saves(block, max_pending=4):
                remaining = []
                for res_path, fut in save_futures:
                    if not block and not fut.done():
                        remaining.append((res_path, fut))
                        continue
                    finish_save(res_path, fut)
                # backpressure: each pending write holds a full float
                # volume; when decode outruns the 2-thread writer, block on
                # the oldest instead of accumulating volumes in RAM
                while not block and len(remaining) > max_pending:
                    finish_save(*remaining.pop(0))
                save_futures[:] = remaining

            next_img, next_idx = io_pool.submit(nifti.load, str(files[0])), 0
            for i, p in enumerate(files):
                sub = argparse.Namespace(**vars(opt))
                sub.image = str(p)
                sub.result = str(out_dir / p.name)
                try:
                    img = (next_img.result() if next_idx == i
                           else nifti.load(str(p)))
                    if i + 1 < len(files):
                        next_img = io_pool.submit(nifti.load,
                                                  str(files[i + 1]))
                        next_idx = i + 1
                    inference(sub, loaded, img=img, save_pool=io_pool,
                              save_futures=save_futures)
                except Exception as e:
                    # per-volume failure — over-limit geometry refused by
                    # the HBM preflight (RuntimeError), a corrupt/truncated
                    # file (gzip/struct/ValueError from nifti.load), etc. —
                    # the rest of the directory can still decode
                    print(f"SKIPPED {p.name}: {type(e).__name__}: {e}")
                    failed.append(p.name)
                drain_saves(block=False)
            drain_saves(block=True)
        if failed:
            print(f"{len(failed)}/{len(files)} volumes skipped: "
                  + ", ".join(failed))
        return None
    return inference(opt)


if __name__ == "__main__":
    main()
