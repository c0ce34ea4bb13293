"""Training CLI — the reference's ``python train.py`` workflow
(reference train.py:20-147) rebuilt TPU-native:

- one jitted XLA program per train step (G+D+pools+Adam fused);
- optional --data_parallel shards the batch over all devices;
- exact resume (params + optimizer + pool + step via Orbax);
- loss_log.txt / opt.txt outputs match the reference's observability.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from mra_gan_tpu.checkpoint import CheckpointManager
from mra_gan_tpu.core import get_policy
from mra_gan_tpu.data.dataset import PatchLoader, UnpairedVolumeDataset
from mra_gan_tpu.models.cycle_gan import CycleGANConfig, create_state, make_train_step
from mra_gan_tpu.options import TrainOptions
from mra_gan_tpu.training.schedules import LRScheduler
from mra_gan_tpu.utils import StepTimer, Visualizer, print_networks


def config_from_opt(opt) -> CycleGANConfig:
    return CycleGANConfig(
        input_nc=opt.input_nc,
        output_nc=opt.output_nc,
        ngf=opt.ngf,
        ndf=opt.ndf,
        net_g=opt.netG,
        net_d=opt.netD,
        n_layers_d=opt.n_layers_D,
        norm=opt.norm,
        no_dropout=opt.no_dropout,
        init_type=opt.init_type,
        init_gain=opt.init_gain,
        gan_mode="vanilla" if getattr(opt, "no_lsgan", False) else "lsgan",
        lambda_a=getattr(opt, "lambda_A", 10.0),
        lambda_b=getattr(opt, "lambda_B", 10.0),
        lambda_identity=getattr(opt, "lambda_identity", 0.5),
        lambda_co_a=getattr(opt, "lambda_co_A", 2.0),
        lambda_co_b=getattr(opt, "lambda_co_B", 2.0),
        pool_size=getattr(opt, "pool_size", 50),
        beta1=getattr(opt, "beta1", 0.5),
        dynet_sizes=tuple(int(x) for x in getattr(opt, "dynet_sizes",
                                                   (128, 128, 64))),
        dynet_spacings=tuple(float(x) for x in getattr(opt, "dynet_spacings",
                                                       (1.5, 1.5, 1.5))),
        dtype=get_policy(opt.precision).compute_dtype,
        remat=getattr(opt, "remat", False),
    )


def main(argv=None):
    # parse BEFORE any backend-initializing call: on the dev image the
    # first device query claims the (exclusive) tunneled TPU for minutes,
    # which --help or a bad flag must never do
    opt = TrainOptions().parse(argv)
    from mra_gan_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = config_from_opt(opt)
    patch = tuple(int(p) for p in opt.patch_size)
    dataset = UnpairedVolumeDataset(
        opt.data_path,
        patch_size=patch,
        pipeline=opt.pipeline,
        num_samples=opt.num_samples,
        shuffle_labels=(opt.pipeline == "legacy"),
        which_direction=opt.which_direction,
        resample=opt.resample,
        new_resolution=opt.new_resolution,
        drop_ratio=opt.drop_ratio,
        min_pixel=opt.min_pixel,
        cache_dir=opt.cache_dir,
        seed=opt.seed,
    )
    loader = PatchLoader(dataset, batch_size=opt.batch_size, shuffle=True,
                         workers=opt.workers)
    print(f"volumes: {len(dataset)}  steps/epoch: {loader.steps_per_epoch()}")

    rng = jax.random.PRNGKey(opt.seed)
    rng, init_rng = jax.random.split(rng)
    state = create_state(cfg, init_rng, patch)
    print_networks(state, verbose=opt.verbose)

    if opt.data_parallel and not getattr(opt, "spatial_parallel", False) \
            and len(jax.devices()) > 1 \
            and opt.batch_size % len(jax.devices()) != 0:
        raise SystemExit(
            f"--data_parallel requires batch_size ({opt.batch_size}) divisible "
            f"by the device count ({len(jax.devices())}); pick e.g. "
            f"--batch_size {-(-opt.batch_size // len(jax.devices())) * len(jax.devices())}")
    if getattr(opt, "spatial_parallel", False) and len(jax.devices()) <= 1:
        print("WARNING: --spatial_parallel ignored — only one device is "
              "visible; running the single-chip step")
    if getattr(opt, "spatial_parallel", False) and len(jax.devices()) > 1:
        from mra_gan_tpu.core.mesh import DATA_AXIS, SPACE_AXIS, make_mesh
        from mra_gan_tpu.parallel.spatial import (make_spatial_train_step,
                                                  shard_spatial_state)

        total = len(jax.devices())
        both = opt.data_parallel
        ns = getattr(opt, "space_devices", 0)
        if ns > total:
            raise SystemExit(
                f"--space_devices {ns} exceeds the device count ({total})")
        if both:
            if ns <= 0 or total % ns:
                raise SystemExit(
                    "--data_parallel + --spatial_parallel needs "
                    f"--space_devices dividing the device count ({total})")
            devices = jax.devices()
        else:
            # spatial-only: use the first ns devices (the rest stay idle
            # rather than silently replicating identical work)
            ns = ns or total
            devices = jax.devices()[:ns]
        nd = len(devices) // ns
        from mra_gan_tpu.parallel.spatial import spatial_depth_rule

        g, min_shard = spatial_depth_rule(cfg.build_nets()[0])
        d0 = int(patch[0])
        if d0 % ns or (d0 // ns) % g[0] or d0 // ns < min_shard:
            raise SystemExit(
                f"--spatial_parallel over {ns} devices requires a per-device "
                f"patch depth (D/{ns} of D={d0}) divisible by {g[0]} and >= "
                f"{min_shard} for net_g={cfg.net_g}")
        if int(patch[1]) % g[1] or int(patch[2]) % g[2]:
            raise SystemExit(
                f"--spatial_parallel requires in-plane patch dims "
                f"{tuple(patch[1:])} divisible by {g[1:]} for net_g={cfg.net_g}")
        if both and opt.batch_size % nd:
            raise SystemExit(
                f"batch_size ({opt.batch_size}) must be divisible by the "
                f"data-axis size ({nd})")
        mesh = make_mesh(devices, data=nd, space=ns)
        state = shard_spatial_state(state, mesh, SPACE_AXIS, cfg)
        step, vol_sh = make_spatial_train_step(
            cfg, mesh, SPACE_AXIS, data_axis=DATA_AXIS if both else None)

        def put(x):
            return jax.device_put(jnp.asarray(x), vol_sh)
    elif opt.data_parallel and len(jax.devices()) > 1:
        from mra_gan_tpu.core.mesh import make_mesh
        from mra_gan_tpu.parallel.sharding import make_sharded_train_step, shard_state

        mesh = make_mesh()
        state = shard_state(state, mesh)
        step, batch_sh = make_sharded_train_step(cfg, mesh)

        def put(x):
            return jax.device_put(x, batch_sh)
    else:
        step = jax.jit(make_train_step(cfg), donate_argnums=0)
        put = jnp.asarray

    if not getattr(opt, "no_mem_check", False):
        # compile-only HBM preflight: a device OOM poisons the process on
        # some runtimes, so ask the compiler first (with the persistent
        # compile cache the first real step then compiles as a cache hit).
        # core/memory.py.
        from mra_gan_tpu.core.memory import preflight

        ex = put(np.zeros((opt.batch_size, *patch, 1), np.float32))
        lim = getattr(opt, "hbm_limit_gib", 0.0)
        preflight(step, state, ex, ex, jax.random.PRNGKey(0), opt.lr,
                  limit_bytes=int(lim * 2**30) if lim else None)

    ckpt = CheckpointManager(opt.checkpoints_dir, opt.name)
    if opt.continue_train and ckpt.has(opt.which_epoch):
        state = ckpt.restore(opt.which_epoch, state)
        print(f"resumed from checkpoint '{opt.which_epoch}' (step {int(state.step)})")
    elif opt.epoch_count > 1 and ckpt.has(opt.epoch_count):
        state = ckpt.restore(opt.epoch_count, state)
        print(f"resumed from checkpoint '{opt.epoch_count}'")

    sched = LRScheduler(opt.lr_policy, opt.lr, niter=opt.niter,
                        niter_decay=opt.niter_decay, epoch_count=opt.epoch_count,
                        lr_decay_iters=opt.lr_decay_iters)
    visualizer = Visualizer(opt)
    total_steps = 0
    last_metric = None

    # --dump_patches N: write the first N sampled patch pairs as NIfTI for
    # offline QA — the mechanized form of the reference's commented-out
    # patch-dump blocks (reference train.py:83-107 wrote patch_real_A/B to
    # .nii.gz via sitk). Dumped pre-augmentation, i.e. exactly what the
    # loader produced, like the reference's blocks.
    dumps_left = int(getattr(opt, "dump_patches", 0) or 0)
    dump_idx = 0
    if dumps_left:
        from pathlib import Path as _Path

        from mra_gan_tpu.data import nifti as _nifti

        dump_dir = _Path(opt.checkpoints_dir) / opt.name / "patch_dumps"
        dump_dir.mkdir(parents=True, exist_ok=True)

    profiling = bool(getattr(opt, "profile_dir", ""))
    for epoch in range(opt.epoch_count, opt.niter + opt.niter_decay + 1):
        if profiling and epoch == opt.epoch_count:
            jax.profiler.start_trace(opt.profile_dir)
        epoch_start = time.time()
        lr = sched.lr_for_epoch(epoch, metric=last_metric)
        timer = StepTimer()
        epoch_iter = 0
        # plateau metric: epoch mean of the total loss over the print-time
        # samples PLUS one guaranteed end-of-epoch sample, so the scheduler
        # always sees a real metric regardless of print_freq — at zero
        # per-step cost (per-step host-side jnp sums would dispatch ~10
        # one-off device ops per hot-loop step; one-off dispatches cost
        # 1.5-3.5 ms on the tunneled backend, see CLAUDE.md). The
        # reference's plateau policy is actually unusable: its
        # scheduler.step() call passes no metric
        # (reference models/base_model.py:66-67), which raises TypeError
        # for ReduceLROnPlateau — this epoch-mean metric is the recorded fix.
        msum, msteps = 0.0, 0
        sampled_step = -1  # total_steps value of the last print-time sample
        for image_b, label_b in loader.epoch(epoch):
            timer.data_ready()
            if dumps_left > 0:
                for k in range(image_b.shape[0]):
                    if dumps_left <= 0:
                        break
                    for tag, arr in (("A", image_b), ("B", label_b)):
                        _nifti.save(_nifti.NiftiImage(
                            data=np.asarray(arr[k, ..., 0], np.float32),
                            affine=np.eye(4)),
                            dump_dir / f"patch_{dump_idx:04d}_{tag}.nii.gz")
                    dump_idx += 1
                    dumps_left -= 1
            # AtoB: image -> real_A, label -> real_B (reference train.py:123
            # feeds [image, label] into set_input)
            a, b = put(image_b), put(label_b)
            rng, step_rng = jax.random.split(rng)
            if getattr(opt, "augment", False):
                from mra_gan_tpu.data.augment import augment_batch

                rng, aug_rng = jax.random.split(rng)
                # legacy patches live in [-1,1] (the reference's 0-255 scale
                # mapped); monai images are z-scored, so derive per sample
                vr = (-1.0, 1.0) if opt.pipeline == "legacy" else None
                a, b = augment_batch(a, b, aug_rng, value_range=vr,
                                     extended=getattr(opt, "augment_extended",
                                                      False))
            state, metrics = step(state, a, b, step_rng, lr)
            total_steps += opt.batch_size
            epoch_iter += opt.batch_size
            if total_steps % opt.print_freq == 0:
                metrics_host = {k: float(v) for k, v in metrics.items()}
                msum += sum(metrics_host.values())
                msteps += 1
                sampled_step = total_steps
                timer.step_done()
                visualizer.print_current_losses(
                    epoch, epoch_iter, metrics_host,
                    timer.t_comp / opt.batch_size, timer.t_data)
            if total_steps % opt.save_latest_freq == 0:
                print(f"saving the latest model (epoch {epoch}, total_steps {total_steps})")
                ckpt.save("latest", state, also_latest=False)
        if profiling and epoch == opt.epoch_count:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            print(f"profiler trace written to {opt.profile_dir}")
            profiling = False
        if epoch_iter:
            if sampled_step != total_steps:  # final step not yet sampled
                msum += sum(float(v) for v in jax.device_get(metrics).values())
                msteps += 1
            last_metric = msum / msteps
        if epoch % opt.save_epoch_freq == 0:
            print(f"saving the model at the end of epoch {epoch}, iters {total_steps}")
            ckpt.save(epoch, state, also_latest=True)
        print(f"End of epoch {epoch} / {opt.niter + opt.niter_decay} \t "
              f"Time Taken: {int(time.time() - epoch_start)} sec \t lr: {lr:.7f}")
    ckpt.save("latest", state, also_latest=False)


if __name__ == "__main__":
    main()
