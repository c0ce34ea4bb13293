"""Multi-device full-volume inference and spatially-sharded convolution.

Two TPU-native extensions beyond the reference's single-GPU design:

1. ``sharded_sliding_window`` — the sliding-window decode distributed over
   the mesh's ``data`` axis with ``shard_map``: every device decodes a
   disjoint subset of patches into its own accumulator pair and the overlap
   averages are merged with one ``psum`` at the end. Wall-clock scales
   ~linearly with device count for large volumes.

2. ``halo_conv3d`` — a 'same' conv over a volume whose depth axis is sharded
   across devices: each device holds a (D/n, H, W, C) shard, exchanges
   k//2-deep halo slabs with its mesh neighbors via ``ppermute``, and
   convolves locally. This is the building block for running volumes too
   large for one chip's HBM (the "long-context" analogue of this domain,
   SURVEY §5).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.mesh import DATA_AXIS
from ..infer.sliding_window import compute_grid_starts, gaussian_window


def sharded_sliding_window(
    mesh: Mesh,
    volume: np.ndarray,
    generate_fn: Callable,
    patch_size: Sequence[int] = (64, 64, 64),
    stride_inplane: int = 32,
    stride_layer: int = 32,
    blend: str = "gaussian",
    batch: int = 1,
) -> np.ndarray:
    """Multi-device sliding-window decode. volume: (X,Y,Z) float32 (NIfTI
    axis order; stride_layer covers the last axis)."""
    n_dev = mesh.shape[DATA_AXIS]
    patch = tuple(int(p) for p in patch_size)
    vshape = volume.shape
    padded = [max(v, p) for v, p in zip(vshape, patch)]
    vol = np.pad(volume.astype(np.float32),
                 [(0, pd - v) for pd, v in zip(padded, vshape)])

    # stride_layer applies to the last (Z) axis of the (X, Y, Z) volume,
    # matching the reference's grid (reference test.py:111-113)
    starts = [
        compute_grid_starts(padded[0], patch[0], stride_inplane),
        compute_grid_starts(padded[1], patch[1], stride_inplane),
        compute_grid_starts(padded[2], patch[2], stride_layer),
    ]
    grid = np.array([(a, b, c) for a in starts[0] for b in starts[1] for c in starts[2]],
                    np.int32)
    n = len(grid)
    per_dev_chunk = batch * n_dev
    n_pad = (-n) % per_dev_chunk
    # Batch/device padding duplicates the last start; a per-entry validity
    # flag zeroes the duplicates' window contribution (a duplicated patch
    # would otherwise skew overlapped voxels toward it — acc and wsum grow by
    # the same duplicate, but other patches' contributions don't).
    valid = np.ones(n + n_pad, np.float32)
    if n_pad:
        grid = np.concatenate([grid, np.repeat(grid[-1:], n_pad, axis=0)])
        valid[n:] = 0.0
    # round-robin so each device gets an even spread
    grid = grid.reshape(-1, n_dev, batch, 3).transpose(1, 0, 2, 3)  # (dev, steps, B, 3)
    valid = valid.reshape(-1, n_dev, batch).transpose(1, 0, 2)  # (dev, steps, B)

    win = gaussian_window(patch) if blend == "gaussian" else np.ones(patch, np.float32)

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
             out_specs=P(), check_vma=False)
    def decode(vol, grid_dev, valid_dev, win):
        grid_local = grid_dev[0]  # (steps, B, 3)
        valid_local = valid_dev[0]  # (steps, B)
        acc0 = jnp.zeros_like(vol)
        wsum0 = jnp.zeros_like(vol)

        def body(carry, inp):
            starts_b, valid_b = inp
            acc, wsum = carry
            patches = jax.vmap(
                lambda s: jax.lax.dynamic_slice(vol, (s[0], s[1], s[2]), patch)
            )(starts_b)
            out = generate_fn(patches[..., None])[..., 0].astype(jnp.float32)
            out = out * win * valid_b[:, None, None, None]

            def scatter(carry, i):
                acc, wsum = carry
                s = starts_b[i]
                w = win * valid_b[i]
                cur = jax.lax.dynamic_slice(acc, (s[0], s[1], s[2]), patch)
                acc = jax.lax.dynamic_update_slice(acc, cur + out[i], (s[0], s[1], s[2]))
                curw = jax.lax.dynamic_slice(wsum, (s[0], s[1], s[2]), patch)
                wsum = jax.lax.dynamic_update_slice(wsum, curw + w, (s[0], s[1], s[2]))
                return (acc, wsum), None

            (acc, wsum), _ = jax.lax.scan(scatter, (acc, wsum),
                                          jnp.arange(starts_b.shape[0]))
            return (acc, wsum), None

        (acc, wsum), _ = jax.lax.scan(body, (acc0, wsum0), (grid_local, valid_local))
        acc = jax.lax.psum(acc, DATA_AXIS)
        wsum = jax.lax.psum(wsum, DATA_AXIS)
        return acc / jnp.maximum(wsum, 1e-8)

    out = np.asarray(jax.jit(decode)(jnp.asarray(vol), jnp.asarray(grid),
                                     jnp.asarray(valid), jnp.asarray(win)))
    return out[: vshape[0], : vshape[1], : vshape[2]]


def _upload_dtype(net):
    """bf16 upload is exact for a bf16-compute generator (its first op casts
    the input anyway) and halves host->device bytes; f32 nets get f32."""
    return (jnp.bfloat16
            if getattr(net, "dtype", jnp.float32) == jnp.bfloat16
            else jnp.float32)


# One jitted apply per generator: jax.jit caches compiled executables on
# FUNCTION identity + shapes, so building a fresh lambda per call (as
# directory batch mode would) re-traces every volume. Keyed on the module
# itself when hashable (equal configs share one executable); unhashable
# modules fall back to id(net) with the net kept alive in the value so its
# id can't be recycled. Insertion-order LRU capped so long-lived processes
# that build fresh modules per call (test suites, serving loops reloading
# checkpoints) don't pin every net + executable forever.
_SINGLE_PASS_JIT: dict = {}
_SINGLE_PASS_CAP = 8

_DECODE_ADVICE = ("decode it with the sliding-window decoder (default "
                  "test.py mode — streams fixed-size patches) or shard the "
                  "whole volume across a mesh with --spatial_shard")


def _single_pass_fn(net):
    """-> (jitted apply, preflighted-geometry set). The set lives INSIDE the
    cache entry so LRU eviction drops it with the executable — a module-less
    global set keyed on id(net) could match a recycled id after the entry
    (the only thing keeping an unhashable net alive) is evicted and GC'd,
    silently skipping the OOM preflight for a different net."""
    try:
        hash(net)
        key = ("net", net)
    except TypeError:
        key = ("id", id(net))
    hit = _SINGLE_PASS_JIT.pop(key, None)  # pop+reinsert = move to MRU
    if hit is None:
        hit = (net, jax.jit(lambda p, xx: net.apply(p, xx, train=False)),
               set())
    _SINGLE_PASS_JIT[key] = hit
    while len(_SINGLE_PASS_JIT) > _SINGLE_PASS_CAP:
        _SINGLE_PASS_JIT.pop(next(iter(_SINGLE_PASS_JIT)))
    return hit[1], hit[2]


def single_pass_apply(net, params, volume: np.ndarray) -> np.ndarray:
    """Whole-volume generator forward on ONE chip: pad each dim to the
    net's stride granularity (networks.spatial_granularity — 4 for resnet,
    2^num_downs for U-Net, the schedule product for Dynet) with edge
    values, forward, crop back — no
    patching, no seams, instance-norm statistics over the full volume. The
    single-device counterpart of ``sharded_generator_apply``; needs the
    activation stack to fit HBM."""
    from ..models.networks import spatial_granularity

    shp = volume.shape
    pads = [(-s) % g for s, g in zip(shp, spatial_granularity(net))]
    volp = np.pad(np.asarray(volume, np.float32),
                  [(0, p) for p in pads], mode="edge")
    x = jnp.asarray(volp, _upload_dtype(net))[None, ..., None]
    fn, preflighted = _single_pass_fn(net)
    sig = (x.shape, str(x.dtype))
    if sig not in preflighted:
        # whole-volume decode is the likeliest OOM surface — compile-check
        # the footprint once per geometry before touching the device
        # (core/memory.py; with the persistent compile cache the first real
        # call then compiles as a cache hit). Over-limit raises RuntimeError
        # (not SystemExit): this volume can't decode single-pass, but the
        # caller (directory batch mode, bench) may have other work.
        from ..core.memory import preflight

        preflight(fn, params, x,
                  what=f"single-pass decode of {tuple(shp)} volume",
                  advice=_DECODE_ADVICE, exit_on_over=False)
        # only record success — an over-limit geometry must keep raising
        # instead of silently proceeding to a real device OOM next call
        preflighted.add(sig)
    out = fn(params, x)
    return np.asarray(out, np.float32)[0, ..., 0][:shp[0], :shp[1], :shp[2]]


def spatial_depth_rule(net):
    """(per-axis granularity, minimum shard depth) a depth-sharded forward
    of ``net`` needs: shard depth D/n_space must divide by g[0] and be >=
    min_shard (4 for resnet — its 7^3 stem halo reaches 3 voxels across the
    shard boundary). The single divisibility rule shared by the CLI
    pre-check (train.py), ``sharded_generator_apply`` and
    ``make_spatial_train_step`` — per-net via networks.spatial_granularity,
    NOT the resnet-only %4."""
    from ..models.networks import spatial_granularity

    g = spatial_granularity(net)
    min_shard = 4 if type(net).__name__ == "ResnetGenerator3D" else g[0]
    return g, min_shard


def sharded_generator_apply(
    mesh: Mesh,
    net,
    params,
    volume: np.ndarray,
    axis_name: str = DATA_AXIS,
) -> np.ndarray:
    """Single-pass full-volume generator forward with the volume
    DEPTH-SHARDED across the mesh — for volumes too large for one chip's HBM
    (the alternative to sliding-window patching; no seams, exact).

    Every conv's depth padding becomes an ICI halo exchange and every
    instance norm pmeans its statistics across the shard axis
    (core/spatial_ctx.py + ops/conv.extend_sharded_d + ops/norm), so the
    result is bit-equivalent to the unsharded forward. volume: (D, H, W)
    float in the generator's input range; per-shard depth must be divisible
    by the net's depth-stride granularity (networks.spatial_granularity) —
    and >= 4 for resnet (the 7^3 stem's halo) — with H/W divisible by the
    in-plane granularity."""
    from ..core.spatial_ctx import spatial_sharding

    n = mesh.shape[axis_name]
    d = volume.shape[0]
    g, min_shard = spatial_depth_rule(net)
    assert d % n == 0 and (d // n) % g[0] == 0 and d // n >= min_shard, (
        f"depth {d} over {n} devices needs shard depth divisible by {g[0]} "
        f"and >= {min_shard}")
    assert volume.shape[1] % g[1] == 0 and volume.shape[2] % g[2] == 0, (
        f"in-plane dims {volume.shape[1:]} must be divisible by {g[1:]} "
        f"(pad with edge values first)")
    from jax.sharding import NamedSharding

    x = jnp.asarray(volume, _upload_dtype(net))[None, ..., None]
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis_name)))
    params = jax.device_put(params, NamedSharding(mesh, P()))

    with spatial_sharding(axis_name, n):
        @partial(shard_map, mesh=mesh, in_specs=(P(None, axis_name), P()),
                 out_specs=P(None, axis_name), check_vma=False)
        def run(xs, p):
            return net.apply(p, xs, train=False)

        out = jax.jit(run)(x, params)
    return np.asarray(out)[0, ..., 0]


def shard_spatial_state(state, mesh: Mesh, axis_name: str, cfg=None):
    """Place a CycleGANState for the spatial train step: params/opt/step
    replicated, ImagePool buffers depth-sharded (they hold fakes, which live
    depth-sharded inside the step). Pools that ``create_state`` allocated in
    the single-chip step's internal S2D(4) cell layout are auto-detected by
    shape and converted to the plain layout the spatial step uses; ``cfg``
    only refines the channel counts (defaults assume 1-channel volumes)."""
    from jax.sharding import NamedSharding

    from ..models.cycle_gan import PoolState

    rep = NamedSharding(mesh, P())
    psh = NamedSharding(mesh, P(None, axis_name))

    def _pool(p, channels):
        imgs = p.images
        # create_state may have allocated the pool in the single-chip
        # step's S2D(4) cell layout (last dim = 64*channels); the spatial
        # step stores plain-layout fakes, so convert. Detectable from the
        # shape alone — plain pools have `channels` lanes, cell pools 64x.
        if imgs.shape[-1] == 64 * channels:
            from ..ops.s2d import depth_to_space

            imgs = depth_to_space(imgs, 4)
        return PoolState(images=jax.device_put(imgs, psh),
                         count=jax.device_put(p.count, rep))

    put = lambda t: jax.tree.map(lambda x: jax.device_put(x, rep), t)
    in_nc = cfg.input_nc if cfg is not None else 1
    out_nc = cfg.output_nc if cfg is not None else 1
    return state.replace(
        g_params=put(state.g_params), d_params=put(state.d_params),
        opt_g=put(state.opt_g), opt_d=put(state.opt_d),
        pool_fake_a=_pool(state.pool_fake_a, in_nc),
        pool_fake_b=_pool(state.pool_fake_b, out_nc),
        step=jax.device_put(state.step, rep))


def make_spatial_train_step(cfg, mesh: Mesh, axis_name: str = "space",
                            data_axis: str = None):
    """Full CycleGAN train step with every volume DEPTH-SHARDED across
    ``axis_name`` — spatial parallelism for patches too large for one chip's
    HBM (the TPU-native "sequence parallel" of this domain; the reference has
    no equivalent, SURVEY §5).

    Design: the generators (the memory hogs — 32-channel full-resolution
    activation stacks) run sharded via core.spatial_ctx — conv padding
    becomes ICI halo exchange, instance-norm statistics and loss reductions
    are pmean-ed. The PatchGAN discriminators run replicated on all-gathered
    volumes (their even-kernel stride-1 convs don't shard uniformly and they
    are a small fraction of the step); the gather's autodiff transpose
    reduce-scatters cotangents back to the producing shard. Per-device
    gradients then psum into the exact gradient of the unsharded step
    (models/cycle_gan.py train_step._allreduce), so parameters stay
    bit-consistent across devices.

    Pass ``data_axis`` for a 2-D dp x sp mesh: the batch shards over it too
    (loss reductions extend across both axes; the ImagePool all-gathers the
    per-device fakes so every device applies the reference's exact
    sequential pool update to its replicated buffers).

    Constraints: per-shard patch depth divisible by the generator's
    depth-stride granularity (networks.spatial_granularity: 4 for resnet —
    plus shard depth >= 4 for its 7^3 stem halo — 2^num_downs for U-Net,
    the schedule's depth-stride product for Dynet); batch divisible by the
    data-axis size; no dropout (identical per-shard keys would repeat masks
    along depth).

    Returns (step_fn, input_sharding); states go through
    ``shard_spatial_state`` first.
    """
    from jax.sharding import NamedSharding

    from ..core.spatial_ctx import spatial_sharding
    from ..models.cycle_gan import make_train_step

    n = mesh.shape[axis_name]
    assert cfg.no_dropout, "spatial train step requires no_dropout"
    g, min_shard = spatial_depth_rule(cfg.build_nets()[0])
    base = make_train_step(cfg)

    from ..models.cycle_gan import CycleGANState, PoolState

    pool_spec = PoolState(images=P(None, axis_name), count=P())
    state_spec = CycleGANState(
        g_params=P(), d_params=P(), opt_g=P(), opt_d=P(),
        pool_fake_a=pool_spec, pool_fake_b=pool_spec, step=P())
    nd = mesh.shape[data_axis] if data_axis else 1
    vol_spec = P(data_axis, axis_name)

    def body(state, a, b, rng, lr):
        with spatial_sharding(axis_name, n,
                              data_axis=(data_axis, nd) if data_axis else None):
            return base(state, a, b, rng, lr)

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(state_spec, vol_spec, vol_spec, P(), P()),
        out_specs=(state_spec, P()),
        check_vma=False)
    jitted = jax.jit(sharded, donate_argnums=0)

    def step(state, real_a, real_b, rng, lr):
        d = real_a.shape[1]
        if d % n or (d // n) % g[0] or d // n < min_shard:
            raise ValueError(
                f"spatial step over {n} devices needs patch depth with "
                f"shard depth (D/{n}) divisible by {g[0]} and >= "
                f"{min_shard}, got D={d}")
        if real_a.shape[2] % g[1] or real_a.shape[3] % g[2]:
            raise ValueError(
                f"patch in-plane dims {real_a.shape[2:4]} must be divisible "
                f"by {g[1:]} for {cfg.net_g}")
        if real_a.shape[0] % nd:
            raise ValueError(
                f"batch {real_a.shape[0]} not divisible by the data-axis "
                f"size {nd}")
        return jitted(state, real_a, real_b, rng, jnp.float32(lr))

    # expose AOT lowering so core.memory.preflight can compile-check the
    # footprint through the validating wrapper (lr must match the jnp
    # cast the wrapper applies, so wrap it the same way)
    step.lower = lambda state, a, b, rng, lr: jitted.lower(
        state, a, b, rng, jnp.float32(lr))
    return step, NamedSharding(mesh, vol_spec)


def halo_conv3d(mesh: Mesh, x_sharded: jax.Array, kernel: jax.Array,
                axis_name: str = DATA_AXIS) -> jax.Array:
    """'Same' (zero-pad) conv over a depth-sharded (N, D, H, W, C) volume.

    Each device exchanges (k-1)//2 halo slabs with both neighbors over ICI
    (ppermute) and convolves its extended shard locally — no gather of the
    full volume ever materializes."""
    kd = kernel.shape[0]
    halo = (kd - 1) // 2
    n_dev = mesh.shape[axis_name]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, axis_name), P()),
             out_specs=P(None, axis_name), check_vma=False)
    def conv(xs, w):
        idx = jax.lax.axis_index(axis_name)
        # send top slab to left neighbor, bottom slab to right neighbor
        top = xs[:, :halo]
        bot = xs[:, -halo:]
        from_above = jax.lax.ppermute(
            bot, axis_name, [(i, i + 1) for i in range(n_dev - 1)])
        from_below = jax.lax.ppermute(
            top, axis_name, [(i + 1, i) for i in range(n_dev - 1)])
        zero = jnp.zeros_like(top)
        upper = jnp.where(idx == 0, zero, from_above)
        lower = jnp.where(idx == n_dev - 1, zero, from_below)
        ext = jnp.concatenate([upper, xs, lower], axis=1)
        return jax.lax.conv_general_dilated(
            ext, w, (1, 1, 1),
            [(0, 0), (halo, halo), (halo, halo)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=xs.dtype)

    return conv(x_sharded, kernel)
