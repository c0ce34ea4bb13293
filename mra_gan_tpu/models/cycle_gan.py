"""Functional CycleGAN: the reference's optimize_parameters
(reference models/cycle_gan_model.py:227-240) re-expressed as ONE pure,
jittable train step.

One call fuses — into a single XLA program — what the reference runs as ~10
separate torch graphs per iteration: the 4 generator forwards + 2 identity
forwards, the generator backward/Adam step, both image-pool queries, the 4
discriminator forwards, and the discriminator backward/Adam step
(reference models/cycle_gan_model.py:121-240).

Semantics preserved:
- G update sees fakes produced by the *old* G and frozen D
  (set_requires_grad(D, False), reference :231); the D update then trains on
  those same (pooled) fakes with stop_gradient, matching ``fake.detach()``
  (reference :143).
- ImagePool 50%-swap / fill-first replay buffer (reference :8-35) as an
  on-device ring buffer scanned sequentially over the batch.
- Separate Adam chains for {G_A,G_B} and {D_A,D_B} with shared lr/betas
  (reference :107-110); lr is an argument so epoch-level schedules
  (lambda/step/plateau/cosine) stay outside the compiled step.
- Correlation-coefficient losses are computed for logging but excluded from
  loss_G, exactly like the reference (:217-218 computed, :223 sum without).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..ops.losses import cor_coe_loss, gan_loss, l1_loss
from .networks import define_d, define_g


@dataclasses.dataclass(frozen=True)
class CycleGANConfig:
    """Static hyper-parameters (hashable; closed over by the jitted step)."""

    input_nc: int = 1
    output_nc: int = 1
    ngf: int = 32
    ndf: int = 32
    net_g: str = "resnet_6blocks"
    net_d: str = "n_layers"
    n_layers_d: int = 3
    norm: str = "instance"
    no_dropout: bool = True
    init_type: str = "normal"
    init_gain: float = 0.02
    # "vanilla" (BCE + sigmoid D) is the reference's EFFECTIVE default: its
    # --no_lsgan flag is store_false with default True (reference
    # options/train_options.py:19, models/cycle_gan_model.py:93,103), so a
    # bare `python train.py` trains vanilla GAN. The library default matches
    # the CLI default (train.py:39) so library and CLI users train the same
    # objective; pass gan_mode="lsgan" for least-squares GAN.
    gan_mode: str = "vanilla"
    lambda_a: float = 10.0
    lambda_b: float = 10.0
    lambda_identity: float = 0.5
    lambda_co_a: float = 2.0
    lambda_co_b: float = 2.0
    pool_size: int = 50
    beta1: float = 0.5
    dtype: Any = jnp.float32
    # rematerialize generator activations in the backward pass
    # (jax.checkpoint, saving only the named segment boundaries the
    # generator marks): measured -21..-24% peak step memory at 96^3-128^3
    # patches for ~+30% step time on v5e — the lever for patches that
    # otherwise exceed HBM
    remat: bool = False
    # Dynet auto-configuration inputs (reference models/networks3D.py:348);
    # set to the training patch size so the stride schedule fits the patch.
    dynet_sizes: Any = (128, 128, 64)
    dynet_spacings: Any = (1.5, 1.5, 1.5)

    @staticmethod
    def modify_commandline_options(parser, is_train: bool):
        """CycleGAN-injected CLI flags and default overrides, called by the
        options layer's two-phase parse (the reference's dynamic flag
        registration, reference models/cycle_gan_model.py:42-62 via
        options/base_options.py:68-72)."""
        parser.set_defaults(no_dropout=True)
        if is_train:
            parser.add_argument("--lambda_A", type=float, default=10.0,
                                help="weight for cycle loss (A -> B -> A)")
            parser.add_argument("--lambda_B", type=float, default=10.0,
                                help="weight for cycle loss (B -> A -> B)")
            parser.add_argument("--lambda_identity", type=float, default=0.5,
                                help="identity mapping loss weight factor")
            parser.add_argument("--lambda_co_A", type=float, default=2.0,
                                help="weight for correlation coefficient loss (A -> B)")
            parser.add_argument("--lambda_co_B", type=float, default=2.0,
                                help="weight for correlation coefficient loss (B -> A)")
        return parser

    def build_nets(self):
        g_a = define_g(self.output_nc, self.ngf, self.net_g, self.norm,
                       not self.no_dropout, self.init_type, self.init_gain,
                       self.dtype, self.dynet_sizes, self.dynet_spacings)
        g_b = define_g(self.input_nc, self.ngf, self.net_g, self.norm,
                       not self.no_dropout, self.init_type, self.init_gain,
                       self.dtype, self.dynet_sizes, self.dynet_spacings)
        use_sigmoid = self.gan_mode == "vanilla"
        d_a = define_d(self.ndf, self.net_d, self.n_layers_d, self.norm,
                       use_sigmoid, self.init_type, self.init_gain, self.dtype)
        d_b = define_d(self.ndf, self.net_d, self.n_layers_d, self.norm,
                       use_sigmoid, self.init_type, self.init_gain, self.dtype)
        return g_a, g_b, d_a, d_b

    def uses_cells(self, spatial) -> bool:
        """Whether the fused train step runs the G<->D loop in the S2D(4)
        cell domain (TPU-internal layout; parameters and all public APIs are
        unaffected — see networks.ResnetGenerator3D.cells_io). Disabled under
        spatial_sharding: the cell convs pad in the cell domain without halo
        exchange, so the depth-sharded step uses the plain shard-aware
        conv/pad path instead."""
        from ..core.spatial_ctx import spatial_shard_info

        if spatial_shard_info() is not None:
            return False
        if not all(int(s) % 4 == 0 for s in spatial):
            return False
        if self.net_g in ("resnet_6blocks", "resnet_9blocks"):
            return self.norm == "instance"
        if self.net_g == "Dynet":
            # Dynet's norms are its own affine instance norms (cfg.norm is
            # not consulted); cells need a cell-compatible auto-schedule.
            from .networks import DynUNet3D

            return DynUNet3D.schedule_supports_cells(
                tuple(self.dynet_sizes), tuple(self.dynet_spacings))
        return False


class PoolState(flax.struct.PyTreeNode):
    images: jax.Array  # (pool_size, D, H, W, C)
    count: jax.Array  # () int32


class CycleGANState(flax.struct.PyTreeNode):
    g_params: Dict[str, Any]  # {'g_a':…, 'g_b':…}
    d_params: Dict[str, Any]  # {'d_a':…, 'd_b':…}
    opt_g: Any
    opt_d: Any
    pool_fake_a: PoolState
    pool_fake_b: PoolState
    step: jax.Array  # () int32


def _adam(beta1: float) -> optax.GradientTransformation:
    # torch.optim.Adam(betas=(beta1, 0.999), eps=1e-8); lr applied separately.
    return optax.scale_by_adam(b1=beta1, b2=0.999, eps=1e-8)


def _empty_pool(cfg: CycleGANConfig, patch_shape, channels: int) -> PoolState:
    if cfg.uses_cells(patch_shape):
        # the step stores fakes in their internal S2D(4) cell layout
        shape = (max(cfg.pool_size, 1),
                 *(int(p) // 4 for p in patch_shape), 64 * channels)
    else:
        shape = (max(cfg.pool_size, 1), *patch_shape, channels)
    return PoolState(
        images=jnp.zeros(shape, cfg.dtype),
        count=jnp.zeros((), jnp.int32),
    )


def create_state(
    cfg: CycleGANConfig,
    rng: jax.Array,
    patch_shape: Tuple[int, int, int],
) -> CycleGANState:
    """Initialize all four networks and both optimizer chains."""
    g_a, g_b, d_a, d_b = cfg.build_nets()
    ka, kb, kda, kdb = jax.random.split(rng, 4)
    dummy_a = jnp.zeros((1, *patch_shape, cfg.input_nc), cfg.dtype)
    dummy_b = jnp.zeros((1, *patch_shape, cfg.output_nc), cfg.dtype)
    g_params = {
        "g_a": g_a.init(ka, dummy_a, train=False),
        "g_b": g_b.init(kb, dummy_b, train=False),
    }
    d_params = {
        "d_a": d_a.init(kda, dummy_b, train=False),
        "d_b": d_b.init(kdb, dummy_a, train=False),
    }
    tx = _adam(cfg.beta1)
    return CycleGANState(
        g_params=g_params,
        d_params=d_params,
        opt_g=tx.init(g_params),
        opt_d=tx.init(d_params),
        pool_fake_a=_empty_pool(cfg, patch_shape, cfg.input_nc),
        pool_fake_b=_empty_pool(cfg, patch_shape, cfg.output_nc),
        step=jnp.zeros((), jnp.int32),
    )


def pool_query(pool: PoolState, images: jax.Array, rng: jax.Array, pool_size: int):
    """Replay-buffer query with the reference ImagePool semantics
    (reference models/cycle_gan_model.py:15-35): while filling, store and
    return the fresh image; once full, with p>0.5 swap with a random slot and
    return the evicted image, else pass the fresh image through. Sequential
    over the batch (scan) to match the torch loop exactly."""
    if pool_size == 0:
        return pool, images
    keys = jax.random.split(rng, images.shape[0])

    def body(carry, inp):
        imgs, count = carry
        img, key = inp
        k1, k2 = jax.random.split(key)
        p = jax.random.uniform(k1)
        rid = jax.random.randint(k2, (), 0, pool_size)
        not_full = count < pool_size
        swap = jnp.logical_and(jnp.logical_not(not_full), p > 0.5)
        write = jnp.logical_or(not_full, swap)
        idx = jnp.where(not_full, count, rid)
        evicted = imgs[idx]
        imgs = imgs.at[idx].set(jnp.where(write, img, evicted))
        out = jnp.where(swap, evicted, img)
        count = count + not_full.astype(jnp.int32)
        return (imgs, count), out

    (imgs, count), outs = jax.lax.scan(body, (pool.images, pool.count), (images, keys))
    return PoolState(images=imgs, count=count), outs


def make_train_step(cfg: CycleGANConfig):
    """Build the jitted (donated-state) CycleGAN train step.

    step(state, real_a, real_b, rng, lr) -> (state, metrics)
    real_a: (B, D, H, W, input_nc) in [-1, 1]; real_b likewise.
    """
    base_nets = cfg.build_nets()
    lam_idt = cfg.lambda_identity
    # Instance norm (and 'none') is strictly per-sample, so independent
    # generator inputs can be stacked into ONE batched apply — 6 G forwards
    # collapse to 4 (leaf/chain split), raising MXU utilization at the
    # reference's batch-1 workload. Batch norm couples samples through batch
    # statistics, so it keeps separate applies.
    fuse = cfg.norm in ("instance", "none")

    def _build_losses(g_a, g_b, d_a, d_b):
        """Loss closures over a concrete net 4-tuple (true-layout or
        cells_io variants — same parameters either way)."""
        g_loss_fn = _make_g_loss(g_a, g_b, d_a, d_b)
        d_loss_fn = _make_d_loss(d_a, d_b)
        return g_loss_fn, d_loss_fn

    def _make_g_loss(g_a, g_b, d_a, d_b):
        return lambda *a: g_loss_impl(g_a, g_b, d_a, d_b, *a)

    def _make_d_loss(d_a, d_b):
        return lambda *a: d_loss_impl(d_a, d_b, *a)

    def _g_apply(g, params, x, rngs):
        """Generator forward; with cfg.remat the intermediates are
        rematerialized in the backward (jax.checkpoint) instead of stored.
        The policy saves only the named segment boundaries the generator
        marks (networks.ResnetGenerator3D checkpoint_name calls), so the
        backward holds one segment's working set at a time instead of a
        whole apply's."""
        if not cfg.remat:
            return g.apply(params, x, train=True, rngs=rngs)
        policy = jax.checkpoint_policies.save_only_these_names(
            "g_trunk_in", "g_trunk_out")
        return jax.checkpoint(
            lambda p, xx: g.apply(p, xx, train=True, rngs=rngs),
            policy=policy)(params, x)

    def _d_apply(d, params, x):
        """Discriminator forward; under spatial_sharding the input is
        all-gathered along depth and the PatchGAN runs replicated (its
        even-kernel stride-1 convs don't shard uniformly, and D is a tiny
        fraction of the step's compute/memory). The gather's transpose is a
        reduce-scatter, so cotangents flow back to the producing shard."""
        from ..core.spatial_ctx import spatial_shard_info, spatial_unsharded

        info = spatial_shard_info()
        if info is None:
            return d.apply(params, x, train=True)
        xg = jax.lax.all_gather(x, info[0], axis=1, tiled=True)
        with spatial_unsharded():
            return d.apply(params, xg, train=True)

    def g_loss_impl(g_a, g_b, d_a, d_b, g_params, d_params, real_a, real_b,
                    rngs_per_apply):
        # rngs_per_apply: one independent dropout-rng dict per generator
        # apply, matching the reference's independent masks per torch forward
        # (dropout only; empty dicts when no_dropout).
        r0, r1, r2, r3, r4, r5 = rngs_per_apply
        bsz = real_a.shape[0]
        if fuse and lam_idt > 0:
            # Leaf applies (inputs are graph leaves) are batched separately
            # from chain applies (inputs are generator outputs): XLA then
            # skips the first layer's input-gradient for the leaf batches —
            # the stem's cell-domain dx is the single most expensive backward
            # op at 64^3 (measured ~3 ms/step on v5e).
            out_a1 = _g_apply(g_a, g_params["g_a"],
                              jnp.concatenate([real_a, real_b]), r0)
            fake_b, idt_a = out_a1[:bsz], out_a1[bsz:]
            out_b1 = _g_apply(g_b, g_params["g_b"],
                              jnp.concatenate([real_b, real_a]), r1)
            fake_a, idt_b = out_b1[:bsz], out_b1[bsz:]
            rec_a = _g_apply(g_b, g_params["g_b"], fake_b, r2)
            rec_b = _g_apply(g_a, g_params["g_a"], fake_a, r3)
        elif fuse:
            fake_b = _g_apply(g_a, g_params["g_a"], real_a, r0)
            fake_a = _g_apply(g_b, g_params["g_b"], real_b, r1)
            rec_a = _g_apply(g_b, g_params["g_b"], fake_b, r2)
            rec_b = _g_apply(g_a, g_params["g_a"], fake_a, r3)
            idt_a = idt_b = None
        else:
            fake_b = _g_apply(g_a, g_params["g_a"], real_a, r0)
            rec_a = _g_apply(g_b, g_params["g_b"], fake_b, r1)
            fake_a = _g_apply(g_b, g_params["g_b"], real_b, r2)
            rec_b = _g_apply(g_a, g_params["g_a"], fake_a, r3)
            idt_a = (_g_apply(g_a, g_params["g_a"], real_b, r4)
                     if lam_idt > 0 else None)
            idt_b = (_g_apply(g_b, g_params["g_b"], real_a, r5)
                     if lam_idt > 0 else None)

        loss_g_a = gan_loss(_d_apply(d_a, d_params["d_a"], fake_b), True, cfg.gan_mode)
        loss_g_b = gan_loss(_d_apply(d_b, d_params["d_b"], fake_a), True, cfg.gan_mode)
        loss_cycle_a = l1_loss(rec_a, real_a) * cfg.lambda_a
        loss_cycle_b = l1_loss(rec_b, real_b) * cfg.lambda_b

        if lam_idt > 0:
            loss_idt_a = l1_loss(idt_a, real_b) * cfg.lambda_b * lam_idt
            loss_idt_b = l1_loss(idt_b, real_a) * cfg.lambda_a * lam_idt
        else:
            loss_idt_a = jnp.float32(0)
            loss_idt_b = jnp.float32(0)

        # Logged but not optimized, like the reference (:217-218 vs :223).
        sg = jax.lax.stop_gradient
        loss_cor_a = cor_coe_loss(sg(fake_b), real_a) * cfg.lambda_co_a
        loss_cor_b = cor_coe_loss(sg(fake_a), real_b) * cfg.lambda_co_b

        loss = (loss_g_a + loss_g_b + loss_cycle_a + loss_cycle_b
                + loss_idt_a + loss_idt_b)
        aux = {
            "fake_a": sg(fake_a),
            "fake_b": sg(fake_b),
            "metrics": {
                "G_A": loss_g_a, "G_B": loss_g_b,
                "cycle_A": loss_cycle_a, "cycle_B": loss_cycle_b,
                "idt_A": loss_idt_a, "idt_B": loss_idt_b,
                "cor_coe_GA": loss_cor_a, "cor_coe_GB": loss_cor_b,
            },
        }
        return loss, aux

    def d_loss_impl(d_a, d_b, d_params, real_a, real_b, fake_a, fake_b):
        # loss_D = 0.5*(gan(D(real),1) + gan(D(pooled fake),0)) per D
        # (reference :138-149); both Ds step together (reference :237-240).
        # Real and fake stack into one batched apply under per-sample norms.
        bsz = real_a.shape[0]
        if fuse:
            pred_a = _d_apply(d_a, d_params["d_a"],
                              jnp.concatenate([real_b, fake_b]))
            pred_real_a, pred_fake_a = pred_a[:bsz], pred_a[bsz:]
            pred_b = _d_apply(d_b, d_params["d_b"],
                              jnp.concatenate([real_a, fake_a]))
            pred_real_b, pred_fake_b = pred_b[:bsz], pred_b[bsz:]
        else:
            pred_real_a = _d_apply(d_a, d_params["d_a"], real_b)
            pred_fake_a = _d_apply(d_a, d_params["d_a"], fake_b)
            pred_real_b = _d_apply(d_b, d_params["d_b"], real_a)
            pred_fake_b = _d_apply(d_b, d_params["d_b"], fake_a)
        loss_d_a = 0.5 * (gan_loss(pred_real_a, True, cfg.gan_mode)
                          + gan_loss(pred_fake_a, False, cfg.gan_mode))
        loss_d_b = 0.5 * (gan_loss(pred_real_b, True, cfg.gan_mode)
                          + gan_loss(pred_fake_b, False, cfg.gan_mode))
        return loss_d_a + loss_d_b, {"D_A": loss_d_a, "D_B": loss_d_b}

    tx = _adam(cfg.beta1)

    def apply_updates(params, grads, opt_state, lr):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
        return params, opt_state

    def train_step(state: CycleGANState, real_a, real_b, rng, lr):
        real_a = real_a.astype(cfg.dtype)
        real_b = real_b.astype(cfg.dtype)
        # Run the whole G<->D loop in the S2D(4) cell domain when supported:
        # the reals convert once here (C=1: tiny), every intermediate stays
        # in full-128-lane tiles, and no D2S/S2D relayout exists inside the
        # step. Losses are means, so they are layout-invariant.
        if cfg.uses_cells(real_a.shape[1:4]):
            from ..ops.s2d import space_to_depth

            nets = tuple(n.clone(cells_io=True) for n in base_nets)
            real_a = space_to_depth(real_a, 4)
            real_b = space_to_depth(real_b, 4)
        else:
            nets = base_nets
        g_loss_fn, d_loss_fn = _build_losses(*nets)
        k_drop, k_pool_a, k_pool_b = jax.random.split(rng, 3)
        if cfg.no_dropout:
            rngs_per_apply = ({},) * 6
        else:
            rngs_per_apply = tuple({"dropout": k}
                                   for k in jax.random.split(k_drop, 6))

        # Under spatial_sharding the losses are pmean-ed (ops/losses._gmean)
        # across the spatial — and on a 2-D dp x sp mesh also the batch —
        # axes, so every per-device grad — whether its loss term was computed
        # on the local depth shard (G's L1 terms) or replicated on gathered
        # volumes (everything through _d_apply, where the all_gather
        # transpose reduce-scatters cotangents back to shards) — carries a
        # 1/n-scaled share of the true gradient of the replicated params;
        # psum over the same axes assembles it exactly once. Outside the
        # context: no-op.
        from ..core.spatial_ctx import data_shard_info, spatial_shard_info

        sp_info = spatial_shard_info()
        dp_info = data_shard_info()
        ar_axes = tuple(i[0] for i in (sp_info, dp_info) if i is not None)

        def _allreduce(grads):
            if not ar_axes:
                return grads
            return jax.tree.map(lambda g: jax.lax.psum(g, ar_axes), grads)

        # --- G update (Ds frozen: d_params not differentiated) ---
        (_, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params, state.d_params, real_a, real_b, rngs_per_apply)
        g_grads = _allreduce(g_grads)
        g_params, opt_g = apply_updates(state.g_params, g_grads, state.opt_g, lr)

        # --- pool queries on the pre-update fakes ---
        # On a dp x sp mesh the batch is sharded: all_gather the fakes over
        # the batch axis so every device applies the IDENTICAL sequential
        # pool update (same key, same global batch — the reference's exact
        # pool semantics regardless of device count), then slice the mixed
        # result back to the local batch for the D update.
        def _pool_q(pool, fakes, k):
            if dp_info is None:
                return pool_query(pool, fakes, k, cfg.pool_size)
            b = fakes.shape[0]
            fakes_g = jax.lax.all_gather(fakes, dp_info[0], axis=0, tiled=True)
            pool, mix_g = pool_query(pool, fakes_g, k, cfg.pool_size)
            idx = jax.lax.axis_index(dp_info[0])
            mix = jax.lax.dynamic_slice_in_dim(mix_g, idx * b, b, axis=0)
            return pool, mix

        pool_fake_b, fake_b_mix = _pool_q(state.pool_fake_b, aux["fake_b"],
                                          k_pool_b)
        pool_fake_a, fake_a_mix = _pool_q(state.pool_fake_a, aux["fake_a"],
                                          k_pool_a)

        # --- D update ---
        (_, d_metrics), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, real_a, real_b, fake_a_mix, fake_b_mix)
        d_grads = _allreduce(d_grads)
        d_params, opt_d = apply_updates(state.d_params, d_grads, state.opt_d, lr)

        metrics = dict(aux["metrics"])
        metrics.update(d_metrics)
        new_state = state.replace(
            g_params=g_params, d_params=d_params,
            opt_g=opt_g, opt_d=opt_d,
            pool_fake_a=pool_fake_a, pool_fake_b=pool_fake_b,
            step=state.step + 1,
        )
        return new_state, metrics

    return train_step


def make_generate_fn(cfg: CycleGANConfig, which: str = "g_a"):
    """Inference forward for a single generator (the TestModel equivalent,
    reference models/test_model.py:41-48)."""
    g_a, g_b, _, _ = cfg.build_nets()
    net = {"g_a": g_a, "g_b": g_b}[which]

    def generate(params, x):
        return net.apply(params, x.astype(cfg.dtype), train=False)

    return generate


def forward_visuals(cfg: CycleGANConfig, state: CycleGANState, real_a, real_b):
    """real/fake/rec/idt volumes for inspection (the get_current_visuals
    equivalent, reference models/base_model.py:72-77). Not part of the hot
    step — call sparingly. Jitted internally (eager per-op dispatch would
    compile every conv separately)."""
    g_a, g_b, _, _ = cfg.build_nets()

    @jax.jit
    def _run(g_params, real_a, real_b):
        fake_b = g_a.apply(g_params["g_a"], real_a.astype(cfg.dtype), train=False)
        rec_a = g_b.apply(g_params["g_b"], fake_b, train=False)
        fake_a = g_b.apply(g_params["g_b"], real_b.astype(cfg.dtype), train=False)
        rec_b = g_a.apply(g_params["g_a"], fake_a, train=False)
        out = {"real_A": real_a, "fake_B": fake_b, "rec_A": rec_a,
               "real_B": real_b, "fake_A": fake_a, "rec_B": rec_b}
        if cfg.lambda_identity > 0:
            out["idt_A"] = g_a.apply(g_params["g_a"], real_b.astype(cfg.dtype), train=False)
            out["idt_B"] = g_b.apply(g_params["g_b"], real_a.astype(cfg.dtype), train=False)
        return out

    return _run(state.g_params, real_a, real_b)
