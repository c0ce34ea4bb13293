"""3D network zoo as flax.linen modules (NDHWC, TPU-native).

Capability-parity with the reference zoo (reference models/networks3D.py):

- ``ResnetGenerator3D``      — c7s1-ngf, 2x stride-2 down, N residual blocks,
                               2x transposed-conv up, c7s1-out + Tanh
                               (reference :173-263).
- ``UnetGenerator3D``        — recursive skip U-Net, 4^3 stride-2 down /
                               transposed-conv up, channel-concat skips
                               (reference :270-343).
- ``DynUNet3D``              — nnU-Net-style auto-configured residual U-Net +
                               Tanh head, architecture-exact vs MONAI's
                               DynUNet res_block=True (reference :346-377).
- ``NLayerDiscriminator3D``  — 3D PatchGAN (reference :381-425).
- ``PixelDiscriminator3D``   — 1^3-conv per-voxel discriminator
                               (reference :428-450).
- ``define_g`` / ``define_d`` — name-keyed factories (reference :84-118).

Faithfully reproduced quirks (recorded, see docstrings):
- the U-Net's use_bias test in the reference compares against InstanceNorm2d
  and therefore always yields bias=False for norm-adjacent convs
  (reference :298-301); we reproduce bias=False there.
- ``define_g`` has an unreachable duplicate 'resnet_9blocks' branch selecting
  a 7-down U-Net (reference :94-95); we expose it as 'unet_128' instead.

Params are stored float32; compute runs in ``dtype`` (bfloat16 on TPU).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.conv import (
    conv3d,
    conv_transpose3d,
    extend_sharded_d,
    replication_pad3d,
)
from ..ops.init import get_initializer
from ..ops.norm import (
    instance_norm,
    instance_norm_act_auto,
    instance_norm_act_grouped,
)
from ..ops.s2d import (
    conv3d_head_stride2_cells,
    conv3d_s2d,
    conv3d_s2d_cells,
    conv3d_s2d_stride2,
    conv3d_stride2_cells,
    regroup_cells,
    space_to_depth,
)
from ..ops.subpixel import (
    conv_transpose3d_blocked,
    conv_transpose3d_subpixel,
    conv_transpose3d_subpixel_cells,
    conv_transpose3d_subpixel_f4,
)

Dtype = Any


def _canon(v):
    if isinstance(v, int):
        return (v, v, v)
    return tuple(int(x) for x in v)



def _bias_param(mod, features):
    """Bias param; stop_gradient'd when the callsite marked it norm-dead
    (see Conv3D.dead_bias)."""
    b = mod.param("bias", nn.initializers.zeros, (features,), jnp.float32)
    if getattr(mod, "dead_bias", False):
        b = jax.lax.stop_gradient(b)
    return b


class Conv3D(nn.Module):
    """Conv with torch-matching init; kernel (kd,kh,kw,Cin,Cout).

    ``same_edge_pad=True`` fuses the reference's ReplicationPad3d+valid-conv
    pattern (reference models/networks3D.py:185-186) and lets the op dispatch
    to the exact space-to-depth reformulation (ops/s2d.py) when the shape is
    MXU-hostile — large kernel with skinny channels, the measured 4-7 ms
    stem/head convs on v5e.
    """

    features: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    use_bias: bool = True
    kernel_init: Callable = None  # resolved by parent via init_type
    dtype: Dtype = jnp.float32
    same_edge_pad: bool = False
    # Cell-domain IO (ops/s2d.py): tensors between convs stay in S2D(f)
    # layout (lanes = f^3*C, full 128-lane tiles) so the norms/elementwise in
    # between skip XLA's C<128 lane padding, and the S2D/D2S relayouts of
    # adjacent reformulated convs cancel. 0 = true layout; 2/4 = S2D factor
    # of the input/output cell domain. Parameters stay reference-layout.
    cells_in: int = 0
    cells_out: int = 0
    # The bias of a conv immediately followed by instance norm is
    # analytically output-DEAD (the norm subtracts the per-channel mean, so
    # a constant shift cancels; proven against torch autodiff in
    # tests/test_torch_parity_step.py — both frameworks see only f32
    # cancellation noise there, which Adam amplifies into a ±lr random
    # walk). dead_bias=True keeps the parameter (checkpoint parity) and the
    # forward add, but stop_gradients it: the true gradient is exactly 0,
    # and skipping it deletes multi-ms f32 convert+relayout+reduce chains
    # XLA otherwise emits for the 100-MB activation cotangents (measured
    # ~5 ms/step at the reference workload).
    dead_bias: bool = False
    # The cell-domain input is a LANE concatenation of separate cell tensors
    # with these true-channel counts (a skip concat kept in cells, e.g.
    # DynUNet's decoder): the weight remap is applied per block
    # (ops/s2d.py conv3d_s2d_cells ci_split).
    ci_split: Any = ()

    @nn.compact
    def __call__(self, x):
        from ..core.spatial_ctx import spatial_shard_info

        k = _canon(self.kernel_size)
        cin = x.shape[-1] // (self.cells_in ** 3 if self.cells_in else 1)
        init = self.kernel_init or get_initializer("normal")
        kernel = self.param("kernel", init, (*k, cin, self.features), jnp.float32)
        xc = x.astype(self.dtype)
        kc = kernel.astype(self.dtype)
        if spatial_shard_info() is not None:
            # depth-sharded volume: halo-exchange padding, direct convs
            assert not (self.cells_in or self.cells_out)
            if self.same_edge_pad:
                half = (k[0] - 1) // 2
                y = conv3d(replication_pad3d(xc, half), kc, self.stride, 0)
            else:
                if isinstance(self.padding, int):
                    pd = ph = pw = self.padding
                else:
                    # per-axis padding (MONAI-style [(p,p), ...] pairs or
                    # flat per-axis ints); depth must be symmetric (the halo
                    # exchange sends equal slabs both ways)
                    pp = [tuple(int(v) for v in q)
                          if isinstance(q, (tuple, list)) else (int(q), int(q))
                          for q in self.padding]
                    assert all(a == b for a, b in pp), (
                        "depth-sharded Conv3D needs symmetric padding")
                    pd, ph, pw = pp[0][0], pp[1][0], pp[2][0]
                xe = extend_sharded_d(xc, pd, pd, "zero")
                y = conv3d(xe, kc, self.stride,
                           [(0, 0), (ph, ph), (pw, pw)])
            if self.use_bias:
                y = y + _bias_param(self, self.features).astype(self.dtype)
            return y
        if self.same_edge_pad:
            half = (k[0] - 1) // 2
            if self.cells_in or self.cells_out:
                # stem/head-style cell-domain conv. Pick the compute domain:
                # skinny outputs (head) run at f=4 (measured: f4 wins when
                # cout < 16, see _s2d_factor), fat outputs (stem) at f=2.
                # (stem at f=4 measured WORSE overall — the extra f4<->f2
                # regroups outweigh the friendlier backward lanes)
                f = 4 if self.features < 16 else 2
                if f == 4 and k[0] == k[1] == k[2] and k[0] % 2 == 1:
                    # head: relayout-free stride-2 conv on f2 cells
                    # (ops/s2d.py conv3d_head_stride2_cells).
                    if self.cells_in == 0:
                        xcc = space_to_depth(xc, 2)
                    elif self.cells_in != 2:
                        xcc = regroup_cells(xc, self.cells_in, 2, cin)
                    else:
                        xcc = xc
                    y = conv3d_head_stride2_cells(xcc, kc,
                                                  d2s=(self.cells_out == 0))
                    if self.cells_out not in (0, 4):
                        y = regroup_cells(y, 4, self.cells_out, self.features)
                else:
                    if self.cells_in == 0:
                        xcc = space_to_depth(xc, f)
                    elif self.cells_in != f:
                        xcc = regroup_cells(xc, self.cells_in, f, cin)
                    else:
                        xcc = xc
                    y = conv3d_s2d_cells(xcc, kc, f=f, pad_mode="edge",
                                         d2s=(self.cells_out == 0))
                    if self.cells_out not in (0, f):
                        y = regroup_cells(y, f, self.cells_out, self.features)
            else:
                f = _s2d_factor(k, self.stride, cin, self.features, x.shape[1:4])
                if f:
                    y = conv3d_s2d(xc, kc, f=f, pad_mode="edge")
                else:
                    y = conv3d(replication_pad3d(xc, half), kc, self.stride, 0)
        else:
            s = _canon(self.stride)
            p = self.padding
            if self.cells_in:
                if not isinstance(p, int):
                    # per-axis (lo,hi) pairs (the MONAI blocks); the cell
                    # forms need one symmetric uniform value
                    pp = [tuple(int(v) for v in q)
                          if isinstance(q, (tuple, list)) else (int(q), int(q))
                          for q in p]
                    assert all(a == b for a, b in pp) and len(set(pp)) == 1, pp
                    p = pp[0][0]
                xcc = (regroup_cells(xc, self.cells_in, 2, cin)
                       if self.cells_in != 2 else xc)
                if s == (1, 1, 1):
                    # zero-padded 'same' conv in the f2 cell domain (the
                    # MONAI blocks' stride-1 convs; zero pad = MONAI's)
                    assert (k[0] == k[1] == k[2] and k[0] % 2 == 1
                            and p == (k[0] - 1) // 2), (k, p)
                    y = conv3d_s2d_cells(xcc, kc, f=2, pad_mode="zero",
                                         d2s=(self.cells_out == 0),
                                         ci_split=tuple(self.ci_split))
                    if self.cells_out not in (0, 2):
                        y = regroup_cells(y, 2, self.cells_out, self.features)
                else:
                    assert s == (2, 2, 2), (
                        "cells_in without same_edge_pad supports stride-1 "
                        "'same' or stride-2 convs only")
                    y = conv3d_stride2_cells(xcc, kc, p)
            # stride-2 convs with skinny input channels (the PatchGAN's and
            # U-Net's first layers, cin=1) take the exact S2D(2) path: the
            # conv becomes stride-1 with 8*cin channels (ops/s2d.py).
            elif (s == (2, 2, 2) and isinstance(p, int) and cin < 8
                    and all(d % 2 == 0 for d in x.shape[1:4])):
                y = conv3d_s2d_stride2(xc, kc, p)
            else:
                y = conv3d(xc, kc, self.stride, self.padding)
        if self.use_bias:
            b = _bias_param(self, self.features).astype(self.dtype)
            if self.cells_out:
                b = jnp.tile(b, self.cells_out ** 3)  # lane order is (parity, c)
            y = y + b
        return y


def _s2d_factor(k, stride, cin, cout, spatial) -> int:
    """Pick the S2D factor for a same-conv, or 0 for the direct path.
    Measured on v5e: skinny channels dominate cost; f=4 wins when the output
    is skinny (head 32->1: 6.9ms -> 1.9ms), f=2 otherwise (stem 1->32:
    3.8ms -> 0.7ms)."""
    if _canon(stride) != (1, 1, 1) or k[0] < 5 or k[0] % 2 == 0:
        return 0
    if min(cin, cout) >= 16:
        return 0
    f = 4 if cout < 16 else 2
    while f > 1 and any(s % f for s in spatial):
        f //= 2
    return 0 if f == 1 else f


class ConvTranspose3D(nn.Module):
    features: int
    kernel_size: Any = 3
    stride: Any = 2
    padding: Any = 1
    output_padding: Any = 0
    use_bias: bool = True
    kernel_init: Callable = None
    dtype: Dtype = jnp.float32
    dead_bias: bool = False  # see Conv3D.dead_bias
    # cell-domain IO (ops/s2d.py): cells_in=2 consumes S2D(2) cells and emits
    # S2D(4) cells of the doubled grid via the composed weight remap (zero
    # activation relayout, ops/subpixel.py); cells_out=2 keeps the subpixel
    # pre-interleave cells of a true-layout input.
    cells_in: int = 0
    cells_out: int = 0

    @nn.compact
    def __call__(self, x):
        from ..core.spatial_ctx import spatial_shard_info
        from ..ops.s2d import depth_to_space
        from ..ops.subpixel import remap_weight_subpixel

        k = _canon(self.kernel_size)
        cin = x.shape[-1] // (self.cells_in ** 3 if self.cells_in else 1)
        init = self.kernel_init or get_initializer("normal")
        kernel = self.param("kernel", init, (*k, cin, self.features), jnp.float32)
        xc = x.astype(self.dtype)
        kc = kernel.astype(self.dtype)
        s = _canon(self.stride)
        p = _canon(self.padding)
        op = _canon(self.output_padding)
        # stride-2 upsamples take the exact subpixel path (ops/subpixel.py):
        # 3.4x fewer FLOPs and MXU-friendly shapes vs the input-dilated conv.
        subpixel_ok = (s == (2, 2, 2) and len(set(p)) == 1 and len(set(op)) == 1
                       and k[0] + op[0] - 2 * p[0] == 2)
        # kernel==stride, no padding (MONAI DynUNet's upsampler, incl. mixed
        # per-axis strides like (2,2,1)): disjoint output blocks — a 1^3 conv
        # + local interleave (ops/subpixel.conv_transpose3d_blocked), exact
        # and shard-local along a sharded depth axis (no halo needed).
        blocked_ok = (k == s and p == (0, 0, 0) and op == (0, 0, 0))
        if spatial_shard_info() is not None:
            assert not (self.cells_in or self.cells_out)
            if blocked_ok:
                y = conv_transpose3d_blocked(xc, kc)
            else:
                # depth-sharded: subpixel conv with depth halos, local
                # interleave
                assert subpixel_ok, (
                    "depth-sharded ConvTranspose3D supports stride-2 "
                    "(subpixel) or kernel==stride (blocked) forms only")
                wp, pad_lo, ku = remap_weight_subpixel(kc, p[0])
                pad_hi = ku - 1 - pad_lo
                xe = extend_sharded_d(xc, pad_lo, pad_hi, "zero")
                y = conv3d(xe, wp, 1,
                           [(0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi)])
                y = depth_to_space(y, 2)
            if self.use_bias:
                y = y + _bias_param(self, self.features).astype(self.dtype)
            return y
        if self.cells_in:
            assert subpixel_ok and self.cells_in == 2
            y = conv_transpose3d_subpixel_cells(xc, kc, p[0], op[0])
            tile = 64  # f4-cell lanes (p4, c)
        elif subpixel_ok and self.cells_out == 4:
            # true in -> f4 cells out as one stride-2 blocked subpixel conv
            y = conv_transpose3d_subpixel_f4(xc, kc, p[0], op[0])
            tile = 64
        elif blocked_ok and self.cells_out == 2:
            # kernel==stride==2: the blocked conv's pre-interleave output IS
            # the S2D(2) cell layout of the doubled grid — skip the
            # interleave entirely (DynUNet's decoder in cell domain).
            # Checked before the generic subpixel branch: k=s=2, p=op=0 is
            # also subpixel_ok, but the blocked form needs no padding/remap.
            assert s == (2, 2, 2), s
            y = conv_transpose3d_blocked(xc, kc, cells_out=True)
            tile = 8
        elif subpixel_ok:
            y = conv_transpose3d_subpixel(xc, kc, p[0], op[0],
                                          d2s=(self.cells_out == 0))
            tile = 8 if self.cells_out else 1
        elif blocked_ok and not self.cells_out:
            # kernel==stride (incl. per-axis (2,2,1)): no input dilation
            y = conv_transpose3d_blocked(xc, kc)
            tile = 1
        else:
            assert not self.cells_out, "cells_out needs the subpixel path"
            y = conv_transpose3d(xc, kc, self.stride, self.padding, self.output_padding)
            tile = 1
        if self.use_bias:
            b = _bias_param(self, self.features).astype(self.dtype)
            if tile > 1:
                b = jnp.tile(b, tile)
            y = y + b
        return y


class Norm3D(nn.Module):
    """Norm factory: 'instance' (stateless, affine-free, torch-default eps),
    'batch' (affine, batch statistics), or 'none'.

    Recorded deviation: batch norm here always normalizes with batch
    statistics and keeps no running averages. The reference tracks running
    stats but never flips nets to eval mode at inference (its test.py never
    calls model.eval()), so the running stats are dead state there too; a
    stateless norm keeps every network pure-params, which is what lets the
    whole G+D training step compile to a single XLA program.
    """

    kind: str = "instance"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.kind == "instance":
            return instance_norm(x)
        if self.kind == "batch":
            # torch init_weights: BatchNorm weight ~ N(1, 0.02), bias 0
            # (reference models/networks3D.py:60-62).
            scale = self.param(
                "scale",
                lambda key, shape, dt: 1.0 + 0.02 * jax.random.normal(key, shape, dt),
                (x.shape[-1],),
                jnp.float32,
            )
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2, 3), keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2, 3), keepdims=True)
            y = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
            return y.astype(x.dtype)
        if self.kind == "none":
            return x
        raise NotImplementedError(f"normalization layer [{self.kind}] is not found")


def _norm_act(h, kind: str, act: str, dtype, train: bool, slope: float = 0.2):
    """norm followed by activation, fused into the Pallas streaming kernel
    when the norm is affine-free instance norm (the default config)."""
    if kind == "instance":
        return instance_norm_act_auto(h, act=act, negative_slope=slope)
    h = Norm3D(kind, dtype)(h, train)
    if act == "relu":
        h = jax.nn.relu(h)
    elif act == "leaky_relu":
        h = jax.nn.leaky_relu(h, slope)
    return h


def _use_bias(norm: str) -> bool:
    # Conv bias is redundant under batch norm; instance norm here is
    # affine-free so the reference keeps bias for it (reference :180-183).
    return norm == "instance" or norm == "none"


class ResnetBlock3D(nn.Module):
    dim: int
    norm: str = "instance"
    use_dropout: bool = False
    use_bias: bool = True
    kernel_init: Callable = None
    dtype: Dtype = jnp.float32
    dead_bias: bool = False  # both convs feed norms; see Conv3D.dead_bias

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = replication_pad3d(x, 1)
        h = Conv3D(self.dim, 3, use_bias=self.use_bias, kernel_init=self.kernel_init,
                   dtype=self.dtype, dead_bias=self.dead_bias)(h)
        h = _norm_act(h, self.norm, "relu", self.dtype, train)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        h = replication_pad3d(h, 1)
        h = Conv3D(self.dim, 3, use_bias=self.use_bias, kernel_init=self.kernel_init,
                   dtype=self.dtype, dead_bias=self.dead_bias)(h)
        h = Norm3D(self.norm, self.dtype)(h, train)
        return x + h


class ResnetGenerator3D(nn.Module):
    """c7s1-ngf ... Tanh (reference models/networks3D.py:173-263).

    ``cells_io=True`` makes __call__ take and return S2D(4) cell-domain
    tensors (N, D/4, H/4, W/4, 64*C) — used by the fused train step so the
    whole G<->D loop never interleaves back to true layout. Parameters are
    identical in both modes (remaps are weight-side)."""

    output_nc: int = 1
    ngf: int = 32
    n_blocks: int = 6
    norm: str = "instance"
    use_dropout: bool = False
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    cells_io: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        ki = get_initializer(self.init_type, self.init_gain)
        bias = _use_bias(self.norm)
        # Full-resolution segments run in S2D cell domain (ops/s2d.py):
        # stem conv emits cells, norms use grouped lane statistics
        # (numerically identical), down1 consumes cells directly; on the way
        # out up1 keeps the subpixel pre-interleave cells, up2 maps f2-cells
        # to f4-cells with a composed weight remap (zero activation
        # relayout), and the head consumes f4 cells. This removes the
        # S2D/D2S relayouts between reformulated convs and the 4x
        # lane-padding tax XLA puts on C<128 full-res elementwise ops
        # (127 -> ~75 ms/step on v5e with the rest of the cell plumbing).
        from ..core.spatial_ctx import spatial_shard_info

        true_spatial = [int(s) * (4 if self.cells_io else 1)
                        for s in x.shape[1:4]]
        cells = (self.norm == "instance"
                 and all(s % 4 == 0 for s in true_spatial)
                 and spatial_shard_info() is None)
        assert cells or not self.cells_io, (
            "cells_io needs instance norm and spatial dims divisible by 4")
        cin = 2 if self.cells_io else 0
        h = x
        if self.cells_io:
            h = regroup_cells(h, 4, 2, x.shape[-1] // 64)
        dead = self.norm == "instance"  # see Conv3D.dead_bias
        h = Conv3D(self.ngf, 7, use_bias=bias, kernel_init=ki, dtype=self.dtype,
                   same_edge_pad=True, cells_in=cin, dead_bias=dead,
                   cells_out=(2 if cells else 0))(h)
        if cells:
            h = instance_norm_act_grouped(h, 8, 1e-5, "relu")
        else:
            h = _norm_act(h, self.norm, "relu", self.dtype, train)
        for i in range(2):  # downsample
            mult = 2 ** i
            h = Conv3D(self.ngf * mult * 2, 3, stride=2, padding=1, use_bias=bias,
                       kernel_init=ki, dtype=self.dtype, dead_bias=dead,
                       cells_in=(2 if cells and i == 0 else 0))(h)
            h = _norm_act(h, self.norm, "relu", self.dtype, train)
        mult = 4
        # named remat boundaries: under cycle_gan's --remat the checkpoint
        # policy saves ONLY these (+ the apply input), so the backward
        # recomputes one segment (stem+downs / trunk / ups+head) at a time —
        # peak activation memory drops to the largest segment's working set.
        # No-ops without jax.checkpoint; parameter tree unchanged.
        from jax.ad_checkpoint import checkpoint_name

        h = checkpoint_name(h, "g_trunk_in")
        for _ in range(self.n_blocks):
            h = ResnetBlock3D(self.ngf * mult, self.norm, self.use_dropout, bias,
                              ki, self.dtype, dead_bias=dead)(h, train)
        h = checkpoint_name(h, "g_trunk_out")
        for i in range(2):  # upsample
            mult = 2 ** (2 - i)
            last = i == 1
            # (up2 emitting f4 cells directly via the stride-2 blocked
            # subpixel remap measured WORSE — 83 vs 77 ms — the stride-2
            # conv's FLOP blowup and backward exceed the regroup savings)
            h = ConvTranspose3D(self.ngf * mult // 2, 3, stride=2, padding=1,
                                output_padding=1, use_bias=bias, kernel_init=ki,
                                dtype=self.dtype, dead_bias=dead,
                                cells_out=(2 if cells and last else 0))(h)
            if cells and last:
                h = instance_norm_act_grouped(h, 8, 1e-5, "relu")
            else:
                h = _norm_act(h, self.norm, "relu", self.dtype, train)
        h = Conv3D(self.output_nc, 7, use_bias=True, kernel_init=ki, dtype=self.dtype,
                   same_edge_pad=True, cells_in=(2 if cells else 0),
                   cells_out=(4 if self.cells_io else 0))(h)
        return jnp.tanh(h)


class UnetSkipBlock3D(nn.Module):
    """One U-Net level: down 4^3/s2 -> submodule -> up 4^3/s2, concat skip."""

    outer_nc: int
    inner_nc: int
    submodule: Optional[nn.Module] = None
    outermost: bool = False
    innermost: bool = False
    norm: str = "instance"
    use_dropout: bool = False
    kernel_init: Callable = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        ki = self.kernel_init
        # Reference quirk: its use_bias test compares to InstanceNorm2d and is
        # always False in the 3D zoo (reference models/networks3D.py:298-301).
        use_bias = False
        h = x
        if not self.outermost:
            h = jax.nn.leaky_relu(h, 0.2)
        h = Conv3D(self.inner_nc, 4, stride=2, padding=1, use_bias=use_bias,
                   kernel_init=ki, dtype=self.dtype)(h)
        if not (self.outermost or self.innermost):
            h = Norm3D(self.norm, self.dtype)(h, train)
        if self.submodule is not None:
            h = self.submodule(h, train)
        h = jax.nn.relu(h)
        if self.outermost:
            h = ConvTranspose3D(self.outer_nc, 4, stride=2, padding=1,
                                use_bias=True, kernel_init=ki, dtype=self.dtype)(h)
            return jnp.tanh(h)
        h = ConvTranspose3D(self.outer_nc, 4, stride=2, padding=1,
                            use_bias=use_bias, kernel_init=ki, dtype=self.dtype)(h)
        h = Norm3D(self.norm, self.dtype)(h, train)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        return jnp.concatenate([x, h], axis=-1)


class UnetGenerator3D(nn.Module):
    """U-Net with ``num_downs`` halvings; needs spatial dims divisible by
    2**num_downs (reference :270-287)."""

    output_nc: int = 1
    num_downs: int = 5
    ngf: int = 32
    norm: str = "instance"
    use_dropout: bool = False
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        need = 2 ** self.num_downs
        if min(x.shape[1:4]) < need:
            # the reference fails the same way, just deeper in (a stride-2
            # conv on a size-1 map inside UnetSkipConnectionBlock,
            # reference models/networks3D.py:270-343)
            raise ValueError(
                f"UnetGenerator3D with num_downs={self.num_downs} needs every "
                f"spatial dim >= {need}, got {x.shape[1:4]}; use a larger "
                f"patch_size or a shallower netG (unet_custom=5 downs, "
                f"unet_128=7, unet_256=8)")
        ki = get_initializer(self.init_type, self.init_gain)
        common = dict(norm=self.norm, kernel_init=ki, dtype=self.dtype)
        block = UnetSkipBlock3D(self.ngf * 8, self.ngf * 8, innermost=True, **common)
        for _ in range(self.num_downs - 5):
            block = UnetSkipBlock3D(self.ngf * 8, self.ngf * 8, submodule=block,
                                    use_dropout=self.use_dropout, **common)
        block = UnetSkipBlock3D(self.ngf * 4, self.ngf * 8, submodule=block, **common)
        block = UnetSkipBlock3D(self.ngf * 2, self.ngf * 4, submodule=block, **common)
        block = UnetSkipBlock3D(self.ngf, self.ngf * 2, submodule=block, **common)
        block = UnetSkipBlock3D(self.output_nc, self.ngf, submodule=block,
                                outermost=True, **common)
        return block(x, train)


def dynunet_schedule(
    sizes: Sequence[float] = (128, 128, 64),
    spacings: Sequence[float] = (1.5, 1.5, 1.5),
) -> Tuple[list, list]:
    """nnU-Net auto kernel/stride configuration (reference :348-363)."""
    sizes = list(sizes)
    spacings = list(spacings)
    strides, kernels = [], []
    while True:
        ratio = [sp / min(spacings) for sp in spacings]
        stride = [2 if r <= 2 and sz >= 8 else 1 for r, sz in zip(ratio, sizes)]
        kernel = [3 if r <= 2 else 1 for r in ratio]
        if all(s == 1 for s in stride):
            break
        sizes = [i / j for i, j in zip(sizes, stride)]
        spacings = [i * j for i, j in zip(spacings, stride)]
        kernels.append(kernel)
        strides.append(stride)
    strides.insert(0, [1, 1, 1])
    kernels.append([3, 3, 3])
    return kernels, strides


def spatial_granularity(net) -> Tuple[int, int, int]:
    """Per-axis spatial divisibility a generator's stride schedule needs for
    a whole-volume (non-patched) forward: resnet 4 (two stride-2 halvings;
    the cell-domain paths also want %4), U-Net 2^num_downs, DynUNet the
    per-axis product of its auto-schedule strides (mixed (2,2,1) levels give
    per-axis values). Callers pad volumes up to these multiples
    (parallel/spatial.single_pass_apply, test.py --spatial_shard)."""
    name = type(net).__name__
    if name == "UnetGenerator3D":
        g = 2 ** int(net.num_downs)
        return (g, g, g)
    if name == "DynUNet3D":
        _, strides = dynunet_schedule(net.sizes, net.spacings)
        out = [1, 1, 1]
        for s in strides:
            for a in range(3):
                out[a] *= int(s[a])
        return (out[0], out[1], out[2])
    return (4, 4, 4)


def _monai_pad(kernel, stride) -> list:
    """MONAI's get_padding: int((k - s + 1) / 2) per axis, symmetric —
    (1,1) for k=3 at stride 1 or 2, (0,0) for k=1."""
    return [(int((k - s + 1) / 2),) * 2
            for k, s in zip(_canon(kernel), _canon(stride))]


class _AffineIN(nn.Module):
    """torch InstanceNorm3d(affine=True) — MONAI's norm for DynUNet blocks
    (norm_name=("INSTANCE", {"affine": True}), track_running_stats=False,
    so the state dict carries exactly weight+bias).

    ``groups`` > 1: the input is a cell-domain tensor with that many lanes
    per true channel (lane order (parity, c)); stats come from the grouped
    reduction (numerically identical, full-lane tiles) and the affine is the
    parity-tiled scale/bias."""

    groups: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // self.groups
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.groups == 1:
            return instance_norm(x, scale=scale, bias=bias)
        z = instance_norm_act_grouped(x, self.groups)
        return (z * jnp.tile(scale, self.groups).astype(z.dtype)
                + jnp.tile(bias, self.groups).astype(z.dtype))


class _MonaiResBlock(nn.Module):
    """MONAI UnetResBlock (monai dynunet_block.py): conv1(k,s)-norm1-lrelu-
    conv2(k,1)-norm2, shortcut conv3(1,s)+norm3 when channels or stride
    change, then add + lrelu(0.01). Convs bias-free, norms affine.

    ``cells_in=2``: consume an S2D(2) cell-domain input. With stride 1 the
    whole block runs in cells (output stays in cells); with stride (2,2,2)
    the strided convs consume cells and the block emits true layout —
    exactly the resnet stem/down1 pattern (ops/s2d.py). Parameters are
    identical in all modes (remaps are weight-side)."""

    features: int
    kernel: Sequence[int]
    stride: Sequence[int]
    kernel_init: Callable = None
    dtype: Dtype = jnp.float32
    cells_in: int = 0

    @nn.compact
    def __call__(self, x):
        s = _canon(self.stride)
        in_cells = cout_cells = 0
        if self.cells_in:
            in_cells = self.cells_in
            cout_cells = 2 if s == (1, 1, 1) else 0
        true_cin = x.shape[-1] // (in_cells ** 3 if in_cells else 1)
        groups = 8 if cout_cells else 1
        h = Conv3D(self.features, self.kernel, stride=self.stride,
                   padding=_monai_pad(self.kernel, self.stride),
                   use_bias=False, kernel_init=self.kernel_init,
                   dtype=self.dtype, cells_in=in_cells,
                   cells_out=cout_cells, name="conv1")(x)
        h = _AffineIN(groups=groups, name="norm1")(h)
        h = jax.nn.leaky_relu(h, 0.01)
        h = Conv3D(self.features, self.kernel,
                   padding=_monai_pad(self.kernel, 1), use_bias=False,
                   kernel_init=self.kernel_init, dtype=self.dtype,
                   cells_in=cout_cells, cells_out=cout_cells,
                   name="conv2")(h)
        h = _AffineIN(groups=groups, name="norm2")(h)
        if true_cin != self.features or any(v != 1 for v in s):
            x = Conv3D(self.features, 1, stride=self.stride, use_bias=False,
                       kernel_init=self.kernel_init, dtype=self.dtype,
                       cells_in=in_cells, cells_out=cout_cells,
                       name="conv3")(x)
            x = _AffineIN(groups=groups, name="norm3")(x)
        return jax.nn.leaky_relu(x + h, 0.01)


class _MonaiBasicBlock(nn.Module):
    """MONAI UnetBasicBlock: conv1(k,1)-norm1-lrelu-conv2(k,1)-norm2-lrelu,
    no residual — the decoder block DynUNet uses even with res_block=True.

    ``cells=2``: the block runs in the S2D(2) cell domain; ``ci_split``
    marks the input as a LANE concatenation of separate cell tensors with
    these true-channel counts (the decoder concat kept in cells)."""

    features: int
    kernel: Sequence[int]
    kernel_init: Callable = None
    dtype: Dtype = jnp.float32
    cells: int = 0
    ci_split: Any = ()

    @nn.compact
    def __call__(self, x):
        groups = self.cells ** 3 if self.cells else 1
        h = Conv3D(self.features, self.kernel,
                   padding=_monai_pad(self.kernel, 1), use_bias=False,
                   kernel_init=self.kernel_init, dtype=self.dtype,
                   cells_in=self.cells, cells_out=self.cells,
                   ci_split=tuple(self.ci_split), name="conv1")(x)
        h = jax.nn.leaky_relu(_AffineIN(groups=groups, name="norm1")(h), 0.01)
        h = Conv3D(self.features, self.kernel,
                   padding=_monai_pad(self.kernel, 1), use_bias=False,
                   kernel_init=self.kernel_init, dtype=self.dtype,
                   cells_in=self.cells, cells_out=self.cells,
                   name="conv2")(h)
        return jax.nn.leaky_relu(_AffineIN(groups=groups, name="norm2")(h), 0.01)


class _MonaiUpBlock(nn.Module):
    """MONAI UnetUpBlock: transposed conv (kernel = stride =
    upsample_kernel_size, bias-free, no norm) -> cat(up, skip) -> basic
    block. Concat order is (upsampled, skip) — channel order matters for
    weight-level parity.

    ``cells_out=2`` (stride (2,2,2) only): the upsampler emits its
    pre-interleave S2D(2) cells directly, the skip must already be in f2
    cells, and the concat is a lane concat consumed by the conv block's
    block-split weight remap — the full-resolution decoder level never
    touches true layout."""

    features: int
    kernel: Sequence[int]
    up_stride: Sequence[int]
    kernel_init: Callable = None
    dtype: Dtype = jnp.float32
    cells_out: int = 0

    @nn.compact
    def __call__(self, h, skip):
        up = ConvTranspose3D(self.features, self.up_stride,
                             stride=self.up_stride, padding=0,
                             output_padding=0, use_bias=False,
                             kernel_init=self.kernel_init, dtype=self.dtype,
                             cells_out=self.cells_out,
                             name="transp_conv")(h)
        cat = jnp.concatenate([up, skip.astype(up.dtype)], axis=-1)
        if self.cells_out:
            skip_c = skip.shape[-1] // self.cells_out ** 3
            return _MonaiBasicBlock(self.features, self.kernel,
                                    self.kernel_init, self.dtype,
                                    cells=self.cells_out,
                                    ci_split=(self.features, skip_c),
                                    name="conv_block")(cat)
        return _MonaiBasicBlock(self.features, self.kernel, self.kernel_init,
                                self.dtype, name="conv_block")(cat)


class DynUNet3D(nn.Module):
    """MONAI DynUNet, architecture-exact ('Dynet', reference :346-377;
    MONAI monai/networks/nets/dynunet.py + dynunet_block.py, res_block=True,
    deep_supervision off, instance norm affine=True), with the reference's
    added Tanh head. Module names mirror MONAI's state-dict layout
    (input_block / downsamples_i / bottleneck / upsamples_j / output_block),
    so checkpoints migrate via checkpoint.io's 'Dynet' mapping. Filters are
    nnU-Net's min(32*2^i, 320); kernels/strides come from the auto-schedule
    (dynunet_schedule, exact reference math)."""

    output_nc: int = 1
    sizes: Tuple[int, int, int] = (128, 128, 64)
    spacings: Tuple[float, float, float] = (1.5, 1.5, 1.5)
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    cells_io: bool = False

    @staticmethod
    def schedule_supports_cells(sizes, spacings) -> bool:
        """Whether the auto-schedule's full-resolution level fits the cell
        forms: cubic 3^3 kernels at levels 0/1 and an isotropic first
        downsample (true for the reference default (128,128,64)@1.5^3;
        anisotropic spacings can give per-axis kernels/strides the cell
        remaps don't cover)."""
        kernels, strides = dynunet_schedule(sizes, spacings)
        return (len(kernels) >= 3
                and list(kernels[0]) == [3, 3, 3]
                and list(kernels[1]) == [3, 3, 3]
                and list(strides[1]) == [2, 2, 2])

    @nn.compact
    def __call__(self, x, train: bool = True):
        from ..core.spatial_ctx import spatial_shard_info

        ki = get_initializer(self.init_type, self.init_gain)
        kernels, strides = dynunet_schedule(self.sizes, self.spacings)
        n = len(kernels)
        filters = [min(32 * 2 ** i, 320) for i in range(n)]
        # Full-resolution segments (input_block, the last upsample's
        # conv_block, output_block — ~half the net's FLOPs at C=32/64) run
        # in the S2D(2) cell domain, the same lever that took the resnet
        # 127 -> ~75 ms/step: cell convs via weight remaps, grouped-lane
        # affine norms, the k=s=2 upsampler emitting its pre-interleave
        # cells, and a lane-concat skip consumed by a block-split remap.
        # f4-cell input (cells_io) has true dims divisible by 4 by
        # construction — the divisibility check only constrains the
        # true-layout path, where S2D(2) needs even dims. (The caller-side
        # divisibility enforcement for cells_io lives in
        # cycle_gan.uses_cells.)
        cells = (self.schedule_supports_cells(self.sizes, self.spacings)
                 and (self.cells_io
                      or all(int(s) % 2 == 0 for s in x.shape[1:4]))
                 and spatial_shard_info() is None)
        assert cells or not self.cells_io, (
            "cells_io needs a cell-compatible schedule and an unsharded "
            "evaluation")
        h = x
        if cells:
            h = (regroup_cells(h, 4, 2, x.shape[-1] // 64) if self.cells_io
                 else space_to_depth(h, 2))
        c2 = 2 if cells else 0
        h = _MonaiResBlock(filters[0], kernels[0], strides[0], ki,
                           self.dtype, cells_in=c2, name="input_block")(h)
        skips = [h]  # in f2 cells when `cells` (consumed cell-wise below)
        for i in range(1, n - 1):
            h = _MonaiResBlock(filters[i], kernels[i], strides[i], ki,
                               self.dtype, cells_in=(c2 if i == 1 else 0),
                               name=f"downsamples_{i - 1}")(h)
            skips.append(h)
        h = _MonaiResBlock(filters[n - 1], kernels[n - 1], strides[n - 1],
                           ki, self.dtype, name="bottleneck")(h)
        # upsamples_j counts from the bottleneck up (MONAI's ModuleList
        # order); decoder level i uses the NEXT level's kernel and the
        # upsample stride strides[i+1] (MONAI get_upsamples)
        for j, i in enumerate(range(n - 2, -1, -1)):
            h = _MonaiUpBlock(filters[i], kernels[i + 1], strides[i + 1],
                              ki, self.dtype,
                              cells_out=(c2 if i == 0 else 0),
                              name=f"upsamples_{j}")(h, skips[i])
        h = Conv3D(self.output_nc, 1, use_bias=True, kernel_init=ki,
                   dtype=self.dtype, cells_in=c2,
                   cells_out=(4 if self.cells_io else 0),
                   name="output_block")(h)
        return jnp.tanh(h)


class NLayerDiscriminator3D(nn.Module):
    """3D PatchGAN (reference :381-425). ``cells_io=True`` consumes S2D(4)
    cell-domain inputs (the train step's internal format) — the first conv
    regroups to f2 cells and runs the stride-2 cell remap; outputs and all
    other layers are unchanged."""

    ndf: int = 32
    n_layers: int = 3
    norm: str = "instance"
    use_sigmoid: bool = False
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    cells_io: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        # A too-small input makes the 1-channel head's output EMPTY along
        # some axis (e.g. 16 deep at n_layers=3: 16->8->4->2, then two
        # k4/s1/p1 convs -> 0), and a mean over an empty prediction is NaN —
        # every GAN loss silently goes NaN while cycle losses stay finite.
        # torch fails the same config loudly ("Output size is too small",
        # reference models/networks3D.py:381-425); match that with an
        # actionable error.
        true_sp = [int(s) * (4 if self.cells_io else 1) for s in x.shape[1:4]]
        dims = list(true_sp)
        for _ in range(self.n_layers):
            dims = [(d - 2) // 2 + 1 for d in dims]
        dims = [d - 2 for d in dims]  # two stride-1 4^3 convs, 1 voxel each
        if any(d < 1 for d in dims):
            raise ValueError(
                f"NLayerDiscriminator3D with n_layers={self.n_layers} needs "
                f"every spatial dim >= {3 * 2 ** self.n_layers}, got "
                f"{tuple(true_sp)}: the PatchGAN head would output an empty "
                f"map (and the GAN losses NaN). Use a larger patch_size or "
                f"fewer discriminator layers.")
        ki = get_initializer(self.init_type, self.init_gain)
        bias = _use_bias(self.norm)
        dead = self.norm == "instance"  # see Conv3D.dead_bias
        h = Conv3D(self.ndf, 4, stride=2, padding=1, use_bias=True,
                   kernel_init=ki, dtype=self.dtype,
                   cells_in=(4 if self.cells_io else 0))(x)
        h = jax.nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = Conv3D(self.ndf * nf, 4, stride=2, padding=1, use_bias=bias, dead_bias=dead,
                       kernel_init=ki, dtype=self.dtype)(h)
            h = _norm_act(h, self.norm, "leaky_relu", self.dtype, train)
        nf = min(2 ** self.n_layers, 8)
        h = Conv3D(self.ndf * nf, 4, stride=1, padding=1, use_bias=bias, dead_bias=dead,
                   kernel_init=ki, dtype=self.dtype)(h)
        h = _norm_act(h, self.norm, "leaky_relu", self.dtype, train)
        h = Conv3D(1, 4, stride=1, padding=1, use_bias=True,
                   kernel_init=ki, dtype=self.dtype)(h)
        if self.use_sigmoid:
            h = jax.nn.sigmoid(h)
        return h


class PixelDiscriminator3D(nn.Module):
    """Per-voxel 1^3-conv discriminator (reference :428-450)."""

    ndf: int = 32
    norm: str = "instance"
    use_sigmoid: bool = False
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    cells_io: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.cells_io:
            from ..ops.s2d import depth_to_space

            x = depth_to_space(x, 4)  # tiny: per-voxel D input is C=1-ish
        ki = get_initializer(self.init_type, self.init_gain)
        bias = _use_bias(self.norm)
        h = Conv3D(self.ndf, 1, use_bias=True, kernel_init=ki, dtype=self.dtype)(x)
        h = jax.nn.leaky_relu(h, 0.2)
        h = Conv3D(self.ndf * 2, 1, use_bias=bias, kernel_init=ki,
                   dtype=self.dtype, dead_bias=(self.norm == "instance"))(h)
        h = Norm3D(self.norm, self.dtype)(h, train)
        h = jax.nn.leaky_relu(h, 0.2)
        h = Conv3D(1, 1, use_bias=bias, kernel_init=ki, dtype=self.dtype)(h)
        if self.use_sigmoid:
            h = jax.nn.sigmoid(h)
        return h


def define_g(
    output_nc: int,
    ngf: int,
    net_g: str,
    norm: str = "instance",
    use_dropout: bool = False,
    init_type: str = "normal",
    init_gain: float = 0.02,
    dtype: Dtype = jnp.float32,
    dynet_sizes: Tuple[int, int, int] = (128, 128, 64),
    dynet_spacings: Tuple[float, float, float] = (1.5, 1.5, 1.5),
) -> nn.Module:
    """Generator factory keyed by the reference's netG names
    (reference :84-102). input_nc is implied by the input array."""
    common = dict(output_nc=output_nc, norm=norm, init_type=init_type,
                  init_gain=init_gain, dtype=dtype)
    if net_g == "resnet_9blocks":
        return ResnetGenerator3D(ngf=ngf, n_blocks=9, use_dropout=use_dropout, **common)
    if net_g == "resnet_6blocks":
        return ResnetGenerator3D(ngf=ngf, n_blocks=6, use_dropout=use_dropout, **common)
    if net_g == "unet_custom":
        return UnetGenerator3D(num_downs=5, ngf=ngf, use_dropout=use_dropout, **common)
    if net_g == "unet_128":
        return UnetGenerator3D(num_downs=7, ngf=ngf, use_dropout=use_dropout, **common)
    if net_g == "unet_256":
        return UnetGenerator3D(num_downs=8, ngf=ngf, use_dropout=use_dropout, **common)
    if net_g == "Dynet":
        return DynUNet3D(output_nc=output_nc, sizes=tuple(dynet_sizes),
                         spacings=tuple(dynet_spacings), init_type=init_type,
                         init_gain=init_gain, dtype=dtype)
    raise NotImplementedError(f"Generator model name [{net_g}] is not recognized")


def define_d(
    ndf: int,
    net_d: str,
    n_layers_d: int = 3,
    norm: str = "instance",
    use_sigmoid: bool = False,
    init_type: str = "normal",
    init_gain: float = 0.02,
    dtype: Dtype = jnp.float32,
) -> nn.Module:
    """Discriminator factory (reference :105-118)."""
    common = dict(ndf=ndf, norm=norm, use_sigmoid=use_sigmoid,
                  init_type=init_type, init_gain=init_gain, dtype=dtype)
    if net_d == "basic":
        return NLayerDiscriminator3D(n_layers=3, **common)
    if net_d == "n_layers":
        return NLayerDiscriminator3D(n_layers=n_layers_d, **common)
    if net_d == "pixel":
        return PixelDiscriminator3D(**common)
    raise NotImplementedError(f"Discriminator model name [{net_d}] is not recognized")
