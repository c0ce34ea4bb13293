"""Checkpoint save/restore.

Layout mirrors the reference's per-epoch scheme
(``{epoch}_net_{G_A,G_B,D_A,D_B}`` + a 'latest' alias, reference
models/base_model.py:89-112, train.py:132-143), stored as Orbax
checkpoints under ``<checkpoints_dir>/<name>/``. Improvements over the
reference (recorded): optimizer + pool + step state are saved too, so
resume is exact (the reference restarts Adam moments, SURVEY §5).

Also provides a torch-checkpoint import shim mapping the reference's
state-dict names onto our pytrees so users can migrate trained weights.
"""
from __future__ import annotations

from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..models.cycle_gan import CycleGANState


class CheckpointManager:
    def __init__(self, checkpoints_dir, name: str):
        self.root = Path(checkpoints_dir).resolve() / name
        self.root.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def path(self, epoch) -> Path:
        return self.root / f"ckpt_{epoch}"

    def save(self, epoch, state: CycleGANState, also_latest: bool = True) -> None:
        self._ckptr.save(self.path(epoch), state, force=True)
        self._ckptr.wait_until_finished()
        if also_latest and str(epoch) != "latest":
            self._ckptr.save(self.path("latest"), state, force=True)
            self._ckptr.wait_until_finished()

    def restore(self, epoch, template: CycleGANState) -> CycleGANState:
        p = self.path(epoch)
        if not p.exists():
            raise FileNotFoundError(f"no checkpoint at {p}")
        try:
            return self._ckptr.restore(p, template)
        except Exception as strict_err:
            try:
                return self._restore_relayout(p, template)
            except Exception:
                # the fallback only handles pool-layout mismatches; for
                # anything else (corrupt files, version mismatch) surface
                # the ORIGINAL strict-restore error, not the fallback's
                raise strict_err

    def _restore_relayout(self, p, template: CycleGANState) -> CycleGANState:
        """Fallback for checkpoints whose ImagePool layout differs from the
        template's — the single-chip step stores fakes in its internal
        S2D(4) cell layout while the spatial-parallel step stores them
        plain, so switching --spatial_parallel across a resume changes the
        pool buffer shapes. Pool HISTORY is layout-specific and replaceable;
        params/optimizer/step are not: adopt those from the checkpoint
        (strict on structure and shape) and reset any pool whose stored
        shape disagrees with the template."""
        import warnings

        import jax.numpy as jnp

        from ..models.cycle_gan import PoolState

        raw = self.restore_raw(str(p.name).replace("ckpt_", ""))

        def _place(s, t):
            """Adopt a saved leaf with the TEMPLATE's dtype and sharding —
            train.py restores AFTER shard_spatial_state, so under
            --spatial_parallel / --data_parallel the template's leaves carry
            mesh shardings that the restored state must keep (otherwise the
            jitted shard_map step would reshard, or fail, on every step)."""
            arr = jnp.asarray(s, t.dtype)
            sharding = getattr(t, "sharding", None)
            if sharding is not None:
                arr = jax.device_put(arr, sharding)
            return arr

        def _norm_path(kp):
            """Key path as a tuple of names, erasing the container kind —
            the raw restore turns namedtuples (optimizer states) into plain
            dicts, so DictKey('mu') must compare equal to GetAttrKey('mu')."""
            out = []
            for k in kp:
                for attr in ("key", "name", "idx"):
                    if hasattr(k, attr):
                        out.append(str(getattr(k, attr)))
                        break
                else:
                    out.append(str(k))
            return tuple(out)

        def _adopt(tmpl, saved, what):
            """Adopt saved leaves into the template by KEY PATH — never
            positionally: identically shaped convs in renamed/reordered
            modules must not silently restore into the wrong slot."""
            t_flat, treedef = jax.tree_util.tree_flatten_with_path(tmpl)
            s_by_path = {_norm_path(kp): leaf for kp, leaf in
                         jax.tree_util.tree_flatten_with_path(saved)[0]}
            if len(s_by_path) != len(t_flat):
                raise ValueError(
                    f"checkpoint {what} has {len(s_by_path)} arrays, expected "
                    f"{len(t_flat)} — different model/optimizer config")
            out = []
            for kp, t in t_flat:
                key = _norm_path(kp)
                if key not in s_by_path:
                    raise ValueError(
                        f"checkpoint {what} is missing key path "
                        f"{jax.tree_util.keystr(kp)} — different module "
                        f"layout")
                s = s_by_path[key]
                if tuple(np.shape(s)) != tuple(np.shape(t)):
                    raise ValueError(
                        f"checkpoint {what} shape {np.shape(s)} != template "
                        f"{np.shape(t)} at {jax.tree_util.keystr(kp)}")
                out.append(_place(s, t))
            return jax.tree_util.tree_unflatten(treedef, out)

        def _pool(tmpl: PoolState, saved, which):
            if tuple(np.shape(saved["images"])) == tuple(tmpl.images.shape):
                return PoolState(
                    images=_place(saved["images"], tmpl.images),
                    count=_place(saved["count"], tmpl.count))
            warnings.warn(
                f"checkpoint {which} buffer layout {np.shape(saved['images'])}"
                f" differs from this run's {tuple(tmpl.images.shape)} "
                "(single-chip cell layout vs spatial-parallel plain layout); "
                "pool history reset — training semantics re-fill it within "
                f"pool_size steps")
            return PoolState(images=_place(jnp.zeros(tmpl.images.shape,
                                                     tmpl.images.dtype),
                                           tmpl.images),
                             count=_place(jnp.zeros((), jnp.int32),
                                          tmpl.count))

        return template.replace(
            g_params=_adopt(template.g_params, raw["g_params"], "g_params"),
            d_params=_adopt(template.d_params, raw["d_params"], "d_params"),
            opt_g=_adopt(template.opt_g, raw["opt_g"], "opt_g"),
            opt_d=_adopt(template.opt_d, raw["opt_d"], "opt_d"),
            pool_fake_a=_pool(template.pool_fake_a, raw["pool_fake_a"], "pool_fake_a"),
            pool_fake_b=_pool(template.pool_fake_b, raw["pool_fake_b"], "pool_fake_b"),
            step=_place(raw["step"], template.step),
        )

    def restore_raw(self, epoch):
        """Restore the saved pytree without a template (plain dicts/arrays) —
        used by inference to pull just the generators regardless of the
        discriminator/optimizer configuration used in training. Arrays come
        back as host numpy: checkpoints written by a sharded run (e.g.
        --spatial_parallel) record mesh shardings that cannot be
        re-materialized template-free in a different process/device
        topology, so every leaf is restored by value instead."""
        p = self.path(epoch)
        if not p.exists():
            raise FileNotFoundError(f"no checkpoint at {p}")
        with ocp.PyTreeCheckpointer() as ckptr:
            meta = ckptr.metadata(p).item_metadata.tree
            restore_args = jax.tree.map(
                lambda m: ocp.RestoreArgs(restore_type=np.ndarray), meta)
            return ckptr.restore(p, restore_args=restore_args)

    def has(self, epoch) -> bool:
        return self.path(epoch).exists()


# ---------------------------------------------------------------------------
# torch import/export shim
#
# Explicit per-architecture layouts mapping our flax param paths onto the
# reference's torch state-dict keys, covering the full zoo the reference can
# save/load (reference models/base_model.py:89-148): ResnetGenerator (6/9
# blocks, models/networks3D.py:173-263), UnetGenerator (5/7/8 downs,
# :270-343), NLayerDiscriminator (:381-425) and PixelDiscriminator (:428-450).
# 'Dynet' is MONAI's DynUNet (:346-377); DynUNet3D matches its architecture
# (res_block=True) and maps via the dedicated MONAI-layout entries
# (_dynet_entries), including the affine instance-norm weights.
#
# Norm layers: the reference's instance norm is affine-free but
# track_running_stats=True (models/networks3D.py:19), so every reference
# checkpoint carries running_mean/running_var/num_batches_tracked buffers and
# the reference's strict load_state_dict (base_model.py:148) requires
# running_mean/running_var to be present (num_batches_tracked is popped by
# its __patch_instance_norm_state_dict, base_model.py:114-127). The buffers
# are dead at reference inference — its test.py never calls model.eval(), so
# instance statistics are always used — which is why import drops them and
# export emits fresh zeros/ones.


class _Entry:
    """One conv in torch registration order.

    flax:    path tuple into our params tree
    torch:   torch Sequential key base ('model.1' -> weights 'model.1.weight')
    norm:    key base of the norm layer that follows this conv, or None
    bias:    whether the torch conv has a bias parameter
    """

    __slots__ = ("flax", "torch", "norm", "bias")

    def __init__(self, flax, torch, norm=None, bias=True):
        self.flax, self.torch, self.norm, self.bias = flax, torch, norm, bias


def _resnet_layout(n_blocks: int, use_dropout: bool) -> list:
    """ResnetGenerator Sequential indices (reference models/networks3D.py:
    185-213): 0 pad, 1 conv, 2 norm, 3 relu | 4,5,6 down1 | 7,8,9 down2 |
    10..10+n-1 blocks | up1 at base, up2 at base+3 | base+6 pad, base+7 conv,
    base+8 tanh. Block conv_block (reference :229-259): 0 pad, 1 conv,
    2 norm, 3 relu, [4 dropout,] then pad, conv, norm — the second conv sits
    at index 5 without dropout and 6 with (the reference inserts Dropout at
    4, shifting the tail)."""
    c2 = 6 if use_dropout else 5
    ents = [
        _Entry(("Conv3D_0",), "model.1", "model.2"),
        _Entry(("Conv3D_1",), "model.4", "model.5"),
        _Entry(("Conv3D_2",), "model.7", "model.8"),
    ]
    for i in range(n_blocks):
        b = f"model.{10 + i}.conv_block"
        ents.append(_Entry((f"ResnetBlock3D_{i}", "Conv3D_0"), f"{b}.1", f"{b}.2"))
        ents.append(_Entry((f"ResnetBlock3D_{i}", "Conv3D_1"), f"{b}.{c2}", f"{b}.{c2 + 1}"))
    base = 10 + n_blocks
    ents += [
        _Entry(("ConvTranspose3D_0",), f"model.{base}", f"model.{base + 1}"),
        _Entry(("ConvTranspose3D_1",), f"model.{base + 3}", f"model.{base + 4}"),
        _Entry(("Conv3D_3",), f"model.{base + 7}"),
    ]
    return ents


def _unet_layout(n_levels: int) -> list:
    """UnetGenerator's recursive UnetSkipConnectionBlock keys (reference
    models/networks3D.py:293-337). Per level the inner Sequential is:
    outermost [downconv(0), sub(1), uprelu(2), upconv(3), tanh(4)];
    middle    [downrelu(0), downconv(1), downnorm(2), sub(3), uprelu(4),
               upconv(5), upnorm(6), (dropout appended — indices stable)];
    innermost [downrelu(0), downconv(1), uprelu(2), upconv(3), upnorm(4)].
    All convs have bias=False except the outermost upconv (the reference's
    use_bias check compares to InstanceNorm2d and is always False in the 3D
    zoo, reference :298-301; the outermost upconv takes torch's default
    bias=True, reference :312-314).

    Our flax blocks are flat siblings created innermost-first
    (UnetSkipBlock3D_0 = innermost, _{n_levels-1} = outermost)."""
    ents = []
    ups = []  # built on the way down, emitted reversed (registration order)
    prefix = "model.model"
    for lvl in range(n_levels):  # outermost -> innermost
        fx = f"UnetSkipBlock3D_{n_levels - 1 - lvl}"
        outer = lvl == 0
        inner = lvl == n_levels - 1
        if outer:
            ents.append(_Entry((fx, "Conv3D_0"), f"{prefix}.0", bias=False))
            ups.append(_Entry((fx, "ConvTranspose3D_0"), f"{prefix}.3", bias=True))
            prefix = f"{prefix}.1.model"
        elif inner:
            ents.append(_Entry((fx, "Conv3D_0"), f"{prefix}.1", bias=False))
            ups.append(_Entry((fx, "ConvTranspose3D_0"), f"{prefix}.3",
                              f"{prefix}.4", bias=False))
        else:
            ents.append(_Entry((fx, "Conv3D_0"), f"{prefix}.1", f"{prefix}.2",
                               bias=False))
            ups.append(_Entry((fx, "ConvTranspose3D_0"), f"{prefix}.5",
                              f"{prefix}.6", bias=False))
            prefix = f"{prefix}.3.model"
    return ents + ups[::-1]


def _nlayer_d_layout(n_layers: int) -> list:
    """NLayerDiscriminator Sequential (reference models/networks3D.py:
    389-422): conv(0), lrelu(1), then [conv, norm, lrelu] per middle layer,
    a stride-1 [conv, norm, lrelu], and the final 1-channel conv. First and
    last convs have torch-default bias=True; norm-adjacent convs use
    use_bias (True for instance norm, reference :384-387)."""
    ents = [_Entry(("Conv3D_0",), "model.0")]
    idx = 2
    for n in range(1, n_layers + 1):  # middles + the stride-1 layer
        ents.append(_Entry((f"Conv3D_{n}",), f"model.{idx}", f"model.{idx + 1}"))
        idx += 3
    ents.append(_Entry((f"Conv3D_{n_layers + 1}",), f"model.{idx}"))
    return ents


def _pixel_d_layout() -> list:
    """PixelDiscriminator — note its Sequential attribute is ``net``, not
    ``model`` (reference models/networks3D.py:436-447)."""
    return [
        _Entry(("Conv3D_0",), "net.0"),
        _Entry(("Conv3D_1",), "net.2", "net.3"),
        _Entry(("Conv3D_2",), "net.5"),
    ]


_ARCH_ALIASES = {
    "resnet": "resnet", "resnet_6blocks": "resnet", "resnet_9blocks": "resnet",
    "unet": "unet", "unet_custom": "unet", "unet_128": "unet", "unet_256": "unet",
    "nlayer_d": "nlayer_d", "basic": "nlayer_d", "n_layers": "nlayer_d",
    "pixel_d": "pixel_d", "pixel": "pixel_d",
}


def _dynet_entries(params: dict) -> list:
    """DynUNet3D <-> MONAI DynUNet state-dict layout (reference
    models/networks3D.py:346-377 builds monai.networks.nets.DynUNet with
    res_block=True; layout per monai/networks/nets/dynunet.py +
    blocks/dynunet_block.py). Our module names mirror MONAI's attribute
    paths, so entries are (flax_path, torch_key_base, kind) with kind one
    of 'conv' (OIDHW weight, no bias), 'transp' (IODHW weight, no bias),
    'norm' (affine instance norm weight/bias -> scale/bias), 'out'
    (1^3 conv WITH bias). MONAI wraps every conv in a Convolution module,
    hence the '.conv' suffix; its instance norms track no running stats."""
    def _num(name):
        return int(name.rsplit("_", 1)[1])

    downs = sorted((k for k in params if k.startswith("downsamples_")), key=_num)
    ups = sorted((k for k in params if k.startswith("upsamples_")), key=_num)
    entries = []
    for b in ["input_block"] + downs + ["bottleneck"]:
        tb = b.replace("downsamples_", "downsamples.")
        for c in ("conv1", "conv2", "conv3"):
            if c in params[b]:
                entries.append(((b, c), f"{tb}.{c}.conv", "conv"))
        for nm in ("norm1", "norm2", "norm3"):
            if nm in params[b]:
                entries.append(((b, nm), f"{tb}.{nm}", "norm"))
    for u in ups:
        tu = u.replace("upsamples_", "upsamples.")
        entries.append(((u, "transp_conv"), f"{tu}.transp_conv.conv", "transp"))
        for c in ("conv1", "conv2"):
            entries.append(((u, "conv_block", c), f"{tu}.conv_block.{c}.conv",
                            "conv"))
        for nm in ("norm1", "norm2"):
            entries.append(((u, "conv_block", nm), f"{tu}.conv_block.{nm}",
                            "norm"))
    entries.append((("output_block",), "output_block.conv.conv", "out"))
    return entries


def _dynet_alias_map(n_levels: int) -> list:
    """MONAI DynUNet registers every block a SECOND time under
    ``skip_layers`` (dynunet.py create_skips wraps the same module objects
    in a DynUNetSkipLayer chain, and torch's state_dict does not dedup
    shared submodules), so real checkpoints carry duplicate keys:
    skip_layers(.next_layer)*i.downsample ≡ input_block / downsamples.{i-1},
    skip_layers(.next_layer)*i.upsample ≡ upsamples.{n-2-i} (the chain is
    built outermost-first over reversed upsamples), and the deepest
    .next_layer chain IS the bottleneck. Returns (alias_prefix,
    canonical_prefix) pairs."""
    pairs = []
    for i in range(n_levels - 1):
        prefix = "skip_layers" + ".next_layer" * i
        pairs.append((prefix + ".downsample",
                      "input_block" if i == 0 else f"downsamples.{i - 1}"))
        pairs.append((prefix + ".upsample", f"upsamples.{n_levels - 2 - i}"))
    pairs.append(("skip_layers" + ".next_layer" * (n_levels - 1), "bottleneck"))
    return pairs


def _load_dynet(sd: dict, params) -> dict:
    import copy

    new_params = {"params": copy.deepcopy(
        jax.tree.map(np.asarray, params["params"]))}
    entries = _dynet_entries(new_params["params"])
    want_keys = set()
    for path, tb, kind in entries:
        want_keys.add(tb + ".weight")
        if kind in ("norm", "out"):
            want_keys.add(tb + ".bias")
    have = set(sd.keys())
    # skip_layers.* keys are aliases of the canonical blocks (shared
    # storage, see _dynet_alias_map) — ignored on import, but VERIFIED
    # against their canonical twins first: a merged/hand-edited checkpoint
    # whose duplicates diverged would otherwise import silently from the
    # canonical half only. Longest-prefix match, since the bottleneck's
    # chain prefix is a proper prefix of deeper downsample/upsample ones.
    n_levels = 1 + sum(1 for p, _, _ in entries
                       if p[0] == "upsamples" or str(p[0]).startswith("upsamples_")
                       if p[-1] == "transp_conv")
    aliases = sorted(_dynet_alias_map(n_levels),
                     key=lambda pc: -len(pc[0]))
    for k in sorted(have):
        if not k.startswith("skip_layers"):
            continue
        for apre, cpre in aliases:
            if k.startswith(apre + "."):
                ck = cpre + k[len(apre):]
                if ck in have and not np.array_equal(
                        sd[k].numpy(), sd[ck].numpy()):
                    raise ValueError(
                        f"Dynet checkpoint alias {k} diverges from its "
                        f"canonical twin {ck} — MONAI DynUNet registers "
                        "shared modules twice and both copies must be "
                        "identical; this checkpoint appears merged or "
                        "edited inconsistently.")
                break
    extras = {k for k in have - want_keys if not k.startswith("skip_layers")}
    if extras or (want_keys - have):
        raise ValueError(
            "Dynet checkpoint layout mismatch vs MONAI DynUNet "
            f"(res_block=True): unexpected keys {sorted(extras)[:4]}, "
            f"missing {sorted(want_keys - have)[:4]} — was the net built "
            "with different sizes/spacings (see dynet_sizes flags)?")
    for path, tb, kind in entries:
        node = _get_node(new_params["params"], path)
        if kind == "norm":
            for tname, fname in (("weight", "scale"), ("bias", "bias")):
                v = sd[f"{tb}.{tname}"].numpy().astype(np.float32)
                if v.shape != node[fname].shape:
                    raise ValueError(f"shape mismatch at {'/'.join(path)}."
                                     f"{fname}: {v.shape} vs {node[fname].shape}")
                node[fname] = v
            continue
        w = sd[tb + ".weight"].numpy()
        if kind == "transp":
            k = np.transpose(w, (2, 3, 4, 0, 1)).astype(np.float32)  # IODHW
        else:
            k = np.transpose(w, (2, 3, 4, 1, 0)).astype(np.float32)  # OIDHW
        if k.shape != node["kernel"].shape:
            raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                             f"{k.shape} vs {node['kernel'].shape}")
        node["kernel"] = k
        if kind == "out":
            node["bias"] = sd[tb + ".bias"].numpy().astype(np.float32)
    return new_params


def _save_dynet(params, pth_path) -> None:
    import torch

    inner = dict(params["params"])
    sd = {}
    for path, tb, kind in _dynet_entries(inner):
        node = _get_node(inner, path)
        if kind == "norm":
            sd[tb + ".weight"] = torch.tensor(np.asarray(node["scale"], np.float32))
            sd[tb + ".bias"] = torch.tensor(np.asarray(node["bias"], np.float32))
            continue
        k = np.asarray(node["kernel"], np.float32)
        if kind == "transp":
            sd[tb + ".weight"] = torch.tensor(np.transpose(k, (3, 4, 0, 1, 2)))
        else:
            sd[tb + ".weight"] = torch.tensor(np.transpose(k, (4, 3, 0, 1, 2)))
        if kind == "out":
            sd[tb + ".bias"] = torch.tensor(np.asarray(node["bias"], np.float32))
    # duplicate every block under its skip_layers alias so MONAI's strict
    # load_state_dict (which expects BOTH registrations) succeeds
    n_levels = 2 + sum(1 for k in inner if k.startswith("downsamples_"))
    for alias, canon in _dynet_alias_map(n_levels):
        for key in [k for k in sd if k.startswith(canon + ".")]:
            sd[alias + key[len(canon):]] = sd[key]
    torch.save(sd, pth_path)


def _layout_for(params: dict, arch: str, use_dropout: bool) -> list:
    """Build the layout for ``arch``, sizing it from the params tree."""
    kind = _ARCH_ALIASES.get(arch)
    if kind is None:
        raise ValueError(f"unknown arch {arch!r}; expected one of "
                         f"{sorted(_ARCH_ALIASES)} or 'Dynet'")
    if kind == "resnet":
        return _resnet_layout(
            sum(1 for k in params if k.startswith("ResnetBlock3D_")), use_dropout)
    if kind == "unet":
        return _unet_layout(
            sum(1 for k in params if k.startswith("UnetSkipBlock3D_")))
    if kind == "nlayer_d":
        return _nlayer_d_layout(
            sum(1 for k in params if k.startswith("Conv3D_")) - 2)
    return _pixel_d_layout()


def _get_node(params: dict, path):
    node = params
    for p in path:
        node = node[p]
    return node


def load_torch_network(pth_path, params, arch: str = "resnet"):
    """Import a reference ``*.pth`` state dict into our param pytree.

    arch: any reference netG/netD name ('resnet_6blocks', 'resnet_9blocks',
    'unet_custom', 'unet_128', 'unet_256', 'basic', 'n_layers', 'pixel') or
    the shorthands 'resnet'/'unet'/'nlayer_d'/'pixel_d'. Conv kernels
    transpose OIDHW -> DHWIO; transposed convs IODHW -> DHWIO; InstanceNorm
    running stats are dropped (dead at reference inference — its test.py
    never calls model.eval(), so instance statistics are always used).
    DataParallel 'module.' prefixes are stripped like the reference's
    new_state_dict (reference utils/utils.py:23-32). Dropout variants are
    autodetected from the checkpoint's key indices.

    ``params`` is the linen variables dict {'params': {...}}; returns a new
    variables dict with imported weights (float32).
    """
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}

    if arch in ("Dynet", "dynet"):
        return _load_dynet(sd, params)

    inner = dict(params["params"])
    use_dropout = any(".conv_block.6.weight" in k for k in sd)
    layout = _layout_for(inner, arch, use_dropout)

    conv_keys = {k for k, v in sd.items() if k.endswith(".weight") and v.ndim == 5}
    want = {e.torch + ".weight" for e in layout}
    if conv_keys != want:
        raise ValueError(
            f"conv count mismatch: checkpoint has {len(conv_keys)} conv "
            f"weights, template expects {len(want)} — wrong architecture/"
            f"flags? unexpected: {sorted(conv_keys - want)[:4]}, "
            f"missing: {sorted(want - conv_keys)[:4]}")

    import copy

    new_params = {"params": copy.deepcopy(jax.tree.map(np.asarray, params["params"]))}
    for e in layout:
        node = _get_node(new_params["params"], e.flax)
        w = sd[e.torch + ".weight"].numpy()
        transposed = e.flax[-1].startswith("ConvTranspose")
        if transposed:
            k = np.transpose(w, (2, 3, 4, 0, 1)).astype(np.float32)  # IODHW->DHWIO
        else:
            k = np.transpose(w, (2, 3, 4, 1, 0)).astype(np.float32)  # OIDHW->DHWIO
        if k.shape != node["kernel"].shape:
            raise ValueError(
                f"shape mismatch at {'/'.join(e.flax)}: {k.shape} vs "
                f"{node['kernel'].shape}")
        node["kernel"] = k
        b = sd.get(e.torch + ".bias")
        if b is not None:
            if "bias" not in node:
                raise ValueError(f"checkpoint has a bias at {e.torch} but "
                                 f"{'/'.join(e.flax)} takes none")
            node["bias"] = b.numpy().astype(np.float32)
    return new_params


def save_torch_network(params, pth_path, arch: str = "resnet",
                       use_dropout: bool = False) -> None:
    """Export our param pytree to a reference-style torch state dict — the
    inverse of load_torch_network, so models trained here load into the
    reference's torch code via its strict load_state_dict
    (reference models/base_model.py:130-148).

    For every norm position we also emit running_mean=zeros/running_var=ones/
    num_batches_tracked=0: the reference's instance norm tracks running stats
    (models/networks3D.py:19) so its strict load requires the buffer keys,
    but they are dead state at reference inference (test.py never calls
    model.eval()), so fresh values are exact.

    ``use_dropout`` must match the flags the reference net will be built
    with — it shifts the residual blocks' second-conv index (reference
    models/networks3D.py:244-256)."""
    import torch

    if arch in ("Dynet", "dynet"):
        _save_dynet(params, pth_path)
        return

    inner = dict(params["params"])
    layout = _layout_for(inner, arch, use_dropout)

    sd = {}
    for e in layout:
        node = _get_node(inner, e.flax)
        k = np.asarray(node["kernel"], np.float32)
        transposed = e.flax[-1].startswith("ConvTranspose")
        if transposed:
            w = np.transpose(k, (3, 4, 0, 1, 2))  # DHWIO->IODHW
            cout = k.shape[4]
        else:
            w = np.transpose(k, (4, 3, 0, 1, 2))  # DHWIO->OIDHW
            cout = k.shape[4]
        sd[e.torch + ".weight"] = torch.tensor(w)
        if "bias" in node:
            sd[e.torch + ".bias"] = torch.tensor(np.asarray(node["bias"], np.float32))
        elif e.bias:
            # torch conv has a bias we never created (shouldn't happen with
            # matching flags) — emit zeros so strict load still succeeds
            sd[e.torch + ".bias"] = torch.zeros(cout)
        if e.norm is not None:
            sd[e.norm + ".running_mean"] = torch.zeros(cout)
            sd[e.norm + ".running_var"] = torch.ones(cout)
            sd[e.norm + ".num_batches_tracked"] = torch.tensor(0, dtype=torch.long)
    torch.save(sd, pth_path)
