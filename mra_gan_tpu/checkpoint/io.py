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
        return self._ckptr.restore(p, template)

    def restore_raw(self, epoch):
        """Restore the saved pytree without a template (plain dicts/arrays) —
        used by inference to pull just the generators regardless of the
        discriminator/optimizer configuration used in training."""
        p = self.path(epoch)
        if not p.exists():
            raise FileNotFoundError(f"no checkpoint at {p}")
        with ocp.PyTreeCheckpointer() as ckptr:
            return ckptr.restore(p)

    def has(self, epoch) -> bool:
        return self.path(epoch).exists()


# ---------------------------------------------------------------------------
# torch import shim


def _resnet_module_order(params: dict) -> list:
    """Creation-order module paths of ResnetGenerator3D, matching the torch
    Sequential order of the reference's ResnetGenerator
    (reference models/networks3D.py:185-213):
    stem conv, 2 down convs, n blocks x 2 convs, 2 up convs, head conv."""
    n_blocks = sum(1 for k in params if k.startswith("ResnetBlock3D_"))
    order = [("Conv3D_0",), ("Conv3D_1",), ("Conv3D_2",)]
    for i in range(n_blocks):
        order.append((f"ResnetBlock3D_{i}", "Conv3D_0"))
        order.append((f"ResnetBlock3D_{i}", "Conv3D_1"))
    order += [("ConvTranspose3D_0",), ("ConvTranspose3D_1",), ("Conv3D_3",)]
    return order


def _nlayer_d_module_order(params: dict) -> list:
    n = sum(1 for k in params if k.startswith("Conv3D_"))
    return [(f"Conv3D_{i}",) for i in range(n)]


def load_torch_network(pth_path, params, arch: str = "resnet"):
    """Import a reference ``*.pth`` state dict into our param pytree.

    arch: 'resnet' (ResnetGenerator, reference models/networks3D.py:173-263)
    or 'nlayer_d' (NLayerDiscriminator, :381-425). Conv kernels transpose
    OIDHW -> DHWIO; transposed convs IODHW -> DHWIO; InstanceNorm running
    stats are dropped (never used at reference inference, see ops/norm.py).
    DataParallel 'module.' prefixes are stripped like the reference's
    new_state_dict (reference utils/utils.py:23-32).

    ``params`` is the linen variables dict {'params': {...}}; returns a new
    variables dict with imported weights (float32).
    """
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}

    # ordered conv (weight, bias) pairs from the torch Sequential
    bases = []
    for k in sd:
        if k.endswith(".weight") and sd[k].ndim == 5:
            bases.append(k[: -len(".weight")])

    def seq_key(base: str):
        return [int(p) if p.isdigit() else -1 for p in base.split(".")]

    bases.sort(key=seq_key)
    torch_convs = [
        (sd[b + ".weight"].numpy(),
         sd[b + ".bias"].numpy() if (b + ".bias") in sd else None)
        for b in bases
    ]

    inner = dict(params["params"])
    order = (_resnet_module_order(inner) if arch == "resnet"
             else _nlayer_d_module_order(inner))
    if len(order) != len(torch_convs):
        raise ValueError(
            f"conv count mismatch: checkpoint has {len(torch_convs)}, "
            f"template expects {len(order)} — wrong architecture/flags?")

    def set_in(tree, path, leaf_name, value):
        node = tree["params"]
        for p in path[:-1]:
            node = node[p]
        mod = dict(node[path[-1]])
        if value.shape != mod[leaf_name].shape:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}/{leaf_name}: "
                f"{value.shape} vs {mod[leaf_name].shape}")
        mod[leaf_name] = value
        node[path[-1]] = mod

    # rebuild as mutable nested dicts
    import copy

    new_params = {"params": copy.deepcopy(jax.tree.map(np.asarray, params["params"]))}
    for path, (w, b) in zip(order, torch_convs):
        transposed = path[-1].startswith("ConvTranspose")
        if transposed:
            k = np.transpose(w, (2, 3, 4, 0, 1)).astype(np.float32)  # IODHW->DHWIO
        else:
            k = np.transpose(w, (2, 3, 4, 1, 0)).astype(np.float32)  # OIDHW->DHWIO
        set_in(new_params, path, "kernel", k)
        if b is not None:
            set_in(new_params, path, "bias", b.astype(np.float32))
    return new_params


def save_torch_network(params, pth_path, arch: str = "resnet") -> None:
    """Export our param pytree to a reference-style torch state dict — the
    inverse of load_torch_network, so models trained here can be loaded by
    the reference's torch code (reference models/base_model.py:130-148).

    Key names follow the reference Sequential layout for ResnetGenerator
    (models/networks3D.py:185-213): model.{i}.weight/.bias with the blocks'
    convs under model.{i}.conv_block.{j}."""
    import torch

    inner = dict(params["params"])
    if arch == "resnet":
        order = _resnet_module_order(inner)
        n_blocks = sum(1 for k in inner if k.startswith("ResnetBlock3D_"))
        # torch Sequential indices: 0 pad, 1 conv, 2 norm, 3 relu,
        # 4 conv, 5 norm, 6 relu, 7 conv, 8 norm, 9 relu,
        # 10..10+n-1 blocks, then convT at 10+n, norm, relu, convT+3, ...,
        # pad, conv, tanh
        names = ["model.1", "model.4", "model.7"]
        for i in range(n_blocks):
            names += [f"model.{10 + i}.conv_block.1",
                      f"model.{10 + i}.conv_block.5"]
        base = 10 + n_blocks
        names += [f"model.{base}", f"model.{base + 3}", f"model.{base + 7}"]
    elif arch == "nlayer_d":
        order = _nlayer_d_module_order(inner)
        n = len(order)
        names = ["model.0"]
        for i in range(1, n - 1):
            names.append(f"model.{3 * i - 1}")
        names.append(f"model.{3 * (n - 1) - 1}")
    else:
        raise ValueError(arch)

    sd = {}
    for path, name in zip(order, names):
        node = inner
        for p in path:
            node = node[p]
        k = np.asarray(node["kernel"], np.float32)
        transposed = path[-1].startswith("ConvTranspose")
        if transposed:
            sd[name + ".weight"] = np.transpose(k, (3, 4, 0, 1, 2))  # DHWIO->IODHW
        else:
            sd[name + ".weight"] = np.transpose(k, (4, 3, 0, 1, 2))  # DHWIO->OIDHW
        if "bias" in node:
            sd[name + ".bias"] = np.asarray(node["bias"], np.float32)
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, pth_path)
