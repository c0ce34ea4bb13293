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

import re
from pathlib import Path
from typing import Any, Optional

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


def _torch_key_to_path(key: str):
    """Map a reference state-dict key like 'model.10.conv_block.5.weight'
    to (layer_index_chain, param_kind)."""
    parts = key.split(".")
    kind = parts[-1]
    idxs = [int(p) for p in parts if p.isdigit()]
    return idxs, kind


def load_torch_generator(pth_path, params_template) -> Any:
    """Import a reference ``*_net_G_*.pth`` ResnetGenerator checkpoint into
    our ResnetGenerator3D param pytree.

    Reference module order (models/networks3D.py:185-213):
    Sequential[pad, conv7, norm, relu, (conv s2, norm, relu)x2,
    ResnetBlock xN, (convT, norm, relu)x2, pad, conv7, tanh]; our linen
    params are named Conv3D_0..n / ConvTranspose3D_0..1 in the same
    creation order. Conv kernels transpose OIDHW -> DHWIO (transposed
    convs IODHW -> DHWIO); InstanceNorm running stats are dropped
    (never used at reference inference — SURVEY §2.2 / our norm docs).
    """
    import torch

    sd = torch.load(pth_path, map_location="cpu")
    # strip DataParallel prefixes like the reference's new_state_dict
    # (reference utils/utils.py:23-32)
    sd = { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }

    convs = []  # ordered (weight, bias|None, is_transposed)
    seen = {}
    for k, v in sd.items():
        if k.endswith(".weight") and v.ndim == 5:
            base = k[: -len(".weight")]
            seen[base] = {"weight": v.numpy()}
    for k, v in sd.items():
        if k.endswith(".bias"):
            base = k[: -len(".bias")]
            if base in seen:
                seen[base]["bias"] = v.numpy()

    def order_key(base: str):
        return [int(p) if p.isdigit() else -1 for p in base.split(".")]

    ordered = [seen[b] for b in sorted(seen, key=order_key)]

    flat = jax.tree_util.tree_flatten_with_path(params_template)[0]
    # group template leaves by module path prefix, in order
    mods = {}
    for path, leaf in flat:
        keys = [getattr(p, "key", None) for p in path]
        mod = next((k for k in keys if k and ("Conv" in k)), None)
        if mod is None:
            continue
        mods.setdefault(mod, {})[keys[-1]] = (path, leaf)

    def mod_order(name: str):
        # creation order == numeric suffix order per type; ResnetGenerator3D
        # interleaves Conv3D_* then ConvTranspose3D_*; rely on scan order of
        # the torch sequence to match sorted-by-first-use below.
        return name

    # Walk template convs in torch order: this works because linen names are
    # assigned in call order and the architectures are sequential.
    ordered_mods = sorted(
        mods.items(),
        key=lambda kv: (0 if kv[0].startswith("Conv3D") else 1)
        if False else int(re.search(r"_(\d+)$", kv[0]).group(1))
        + (1000 if kv[0].startswith("ConvTranspose") else 0),
    )
    # interleave: Conv3D_0..2 (head+2 downs), blocks' convs (inside submodules
    # they appear under their own scope) — handled by the caller passing the
    # full nested template; here we simply require counts to match.
    tensors = []
    for path, leaf in flat:
        keys = [getattr(p, "key", None) for p in path]
        if keys[-1] in ("kernel", "bias"):
            tensors.append((path, leaf, keys[-1]))

    new_leaves = {}
    ti = 0
    for entry in ordered:
        w = entry["weight"]
        is_transposed_guess = None
        # assign kernel
        while ti < len(tensors) and tensors[ti][2] != "kernel":
            ti += 1
        if ti >= len(tensors):
            raise ValueError("torch checkpoint has more convs than template")
        path, leaf, _ = tensors[ti]
        ti += 1
        keys = [getattr(p, "key", None) for p in path]
        transposed = any(k and k.startswith("ConvTranspose") for k in keys)
        if transposed:
            k = np.transpose(w, (2, 3, 4, 0, 1))  # IODHW -> DHWIO
        else:
            k = np.transpose(w, (2, 3, 4, 1, 0))  # OIDHW -> DHWIO
        if k.shape != leaf.shape:
            raise ValueError(f"shape mismatch {k.shape} vs {leaf.shape} at {keys}")
        new_leaves[tuple(str(p) for p in path)] = k.astype(np.float32)
        if "bias" in entry:
            if ti < len(tensors) and tensors[ti][2] == "bias":
                bpath, bleaf, _ = tensors[ti]
                ti += 1
                b = entry["bias"].astype(np.float32)
                if b.shape != bleaf.shape:
                    raise ValueError(f"bias shape mismatch at {bpath}")
                new_leaves[tuple(str(p) for p in bpath)] = b

    def replace(path, leaf):
        key = tuple(str(p) for p in path)
        return new_leaves.get(key, leaf)

    return jax.tree_util.tree_map_with_path(replace, params_template)
