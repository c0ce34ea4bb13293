"""Device mesh construction and sharding helpers.

The reference is single-GPU (its DataParallel path is commented out —
reference models/networks3D.py:69-75). The TPU-native equivalent is a
1-D data-parallel mesh over ICI: batch sharded on axis ``data``, params
replicated, gradient all-reduce inserted by XLA from the sharding
annotations. A second ``space`` axis is reserved for spatial sharding of
large volumes (TPU-native extension).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    space: int = 1,
) -> Mesh:
    """Build a (data, space) mesh. Defaults to all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if data is None:
        data = len(devices) // space
    if data * space != len(devices):
        raise ValueError(f"mesh {data}x{space} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(data, space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the batch axis sharded over ``data``."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
