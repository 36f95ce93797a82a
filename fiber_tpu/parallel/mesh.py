"""Device mesh + sharding helpers.

The reference scales with DDP/NCCL (SURVEY.md §2.3); the TPU-native
equivalent is a single `jax.sharding.Mesh` with a `data` axis and
jit-compiled global-view programs — XLA inserts the ICI collectives.
An optional `model` axis is provided for tensor-parallel sharding of the
attention/MLP weights (not needed at FIBER-Base scale, but supported so the
same code scales to larger variants).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(devices: Optional[Sequence[jax.Device]] = None,
                data: Optional[int] = None,
                model: int = 1) -> Mesh:
    """Build a (data, model) mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    dev_array = np.array(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with its leading axis sharded over data."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch)
