"""Device mesh + sharding utilities (jax.sharding native)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a Mesh. Default: all devices on one ``data`` axis (pure DP).

    ``axes``/``shape`` allow e.g. axes=("data", "model"), shape=(4, 2).
    """
    devs = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devs)] + [1] * (len(axes) - 1)
    arr = np.asarray(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """device_put a pytree of host arrays with batch-dim sharding."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
