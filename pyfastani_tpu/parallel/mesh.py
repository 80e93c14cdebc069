"""Device-mesh helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(n_data: int = 1, n_shard: int | None = None, devices=None) -> Mesh:
    """Build a ("data", "shard") mesh.

    ``data`` parallelizes query fragments; ``shard`` partitions the
    reference index by genome.  Defaults to all shards on all devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_shard is None:
        n_shard = len(devices) // n_data
    if n_data * n_shard != len(devices):
        devices = devices[: n_data * n_shard]
    arr = np.asarray(devices).reshape(n_data, n_shard)
    return Mesh(arr, ("data", "shard"))
