"""Device-mesh helpers for SPMD execution.

The reference is strictly single-GPU (SURVEY.md §2.5). This layer is the
TPU-native additive capability: a 1-D (or N-D) `jax.sharding.Mesh` over ICI,
data parallelism for the batch axis, subset parallelism for ensembled
inference, and point/spatial sharding hooks. Collectives are inserted by XLA
GSPMD from sharding annotations — no hand-written NCCL-equivalents needed.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names=("data",), devices=None, shape=None) -> Mesh:
    """Create a device mesh. Default: all devices on one 'data' axis."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if shape is None:
        if len(axis_names) != 1:
            raise ValueError("pass `shape` for multi-axis meshes")
        shape = (len(devices),)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def shard_along(x, mesh: Mesh, axis_name: str = "data", dim: int = 0):
    """Place `x` sharded along `dim` over the given mesh axis."""
    spec = [None] * x.ndim
    spec[dim] = axis_name
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
