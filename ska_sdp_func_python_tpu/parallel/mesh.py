"""Device-mesh construction helpers (framework M6).

The reference has no distributed backend (SURVEY.md §2c) — its scatter/
gather/sum primitives are parallelised by an external dask framework. Here
the backend is jax.sharding: a Mesh over ICI/DCN with psum/all-gather
collectives inserted by XLA.

Canonical axes:
    "data"  - visibility rows (time x baseline blocks): gridding shards,
              normal-equation shards
    "freq"  - frequency channels: embarrassingly parallel imaging/clean
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "P", "NamedSharding", "replicated", "shard_rows"]


def make_mesh(shape=None, axis_names=("data",), devices=None) -> Mesh:
    """Create a Mesh over the available devices.

    :param shape: mesh shape tuple (defaults to all devices on one axis)
    :param axis_names: mesh axis names
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh):
    """Sharding that replicates across the whole mesh."""
    return NamedSharding(mesh, P())


def shard_rows(mesh: Mesh, axis: str = "data"):
    """Sharding that splits the leading axis over ``axis``."""
    return NamedSharding(mesh, P(axis))
