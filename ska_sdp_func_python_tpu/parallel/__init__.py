"""Device-mesh sharding and distributed pipelines (framework M6).

The distributed-communication backend the reference lacks (SURVEY.md §2c):
jax.sharding Mesh + shard_map + psum/all-gather over ICI/DCN.
"""

from .mesh import make_mesh, replicated, shard_rows, P, NamedSharding
from .distributed import (
    distributed_invert,
    distributed_predict,
    distributed_solve_gaintable,
)
from .selfcal import distributed_ical
from .fused import sharded_ical
from .redistribute import redistribute_visibility, reshard
from . import multihost

__all__ = [
    "multihost",
    "reshard",
    "redistribute_visibility",
    "make_mesh",
    "replicated",
    "shard_rows",
    "P",
    "NamedSharding",
    "distributed_invert",
    "distributed_predict",
    "distributed_solve_gaintable",
    "distributed_ical",
    "sharded_ical",
]
