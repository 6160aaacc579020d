"""Multi-host (multi-process) runtime for the sharded pipelines.

SURVEY.md §7 M6 / BASELINE.md item 5: the 1B-visibility self-cal runs
sharded across a multi-host pod slice. The single-program SPMD design in
:mod:`parallel.fused` already expresses the computation over a global
``jax.sharding.Mesh``; this module supplies the multi-process runtime
around it:

* :func:`initialize` — one-call ``jax.distributed`` bring-up (env-var or
  explicit coordinator), safe to call once per process.
* :func:`global_mesh` — a mesh over ALL processes' devices.
* :func:`local_shard_indices` — which shards of a leading-axis-sharded
  pytree this process owns (process-local shard construction: each host
  builds gridding plans and sorted streams only for its own rows).
* :func:`stack_shards_global` — assemble per-shard host pytrees into
  a globally-sharded pytree via ``make_array_from_single_device_arrays``
  without ever materialising the full array on one host.

The reference delegates its distribution to an external dask execution
framework (SURVEY.md §2c); DCN/ICI collectives via XLA replace it here.
A two-process CPU integration test drives this end to end
(tests/test_multihost.py -> tests/_multihost_worker.py).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize",
    "global_mesh",
    "local_shard_indices",
    "stack_shards_global",
    "process_count",
    "process_index",
]


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> None:
    """Bring up the jax distributed runtime (idempotent).

    Arguments default to the standard environment variables
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``) or auto-detection on managed clusters. On a
    single process (no coordinator configured anywhere) this is a no-op.
    """
    # NOTE: must not touch jax.devices()/process_count() here — those
    # initialise the XLA backend, after which distributed bring-up is
    # rejected. The distributed client handle is the safe signal.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialised
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def global_mesh(axis_names=("data",), shape=None, devices=None) -> Mesh:
    """A mesh over every device of every process (DCN x ICI)."""
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def local_shard_indices(mesh: Mesh, axis: str = "data") -> list[int]:
    """Indices along ``axis`` whose devices belong to this process.

    With one shard per device along ``axis`` (the layout
    ``parallel.fused.sharded_ical`` uses), these are the shards this
    process must construct.
    """
    if mesh.devices.ndim != 1:
        # shards along `axis` map to device rows; a device row is local
        # iff its first device is (all shards of a row live together
        # only for 1D meshes — the sharded pipelines use 1D meshes)
        raise ValueError(
            "local_shard_indices supports 1D meshes (one shard per "
            f"device); got mesh shape {dict(zip(mesh.axis_names, mesh.devices.shape))}"
        )
    pid = jax.process_index()
    return [
        i
        for i, d in enumerate(mesh.devices.flat)
        if d.process_index == pid
    ]


def stack_shards_global(
    shard_states: list,
    local_ds: list[int],
    mesh: Mesh,
    axis: str = "data",
):
    """Stack per-shard pytrees into ONE pytree of globally-sharded arrays.

    ``shard_states[k]`` is the pytree for shard ``local_ds[k]``; the
    result's leaves have a leading axis of length ``mesh.shape[axis]``
    sharded as ``P(axis)``. In a single-process run this is equivalent
    to ``jnp.stack`` + ``device_put``; in a multi-process run every
    process contributes only its own shards and no full-size array ever
    exists on one host.
    """
    import jax.numpy as jnp

    ndev = mesh.shape[axis]
    sharding = NamedSharding(mesh, P(axis))
    flat_devices = list(mesh.devices.flat)

    def build(*leaves):
        l0 = leaves[0]
        if jax.process_count() == 1 and len(leaves) == ndev:
            return jax.device_put(jnp.stack(leaves), sharding)
        gshape = (ndev,) + tuple(np.shape(l0))
        pieces = [
            jax.device_put(np.asarray(leaf)[None], flat_devices[d])
            for d, leaf in zip(local_ds, leaves)
        ]
        return jax.make_array_from_single_device_arrays(
            gshape, sharding, pieces
        )

    return jax.tree_util.tree_map(build, *shard_states)
