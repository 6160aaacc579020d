"""Resharding (all-to-all) utilities between pipeline stages.

SURVEY.md §7 M6 names an all-to-all for residual-visibility
redistribution between predict/solve/image stages: different stages
prefer different decompositions (gridding likes baseline shards whose
uv footprints are local; solves like time shards whose solution
intervals are local; spectral stages like channel shards). The
mechanism here is deliberately thin and XLA-idiomatic: express the
source and target shardings and jit an identity — XLA lowers the
resharding to a single fused all-to-all over ICI/DCN.

The fused pipelines avoid most redistribution by construction (psum-only
collective structure, parallel/fused.py), so this is the escape hatch
for pipelines that mix decompositions.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["reshard", "redistribute_visibility"]


def _spec_for(ndim: int, dim: int | None, axis: str) -> P:
    if dim is None:
        return P()
    return P(*(axis if i == dim else None for i in range(dim + 1)))


def reshard(tree, mesh: Mesh, out_dims, axis: str = "data"):
    """Reshard a pytree so leaf ``i`` is sharded along dimension
    ``out_dims[i]`` (or replicated for ``None``) of ``axis``.

    ``out_dims`` may be a single int/None (applied to every leaf) or a
    pytree-matching structure. XLA emits one all-to-all (or
    all-gather / dynamic-slice for replication changes) per leaf.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if isinstance(out_dims, (int, type(None))):
        dims = [out_dims] * len(leaves)
    elif isinstance(out_dims, (list, tuple)):
        # flat per-leaf list (None entries mean replicate — a pytree
        # would drop them, so flat lists are matched by position)
        dims = list(out_dims)
        if len(dims) != len(leaves):
            raise ValueError(
                f"out_dims has {len(dims)} entries for {len(leaves)} "
                "leaves"
            )
    else:
        dims = jax.tree_util.tree_leaves(out_dims)
        if len(dims) != len(leaves):
            raise ValueError(
                f"out_dims has {len(dims)} entries for {len(leaves)} "
                "leaves"
            )
    shardings = [
        NamedSharding(mesh, _spec_for(leaf.ndim, dim, axis))
        for leaf, dim in zip(leaves, dims)
    ]
    out = jax.jit(
        lambda *ls: ls, out_shardings=tuple(shardings)
    )(*leaves)
    return jax.tree_util.tree_unflatten(treedef, out)


def redistribute_visibility(
    vis, mesh: Mesh, to: str = "time", axis: str = "data"
):
    """Reshard a Visibility between the two row decompositions.

    ``to="time"`` shards the time axis (solution intervals local: gain
    solves need no baseline collective); ``to="baseline"`` shards the
    baseline axis (uv footprints local: gridding needs no time
    collective). One all-to-all per data field.
    """
    if to not in ("time", "baseline"):
        raise ValueError(f"unknown target decomposition {to!r}")
    dim = 0 if to == "time" else 1

    def dims_of(leaf):
        # data fields are [ntime, nbaseline, ...]; per-axis metadata
        # (time [nt], frequency [nchan], antenna1 [nbl], ...) and
        # scalars replicate
        if leaf.ndim >= 2:
            return dim
        return None

    leaves = jax.tree_util.tree_leaves(vis)
    return reshard(
        vis, mesh, [dims_of(leaf) for leaf in leaves], axis=axis
    )
