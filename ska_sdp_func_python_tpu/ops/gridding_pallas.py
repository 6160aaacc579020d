"""Pallas TPU kernel for the tiled-gridding unit compute.

Fuses the dense ES-kernel evaluation with the tile matmul entirely in VMEM:
for each unit of C visibilities the XLA path materialises kv/ku
[C, buf] arrays in HBM between the exp evaluation and the matmul; here both
stay on-chip, the VPU computes the kernels and the MXU contracts them, and
only the [buf, buf] tile goes back to HBM.

Used by ops/gridding_tiled.tiled_grid when ``use_pallas=True`` (TPU only;
the XLA path remains the portable fallback and the CPU-test reference).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_HAVE_PALLAS = True
try:  # pragma: no cover - environment probe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

__all__ = ["unit_tiles_pallas", "pallas_available"]


def pallas_available() -> bool:
    return _HAVE_PALLAS


def _unit_kernel(uu_ref, vv_ref, vr_ref, vi_ref, tv0_ref, tu0_ref,
                 tr_ref, ti_ref, *, buf: int, support: int):
    """UB units per program: tiles [UB, buf, buf] from [UB, C] vis."""
    beta = 2.3 * support
    half = support / 2.0
    ub, c = uu_ref.shape
    r = jax.lax.broadcasted_iota(jnp.int32, (ub, buf, c), 1).astype(
        jnp.float32
    )
    uu = uu_ref[...][:, None, :]
    vv = vv_ref[...][:, None, :]
    tv0 = tv0_ref[...][:, 0][:, None, None]
    tu0 = tu0_ref[...][:, 0][:, None, None]

    def es(offs):
        nu = offs / half
        nu2 = jnp.clip(nu * nu, 0.0, 1.0)
        k = jnp.exp(beta * (jnp.sqrt(1.0 - nu2) - 1.0))
        return jnp.where(jnp.abs(nu) < 1.0, k, 0.0)

    # difference first: (tv0 + r) - vv would round at eps32*npad (r5)
    kv = es((tv0 - vv) + r)  # [UB, buf, C]
    ku = es((tu0 - uu) + r)
    vr = vr_ref[...][:, None, :]
    vi = vi_ref[...][:, None, :]
    dn = (((2,), (2,)), ((0,), (0,)))
    tr_ref[...] = jax.lax.dot_general(
        kv * vr, ku, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    ti_ref[...] = jax.lax.dot_general(
        kv * vi, ku, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("buf", "support", "interpret"))
def unit_tiles_pallas(
    uu, vv, vr, vi, tv0, tu0, *, buf: int, support: int, interpret: bool = False
):
    """Compute all unit tiles with the fused Pallas kernel.

    :param uu, vv, vr, vi: [U, C] float32 unit-arranged visibility fields
        (U must be a multiple of 8)
    :param tv0, tu0: [U] float32 tile origins
    :return: (tr, ti) [U, buf, buf] float32
    """
    n_units, c = uu.shape
    ub = 8
    if n_units % ub != 0:
        raise ValueError(f"n_units {n_units} must be a multiple of {ub}")
    grid = (n_units // ub,)
    vec_spec = pl.BlockSpec(
        (ub, c), lambda u: (u, 0), memory_space=pltpu.VMEM
    )
    scal_spec = pl.BlockSpec(
        (ub, 1), lambda u: (u, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (ub, buf, buf), lambda u: (u, 0, 0), memory_space=pltpu.VMEM
    )
    kernel = partial(_unit_kernel, buf=buf, support=support)
    return pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            vec_spec,
            vec_spec,
            vec_spec,
            vec_spec,
            scal_spec,
            scal_spec,
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_units, buf, buf), jnp.float32),
            jax.ShapeDtypeStruct((n_units, buf, buf), jnp.float32),
        ),
    )(uu, vv, vr, vi, tv0[:, None], tu0[:, None])
