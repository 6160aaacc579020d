"""Parity tests for the fused Pallas w-stack gridder (interpret mode on
CPU) against the tiled-matmul path and the scatter reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ska_sdp_func_python_tpu.ops.gridding import convolutional_grid
from ska_sdp_func_python_tpu.ops.gridding_tiled import tiled_grid
from ska_sdp_func_python_tpu.ops.gridding_fused import (
    fused_available,
    fused_grid_wstack,
)

pytestmark = pytest.mark.skipif(
    not fused_available(), reason="pallas unavailable"
)


@pytest.mark.parametrize("npixel,tile", [(256, 64), (128, 32)])
def test_fused_single_plane_matches_scatter(rng, npixel, tile):
    n = 3000
    u = jnp.asarray(rng.uniform(-20, npixel + 20, n))
    v = jnp.asarray(rng.uniform(-20, npixel + 20, n))
    vals = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    ref, _ = convolutional_grid(u, v, vals, npixel, 8)
    fast = fused_grid_wstack(
        u, v, vals, npixel=npixel, support=8, tile=tile, interpret=True
    )
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), atol=2e-5 * scale
    )


def test_fused_wstack_matches_tiled(rng):
    npixel, nplanes = 256, 5
    n = 4000
    u = jnp.asarray(rng.uniform(4, npixel - 12, n))
    v = jnp.asarray(rng.uniform(4, npixel - 12, n))
    vals = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    p0 = jnp.asarray(rng.integers(0, nplanes - 1, n))
    frac = jnp.asarray(rng.uniform(0, 1, n))
    ref = tiled_grid(
        u, v, vals, p0, frac,
        npixel=npixel, support=8, nplanes=nplanes, tile=64, unit=256,
    )
    fast = fused_grid_wstack(
        u, v, vals, p0, frac,
        npixel=npixel, support=8, nplanes=nplanes, tile=64, interpret=True,
    )
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), atol=2e-5 * scale
    )


def test_fused_wstack_quad_t56_matches_tiled(rng):
    """tile=56 (buf=64) activates the full-MXU [128,128] quadrant slot
    layout and the quad assemble path; parity vs the tiled reference."""
    npixel, nplanes = 224, 4
    n = 4000
    u = jnp.asarray(rng.uniform(4, npixel - 12, n))
    v = jnp.asarray(rng.uniform(4, npixel - 12, n))
    vals = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    p0 = jnp.asarray(rng.integers(0, nplanes - 1, n))
    frac = jnp.asarray(rng.uniform(0, 1, n))
    ref = tiled_grid(
        u, v, vals, p0, frac,
        npixel=npixel, support=8, nplanes=nplanes, tile=56, unit=256,
    )
    fast = fused_grid_wstack(
        u, v, vals, p0, frac,
        npixel=npixel, support=8, nplanes=nplanes, tile=56, interpret=True,
    )
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), atol=2e-5 * scale
    )


def test_fused_nearest_w_matches_tiled(rng):
    npixel, nplanes = 128, 4
    n = 2500
    u = jnp.asarray(rng.uniform(4, npixel - 12, n))
    v = jnp.asarray(rng.uniform(4, npixel - 12, n))
    vals = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    p0 = jnp.asarray(rng.integers(0, nplanes, n))
    ref = tiled_grid(
        u, v, vals, p0, None,
        npixel=npixel, support=8, nplanes=nplanes, tile=32, unit=256,
    )
    fast = fused_grid_wstack(
        u, v, vals, p0, None,
        npixel=npixel, support=8, nplanes=nplanes, tile=32, interpret=True,
    )
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), atol=2e-5 * scale
    )


def test_fused_empty_and_out_of_grid(rng):
    """Segments with zero entries and fully out-of-grid streams."""
    npixel = 128
    n = 300
    u = jnp.asarray(rng.uniform(-200, -50, n))  # all out of grid
    v = jnp.asarray(rng.uniform(4, npixel - 12, n))
    vals = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    g = fused_grid_wstack(
        u, v, vals, npixel=npixel, support=8, tile=32, interpret=True
    )
    assert float(jnp.max(jnp.abs(g))) == 0.0


def test_fused_invert_core_matches_tiled(rng):
    from ska_sdp_func_python_tpu.ops.imaging import invert_core

    npixel = 128
    n = 2000
    u = jnp.asarray(rng.uniform(-500, 500, n))
    v = jnp.asarray(rng.uniform(-500, 500, n))
    w = jnp.asarray(rng.uniform(-30, 30, n))
    vals = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    wgt = jnp.ones(n)
    kw = dict(npixel=npixel, cellsize=5e-4, support=8, nw=4,
              do_wstacking=True)
    ref, sw_ref = invert_core(u, v, w, vals, wgt, gridder="tiled", **kw)
    # on CPU the fused path auto-falls back to pallas interpret mode
    fast, sw = invert_core(u, v, w, vals, wgt, gridder="fused", **kw)
    assert sw == sw_ref
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), atol=2e-5 * scale
    )


# ---------------------------------------------------------------------------
# fused degrid (predict adjoint)
# ---------------------------------------------------------------------------

from ska_sdp_func_python_tpu.ops.gridding_tiled import tiled_degrid
from ska_sdp_func_python_tpu.ops.gridding_fused import fused_degrid_wstack


@pytest.mark.parametrize("npixel,tile", [(256, 64), (128, 32)])
def test_fused_degrid_single_plane_matches_tiled(rng, npixel, tile):
    n = 3000
    u = jnp.asarray(rng.uniform(-20, npixel + 20, n))
    v = jnp.asarray(rng.uniform(-20, npixel + 20, n))
    grid = jnp.asarray(
        rng.normal(size=(npixel, npixel))
        + 1j * rng.normal(size=(npixel, npixel))
    ).astype(jnp.complex64)
    ref = tiled_degrid(u, v, grid, support=8, tile=tile, unit=256)
    fast = fused_degrid_wstack(
        u, v, grid, support=8, tile=tile, interpret=True
    )
    scale = float(jnp.max(jnp.abs(ref))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), atol=2e-5 * scale
    )


def test_fused_degrid_wstack_t56_matches_tiled(rng):
    """tile=56 (buf=64) activates the full-MXU concat form of the
    degrid contraction; parity vs the tiled reference."""
    npixel, nplanes = 224, 4
    n = 4000
    u = jnp.asarray(rng.uniform(4, npixel - 12, n))
    v = jnp.asarray(rng.uniform(4, npixel - 12, n))
    grids = jnp.asarray(
        rng.normal(size=(nplanes, npixel, npixel))
        + 1j * rng.normal(size=(nplanes, npixel, npixel))
    ).astype(jnp.complex64)
    p0 = jnp.asarray(rng.integers(0, nplanes - 1, n))
    frac = jnp.asarray(rng.uniform(0, 1, n))
    ref = tiled_degrid(
        u, v, grids, p0, frac,
        support=8, nplanes=nplanes, tile=56, unit=256,
    )
    fast = fused_degrid_wstack(
        u, v, grids, p0, frac,
        support=8, nplanes=nplanes, tile=56, interpret=True,
    )
    scale = float(jnp.max(jnp.abs(ref))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), atol=2e-5 * scale
    )


def test_fused_degrid_wstack_matches_tiled(rng):
    npixel, nplanes = 256, 5
    n = 4000
    u = jnp.asarray(rng.uniform(4, npixel - 12, n))
    v = jnp.asarray(rng.uniform(4, npixel - 12, n))
    grids = jnp.asarray(
        rng.normal(size=(nplanes, npixel, npixel))
        + 1j * rng.normal(size=(nplanes, npixel, npixel))
    ).astype(jnp.complex64)
    p0 = jnp.asarray(rng.integers(0, nplanes - 1, n))
    frac = jnp.asarray(rng.uniform(0, 1, n))
    ref = tiled_degrid(
        u, v, grids, p0, frac,
        support=8, nplanes=nplanes, tile=64, unit=256,
    )
    fast = fused_degrid_wstack(
        u, v, grids, p0, frac,
        support=8, nplanes=nplanes, tile=64, interpret=True,
    )
    scale = float(jnp.max(jnp.abs(ref))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), atol=2e-5 * scale
    )


def test_fused_degrid_out_of_grid_zero(rng):
    npixel = 128
    n = 300
    u = jnp.asarray(rng.uniform(-200, -50, n))  # all out of grid
    v = jnp.asarray(rng.uniform(4, npixel - 12, n))
    grid = jnp.asarray(
        rng.normal(size=(npixel, npixel))
        + 1j * rng.normal(size=(npixel, npixel))
    ).astype(jnp.complex64)
    out = fused_degrid_wstack(
        u, v, grid, support=8, tile=32, interpret=True
    )
    assert out.shape == (n,)
    assert float(jnp.max(jnp.abs(out))) == 0.0


def test_fused_predict_core_matches_tiled(rng):
    from ska_sdp_func_python_tpu.ops.imaging import predict_core

    npixel = 128
    n = 2000
    u = jnp.asarray(rng.uniform(-500, 500, n))
    v = jnp.asarray(rng.uniform(-500, 500, n))
    w = jnp.asarray(rng.uniform(-30, 30, n))
    img = jnp.asarray(rng.normal(size=(npixel, npixel)))
    kw = dict(cellsize=5e-4, support=8, nw=4, do_wstacking=True)
    ref = predict_core(u, v, w, img, gridder="tiled", **kw)
    fast = predict_core(u, v, w, img, gridder="fused", **kw)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), atol=2e-5 * scale
    )
