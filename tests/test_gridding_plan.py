"""Parity tests for reusable gridding plans (interpret mode on CPU)
against the one-shot fused Pallas paths."""

import numpy as np
import jax.numpy as jnp
import pytest

from ska_sdp_func_python_tpu.ops.gridding_fused import (
    fused_available,
    fused_degrid_wstack,
    fused_grid_wstack,
)
from ska_sdp_func_python_tpu.ops.gridding_plan import (
    degrid_with_plan,
    grid_with_plan,
    make_grid_plan,
    sort_values,
    unsort_values,
)

pytestmark = pytest.mark.skipif(
    not fused_available(), reason="pallas unavailable"
)


def _case(rng, npixel, nplanes, n, wstack=True):
    # f32 coordinates: these tests check plan-vs-unit-path LOGIC parity,
    # so both sides must see identical (f32) positions — f64 coordinates
    # now keep their precision through the plan build (compensated /
    # f64-native modes, test_gridding_accuracy.py) and would legitimately
    # differ from the f32 unit path at the ~1e-5 quantisation level
    u = jnp.asarray(rng.uniform(-20, npixel + 20, n).astype(np.float32))
    v = jnp.asarray(rng.uniform(-20, npixel + 20, n).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    if nplanes > 1:
        p0 = jnp.asarray(
            rng.integers(0, nplanes - 1 if wstack else nplanes, n)
        )
        frac = jnp.asarray(rng.uniform(0, 1, n)) if wstack else None
    else:
        p0, frac = None, None
    return u, v, vals, p0, frac


def test_plan_grid_matches_fused_wstack(rng):
    npixel, nplanes, n = 256, 5, 4000
    u, v, vals, p0, frac = _case(rng, npixel, nplanes, n)
    ref = fused_grid_wstack(
        u, v, vals, p0, frac,
        npixel=npixel, support=8, nplanes=nplanes, tile=64, interpret=True,
    )
    plan = make_grid_plan(
        u, v, p0, frac, npixel=npixel, support=8, nplanes=nplanes, tile=64
    )
    fast = grid_with_plan(plan, vals, interpret=True)
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), atol=1e-5
    )


def test_plan_grid_matches_fused_single(rng):
    npixel, n = 128, 2500
    u, v, vals, _, _ = _case(rng, npixel, 1, n)
    ref = fused_grid_wstack(
        u, v, vals, npixel=npixel, support=8, tile=32, interpret=True
    )
    plan = make_grid_plan(u, v, npixel=npixel, support=8, tile=32)
    fast = grid_with_plan(plan, vals, interpret=True)
    assert fast.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), atol=1e-5
    )


def test_plan_degrid_matches_fused(rng):
    npixel, nplanes, n = 256, 5, 4000
    u, v, _, p0, frac = _case(rng, npixel, nplanes, n)
    grids = jnp.asarray(
        rng.normal(size=(nplanes, npixel, npixel))
        + 1j * rng.normal(size=(nplanes, npixel, npixel))
    ).astype(jnp.complex64)
    ref = fused_degrid_wstack(
        u, v, grids, p0, frac,
        support=8, nplanes=nplanes, tile=64, interpret=True,
    )
    plan = make_grid_plan(
        u, v, p0, frac, npixel=npixel, support=8, nplanes=nplanes, tile=64
    )
    fast = degrid_with_plan(plan, grids, interpret=True)
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), atol=1e-5
    )


def test_plan_sorted_domain_roundtrip(rng):
    """sorted values -> grid -> degrid(to_sorted) -> unsort == plain."""
    npixel, nplanes, n = 128, 4, 3000
    u, v, vals, p0, frac = _case(rng, npixel, nplanes, n)
    plan = make_grid_plan(
        u, v, p0, frac, npixel=npixel, support=8, nplanes=nplanes, tile=32
    )
    vals_s = sort_values(plan, vals)
    # round-trip through sort/unsort is the identity
    np.testing.assert_allclose(
        np.asarray(unsort_values(plan, vals_s)), np.asarray(vals),
        atol=1e-7,
    )
    g_plain = grid_with_plan(plan, vals, interpret=True)
    g_sorted = grid_with_plan(
        plan, vals_s, values_sorted=True, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(g_sorted), np.asarray(g_plain), atol=1e-6
    )
    d_plain = degrid_with_plan(plan, g_plain, interpret=True)
    d_sorted = degrid_with_plan(
        plan, g_plain, to_sorted=True, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(unsort_values(plan, d_sorted)), np.asarray(d_plain),
        atol=1e-5,
    )


def test_plan_reuse_multiple_value_sets(rng):
    """One plan, several gridding calls with different values."""
    npixel, nplanes, n = 128, 4, 2000
    u, v, vals, p0, frac = _case(rng, npixel, nplanes, n)
    plan = make_grid_plan(
        u, v, p0, frac, npixel=npixel, support=8, nplanes=nplanes, tile=32
    )
    for _ in range(2):
        vals = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
        ref = fused_grid_wstack(
            u, v, vals, p0, frac,
            npixel=npixel, support=8, nplanes=nplanes, tile=32,
            interpret=True,
        )
        fast = grid_with_plan(plan, vals, interpret=True)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(ref), atol=1e-5
        )


# ---------------------------------------------------------------------------
# imaging-level plans
# ---------------------------------------------------------------------------

from ska_sdp_func_python_tpu.ops.imaging import (
    invert_core,
    predict_core,
    make_imaging_plan,
    invert_with_plan,
    predict_with_plan,
)


def _uvw_case(rng, n=2000):
    u = jnp.asarray(rng.uniform(-500, 500, n))
    v = jnp.asarray(rng.uniform(-500, 500, n))
    w = jnp.asarray(rng.uniform(-30, 30, n))
    return u, v, w


def test_imaging_plan_invert_matches_core(rng):
    npixel, n = 128, 2000
    u, v, w = _uvw_case(rng, n)
    vals = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    wgt = jnp.asarray(rng.uniform(0.5, 1.5, n))
    kw = dict(cellsize=5e-4, support=8, nw=4, do_wstacking=True)
    ref, sw_ref = invert_core(
        u, v, w, vals, wgt, npixel=npixel, gridder="fused", **kw
    )
    plan = make_imaging_plan(u, v, w, npixel=npixel, **kw)
    fast, sw = invert_with_plan(plan, vals, wgt, interpret=True)
    assert abs(float(sw) - float(sw_ref)) < 1e-3
    scale = float(jnp.max(jnp.abs(ref))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), atol=2e-5 * scale
    )


def test_imaging_plan_predict_matches_core(rng):
    npixel, n = 128, 2000
    u, v, w = _uvw_case(rng, n)
    img = jnp.asarray(rng.normal(size=(npixel, npixel)))
    kw = dict(cellsize=5e-4, support=8, nw=4, do_wstacking=True)
    ref = predict_core(u, v, w, img, gridder="fused", **kw)
    plan = make_imaging_plan(u, v, w, npixel=npixel, **kw)
    fast = predict_with_plan(plan, img, interpret=True)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), atol=2e-5 * scale
    )


def test_imaging_plan_no_wstack(rng):
    npixel, n = 128, 1500
    u, v, w = _uvw_case(rng, n)
    vals = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    wgt = jnp.ones(n)
    kw = dict(cellsize=5e-4, support=8, nw=1, do_wstacking=False)
    ref, _ = invert_core(
        u, v, w, vals, wgt, npixel=npixel, gridder="fused", **kw
    )
    plan = make_imaging_plan(u, v, w, npixel=npixel, **kw)
    fast, _ = invert_with_plan(plan, vals, wgt, interpret=True)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), atol=2e-5 * scale
    )


def test_imaging_plan_sorted_residual_loop(rng):
    """Major-cycle pattern in the sorted domain: obs sorted once,
    predict(to_sorted) - subtract - invert(values_sorted) with no
    per-cycle sorts; matches the plain-order result."""
    npixel, n = 128, 2000
    u, v, w = _uvw_case(rng, n)
    vals = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    wgt = jnp.asarray(rng.uniform(0.5, 1.5, n))
    img = jnp.asarray(rng.normal(size=(npixel, npixel)) * 0.1)
    kw = dict(cellsize=5e-4, support=8, nw=4, do_wstacking=True)
    plan = make_imaging_plan(u, v, w, npixel=npixel, **kw)

    # plain order
    model_vis = predict_with_plan(plan, img, interpret=True)
    ref, _ = invert_with_plan(plan, vals - model_vis, wgt, interpret=True)

    # sorted domain
    obs_s = sort_values(plan.gp, vals)
    wgt_s = jnp.real(sort_values(plan.gp, wgt))
    model_s = predict_with_plan(plan, img, to_sorted=True, interpret=True)
    fast, _ = invert_with_plan(
        plan, obs_s - model_s, wgt_s, values_sorted=True, interpret=True
    )
    scale = float(jnp.max(jnp.abs(ref))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), atol=2e-5 * scale
    )


# ---------------------------------------------------------------------------
# data-model driver plans (invert_visibility / predict_visibility plan=)
# ---------------------------------------------------------------------------

from simul import make_visibility
from ska_sdp_func_python_tpu.ops.imaging import (
    create_image_from_visibility,
    invert_visibility,
    make_visibility_plan,
    predict_visibility,
)


def _vis_model(nchan=2, npixel=128):
    vis = make_visibility(nants=8, ntimes=2, nchan=nchan, rmax=300.0)
    model = create_image_from_visibility(
        vis, npixel=npixel, oversampling=4.0, nchan=1
    )
    return vis, model


def test_driver_invert_with_plan_matches_plain(rng):
    vis, model = _vis_model()
    vis = vis.replace(
        vis=jnp.asarray(
            rng.normal(size=vis.vis.shape)
            + 1j * rng.normal(size=vis.vis.shape)
        ).astype(vis.vis.dtype)
    )
    kw = dict(context="ng", nw=4)
    # plain path on CPU uses the tiled gridder; force fused for parity
    import ska_sdp_func_python_tpu.ops.imaging as imaging_mod

    ref, sw_ref = invert_visibility(vis, model, **kw)
    plan = make_visibility_plan(vis, model, **kw)
    fast, sw = invert_visibility(vis, model, plan=plan, **kw)
    np.testing.assert_allclose(
        np.asarray(sw), np.asarray(sw_ref), rtol=1e-5
    )
    scale = float(jnp.max(jnp.abs(ref.pixels))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(fast.pixels), np.asarray(ref.pixels),
        atol=3e-5 * scale,
    )


def test_driver_predict_with_plan_matches_plain(rng):
    vis, model = _vis_model()
    model = model.replace(
        pixels=jnp.asarray(
            rng.normal(size=model.pixels.shape)
        ).astype(model.pixels.dtype)
    )
    kw = dict(context="ng", nw=4)
    ref = predict_visibility(vis, model, **kw)
    plan = make_visibility_plan(vis, model, **kw)
    fast = predict_visibility(vis, model, plan=plan, **kw)
    scale = float(jnp.max(jnp.abs(ref.vis))) + 1e-30
    np.testing.assert_allclose(
        np.asarray(fast.vis), np.asarray(ref.vis), atol=3e-5 * scale
    )


def test_pipeline_use_plan_smoke(rng):
    """continuum_imaging with use_plan=True (plan path forced on CPU)
    recovers a point source like the plain path."""
    from ska_sdp_func_python_tpu.models import SkyComponents
    from ska_sdp_func_python_tpu.ops.dft import (
        dft_skycomponent_visibility,
    )
    from ska_sdp_func_python_tpu.pipeline import continuum_imaging

    vis, model = _vis_model(nchan=1, npixel=64)
    ra, dec = model.pixel_to_radec(32 + 6, 32 - 4)
    comps = SkyComponents.from_lists(
        [[float(ra), float(dec)]],
        np.full((1, 1, 1), 1.5),
        model.frequency,
    )
    vis = dft_skycomponent_visibility(vis, comps)
    out = {}
    for use_plan in (False, True):
        current, residual, _ = continuum_imaging(
            vis, model, nmajor=2, context="ng", nw=2,
            use_plan=use_plan, niter=50,
        )
        out[use_plan] = (current.pixels, residual.pixels)
        assert float(jnp.max(current.pixels)) > 0.1  # converging
    # the plan path must reproduce the plain path
    np.testing.assert_allclose(
        np.asarray(out[True][0]), np.asarray(out[False][0]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out[True][1]), np.asarray(out[False][1]), atol=2e-5
    )


def test_plan_grid_clustered_empty_segments(rng):
    """Most (plane, tile) segments empty: the min-one-slot logic must
    still zero-initialise every output block (slot-kernel regression)."""
    npixel, nplanes, n = 256, 4, 600
    # all entries inside one tile, one plane pair
    u = jnp.asarray(rng.uniform(70.0, 90.0, n).astype(np.float32))
    v = jnp.asarray(rng.uniform(70.0, 90.0, n).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    p0 = jnp.asarray(np.full(n, 1, np.int32))
    frac = jnp.asarray(rng.uniform(0, 1, n))
    ref = fused_grid_wstack(
        u, v, vals, p0, frac,
        npixel=npixel, support=8, nplanes=nplanes, tile=64, interpret=True,
    )
    plan = make_grid_plan(
        u, v, p0, frac, npixel=npixel, support=8, nplanes=nplanes, tile=64
    )
    fast = grid_with_plan(plan, vals, interpret=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-5)
    # untouched planes must be exactly zero
    assert float(jnp.max(jnp.abs(fast[3]))) == 0.0


def test_plan_grid_all_out_of_grid(rng):
    """Every entry out of grid: result must be exactly zero."""
    npixel, n = 128, 200
    u = jnp.asarray(rng.uniform(npixel + 10, npixel + 50, n).astype(np.float32))
    v = jnp.asarray(rng.uniform(-60, -10, n).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    plan = make_grid_plan(u, v, npixel=npixel, support=8, tile=32)
    fast = grid_with_plan(plan, vals, interpret=True)
    assert float(jnp.max(jnp.abs(fast))) == 0.0
    back = degrid_with_plan(
        plan, jnp.ones((npixel, npixel), jnp.complex64)[None],
        interpret=True,
    )
    assert float(jnp.max(jnp.abs(back))) == 0.0


def test_plan_grid_tile56_grouped_assemble(rng):
    """tile=56 (buf 64: MXU-exact lane panels) with the g=3 grouped
    assemble (128-lane ceil fix): must match the tile-64 plan path on
    the same coordinates."""
    npixel, nplanes, n = 336, 4, 3000
    u, v, vals, p0, frac = _case(rng, npixel, nplanes, n)
    plan64 = make_grid_plan(
        u, v, p0, frac, npixel=npixel, support=8, nplanes=nplanes,
        tile=56,
    )
    assert npixel // 56 % 3 == 0  # grouped-assemble lane path active
    fast = grid_with_plan(plan64, vals, interpret=True)
    ref = fused_grid_wstack(
        u, v, vals, p0, frac,
        npixel=npixel, support=8, nplanes=nplanes, tile=48,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), atol=1e-5
    )
    # degrid round trip on the same plan
    back = degrid_with_plan(plan64, ref, interpret=True)
    ref_d = fused_degrid_wstack(
        u, v, ref, p0, frac, support=8, nplanes=nplanes, tile=48,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(ref_d), atol=1e-5
    )


def test_matmul_tail_matches_fft_tail():
    """Pruned-DFT matmul tail == batched-ifft tail (round-4 MXU tail)."""
    import numpy as np

    from ska_sdp_func_python_tpu.ops.imaging import (
        make_imaging_plan,
        uv_grids_to_dirty,
    )

    rng = np.random.default_rng(0)
    npixel, nvis, nw = 128, 20000, 5
    cell = 8e-4
    umax = 0.4 / (2 * cell)
    u = rng.uniform(-umax, umax, nvis).astype(np.float32)
    v = rng.uniform(-umax, umax, nvis).astype(np.float32)
    w = rng.uniform(-50, 50, nvis).astype(np.float32)
    plan = make_imaging_plan(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(w),
        npixel=npixel, cellsize=cell, support=8, nw=nw,
        do_wstacking=True, padding=1.25,
    )
    npad = plan.npad
    g = (
        rng.normal(size=(nw, npad, npad))
        + 1j * rng.normal(size=(nw, npad, npad))
    ).astype(np.complex64)
    d_fft = np.asarray(uv_grids_to_dirty(plan, jnp.asarray(g), tail="fft"))
    d_mm = np.asarray(
        uv_grids_to_dirty(plan, jnp.asarray(g), tail="matmul")
    )
    scale = float(np.max(np.abs(d_fft)))
    assert np.max(np.abs(d_mm - d_fft)) < 2e-5 * scale


def test_invert_tail_config_knob():
    from ska_sdp_func_python_tpu import config

    try:
        config.set_invert_tail("matmul")
        assert config.invert_tail() == "matmul"
        with pytest.raises(ValueError):
            config.set_invert_tail("bogus")
    finally:
        config.set_invert_tail("auto")


def test_matmul_head_matches_fft_head():
    """Input-pruned forward-DFT matmul head == pad+fft head."""
    import numpy as np

    from ska_sdp_func_python_tpu.ops.imaging import (
        image_to_uv_grids,
        make_imaging_plan,
    )

    rng = np.random.default_rng(1)
    npixel, nw = 128, 5
    cell = 8e-4
    umax = 0.4 / (2 * cell)
    n = 20000
    plan = make_imaging_plan(
        jnp.asarray(rng.uniform(-umax, umax, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-umax, umax, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-50, 50, n).astype(np.float32)),
        npixel=npixel, cellsize=cell, support=8, nw=nw,
        do_wstacking=True, padding=1.25,
    )
    img = rng.normal(size=(npixel, npixel)).astype(np.float32)
    g_fft = np.asarray(image_to_uv_grids(plan, jnp.asarray(img), head="fft"))
    g_mm = np.asarray(
        image_to_uv_grids(plan, jnp.asarray(img), head="matmul")
    )
    scale = float(np.max(np.abs(g_fft)))
    assert np.max(np.abs(g_mm - g_fft)) < 3e-5 * scale
