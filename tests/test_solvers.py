"""M2 gain-solver tests: differential parity against the reference's numpy
StefCal kernels, plus corrupt->solve->recover round trips (mirrors
tests/calibration/test_calibration_solvers.py strategy in the reference)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ska_sdp_func_python_tpu.models import (
    SkyComponents,
    create_gaintable_from_visibility,
)
from ska_sdp_func_python_tpu.ops.dft import dft_skycomponent_visibility
from ska_sdp_func_python_tpu.ops.gain_ops import apply_gaintable
from ska_sdp_func_python_tpu.ops.solvers import (
    solve_gaintable,
    solve_gains_core,
)

import reference_oracle
from simul import make_visibility


def _make_xy(rng, nants, nchan, npol, seed_gain=None):
    """Random x/xwt antenna-pair matrices (upper/lower consistent)."""
    g = (
        rng.normal(size=(nants, nchan))
        + 1j * rng.normal(size=(nants, nchan))
        if seed_gain is None
        else seed_gain
    )
    x = np.zeros((nants, nants, nchan, npol), dtype=complex)
    xwt = np.zeros((nants, nants, nchan, npol))
    for a2 in range(nants):
        for a1 in range(a2):
            for p in range(npol):
                val = g[a2] * np.conj(g[a1]) + 0.05 * (
                    rng.normal(size=nchan) + 1j * rng.normal(size=nchan)
                )
                x[a2, a1, :, p] = val
                x[a1, a2, :, p] = np.conj(val)
                w = rng.uniform(0.5, 2.0, size=nchan)
                xwt[a2, a1, :, p] = w
                xwt[a1, a2, :, p] = w
    return x, xwt


class TestSolverCoreParity:
    @pytest.mark.parametrize("phase_only", [True, False])
    def test_scalar_matches_reference(self, rng, phase_only):
        ref = reference_oracle.load_solvers()
        nants, nchan = 10, 1
        x, xwt = _make_xy(rng, nants, nchan, 1)
        # reference normalisation (solvers.py:164-168)
        xr = x.copy()
        wr = xwt.copy()
        mask = np.abs(wr) > 0.0
        xr[mask] = xr[mask] / wr[mask]
        xr[~mask] = 0.0
        wr[mask] = wr[mask] / np.max(wr[mask])
        wr[~mask] = 0.0
        gain0 = np.ones((nants, nchan, 1, 1), dtype=complex)
        gwt0 = np.zeros((nants, nchan, 1, 1))
        g_ref, gwt_ref, res_ref = ref._solve_antenna_gains_itsubs_scalar(
            gain0.copy(), gwt0.copy(), xr.copy(), wr.copy(),
            phase_only=phase_only,
        )
        g, gwt, res = solve_gains_core(
            jnp.asarray(x)[None],
            jnp.asarray(xwt)[None],
            jnp.asarray(gain0)[None],
            phase_only=phase_only,
            npol=1,
        )
        np.testing.assert_allclose(np.asarray(g)[0], g_ref, atol=1e-10)
        np.testing.assert_allclose(np.asarray(gwt)[0], gwt_ref, atol=1e-10)
        np.testing.assert_allclose(np.asarray(res)[0], res_ref, atol=1e-10)

    @pytest.mark.parametrize("phase_only", [True, False])
    def test_matrix_crosspol_matches_reference(self, rng, phase_only):
        ref = reference_oracle.load_solvers()
        nants, nchan = 8, 2
        x, xwt = _make_xy(rng, nants, nchan, 4)
        xr = x.copy()
        wr = xwt.copy()
        mask = np.abs(wr) > 0.0
        xr[mask] = xr[mask] / wr[mask]
        xr[~mask] = 0.0
        wr[mask] = wr[mask] / np.max(wr[mask])
        wr[~mask] = 0.0
        gain0 = np.zeros((nants, nchan, 2, 2), dtype=complex)
        gain0[..., 0, 0] = 1.0
        gain0[..., 1, 1] = 1.0
        gwt0 = np.zeros((nants, nchan, 2, 2))
        g_ref, gwt_ref, res_ref = ref._solve_antenna_gains_itsubs_matrix(
            gain0.copy(), gwt0.copy(), xr.copy(), wr.copy(),
            phase_only=phase_only,
        )
        g, gwt, res = solve_gains_core(
            jnp.asarray(x)[None],
            jnp.asarray(xwt)[None],
            jnp.asarray(gain0)[None],
            phase_only=phase_only,
            npol=4,
            crosspol=True,
        )
        np.testing.assert_allclose(np.asarray(g)[0], g_ref, atol=1e-10)
        np.testing.assert_allclose(np.asarray(res)[0], res_ref, atol=1e-10)

    def test_nocrossdata_matches_reference(self, rng):
        ref = reference_oracle.load_solvers()
        nants, nchan = 6, 1
        x, xwt = _make_xy(rng, nants, nchan, 2)
        xr = x.copy()
        wr = xwt.copy()
        mask = np.abs(wr) > 0.0
        xr[mask] = xr[mask] / wr[mask]
        wr[mask] = wr[mask] / np.max(wr[mask])
        gain0 = np.zeros((nants, nchan, 2, 2), dtype=complex)
        gain0[..., 0, 0] = 1.0
        gain0[..., 1, 1] = 1.0
        gwt0 = np.zeros((nants, nchan, 2, 2))
        g_ref, _, res_ref = ref._solve_antenna_gains_itsubs_nocrossdata(
            gain0.copy(), gwt0.copy(), xr.copy(), wr.copy(), phase_only=False
        )
        g, _, res = solve_gains_core(
            jnp.asarray(x)[None],
            jnp.asarray(xwt)[None],
            jnp.asarray(gain0)[None],
            phase_only=False,
            npol=2,
        )
        np.testing.assert_allclose(np.asarray(g)[0], g_ref, atol=1e-10)
        np.testing.assert_allclose(np.asarray(res)[0], res_ref, atol=1e-10)


def _simulate_gaintable(gt, rng, phase_error=0.1, amplitude_error=0.0):
    """Seeded random gain corruption (mirrors reference testing_utils.py
    simulate_gaintable)."""
    phases = rng.normal(0, phase_error, gt.gain.shape[:3])
    amps = (
        rng.lognormal(0.0, amplitude_error, gt.gain.shape[:3])
        if amplitude_error > 0
        else np.ones(gt.gain.shape[:3])
    )
    g = amps * np.exp(1j * phases)
    gain = np.zeros(gt.gain.shape, dtype=complex)
    if gt.nrec == 1:
        gain[..., 0, 0] = g
    else:
        gain[..., 0, 0] = g
        gain[..., 1, 1] = g
    return gt.replace(gain=jnp.asarray(gain))


class TestSolveGaintableRoundtrip:
    @pytest.mark.parametrize(
        "phase_only,amperr", [(True, 0.0), (False, 0.1)]
    )
    def test_recover_gains_stokesI(self, rng, phase_only, amperr):
        vis = make_visibility(nants=10, ntimes=2, nchan=1)
        comps = SkyComponents.from_lists(
            [[0.0, np.deg2rad(-35.0)]], [[[1.0]]], vis.frequency
        )
        vis = dft_skycomponent_visibility(vis, comps)
        gt_true = create_gaintable_from_visibility(vis, jones_type="G")
        gt_true = _simulate_gaintable(
            gt_true, rng, phase_error=0.1, amplitude_error=amperr
        )
        corrupted = apply_gaintable(vis, gt_true)
        gt_sol = solve_gaintable(
            corrupted,
            modelvis=vis,
            phase_only=phase_only,
            niter=200,
            tol=1e-8,
            jones_type="G",
            normalise_gains=None,  # keep absolute scale for the comparison
        )
        # compare baseline-referenced gain products g_i conj(g_j)
        gs = np.asarray(gt_sol.gain)[..., 0, 0]
        gtr = np.asarray(gt_true.gain)[..., 0, 0]
        prod_sol = gs[:, :, None] * np.conj(gs[:, None, :])
        prod_true = gtr[:, :, None] * np.conj(gtr[:, None, :])
        if phase_only:
            np.testing.assert_allclose(
                np.angle(prod_sol), np.angle(prod_true), atol=1e-6
            )
        else:
            np.testing.assert_allclose(prod_sol, prod_true, atol=1e-6)
        assert float(jnp.max(gt_sol.residual)) < 1e-6

    def test_apply_inverse_restores(self, rng):
        vis = make_visibility(nants=8, ntimes=2, nchan=2)
        comps = SkyComponents.from_lists(
            [[0.001, np.deg2rad(-34.9)]], [[[1.0], [1.0]]], vis.frequency
        )
        vis = dft_skycomponent_visibility(vis, comps)
        gt = create_gaintable_from_visibility(vis, jones_type="G")
        gt = _simulate_gaintable(gt, rng, 0.2, 0.1)
        corrupted = apply_gaintable(vis, gt)
        restored = apply_gaintable(corrupted, gt, inverse=True)
        np.testing.assert_allclose(
            np.asarray(restored.vis), np.asarray(vis.vis), atol=1e-10
        )

    def test_solve_polarised_matrix(self, rng):
        vis = make_visibility(
            nants=8, ntimes=1, nchan=1, polarisation_frame="linear"
        )
        comps = SkyComponents.from_lists(
            [[0.0, np.deg2rad(-35.0)]],
            [[[1.0, 0.0, 0.0, 1.0]]],
            vis.frequency,
            polarisation_frame="linear",
        )
        vis = dft_skycomponent_visibility(vis, comps)
        gt = create_gaintable_from_visibility(vis, jones_type="G")
        gt = _simulate_gaintable(gt, rng, 0.1, 0.05)
        corrupted = apply_gaintable(vis, gt)
        gt_sol = solve_gaintable(
            corrupted,
            modelvis=vis,
            phase_only=False,
            crosspol=False,
            niter=200,
            tol=1e-8,
            jones_type="G",
            normalise_gains=None,  # keep absolute scale for the comparison
        )
        corrected = apply_gaintable(corrupted, gt_sol, inverse=True)
        np.testing.assert_allclose(
            np.asarray(corrected.vis), np.asarray(vis.vis), atol=1e-5
        )
