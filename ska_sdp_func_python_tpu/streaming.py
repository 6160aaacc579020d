"""Out-of-core (streamed) self-calibration major cycles.

BASELINE.md config 5 / VERDICT round-1 item 4: a 1B-visibility self-cal
cannot hold the visibilities — let alone sorted copies and plan payloads
— in device memory. This module runs the fused-cycle mathematics as a
STREAM over time slabs from the native prefetching visibility store
(:mod:`ska_sdp_func_python_tpu.io`, C++ reader thread double-buffering
the next slab while the device computes):

* per slab: upload re/im/weight (the axon tunnel cannot transfer complex
  arrays), build the slab's gridding plan on device, degrid the current
  model, solve the slab's gain intervals, and grid the corrected
  residual;
* across slabs: uv grids, PSF grids and sum-of-weights ACCUMULATE (the
  same reduction :func:`parallel.fused.sharded_ical` performs with a
  psum across a mesh, here performed serially — device memory is
  bounded by the slab size, not the observation);
* per cycle: one FFT/w-beam tail + CLEAN on the accumulated grids.

Gain solutions are exact (not lagged): StefCal normal equations are
solution-interval-local, and solution intervals are derived per slab
(``timeslice="auto"`` or any interval that does not straddle a slab
boundary), so each slab's gains are identical to a monolithic solve.

The reference's counterpart is DP3's DPBuffer streaming
(calibration/dp3_calibration.py:157-196), which streams only the
calibration; here the whole major cycle streams.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import zeros_like_safe
from .models.gaintable import GainTable, create_gaintable_from_visibility
from .models.image import Image
from .models.visibility import Visibility, create_visibility_from_arrays

log = logging.getLogger("ska-sdp-func-python-tpu")

__all__ = ["streamed_ical", "StreamedICALResult"]


class StreamedICALResult(tuple):
    """(model, residual, restored, gaintable) with attribute access."""

    @property
    def model(self):
        return self[0]

    @property
    def residual(self):
        return self[1]

    @property
    def restored(self):
        return self[2]

    @property
    def gaintable(self):
        return self[3]


def _pad_slab(arr, nt_pad):
    nt = arr.shape[0]
    if nt == nt_pad:
        return arr
    return np.concatenate(
        [arr, np.zeros((nt_pad - nt,) + arr.shape[1:], arr.dtype)]
    )


@partial(jax.jit, static_argnames=("niter", "tol", "phase_only"))
def _slab_solve_and_residual(
    plan,
    re,
    im,
    fw,
    model_s,
    w_t,
    row_idx,
    has_row,
    a1,
    a2,
    ne_idx,
    gain0,
    niter: int,
    tol: float,
    phase_only: bool,
):
    """One slab's calibration + residual gridding, one dispatch.

    All arrays are slab-local: obs re/im [nt*nbl], flagged weights
    alike, ``model_s`` the plan-sorted degrid of the current model.
    Returns (uv grid contribution, sum of weights, gains, gain weights,
    gain residuals).
    """
    from .ops.gridding_plan import grid_with_plan, unsort_values
    from .ops.solvers import solve_gains_core

    obs = jax.lax.complex(re, im)
    model_nat = unsort_values(plan.gp, model_s)
    nt, nbl = w_t.shape[1], a1.shape[0]
    # solve at the gaintable's precision (f64 in x64 test runs)
    rdt = jnp.real(gain0).dtype
    obs2 = obs.reshape(nt, nbl).astype(gain0.dtype)
    fw2 = fw.reshape(nt, nbl).astype(rdt)
    mv2 = model_nat.reshape(nt, nbl).astype(gain0.dtype)
    w_t = w_t.astype(rdt)

    # product-form normal equations (interval-local => slab-local)
    xe = obs2 * jnp.conj(mv2) * fw2.astype(obs2.dtype)
    we = (jnp.real(mv2) ** 2 + jnp.imag(mv2) ** 2) * fw2
    xb = jnp.einsum("st,tb->sb", w_t.astype(xe.dtype), xe)
    wb = jnp.einsum("st,tb->sb", w_t, we)
    nsol = w_t.shape[0]
    nants = gain0.shape[1]
    from .config import czeros

    # gather-based antenna-pair assembly (solvers.ne_index_map)
    zx = czeros((nsol, 1), xb.dtype)
    ext = jnp.concatenate([jnp.conj(xb), xb, zx], axis=1)
    x = jnp.take(ext, ne_idx, axis=1).reshape(
        nsol, nants, nants, 1, 1
    )
    zw = jnp.zeros((nsol, 1), dtype=wb.dtype)
    extw = jnp.concatenate([wb, wb, zw], axis=1)
    xwt = jnp.take(extw, ne_idx, axis=1).reshape(
        nsol, nants, nants, 1, 1
    )
    has_data = jnp.sum(jnp.abs(xwt), axis=(1, 2, 3, 4)) > 0.0
    gain, gwt, gres = solve_gains_core(
        x, xwt, gain0, niter=niter, tol=tol,
        phase_only=phase_only, crosspol=False, npol=1,
    )
    hd = has_data[:, None, None, None, None]
    eye = jnp.broadcast_to(
        jnp.eye(gain.shape[-1], dtype=jnp.float32), gain.shape
    )
    gain = jnp.where(hd, gain, eye.astype(gain.dtype))
    gwt = jnp.where(hd, gwt, jnp.zeros_like(gwt))
    gres = jnp.where(
        has_data[:, None, None, None], gres, jnp.zeros_like(gres)
    )

    # inverse-apply factors per (t, b)
    gg = gain[row_idx][:, :, 0, 0, 0]  # [nt, nants]
    g1 = jnp.take(gg, a1, axis=1)
    g2 = jnp.take(gg, a2, axis=1)
    sm = g1 * jnp.conj(g2)
    m2 = jnp.real(sm) ** 2 + jnp.imag(sm) ** 2
    ok = m2 > 0.0
    inv = jnp.where(
        ok, jnp.conj(sm) / jnp.where(ok, m2, 1.0).astype(sm.dtype),
        sm * 0.0,
    )
    inv = jnp.where(
        has_row[:, None], inv,
        jnp.ones(inv.shape, jnp.float32).astype(inv.dtype),
    )
    corrected = obs2 * inv
    resid = (corrected - mv2).reshape(-1)
    grids = grid_with_plan(
        plan.gp, resid * fw.astype(resid.dtype), values_sorted=False
    )
    return grids, jnp.sum(fw), gain, gwt, gres


@partial(jax.jit, static_argnames=())
def _slab_residual_only(plan, re, im, fw, model_s):
    from .ops.gridding_plan import grid_with_plan, unsort_values

    obs = jax.lax.complex(re, im)
    resid = obs - unsort_values(plan.gp, model_s)
    grids = grid_with_plan(
        plan.gp, resid * fw.astype(resid.dtype), values_sorted=False
    )
    return grids, jnp.sum(fw)


def _psum_tree(tree):
    """Sum a pytree across processes (identity in single-process runs).

    The streamed accumulation mirrors ``parallel.fused.sharded_ical``'s
    in-graph psum; across processes the once-per-cycle reduction runs
    host-side (allgather + deterministic process-ordered sum, so every
    process computes bit-identical results and the replicated CLEAN/
    model update stays synchronised). Complex leaves travel as re/im
    pairs — neither Gloo nor the axon tunnel moves complex buffers.
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    def red(x):
        x = jnp.asarray(x)
        if jnp.iscomplexobj(x):
            r = jnp.sum(
                multihost_utils.process_allgather(jnp.real(x)), axis=0
            )
            i = jnp.sum(
                multihost_utils.process_allgather(jnp.imag(x)), axis=0
            )
            return jax.lax.complex(
                r.astype(jnp.real(x).dtype), i.astype(jnp.real(x).dtype)
            ).astype(x.dtype)
        return jnp.sum(
            multihost_utils.process_allgather(x), axis=0
        ).astype(x.dtype)

    return jax.tree_util.tree_map(red, tree)


def streamed_ical(
    store,
    model: Image,
    phasecentre,
    nmajor: int = 5,
    chunk_times: int = 16,
    calibration_context: str = "T",
    controls: Optional[dict] = None,
    context: str = "ng",
    support: int = 8,
    nw: int | None = None,
    solver_niter: int = 200,
    tol: float = 1e-6,
    first_selfcal: int = 0,
    cache_slabs: bool | None = None,
    slab_cache_bytes: float = 8e9,
    distribute: bool = True,
    **clean_kwargs,
):
    """Streamed ICAL over a native visibility store.

    :param store: :class:`io.VisStore` or a path to one
    :param model: single-channel stokesI image template
    :param phasecentre: (ra, dec) rad of the store's phase centre
    :param chunk_times: time rows per slab (device memory bound); gain
        solution intervals must not straddle slab boundaries
        (``timeslice='auto'`` always satisfies this)
    :param cache_slabs: keep each slab's uploaded observed stream and
        uvw template on device across cycles (skips per-cycle store IO
        and host->device transfer at the cost of ~36 B/vis of HBM).
        ``None`` = automatic: cache when the estimate fits
        ``slab_cache_bytes``. At the 1B-vis scale caching is off and
        every cycle truly re-streams.
    :param distribute: in a ``jax.distributed`` multi-process run
        (``parallel.multihost.initialize``), shard the time slabs
        round-robin across processes: each process streams only its own
        slabs from its copy of the store (IO, h2d transfer, plan builds
        and solves all scale 1/nproc) and the uv-grid/sumwt
        accumulators are psummed once per cycle — the multi-host form
        of the BASELINE "1B sharded across a pod slice" shape. The
        CLEAN tail is replicated deterministically on every process.
    :return: (model, residual, restored, gaintable) — the gaintable
        concatenates every slab's solution intervals (gathered from
        their owning processes in distributed runs)

    Current scope: stokesI (npol=1), single-channel data (the 1B-vis
    BASELINE shape), a single per-time Jones term ("T" or "G"
    semantics via ``phase_only`` in controls). Components and bandpass
    stream via the composed API.
    """
    from .io.visio import VisStore
    from .ops.calibration_chain import create_calibration_controls
    from .ops.cleaners import hogbom, msclean
    from .ops.deconvolution import bound_psf, common_arguments, fit_psf
    from .ops.deconvolution import restore_cube
    from .ops.gain_ops import _gain_row_of_time
    from .ops.imaging import (
        make_visibility_plan,
        predict_with_plan,
        uv_grids_to_dirty,
        _nw_for,
    )

    own = False
    if isinstance(store, (str, bytes)):
        store = VisStore(str(store))
        own = True
    try:
        if store.npol != 1 or store.nchan != 1:
            raise ValueError(
                "streamed_ical streams the 1B-vis BASELINE shape: "
                f"npol=1, nchan=1 (store has npol={store.npol}, "
                f"nchan={store.nchan}); reshape multi-channel stores "
                "into per-channel stores or use the in-memory pipelines"
            )
        if model.nchan != 1 or model.npol != 1:
            raise ValueError("model must be single-channel stokesI")
        if len(calibration_context) != 1:
            raise ValueError(
                "streamed_ical solves one per-time Jones term per run "
                f"(got context {calibration_context!r}); chain further "
                "terms with repeated runs"
            )
        if controls is None:
            controls = create_calibration_controls()
        term = calibration_context
        phase_only = bool(controls[term]["phase_only"])
        timeslice = controls[term]["timeslice"]

        ntime = store.ntime
        steps = [
            (t0, min(chunk_times, ntime - t0))
            for t0 in range(0, ntime, chunk_times)
        ]
        nt_pad = chunk_times

        nproc = jax.process_count() if distribute else 1
        pid = jax.process_index() if distribute else 0
        if nproc > 1 and len(steps) < nproc:
            raise ValueError(
                f"streamed_ical: {len(steps)} time slabs cannot shard "
                f"across {nproc} processes; reduce chunk_times"
            )
        my_slabs = [k for k in range(len(steps)) if k % nproc == pid]

        # global w range and plane count (every slab's grids must stack
        # onto identical planes to accumulate)
        freq_max = float(np.max(store.frequency))
        from .models.visibility import C_M_S

        wl = store.uvw[..., 2] * freq_max / C_M_S
        w_range = (float(np.min(wl)), float(np.max(wl)))

        # per-slab gain tables + interval maps (host side, tiny). Slab
        # Visibility templates are built LAZILY inside the loops: at the
        # 1B-vis scale even the uvw of all slabs must not pin device
        # memory at once.
        # slab caching: ~36 B/vis of device memory buys zero per-cycle
        # store IO / host->device transfer (which dominates over slow
        # links — the axon tunnel moves ~20 MB/s)
        n_slab_vis = nt_pad * store.nbl
        est_bytes = len(my_slabs) * n_slab_vis * 36
        if cache_slabs is None:
            cache_slabs = est_bytes <= slab_cache_bytes
        _tmpl_cache: dict = {}
        _slab_cache: dict = {}

        def chunk_visibility(k):
            # only the uvw block is worth caching (12 B/vis, and the
            # only host->device transfer here); the zero-filled data
            # fields are recreated on device each call for free
            t0, nt = steps[k]
            uvw = _tmpl_cache.get(k) if cache_slabs else None
            if uvw is None:
                uvw_np = np.zeros((nt_pad, store.nbl, 3))
                uvw_np[:nt] = store.uvw[t0 : t0 + nt]
                if not jax.config.jax_enable_x64:
                    uvw_np = uvw_np.astype(np.float32)
                uvw = jnp.asarray(uvw_np)
                if cache_slabs:
                    _tmpl_cache[k] = uvw
            time_np = np.zeros((nt_pad,))
            time_np[:nt] = store.time[t0 : t0 + nt]
            if nt_pad > nt:
                dt = store.time[-1] - store.time[0] + 1e6
                time_np[nt:] = (
                    store.time[-1] + dt + np.arange(nt_pad - nt)
                )
            return create_visibility_from_arrays(
                uvw=uvw,
                time=time_np,
                frequency=store.frequency,
                antenna1=store.antenna1,
                antenna2=store.antenna2,
                phasecentre=phasecentre,
                polarisation_frame="stokesI",
            )

        gt0s = []
        cal_aux = []
        for k in range(len(steps)):
            cv = chunk_visibility(k)
            gt0 = create_gaintable_from_visibility(
                cv, jones_type=term, timeslice=timeslice
            )
            t = cv.time[None, :]
            lo = (gt0.time - gt0.interval / 2)[:, None]
            hi = (gt0.time + gt0.interval / 2)[:, None]
            w_t = ((t >= lo) & (t <= hi)).astype(jnp.float32)
            row_idx, has_row = _gain_row_of_time(
                cv.time, gt0.time, gt0.interval
            )
            gt0s.append(gt0)
            cal_aux.append((w_t, row_idx, has_row))
            del cv
        a1 = jnp.asarray(store.antenna1, jnp.int32)
        a2 = jnp.asarray(store.antenna2, jnp.int32)
        from .ops.solvers import ne_index_map

        nants_store = (
            int(max(store.antenna1.max(), store.antenna2.max())) + 1
        )
        ne_idx = jnp.asarray(
            ne_index_map(store.antenna1, store.antenna2, nants_store)
        )
        do_wstacking = context not in ("2d",)
        wmax_l = max(abs(w_range[0]), abs(w_range[1]))
        nwp = _nw_for(
            chunk_visibility(0), model, do_wstacking, nw, wmax=wmax_l
        )

        def build_plan(cv):
            return make_visibility_plan(
                cv, model, context=context, support=support, nw=nwp,
                w_range=w_range,
            ).plans[0]

        def stream_slabs():
            """(k, re, im, flagged weight) per OWNED slab, padded, with
            the C++ thread prefetching this process's next slab. With
            slab caching the device copies persist across cycles and
            later passes never touch the store or the host->device
            link."""
            if cache_slabs and len(_slab_cache) == len(my_slabs):
                for k in my_slabs:
                    yield (k, *_slab_cache[k])
                return
            store.prefetch(*steps[my_slabs[0]])
            for j, k in enumerate(my_slabs):
                nt = steps[k][1]
                re, im, wt, fl = store.wait(nt)
                if j + 1 < len(my_slabs):
                    store.prefetch(*steps[my_slabs[j + 1]])
                fw = wt * (1 - fl)
                item = (
                    jnp.asarray(_pad_slab(re, nt_pad).reshape(-1)),
                    jnp.asarray(_pad_slab(im, nt_pad).reshape(-1)),
                    jnp.asarray(_pad_slab(fw, nt_pad).reshape(-1)),
                )
                if cache_slabs:
                    _slab_cache[k] = item
                yield (k, *item)

        # ---- PSF pass (once) ----
        from .ops.gridding_plan import grid_with_plan

        @jax.jit
        def psf_grids(plan, fw):
            g = grid_with_plan(
                plan.gp,
                jax.lax.complex(fw, jnp.zeros_like(fw)),
                values_sorted=False,
            )
            return g, jnp.sum(fw)

        acc = None
        swt = 0.0
        plan0 = None
        for k, re, im, fw in stream_slabs():
            plan = build_plan(chunk_visibility(k))
            if plan0 is None:
                plan0 = plan
            g, s = psf_grids(plan, fw)
            acc = g if acc is None else acc + g
            swt = swt + s
        acc, swt = _psum_tree((acc, swt))
        psf_px = uv_grids_to_dirty(plan0, acc) / jnp.maximum(swt, 1e-30)
        psf = model.replace(pixels=psf_px[None, None].astype(jnp.float32))

        frac, cgain, cniter, cthresh, scales = common_arguments(
            **clean_kwargs
        )
        algorithm = clean_kwargs.get("algorithm", "hogbom")
        bpsf = bound_psf(psf, psf, clean_kwargs.get("psf_support", None))
        patch = bpsf.pixels[0, 0].astype(jnp.float32)

        gains = [gt.gain for gt in gt0s]
        gwts = [gt.weight for gt in gt0s]
        gress = [gt.residual for gt in gt0s]
        model_px = jnp.zeros(
            (model.npixel, model.npixel), jnp.float32
        )
        residual_px = None
        ny = nx = model.npixel
        for cycle in range(nmajor):
            do_cal = cycle >= first_selfcal
            acc = None
            swt = 0.0
            for k, re, im, fw in stream_slabs():
                plan = build_plan(chunk_visibility(k))
                model_s = predict_with_plan(
                    plan, model_px, to_sorted=True
                )
                if do_cal:
                    w_t, row_idx, has_row = cal_aux[k]
                    g, s, gain, gwt, gres = _slab_solve_and_residual(
                        plan, re, im, fw, model_s,
                        w_t, row_idx, has_row, a1, a2, ne_idx,
                        gains[k],
                        niter=solver_niter, tol=tol,
                        phase_only=phase_only,
                    )
                    gains[k], gwts[k], gress[k] = gain, gwt, gres
                else:
                    g, s = _slab_residual_only(
                        plan, re, im, fw, model_s
                    )
                acc = g if acc is None else acc + g
                swt = swt + s
            acc, swt = _psum_tree((acc, swt))
            dirty = uv_grids_to_dirty(plan0, acc) / jnp.maximum(
                swt, 1e-30
            )
            residual_px = dirty.astype(jnp.float32)
            if algorithm == "hogbom":
                comp, _ = hogbom(
                    residual_px, patch, None, gain=cgain,
                    thresh=cthresh, niter=cniter, fracthresh=frac,
                )
            elif algorithm == "msclean":
                comp, _ = msclean(
                    residual_px, patch, None, None, gain=cgain,
                    thresh=cthresh, niter=cniter, scales=scales,
                    fracthresh=frac,
                )
            else:
                raise ValueError(
                    f"streamed_ical clean algorithm {algorithm!r} "
                    "(hogbom | msclean)"
                )
            model_px = model_px + comp.astype(jnp.float32)
            if log.isEnabledFor(logging.INFO):
                log.info(
                    "streamed_ical: cycle %d peak residual %.6f",
                    cycle,
                    float(jnp.max(jnp.abs(residual_px))),
                )

        current = model.replace(
            pixels=model_px[None, None].astype(model.pixels.dtype)
        )
        residual = model.replace(pixels=residual_px[None, None])
        clean_beam = fit_psf(psf)
        restored = restore_cube(
            current, psf=psf, residual=residual, clean_beam=clean_beam
        )
        if nproc > 1:
            # gather each slab's solutions from its owning process:
            # non-owners contribute zeros, one deterministic psum per
            # field reassembles the full set on every process
            for k in range(len(steps)):
                if k % nproc != pid:
                    gains[k] = zeros_like_safe(gains[k])
                    gwts[k] = jnp.zeros_like(gwts[k])
                    gress[k] = jnp.zeros_like(gress[k])
            gains, gwts, gress = _psum_tree((gains, gwts, gress))
        # merge slab gain tables (disjoint, time-ordered intervals)
        gaintable = GainTable(
            gain=jnp.concatenate(gains, axis=0),
            weight=jnp.concatenate(gwts, axis=0),
            residual=jnp.concatenate(gress, axis=0),
            time=jnp.concatenate([gt.time for gt in gt0s]),
            interval=jnp.concatenate([gt.interval for gt in gt0s]),
            frequency=gt0s[0].frequency,
            jones_type=term,
            receptor_frame=gt0s[0].receptor_frame,
        )
        return StreamedICALResult(
            (current, residual, restored, gaintable)
        )
    finally:
        if own:
            store.close()
