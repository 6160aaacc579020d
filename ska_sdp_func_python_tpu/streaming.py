"""Out-of-core (streamed) self-calibration major cycles.

BASELINE.md config 5 / VERDICT round-1 item 4: a 1B-visibility self-cal
cannot hold the visibilities — let alone sorted copies and plan payloads
— in device memory. This module runs the fused-cycle mathematics as a
STREAM over time slabs from the native prefetching visibility store
(:mod:`ska_sdp_func_python_tpu.io`, C++ reader thread double-buffering
the next slab while the device computes):

* per slab: upload re/im/weight (the axon tunnel cannot transfer complex
  arrays), build the slab's gridding plan(s) on device, degrid the
  current model (plus any in-stream sky components via the DFT), solve
  the slab's gain intervals for every active Jones term in the
  calibration chain, and grid the corrected residual;
* across slabs: uv grids, PSF grids and sum-of-weights ACCUMULATE (the
  same reduction :func:`parallel.fused.sharded_ical` performs with a
  psum across a mesh, here performed serially — device memory is
  bounded by the slab size, not the observation);
* per cycle: one FFT/w-beam tail + CLEAN (``ops.deconvolution
  .deconvolve_cube`` — every cube algorithm incl. windows) on the
  accumulated grids.

Scope (round 3, VERDICT item 4): multi-letter calibration chains
("T", "TG", "TB", ...), npol 1/2/4 with diagonal Jones terms, bandpass
("B") terms solved per data channel, multi-channel stores imaged as
MFS (``model.nchan == 1``) or as spectral cubes
(``model.nchan == store.nchan``), and in-stream sky components
(DFT-predicted per slab). Full-Jones (crosspol) terms compose via the
in-memory pipelines.

Gain solutions are interval-local: StefCal normal equations are
solution-interval-local and solution intervals are derived per slab
(``timeslice='auto'`` or any interval that does not straddle a slab
boundary gives gains identical to a monolithic solve; timeslices longer
than a slab clamp to the slab span).

The reference's counterpart is DP3's DPBuffer streaming
(calibration/dp3_calibration.py:157-196), which streams only the
calibration; here the whole major cycle streams.
"""

from __future__ import annotations

import logging
import time as _time
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
    """(model, residual, restored, gaintable) with attribute access.

    ``gaintable`` is a :class:`GainTable` for single-term runs and a
    ``{term: GainTable}`` dict for multi-term chains.
    """

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


def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


@partial(jax.jit, static_argnames=("cfg", "do_cal"))
def _slab_step(
    plans,
    re,
    im,
    fw,
    model_px,
    comp,
    cal,
    gains,
    gwts,
    gress,
    a1,
    a2,
    ne_idx,
    *,
    cfg,
    do_cal,
):
    """One slab's full major-cycle leg in one dispatch: model degrid
    (+ in-stream component DFT), sequential Jones-term solves
    (:func:`pipeline._solve_terms` — the same program as the fused
    in-memory cycle), inverse-apply, residual gridding.

    :param plans: per-image-channel ImagingPlans (one MFS plan covering
        all data channels when ``cfg.mfs``)
    :param re/im/fw: slab observed stream, [nt, nbl, nchan, npol] f32
    :param model_px: current model cube [nchan_img, npol, ny, nx] f32
    :param comp: None or (lmn [ncomp, 3], vflux [ncomp, nchan, npol],
        uvw_lambda [nt, nbl, nchan, 3]) for in-stream components
    :param cal: per-term dicts (w_t, row_idx, has_row), slab-local
    :return: (uv grids [chan][pol], sumwt [nchan_img, npol], gains,
        gain weights, gain residuals)
    """
    from .ops.dft import dft_kernel
    from .ops.gridding_plan import grid_with_plan
    from .ops.imaging import predict_with_plan
    from .pipeline import _solve_terms

    nchan_img = len(plans)
    nt, nbl, nchan, npol = re.shape
    obs = jax.lax.complex(re, im)
    sdt = gains[0].dtype  # solve at the gaintable's precision

    chans = []
    for c in range(nchan_img):
        pols = [
            predict_with_plan(plans[c], model_px[c, p])
            for p in range(npol)
        ]
        mv = jnp.stack(pols, axis=-1)
        nf = nchan if cfg.mfs else 1
        chans.append(mv.reshape(nt, nbl, nf, npol))
    mvis = chans[0] if cfg.mfs else jnp.concatenate(chans, axis=2)
    if comp is not None:
        lmn, vflux, uvw_l = comp
        cvis = dft_kernel(lmn, vflux, uvw_l)  # [nt, nbl, nchan, npol]
        mvis = mvis + cvis.astype(mvis.dtype)
    mvis = mvis.astype(sdt)

    state = {
        "a1": a1,
        "a2": a2,
        "fw_nat": fw,
        "ms_nat": obs.astype(sdt),
        "cal": cal,
        "ne_idx": ne_idx,
        "gain_wt": gwts,
        "gain_res": gress,
    }
    new_gains, new_gwts, new_gress, inv_tot = _solve_terms(
        state, cfg, gains, do_cal, mvis, None
    )
    corrected = state["ms_nat"]
    if inv_tot is not None and inv_tot.ndim == 5:
        # full-Jones: Mueller correction mixes the pol columns
        if inv_tot.shape[2] == nchan:
            corrected = jnp.einsum(
                "tbfpq,tbfq->tbfp", inv_tot, corrected
            )
        else:
            corrected = jnp.einsum(
                "tbfpq,tbgq->tbgp", inv_tot, corrected
            )
    elif inv_tot is not None:
        corrected = corrected * inv_tot
    resid = (corrected - mvis) * fw.astype(sdt)

    gridss = []
    sumwt = jnp.zeros((nchan_img, npol), jnp.float32)
    for c in range(nchan_img):
        cs = slice(None) if cfg.mfs else slice(c, c + 1)
        pol_grids = []
        for p in range(npol):
            pol_grids.append(
                grid_with_plan(
                    plans[c].gp,
                    resid[:, :, cs, p].reshape(-1),
                    values_sorted=False,
                )
            )
            sumwt = sumwt.at[c, p].set(jnp.sum(fw[:, :, cs, p]))
        gridss.append(tuple(pol_grids))
    return (
        tuple(gridss),
        sumwt,
        tuple(new_gains),
        tuple(new_gwts),
        tuple(new_gress),
    )


@partial(jax.jit, static_argnames=("mfs", "npol"))
def _slab_psf(plans, fw, *, mfs, npol):
    """One slab's PSF gridding: unit visibilities at the flagged
    weights, per (image channel, pol)."""
    from .ops.gridding_plan import grid_with_plan

    nchan_img = len(plans)
    gridss = []
    sumwt = jnp.zeros((nchan_img, npol), jnp.float32)
    for c in range(nchan_img):
        cs = slice(None) if mfs else slice(c, c + 1)
        pol_grids = []
        for p in range(npol):
            vals = fw[:, :, cs, p].reshape(-1)
            pol_grids.append(
                grid_with_plan(
                    plans[c].gp,
                    jax.lax.complex(vals, jnp.zeros_like(vals)),
                    values_sorted=False,
                )
            )
            sumwt = sumwt.at[c, p].set(jnp.sum(vals))
        gridss.append(tuple(pol_grids))
    return tuple(gridss), sumwt


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


_POL_FRAME_OF_NPOL = {1: "stokesI", 2: "linearnp", 4: "linear"}


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
    components=None,
    polarisation_frame: str | None = None,
    normalise_gains: str | None = None,
    cache_slabs: bool | None = None,
    slab_cache_bytes: float = 8e9,
    distribute: bool = True,
    on_cycle=None,
    model_init: Image | None = None,
    wire_dtype: str | None = None,
    uvw_compute=None,
    **clean_kwargs,
):
    """Streamed ICAL over a native visibility store.

    :param store: :class:`io.VisStore` or a path to one
    :param model: image template — ``nchan == 1`` for MFS imaging of
        the store's channels, ``nchan == store.nchan`` for a spectral
        cube; ``npol`` must match the store
    :param phasecentre: (ra, dec) rad of the store's phase centre
    :param chunk_times: time rows per slab (device memory bound); gain
        solution intervals are slab-local (``timeslice='auto'`` or any
        interval not straddling a slab boundary reproduces the
        monolithic solve; longer timeslices clamp to the slab span)
    :param calibration_context: Jones chain, e.g. "T", "TG", "TB" —
        each letter solved sequentially per slab with the others
        applied, per-channel for "B" (chain_calibration.py semantics)
    :param components: optional SkyComponents predicted in-stream via
        the DFT and calibrated against together with the image model
        (CLEAN updates the image only)
    :param polarisation_frame: visibility frame of the store (defaults
        by npol: stokesI / linearnp / linear)
    :param wire_dtype: "f16" ships the observed re/im/weight streams
        over the host->device link as float16 with a per-slab scale,
        dequantised on device — halves the dominant wire traffic of
        out-of-core runs on the ~tunnel-bound axon link (VERDICT r4
        item 7). Quantisation is ~5e-4 relative on the visibilities,
        ample for self-cal (the 1B store's phase walk is sigma~0.8
        rad). None (default) ships f32.
    :param uvw_compute: optional ``times[s] -> uvw [nt, nbl, 3]``
        device-side callable (e.g. antenna geometry + hour-angle
        rotation). When given, per-slab uvw is COMPUTED on device from
        the nt time scalars instead of uploading 12 B/vis of
        coordinates — at single-channel scales uvw dominates the wire
        (12 of 25 B/vis), so geometry-computed uvw plus f16 data cuts
        a cold pass ~3.6x.
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
    :param model_init: warm-start model image (checkpoint/resume: a
        previous run's returned model continues the major-cycle
        iteration — used for multi-session runs at scales where one
        process's RAM cannot hold all passes, e.g. the 1B-vis store
        whose h2d staging leak bounds a process to ~3 passes)
    :return: (model, residual, restored, gaintable) — ``gaintable``
        concatenates every slab's solution intervals per term (gathered
        from their owning processes in distributed runs); a dict
        ``{term: GainTable}`` for multi-term chains
    """
    from .io.visio import VisStore
    from .ops.calibration_chain import create_calibration_controls
    from .ops.deconvolution import deconvolve_cube, fit_psf, restore_cube
    from .ops.dft import extract_direction_and_flux
    from .ops.gain_ops import _gain_row_of_time
    from .ops.imaging import (
        make_visibility_plan,
        uv_grids_to_dirty,
        _nw_for,
    )
    from .ops.solvers import ne_index_map
    from .pipeline import _FusedCfg, _FusedTermCfg

    own = False
    if isinstance(store, (str, bytes)):
        store = VisStore(str(store))
        own = True
    try:
        npol = store.npol
        nchan = store.nchan
        if npol not in (1, 2, 4):
            raise ValueError(f"streamed_ical: npol {npol} not in (1,2,4)")
        if model.npol != npol:
            raise ValueError(
                f"model npol {model.npol} != store npol {npol}; convert "
                "the model to the store's frame first"
            )
        if model.nchan not in (1, nchan):
            raise ValueError(
                f"model nchan {model.nchan} must be 1 (MFS) or the "
                f"store's nchan {nchan} (cube)"
            )
        nchan_img = model.nchan
        mfs = nchan_img == 1 and nchan > 1
        if polarisation_frame is None:
            polarisation_frame = _POL_FRAME_OF_NPOL[npol]
        if controls is None:
            controls = create_calibration_controls()
        terms = list(calibration_context)

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
        # onto identical planes to accumulate); chunked over the
        # memory-mapped uvw so no 1B-row temporary materialises
        freq_max = float(np.max(store.frequency))
        from .models.visibility import C_M_S

        wmin = np.inf
        wmax = -np.inf
        for t0 in range(0, ntime, 2048):
            wc = np.asarray(store.uvw[t0 : t0 + 2048, :, 2])
            wmin = min(wmin, float(wc.min()))
            wmax = max(wmax, float(wc.max()))
        scale_w = freq_max / C_M_S
        w_range = (wmin * scale_w, wmax * scale_w)

        # per-slab per-term gain tables + interval maps (host side,
        # tiny). Slab Visibility templates are built LAZILY inside the
        # loops: at the 1B-vis scale even the uvw of all slabs must not
        # pin device memory at once.
        n_slab_vis = nt_pad * store.nbl * nchan * npol
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
            time_np = np.zeros((nt_pad,))
            time_np[:nt] = store.time[t0 : t0 + nt]
            if nt_pad > nt:
                dt = store.time[-1] - store.time[0] + 1e6
                time_np[nt:] = (
                    store.time[-1] + dt + np.arange(nt_pad - nt)
                )
            uvw = _tmpl_cache.get(k) if cache_slabs else None
            if uvw is None:
                if uvw_compute is not None:
                    # device-side uvw from geometry: nt scalars up the
                    # wire instead of nt*nbl*3 coordinates
                    tdev = np.asarray(time_np)
                    if not jax.config.jax_enable_x64:
                        tdev = tdev.astype(np.float32)
                    uvw = uvw_compute(jnp.asarray(tdev))
                else:
                    uvw_np = np.zeros((nt_pad, store.nbl, 3))
                    uvw_np[:nt] = store.uvw[t0 : t0 + nt]
                    if not jax.config.jax_enable_x64:
                        uvw_np = uvw_np.astype(np.float32)
                    uvw = jnp.asarray(uvw_np)
                if cache_slabs:
                    _tmpl_cache[k] = uvw
            return create_visibility_from_arrays(
                uvw=uvw,
                time=time_np,
                frequency=store.frequency,
                antenna1=store.antenna1,
                antenna2=store.antenna2,
                phasecentre=phasecentre,
                polarisation_frame=polarisation_frame,
            )

        gt0s = []  # [slab][term] GainTable templates
        cal_aux = []  # [slab] tuple-of-term dicts (w_t, row_idx, has_row)
        term_cfgs = []
        for k in range(len(steps)):
            cv = chunk_visibility(k)
            gts, cals = [], []
            for name in terms:
                gt0 = create_gaintable_from_visibility(
                    cv,
                    jones_type=name,
                    timeslice=controls[name]["timeslice"],
                )
                t = cv.time[None, :]
                lo = (gt0.time - gt0.interval / 2)[:, None]
                hi = (gt0.time + gt0.interval / 2)[:, None]
                row_idx, has_row = _gain_row_of_time(
                    cv.time, gt0.time, gt0.interval
                )
                gts.append(gt0)
                cals.append(
                    {
                        "w_t": ((t >= lo) & (t <= hi)).astype(
                            jnp.float32
                        ),
                        "row_idx": row_idx,
                        "has_row": has_row,
                    }
                )
                if k == 0:
                    crosspol = controls[name].get("shape") == "matrix"
                    if crosspol and npol != 4:
                        raise ValueError(
                            f"streamed_ical: full-Jones term {name!r} "
                            f"needs npol=4 data (store has {npol})"
                        )
                    term_cfgs.append(
                        _FusedTermCfg(
                            name=name,
                            phase_only=bool(
                                controls[name]["phase_only"]
                            ),
                            first_selfcal=int(
                                controls[name].get("first_selfcal", 0)
                                or 0
                            ),
                            per_chan=gt0.gain.shape[2] > 1,
                            crosspol=crosspol,
                        )
                    )
            gt0s.append(gts)
            cal_aux.append(tuple(cals))
            del cv
        a1 = jnp.asarray(store.antenna1, jnp.int32)
        a2 = jnp.asarray(store.antenna2, jnp.int32)

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

        cfg = _FusedCfg(
            nchan=nchan,
            npol=npol,
            mfs=mfs,
            terms=tuple(term_cfgs),
            normalise_gains=normalise_gains,
            solver_niter=solver_niter,
            solver_tol=tol,
            algorithm=clean_kwargs.get("algorithm", "hogbom"),
            clean_gain=clean_kwargs.get("gain", 0.1),
            clean_niter=clean_kwargs.get("niter", 100),
            clean_thresh=clean_kwargs.get("threshold", 0.0),
            clean_frac=clean_kwargs.get("fractional_threshold", 0.01),
            scales=tuple(clean_kwargs.get("scales", (0, 3, 10, 30))),
        )

        def build_plans(cv):
            return make_visibility_plan(
                cv, model, context=context, support=support, nw=nwp,
                w_range=w_range,
            ).plans

        # in-stream components: direction cosines + per-(chan, pol)
        # fluxes are slab-invariant; only uvw_lambda varies per slab
        comp_static = None
        if components is not None and components.ncomp > 0:
            cv0 = chunk_visibility(0)
            lmn, vflux = extract_direction_and_flux(components, cv0)
            comp_static = (lmn, vflux)
            del cv0

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
            _t_pass = _time.time()
            for j, k in enumerate(my_slabs):
                nt = steps[k][1]
                re, im, wt, fl = store.wait(nt)
                if j + 1 < len(my_slabs):
                    store.prefetch(*steps[my_slabs[j + 1]])
                if j % 16 == 0 and log.isEnabledFor(logging.INFO):
                    log.info(
                        "streamed_ical: slab %d/%d (%.0fs into pass)",
                        j + 1, len(my_slabs), _time.time() - _t_pass,
                    )
                fw = wt * (1 - fl)

                def up(x):
                    if wire_dtype != "f16":
                        return jnp.asarray(x)
                    # f16 wire with a per-slab scale guard; dequantise
                    # on device (zeros and the flag mask survive
                    # exactly; ~5e-4 relative quantisation otherwise)
                    m = float(np.max(np.abs(x))) if x.size else 0.0
                    if m > 3.0e4:
                        s = m / 3.0e4
                        dev = jnp.asarray((x / s).astype(np.float16))
                        return dev.astype(jnp.float32) * jnp.float32(s)
                    dev = jnp.asarray(x.astype(np.float16))
                    return dev.astype(jnp.float32)

                item = (
                    up(_pad_slab(re, nt_pad)),
                    up(_pad_slab(im, nt_pad)),
                    up(_pad_slab(fw, nt_pad)),
                )
                if cache_slabs:
                    _slab_cache[k] = item
                yield (k, *item)

        # ---- PSF pass (once) ----
        acc = None
        swt = None
        plan0s = None
        for k, re, im, fw in stream_slabs():
            plans = build_plans(chunk_visibility(k))
            if plan0s is None:
                plan0s = plans
            g, s = _slab_psf(plans, fw, mfs=mfs, npol=npol)
            acc = g if acc is None else _tree_add(acc, g)
            swt = s if swt is None else swt + s
        acc, swt = _psum_tree((acc, swt))

        ny = nx = model.npixel

        def grids_to_cube(acc, swt):
            cube = jnp.zeros((nchan_img, npol, ny, nx), jnp.float32)
            for c in range(nchan_img):
                for p in range(npol):
                    d = uv_grids_to_dirty(plan0s[c], acc[c][p])
                    d = d / jnp.maximum(swt[c, p], 1e-30)
                    cube = cube.at[c, p].set(d.astype(jnp.float32))
            return cube

        psf = model.replace(pixels=grids_to_cube(acc, swt))

        gains = [[gt.gain for gt in gts] for gts in gt0s]
        gwts = [[gt.weight for gt in gts] for gts in gt0s]
        gress = [[gt.residual for gt in gts] for gts in gt0s]
        # warm start (checkpoint/resume for multi-session runs at scales
        # where one process's RAM cannot hold all passes): continue the
        # major-cycle iteration from a previous run's CLEANed model
        if model_init is not None:
            model_px = jnp.asarray(
                np.asarray(model_init.pixels, np.float32).reshape(
                    nchan_img, npol, ny, nx
                )
            )
        else:
            model_px = jnp.zeros((nchan_img, npol, ny, nx), jnp.float32)
        residual = None
        ck = dict(clean_kwargs)
        ck.setdefault("algorithm", "hogbom")

        for cycle in range(nmajor):
            _t_cycle = _time.time()
            do_cal = tuple(
                cycle >= max(first_selfcal, t.first_selfcal)
                for t in term_cfgs
            )
            acc = None
            swt = None
            for k, re, im, fw in stream_slabs():
                cv = chunk_visibility(k)
                plans = build_plans(cv)
                comp = None
                if comp_static is not None:
                    comp = (*comp_static, cv.uvw_lambda)
                g, s, gain, gwt, gres = _slab_step(
                    plans, re, im, fw, model_px, comp,
                    cal_aux[k], tuple(gains[k]), tuple(gwts[k]),
                    tuple(gress[k]), a1, a2, ne_idx,
                    cfg=cfg, do_cal=do_cal,
                )
                gains[k] = list(gain)
                gwts[k] = list(gwt)
                gress[k] = list(gres)
                acc = g if acc is None else _tree_add(acc, g)
                swt = s if swt is None else swt + s
            acc, swt = _psum_tree((acc, swt))
            residual = model.replace(pixels=grids_to_cube(acc, swt))
            comp_img, _ = deconvolve_cube(residual, psf, **ck)
            model_px = model_px + comp_img.pixels.astype(jnp.float32)
            if on_cycle is not None:
                # force a device->host fetch: block_until_ready does not
                # reliably block over the remote tunnel
                np.asarray(model_px[0, 0, :1, :1])
                on_cycle(cycle, _time.time() - _t_cycle)
            if log.isEnabledFor(logging.INFO):
                log.info(
                    "streamed_ical: cycle %d peak residual %.6f",
                    cycle,
                    float(jnp.max(jnp.abs(residual.pixels))),
                )

        current = model.replace(
            pixels=model_px.astype(model.pixels.dtype)
        )
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
                    gains[k] = [zeros_like_safe(g) for g in gains[k]]
                    gwts[k] = [jnp.zeros_like(g) for g in gwts[k]]
                    gress[k] = [jnp.zeros_like(g) for g in gress[k]]
            gains, gwts, gress = _psum_tree((gains, gwts, gress))
        # merge slab gain tables per term (disjoint, time-ordered
        # intervals)
        gaintables = {}
        for it, name in enumerate(terms):
            gaintables[name] = GainTable(
                gain=jnp.concatenate(
                    [gains[k][it] for k in range(len(steps))], axis=0
                ),
                weight=jnp.concatenate(
                    [gwts[k][it] for k in range(len(steps))], axis=0
                ),
                residual=jnp.concatenate(
                    [gress[k][it] for k in range(len(steps))], axis=0
                ),
                time=jnp.concatenate(
                    [gt0s[k][it].time for k in range(len(steps))]
                ),
                interval=jnp.concatenate(
                    [gt0s[k][it].interval for k in range(len(steps))]
                ),
                frequency=gt0s[0][it].frequency,
                jones_type=name,
                receptor_frame=gt0s[0][it].receptor_frame,
            )
        gaintable = (
            gaintables[terms[0]] if len(terms) == 1 else gaintables
        )
        return StreamedICALResult(
            (current, residual, restored, gaintable)
        )
    finally:
        if own:
            store.close()
