"""Sharded fused self-cal over a device mesh (baseline- or channel-axis).

This is the BASELINE.json north star realised with the REAL production
kernels: the one-dispatch fused major cycle (pipeline._fused_selfcal_cycle)
runs as a shard_map SPMD program over the mesh's "data" axis, decomposed
along either of the two data axes the reference's execution framework
parallelises over (SURVEY.md §2c rows 4 and 1):

``shard="baseline"`` — visibility *baselines* sharded. Per cycle, on every
device simultaneously:

    model degrid      — replicated image -> FFT grids (identical on all
                        devices) -> local Pallas degrid of the shard's rows
    normal equations  — local product-form accumulation + baseline scatter,
                        then ONE psum assembling the full
                        [nsol, nants, nants] system (rides ICI)
    StefCal solve     — replicated (identical inputs after the psum)
    gain apply        — local per-row factors, local payload sort
    residual invert   — local Pallas gridding of the shard, ONE psum of the
                        w-stacked uv grids, replicated FFT/w-sum tail
    CLEAN             — replicated minor cycles on the full image

The only collectives are the two psums; everything data-sized is local, so
per-cycle communication is O(nants^2 + npad^2 nw) independent of the
visibility count — the design scales to the 1B-visibility target by adding
devices. Each shard carries its own gridding plan (its own segment sort,
built once); plan shapes are static in the padded row count so the
per-shard plans stack into one leading-axis-sharded pytree.

``shard="channel"`` — image/visibility *channels* sharded (spectral-cube
data parallelism, the reference's ``image_scatter_channels`` decomposition
at mesh level). Every gridding/FFT/CLEAN lane is per-channel and therefore
fully local — no uv-grid collective at all; the only frequency-coupled
reductions are the gain normal equations (gains are solved jointly across
the band) and, for MSMFS, the channel→moment transforms, each ONE psum of
O(nants^2) / O(nmoment·npixel^2). For cube imaging this is the cheaper
decomposition; for single-channel snapshots use ``shard="baseline"``.

The reference has no distributed backend (SURVEY.md 2c): it is a
single-process numpy library run under dask by the SKA execution
framework. Here the decomposition primitive is jax.sharding itself.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.components import SkyComponents
from ..models.image import Image
from ..models.visibility import Visibility
from ..ops.calibration_chain import create_calibration_controls
from ..ops.imaging import make_visibility_plan, uv_grids_to_dirty
from ..pipeline import (
    _FusedSelfCal,
    _fused_selfcal_cycle,
    _fused_selfcal_cycle_cube,
    _restore_with_components,
)

log = logging.getLogger("ska-sdp-func-python-tpu")

__all__ = ["sharded_ical"]


def _pad_baselines(vis: Visibility, ndev: int) -> Visibility:
    """Pad the baseline axis to a multiple of the device count with
    zero-weight dummy rows (antenna pair (0, 0), zero uvw)."""
    nbl = vis.nbaselines
    pad = (-nbl) % ndev
    if pad == 0:
        return vis
    def padbl(x):
        w = [(0, 0)] * x.ndim
        w[1] = (0, pad)
        return jnp.pad(x, w)
    fields = dict(
        uvw=padbl(vis.uvw),
        vis=padbl(vis.vis),
        weight=padbl(vis.weight),
        flags=jnp.pad(
            vis.flags, [(0, 0), (0, pad), (0, 0), (0, 0)],
            constant_values=1,
        ),
        antenna1=jnp.pad(jnp.asarray(vis.antenna1), (0, pad)),
        antenna2=jnp.pad(jnp.asarray(vis.antenna2), (0, pad)),
    )
    if vis.imaging_weight is not None:
        fields["imaging_weight"] = padbl(vis.imaging_weight)
    return vis.replace(**fields)


def _shard_slice(vis: Visibility, d: int, nbl_loc: int) -> Visibility:
    sl = slice(d * nbl_loc, (d + 1) * nbl_loc)
    fields = dict(
        uvw=vis.uvw[:, sl],
        vis=vis.vis[:, sl],
        weight=vis.weight[:, sl],
        flags=vis.flags[:, sl],
        antenna1=np.asarray(vis.antenna1)[sl],
        antenna2=np.asarray(vis.antenna2)[sl],
    )
    if vis.imaging_weight is not None:
        fields["imaging_weight"] = vis.imaging_weight[:, sl]
    return vis.replace(**fields)


def _shard_slice_chan(vis: Visibility, d: int, nch_loc: int) -> Visibility:
    sl = slice(d * nch_loc, (d + 1) * nch_loc)
    fields = dict(
        vis=vis.vis[:, :, sl],
        weight=vis.weight[:, :, sl],
        flags=vis.flags[:, :, sl],
        frequency=vis.frequency[sl],
        channel_bandwidth=vis.channel_bandwidth[sl],
    )
    if vis.imaging_weight is not None:
        fields["imaging_weight"] = vis.imaging_weight[:, :, sl]
    return vis.replace(**fields)


def _model_slice_chan(model: Image, d: int, nch_loc: int) -> Image:
    sl = slice(d * nch_loc, (d + 1) * nch_loc)
    return model.replace(
        pixels=model.pixels[sl],
        frequency=model.frequency[sl],
        channel_bandwidth=model.channel_bandwidth[sl],
    )


def sharded_ical(
    vis: Visibility,
    model: Image,
    mesh: Mesh,
    components: Optional[SkyComponents] = None,
    nmajor: int = 5,
    calibration_context: str = "T",
    controls: Optional[dict] = None,
    axis: str = "data",
    context: str = "ng",
    support: int = 8,
    nw: int | None = None,
    solver_niter: int = 200,
    tol: float = 1e-6,
    shard: str = "baseline",
    hlo_out: list | None = None,
    **clean_kwargs,
):
    """Distributed fused ICAL: one SPMD dispatch per major cycle.

    ``shard="baseline"`` shards visibility baselines over the mesh (any
    nchan); ``shard="channel"`` shards image/vis channels (cube mode:
    ``model.nchan == vis.nchan``, divisible by the device count) — see the
    module docstring for the collective structure of each.

    :return: (model Image, residual Image, restored Image, gaintables)
    """
    if controls is None:
        controls = create_calibration_controls()
    if shard not in ("baseline", "channel"):
        raise ValueError(f"unknown shard axis {shard!r}")
    from ..pipeline import _window_fusable

    if not _window_fusable(clean_kwargs):
        raise ValueError(
            "sharded_ical runs the fused in-graph CLEAN, which supports "
            "windows for hogbom/msclean/msmfs — windowed "
            f"{clean_kwargs.get('algorithm')!r} must use the composed "
            "pipeline"
        )
    ndev = mesh.shape[axis]
    has_matrix = any(
        controls[c]["shape"] == "matrix" for c in calibration_context
    )
    if has_matrix and (shard == "channel" or model.nchan > 1):
        raise ValueError(
            "full-Jones (matrix) terms fuse on single-plan npol-4 "
            "configs only; channel-sharded / cube runs must use the "
            "composed pipeline"
        )
    if shard == "channel" and "B" in calibration_context:
        raise ValueError(
            "bandpass ('B') solves per GLOBAL frequency channel; with "
            "channel-sharded data each device only holds a local "
            "channel slice, so the per-channel normal equations cannot "
            "assemble by psum — use shard='baseline' for B contexts"
        )
    multiproc = jax.process_count() > 1
    if multiproc and shard == "channel":
        raise ValueError(
            "shard='channel' assembles the PSF patch host-side and is "
            "single-process; use shard='baseline' for multi-host runs "
            "(its per-cycle collectives are O(nants^2 + grid), "
            "independent of the visibility count)"
        )
    from .multihost import local_shard_indices, stack_shards_global

    local_ds = (
        local_shard_indices(mesh, axis) if multiproc else list(range(ndev))
    )
    # every shard must stack onto the same w planes (range from the real
    # rows, before zero-weight padding)
    wl = vis.uvw_lambda[..., 2]
    w_range = (
        float(jnp.min(wl)),
        float(jnp.max(wl)),
    )

    # the w-plane count must also be global (it is derived from max|w|)
    from ..ops.imaging import _nw_for

    do_wstacking = context not in ("2d",)
    nwp = _nw_for(vis, model, do_wstacking, nw)

    if shard == "channel":
        if model.nchan != vis.nchan:
            raise ValueError(
                "shard='channel' requires cube mode "
                f"(model.nchan == vis.nchan, got {model.nchan} vs "
                f"{vis.nchan})"
            )
        if model.nchan % ndev:
            raise ValueError(
                f"nchan {model.nchan} not divisible by mesh size {ndev}"
            )
        nch_loc = model.nchan // ndev
    else:
        vis = _pad_baselines(vis, ndev)
        nbl_loc = vis.nbaselines // ndev

    # per-shard workspaces (each builds its own plan = its own local
    # sort); a multi-process run constructs ONLY this process's shards
    workspaces = []
    for d in local_ds:
        if shard == "channel":
            svis = _shard_slice_chan(vis, d, nch_loc)
            smodel = _model_slice_chan(model, d, nch_loc)
        else:
            svis = _shard_slice(vis, d, nbl_loc)
            smodel = model
        # baseline shards must stack onto identical w planes (their grids
        # psum together); channel shards never mix grids, so each keeps
        # the per-channel w range the single-device plan would use — only
        # the plane COUNT stays global (static SPMD shape)
        plan = make_visibility_plan(
            svis, smodel, context=context, support=support, nw=nwp,
            w_range=w_range if shard == "baseline" else None,
        )
        workspaces.append(
            _FusedSelfCal(
                svis,
                smodel,
                plan,
                components,
                list(calibration_context),
                controls,
                "mean",
                solver_niter,
                tol,
                # placeholder PSF; patched below once computed
                smodel.replace(
                    pixels=jnp.ones_like(smodel.pixels)
                ),
                **clean_kwargs,
            )
        )
    if shard == "channel" and workspaces[0].mom_w is not None:
        # MSMFS moment weights must be taken about the GLOBAL reference
        # frequency (the per-shard workspaces saw only their local slice);
        # each shard gets its rows of the global weight matrices and the
        # partial moment cubes psum inside the cycle
        from ..ops.taylor import moment_weights

        nmoment = workspaces[0].cfg.nmoment
        nm_psf = 2 * nmoment if nmoment > 1 else 1
        freq_g = jnp.asarray(model.frequency)
        w_m_g = moment_weights(freq_g, None, nmoment).astype(jnp.float32)
        w_pm_g = moment_weights(freq_g, None, nm_psf).astype(jnp.float32)
        for d, w in zip(local_ds, workspaces):
            sl = slice(d * nch_loc, (d + 1) * nch_loc)
            w.mom_w = (w_m_g[sl], w_pm_g[sl])
    ws0 = workspaces[0]
    cfg = ws0.cfg
    gains = tuple(gt.gain for gt in ws0.gt0s)
    gwts = tuple(gt.weight for gt in ws0.gt0s)
    gress = tuple(gt.residual for gt in ws0.gt0s)

    # channel shards always use the channel-batched cube layout/program
    # (even at one local channel) so the SPMD body is identical everywhere
    cube = cfg.nchan > 1 if shard == "baseline" else True
    states = [w.state(gwts, gress, cube=cube) for w in workspaces]
    sharding = NamedSharding(mesh, P(axis))
    stacked = stack_shards_global(states, local_ds, mesh, axis)

    # ---- PSF via the same sharded machinery ----
    # baseline shards: grid the local rows' weights, psum the uv grids;
    # channel shards: every channel's PSF is fully local, no collective
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=P(axis) if shard == "channel" else P(),
        check_vma=False,
    )
    def _psf_shard(state_stacked):
        from ..ops.gridding_plan import grid_with_plan

        state = jax.tree_util.tree_map(lambda x: x[0], state_stacked)
        npol = cfg.npol

        def psf_cp(pl, wgt, p):
            # unit amplitude in the FIRST polarisation only — the same
            # reference ng.py:235-238 convention the single-device
            # invert_visibility(dopsf=True) uses, so sharded and
            # single-device cycles clean with identical PSFs (npol>1:
            # zero-PSF pol lanes are skipped by the clean, matching
            # deconvolve_cube)
            unit = (
                wgt * 0.0 + 1.0 if p == 0 else wgt * 0.0
            )
            grids = grid_with_plan(
                pl.gp,
                jax.lax.complex(unit * wgt, unit * 0.0),
                values_sorted=True,
            )
            swt = jnp.sum(wgt)
            if shard == "baseline":
                from ..ops.imaging import uv_grids_to_dirty_scattered

                swt = jax.lax.psum(swt, axis)
                dirty = uv_grids_to_dirty_scattered(pl, grids, axis)
            else:
                dirty = uv_grids_to_dirty(pl, grids)
            ok = swt > 0.0
            return jnp.where(
                ok, dirty / jnp.where(ok, swt, 1.0), 0.0
            ).astype(jnp.float32)

        if cube:
            plans = state["plans"]  # channel-stacked
            wgt_sa = state["wgt_s"]  # [nchan, npol, n]
            return jnp.stack(
                [
                    jax.vmap(
                        lambda pl, wr: psf_cp(pl, wr[p], p)
                    )(plans, wgt_sa)
                    for p in range(npol)
                ],
                axis=1,
            )
        plans = state["plans"]
        nchan = len(plans)
        ny = nx = plans[0].npixel
        pixels = jnp.zeros((nchan, npol, ny, nx), jnp.float32)
        for c in range(nchan):
            for p in range(npol):
                pixels = pixels.at[c, p].set(
                    psf_cp(plans[c], state["wgt_s"][c][p], p)
                )
        return pixels
    psf_pixels = jax.jit(_psf_shard)(stacked)
    psf = model.replace(pixels=psf_pixels.astype(model.pixels.dtype))
    from ..ops.deconvolution import bound_psf

    # the patch support must be identical on every device (one SPMD
    # program), so it is derived from the gathered full-cube PSF
    bpsf = bound_psf(psf, psf, clean_kwargs.get("psf_support", None))
    bp = bpsf.pixels.astype(jnp.float32)
    if shard == "channel":
        # device d cleans its own channels against its own PSF channels
        patch_stacked = bp.reshape((ndev, nch_loc) + bp.shape[1:])
        stacked["psf_patch"] = jax.device_put(patch_stacked, sharding)
    else:
        # replicate-then-shard under jit so a multi-process run never
        # needs an eagerly-addressable full array
        stacked["psf_patch"] = jax.jit(
            lambda b: jnp.broadcast_to(b[None], (ndev,) + b.shape),
            out_shardings=sharding,
        )(bp)

    if shard == "channel":
        # model/residual/sumwt live on the sharded channel axis; gains,
        # gain stats and the peak are replicated after their psums
        mp_spec = P(axis)
        out_specs = (P(axis), P(), P(), P(), P(axis), P(axis), P())
        shard_kw = dict(psum_axis=None, channel_axis=axis)
    else:
        mp_spec = P()
        out_specs = P()
        shard_kw = dict(psum_axis=axis)

    def _cycle(state_stacked, mp, gs, *, do_cal, with_model):
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(axis), mp_spec, P()),
            out_specs=out_specs,
            check_vma=False,
        )
        def body(ss, m, g):
            state = jax.tree_util.tree_map(lambda x: x[0], ss)
            fn = (
                _fused_selfcal_cycle_cube
                if cube
                else _fused_selfcal_cycle
            )
            return fn(
                state,
                m,
                g,
                cfg=cfg,
                do_cal=do_cal,
                with_model=with_model,
                **shard_kw,
            )

        return body(state_stacked, mp, gs)

    cycle_jit = jax.jit(
        _cycle, static_argnames=("do_cal", "with_model")
    )

    model_px = jnp.zeros_like(model.pixels).astype(jnp.float32)
    res_px = None
    for cycle in range(nmajor):
        do_cal = tuple(cycle >= t.first_selfcal for t in cfg.terms)
        if hlo_out is not None and cycle == 0:
            # scaling introspection: the optimized HLO of the per-cycle
            # SPMD program (bench_scaling_model.py parses its
            # collectives to audit per-cycle communication volume)
            hlo_out.append(
                cycle_jit.lower(
                    stacked, model_px, gains, do_cal=do_cal,
                    with_model=cycle > 0,
                ).compile().as_text()
            )
        model_px, gains, gwts, gress, res_px, _, peak = cycle_jit(
            stacked, model_px, gains, do_cal=do_cal,
            with_model=cycle > 0,
        )
        if log.isEnabledFor(logging.INFO):
            log.info(
                "sharded_ical: cycle %d peak residual %.6f",
                cycle,
                float(peak),
            )
    current = model.replace(pixels=model_px.astype(model.pixels.dtype))
    residual = model.replace(pixels=res_px) if res_px is not None else None
    gaintables = ws0.gaintables(gains, gwts, gress)
    restored = _restore_with_components(current, psf, residual, components)
    return current, residual, restored, gaintables
