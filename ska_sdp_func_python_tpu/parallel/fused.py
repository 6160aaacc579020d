"""Baseline-sharded fused self-cal over a device mesh.

This is the BASELINE.json north star realised with the REAL production
kernels: the one-dispatch fused major cycle (pipeline._fused_selfcal_cycle)
runs as a shard_map SPMD program with visibility *baselines* sharded over
the mesh's "data" axis. Per cycle, on every device simultaneously:

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
    **clean_kwargs,
):
    """Distributed fused ICAL: one SPMD dispatch per major cycle.

    :return: (model Image, residual Image, restored Image, gaintables)
    """
    if controls is None:
        controls = create_calibration_controls()
    ndev = mesh.shape[axis]
    # every shard must stack onto the same w planes (range from the real
    # rows, before zero-weight padding)
    wl = vis.uvw_lambda[..., 2]
    w_range = (
        float(jnp.min(wl)),
        float(jnp.max(wl)),
    )
    vis = _pad_baselines(vis, ndev)
    nbl_loc = vis.nbaselines // ndev

    # the w-plane count must also be global (it is derived from max|w|)
    from ..ops.imaging import _nw_for

    do_wstacking = context not in ("2d",)
    nwp = _nw_for(vis, model, do_wstacking, nw)

    # per-shard workspaces (each builds its own plan = its own local sort)
    workspaces = []
    for d in range(ndev):
        svis = _shard_slice(vis, d, nbl_loc)
        plan = make_visibility_plan(
            svis, model, context=context, support=support, nw=nwp,
            w_range=w_range,
        )
        workspaces.append(
            _FusedSelfCal(
                svis,
                model,
                plan,
                components,
                list(calibration_context),
                controls,
                "mean",
                solver_niter,
                tol,
                # placeholder PSF; patched below once computed
                model.replace(
                    pixels=jnp.ones_like(model.pixels)
                ),
                **clean_kwargs,
            )
        )
    ws0 = workspaces[0]
    cfg = ws0.cfg
    gains = tuple(gt.gain for gt in ws0.gt0s)
    gwts = tuple(gt.weight for gt in ws0.gt0s)
    gress = tuple(gt.residual for gt in ws0.gt0s)

    states = [w.state(gwts, gress) for w in workspaces]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *states
    )
    sharding = NamedSharding(mesh, P(axis))
    stacked = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), stacked
    )

    # ---- PSF via the same sharded machinery: grid weights, psum ----
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=P(),
        check_vma=False,
    )
    def _psf_shard(state_stacked):
        from ..ops.gridding_plan import grid_with_plan

        state = jax.tree_util.tree_map(lambda x: x[0], state_stacked)
        npol = cfg.npol

        def psf_cp(pl, wgt, p):
            # unit vis in the parallel hands (fill_vis_for_psf)
            unit = (
                wgt * 0.0 + 1.0
                if (npol == 1 or p in (0, npol - 1))
                else wgt * 0.0
            )
            grids = grid_with_plan(
                pl.gp,
                jax.lax.complex(unit * wgt, unit * 0.0),
                values_sorted=True,
            )
            grids = jax.lax.psum(grids, axis)
            dirty = uv_grids_to_dirty(pl, grids)
            swt = jax.lax.psum(jnp.sum(wgt), axis)
            ok = swt > 0.0
            return jnp.where(
                ok, dirty / jnp.where(ok, swt, 1.0), 0.0
            ).astype(jnp.float32)

        if cfg.nchan > 1:
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
    psf_pixels = _psf_shard(stacked)
    psf = model.replace(pixels=psf_pixels.astype(model.pixels.dtype))
    from ..ops.deconvolution import bound_psf

    bpsf = bound_psf(psf, psf, clean_kwargs.get("psf_support", None))
    stacked["psf_patch"] = jax.device_put(
        jnp.broadcast_to(
            bpsf.pixels.astype(jnp.float32)[None],
            (ndev,) + bpsf.pixels.shape,
        ),
        sharding,
    )

    def _cycle(state_stacked, mp, gs, *, do_cal, with_model):
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(axis), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
        def body(ss, m, g):
            state = jax.tree_util.tree_map(lambda x: x[0], ss)
            fn = (
                _fused_selfcal_cycle_cube
                if cfg.nchan > 1
                else _fused_selfcal_cycle
            )
            return fn(
                state,
                m,
                g,
                cfg=cfg,
                do_cal=do_cal,
                with_model=with_model,
                psum_axis=axis,
            )

        return body(state_stacked, mp, gs)

    cycle_jit = jax.jit(
        _cycle, static_argnames=("do_cal", "with_model")
    )

    model_px = jnp.zeros_like(model.pixels).astype(jnp.float32)
    res_px = None
    for cycle in range(nmajor):
        do_cal = tuple(cycle >= t.first_selfcal for t in cfg.terms)
        model_px, gains, gwts, gress, res_px, _, peak = cycle_jit(
            stacked, model_px, gains, do_cal=do_cal,
            with_model=cycle > 0,
        )
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
