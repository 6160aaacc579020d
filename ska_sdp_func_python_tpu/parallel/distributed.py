"""Distributed (multi-chip) kernels via shard_map + collectives
(framework M6).

Maps the reference's decomposition primitives (SURVEY.md §2c) onto a
jax.sharding Mesh:

* visibility rows shard over the "data" axis; gridding produces partial uv
  grids / dirty images that are ``psum``-reduced over ICI — the collective
  equivalent of imaging_helpers.sum_invert_results;
* gain-solve normal equations are assembled per baseline shard and
  ``psum``-reduced — the equivalent of the baseline->antenna scatter in
  solvers.py:110-114;
* predict is embarrassingly parallel over row shards (no collective).

Everything here is pure SPMD: one jitted program, XLA inserts the
collectives. Tested on a virtual 8-device CPU mesh (tests/test_parallel.py)
and dry-run compiled by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.image import Image
from ..models.visibility import Visibility
from ..ops.imaging import invert_core, normalise_sumwt, predict_core
from ..ops.solvers import solve_gains_core
from ..models.gaintable import GainTable, create_gaintable_from_visibility

__all__ = [
    "distributed_invert",
    "distributed_predict",
    "distributed_solve_gaintable",
]


def _pad_rows(n, ndev):
    return (-n) % ndev


def _flatten_rows(vis: Visibility, imchan_mfs: bool, ichan: int):
    """Flatten (time, baseline[, chan]) rows for one image channel."""
    uvw_l = vis.uvw_lambda
    fsel = slice(None) if imchan_mfs else slice(ichan, ichan + 1)
    uu = uvw_l[:, :, fsel, 0].reshape(-1)
    vv = uvw_l[:, :, fsel, 1].reshape(-1)
    ww = uvw_l[:, :, fsel, 2].reshape(-1)
    return uu, vv, ww, fsel


def distributed_invert(
    vis: Visibility,
    model: Image,
    mesh: Mesh,
    axis: str = "data",
    dopsf: bool = False,
    normalise: bool = True,
    support: int = 8,
    nw: int = 1,
    do_wstacking: bool = False,
    **kwargs,
):
    """Invert with visibility rows sharded over ``axis`` and the dirty
    image psum-reduced over the mesh. Returns (Image, sumwt)."""
    ndev = mesh.shape[axis]
    nchan_img, npol_img = model.nchan, model.npol
    mfs = nchan_img == 1 and vis.nchan > 1
    npixel = model.npixel

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
    )
    def _invert_shard(u, v, w, vals, wgt):
        dirty, sumwt = invert_core(
            u,
            v,
            w,
            vals,
            wgt,
            npixel=npixel,
            cellsize=model.cellsize,
            support=support,
            nw=nw,
            do_wstacking=do_wstacking,
        )
        dirty = jax.lax.psum(dirty, axis)
        sumwt = jax.lax.psum(sumwt, axis)
        return dirty, sumwt

    ms = vis.flagged_vis
    if dopsf:
        newms = jnp.zeros_like(ms)
        ms = newms.at[..., 0].set(1.0)
    wgt = vis.flagged_imaging_weight

    pixels = jnp.zeros_like(model.pixels)
    sumwt_out = jnp.zeros((nchan_img, npol_img), dtype=wgt.dtype)
    for ichan in range(nchan_img):
        uu, vv, ww, fsel = _flatten_rows(vis, mfs, ichan)
        pad = _pad_rows(uu.shape[0], ndev)
        uup = jnp.pad(uu, (0, pad))
        vvp = jnp.pad(vv, (0, pad))
        wwp = jnp.pad(ww, (0, pad))
        for pol in range(npol_img):
            vals = jnp.pad(ms[:, :, fsel, pol].reshape(-1), (0, pad))
            wv = jnp.pad(wgt[:, :, fsel, pol].reshape(-1), (0, pad))
            dirty, swt = _invert_shard(uup, vvp, wwp, vals, wv)
            pixels = pixels.at[ichan, pol].set(dirty.astype(pixels.dtype))
            sumwt_out = sumwt_out.at[ichan, pol].set(swt)
    out = model.with_pixels(pixels)
    if normalise:
        out = normalise_sumwt(out, sumwt_out)
    return out, sumwt_out


def distributed_predict(
    vis: Visibility,
    model: Image,
    mesh: Mesh,
    axis: str = "data",
    support: int = 8,
    nw: int = 1,
    do_wstacking: bool = False,
    **kwargs,
) -> Visibility:
    """Predict with rows sharded over ``axis`` (no collective: the image is
    replicated, each shard degrids its rows)."""
    ndev = mesh.shape[axis]
    nchan_img, npol_img = model.nchan, model.npol
    mfs = nchan_img == 1 and vis.nchan > 1

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
    )
    def _predict_shard(u, v, w, image):
        return predict_core(
            u,
            v,
            w,
            image,
            cellsize=model.cellsize,
            support=support,
            nw=nw,
            do_wstacking=do_wstacking,
        )

    cdtype = jnp.result_type(vis.vis.dtype, jnp.complex64)
    from ..config import czeros

    newvis = czeros(vis.vis.shape[:3] + (npol_img,), cdtype)
    for ichan in range(nchan_img):
        uu, vv, ww, fsel = _flatten_rows(vis, mfs, ichan)
        n = uu.shape[0]
        pad = _pad_rows(n, ndev)
        uup = jnp.pad(uu, (0, pad))
        vvp = jnp.pad(vv, (0, pad))
        wwp = jnp.pad(ww, (0, pad))
        tb_shape = vis.uvw_lambda[:, :, fsel, 0].shape
        for pol in range(npol_img):
            vals = _predict_shard(uup, vvp, wwp, model.pixels[ichan, pol])
            newvis = newvis.at[:, :, fsel, pol].add(
                vals[:n].reshape(tb_shape).astype(cdtype)
            )
    return vis.replace(vis=newvis.astype(vis.vis.dtype))


def distributed_solve_gaintable(
    vis: Visibility,
    modelvis: Visibility | None,
    mesh: Mesh,
    axis: str = "data",
    phase_only: bool = True,
    niter: int = 200,
    tol: float = 1e-6,
    crosspol: bool = False,
    jones_type: str = "T",
    timeslice=None,
) -> GainTable:
    """Gain solve with the baseline axis sharded over ``axis``.

    Each shard accumulates its partial antenna-pair normal equations
    (solvers.py:99-114 equivalent) which are psum-reduced; the batched
    StefCal iteration then runs replicated on every device.
    """
    from ..ops.visibility_ops import divide_visibility

    ndev = mesh.shape[axis]
    point_vis = (
        divide_visibility(vis, modelvis) if modelvis is not None else vis
    )
    gain_table = create_gaintable_from_visibility(
        vis, jones_type=jones_type, timeslice=timeslice
    )
    nants = vis.nants
    nbl = vis.nbaselines
    pad = _pad_rows(nbl, ndev)

    # time-interval membership [nsol, ntime]
    t = point_vis.time[None, :]
    lo = (gain_table.time - gain_table.interval / 2)[:, None]
    hi = (gain_table.time + gain_table.interval / 2)[:, None]
    w_t = ((t >= lo) & (t <= hi)).astype(point_vis.weight.dtype)

    fw = point_vis.flagged_weight
    xw = point_vis.vis * fw.astype(point_vis.vis.dtype)
    if gain_table.nchan == 1:
        xb = jnp.einsum("st,tbfp->sbp", w_t.astype(xw.dtype), xw)[
            :, :, None, :
        ]
        wb = jnp.einsum("st,tbfp->sbp", w_t, fw)[:, :, None, :]
    else:
        xb = jnp.einsum("st,tbfp->sbfp", w_t.astype(xw.dtype), xw)
        wb = jnp.einsum("st,tbfp->sbfp", w_t, fw)
    # pad baseline axis; padded rows get antenna indices 0,0 with zero weight
    xb = jnp.pad(xb, ((0, 0), (0, pad), (0, 0), (0, 0)))
    wb = jnp.pad(wb, ((0, 0), (0, pad), (0, 0), (0, 0)))
    a1 = jnp.pad(vis.antenna1, (0, pad))
    a2 = jnp.pad(vis.antenna2, (0, pad))
    nsol, _, nchan, npol = xb.shape

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(axis), P(axis)),
        out_specs=(P(), P()),
    )
    def _normal_eq_shard(xb_l, wb_l, a1_l, a2_l):
        x = jnp.zeros((nsol, nants, nants, nchan, npol), dtype=xb_l.dtype)
        xwt = jnp.zeros((nsol, nants, nants, nchan, npol), dtype=wb_l.dtype)
        x = x.at[:, a1_l, a2_l].add(jnp.conj(xb_l)).at[:, a2_l, a1_l].add(
            xb_l
        )
        xwt = xwt.at[:, a1_l, a2_l].add(wb_l).at[:, a2_l, a1_l].add(wb_l)
        return jax.lax.psum(x, axis), jax.lax.psum(xwt, axis)

    x, xwt = _normal_eq_shard(xb, wb, a1, a2)
    # zero any padded-row contamination on the (0, 0) diagonal: the solver
    # masks the diagonal anyway (solvers.py:252-253 equivalent)
    gain, gwt, residual = solve_gains_core(
        x,
        xwt,
        gain_table.gain,
        niter=niter,
        tol=tol,
        phase_only=phase_only,
        crosspol=crosspol,
        npol=vis.npol,
    )
    return gain_table.replace(gain=gain, weight=gwt, residual=residual)
