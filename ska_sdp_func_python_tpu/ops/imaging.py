"""Imaging: predict and invert between visibilities and images
(framework L2/L3, C8-C11).

TPU-native replacement for /root/reference/src/ska_sdp_func_python/imaging/
{imaging.py, ng.py, wg.py, base.py}. The reference delegates the hot path to
the ducc0 C++ w-stacking gridder (ng.py:99,240) or the wagg CUDA port
(wg.py); here the same contract — predict/invert with w-correction — is one
jitted XLA graph: PSWF convolutional gridding (ops/gridding.py), batched
centred FFTs, and a w-stack with linear interpolation between w-planes.

Sign conventions (verified against the DFT in tests/test_imaging.py):
    u_pix = -u * npixel * cellsize + npixel//2     (matches ng.py:84 u-flip)
    v_pix = +v * npixel * cellsize + npixel//2
    dirty(l, m) = sum_k V_k exp(+2pi i (u l + v m + w (n-1)))
"""

from __future__ import annotations

import logging
from dataclasses import dataclass as _dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.image import Image, create_image
from ..models.polarisation import convert_pol_frame
from ..models.visibility import Visibility, C_M_S
from .fft import extract_mid, fft, ifft, pad_mid

log = logging.getLogger("ska-sdp-func-python-tpu")
from .gridding import (
    _es_beta,
    convolutional_degrid,
    convolutional_grid,
    grid_correction,
)
from .pswf import w_beam
from .visibility_ops import phaserotate_visibility

__all__ = [
    "visibility_recentre",
    "invert_visibility",
    "predict_visibility",
    "ImagingPlan",
    "make_imaging_plan",
    "invert_with_plan",
    "predict_with_plan",
    "VisibilityImagingPlan",
    "make_visibility_plan",
    "predict_ng",
    "invert_ng",
    "predict_wg",
    "invert_wg",
    "rad_deg_arcsec",
    "shift_vis_to_image",
    "normalise_sumwt",
    "fill_vis_for_psf",
    "create_image_from_visibility",
    "advise_wide_field",
]


def shift_vis_to_image(
    vis: Visibility, im: Image, tangent: bool = True, inverse: bool = False
) -> Visibility:
    """Phase-rotate visibility to the image phase centre
    (imaging/base.py:48-92)."""
    return phaserotate_visibility(
        vis, im.phasecentre, tangent=tangent, inverse=inverse
    )


def normalise_sumwt(im: Image, sumwt) -> Image:
    """Divide image planes by the sum of weights (imaging/base.py:95-155)."""
    sumwt = jnp.asarray(sumwt)
    ok = sumwt > 0.0
    scale = jnp.where(ok, 1.0 / jnp.where(ok, sumwt, 1.0), 0.0)
    return im.with_pixels(im.pixels * scale[:, :, None, None])


def fill_vis_for_psf(vis: Visibility) -> Visibility:
    """Set vis to unity in the parallel hands and zero in cross hands
    (imaging/base.py:262-296)."""
    if vis.npol == 4:
        from ..config import zeros_like_safe

        newvis = zeros_like_safe(vis.vis)
        newvis = newvis.at[..., 0].set(1.0).at[..., 3].set(1.0)
    else:
        newvis = jnp.ones(vis.vis.shape, dtype=jnp.float32).astype(
            vis.vis.dtype
        )
    return vis.replace(vis=newvis)


# --------------------------------------------------------------------------
# core jitted kernels (flattened per image-channel/pol arrays)
# --------------------------------------------------------------------------


def _w_planes(
    w, nw: int, w_interp: str = "linear", w_range=None,
    w_support: int = 8,
):
    """W-plane decomposition: per-vis plane index + fraction.

    ``w_interp="linear"`` splits each vis between its two neighbouring
    planes (second-order accurate in the plane spacing); ``"nearest"``
    assigns the closest plane only — classic WSClean-style w-stacking,
    first-order accurate but ~1.5x faster (half the sorted entries).
    Measured at 256^2/32 planes: linear ~1e-5, nearest ~2e-3 peak error.
    ``"eskernel"`` spreads each vis over ``w_support`` planes with ES
    weights (ducc0 improved w-stacking: uniform-over-the-field w error;
    pair with :func:`w_kernel_correction`) — the plane grid extends
    ``w_support/2`` planes beyond [wmin, wmax] on each side and the
    returned fraction is the continuous plane coordinate minus the
    first tap plane.
    ``w_range=(wmin, wmax)`` pins the plane grid externally — REQUIRED
    when visibilities are sharded so every shard stacks onto identical
    planes (parallel/fused.py).
    """
    if w_range is not None:
        wmin, wmax = w_range
        wmin = jnp.asarray(wmin, w.dtype)
        wmax = jnp.asarray(wmax, w.dtype)
    else:
        wmin = jnp.min(w)
        wmax = jnp.max(w)
    if w_interp == "eskernel":
        ssw = w_support
        ni = max(nw - ssw, 1)
        rng = wmax - wmin
        wstep = jnp.where(
            rng > 0, rng / max(ni - 1, 1), jnp.asarray(1.0, w.dtype)
        )
        w_lo = wmin - (ssw / 2) * wstep
        t = (w - w_lo) / wstep
        j0 = jnp.floor(t).astype(jnp.int32) - (ssw // 2 - 1)
        j0 = jnp.clip(j0, 0, max(nw - ssw, 0))
        plane_w = w_lo + wstep * jnp.arange(nw, dtype=w.dtype)
        return j0, t - j0.astype(w.dtype), plane_w
    wstep = jnp.maximum((wmax - wmin) / max(nw - 1, 1), 1e-30)
    t = (w - wmin) / wstep
    plane_w = wmin + wstep * jnp.arange(nw)
    if nw <= 1:
        return jnp.zeros(w.shape, dtype=jnp.int32), jnp.zeros_like(w), plane_w
    if w_interp == "nearest":
        p0 = jnp.clip(jnp.round(t).astype(jnp.int32), 0, nw - 1)
        return p0, None, plane_w
    if w_interp == "quadratic":
        # centre plane + signed offset for the 3-plane Lagrange stencil
        # (gridding_tiled w_order=2): third-order w-interpolation error
        # ~(nw_est/nw)^3 vs linear's ^2 — the deep-f64 regimes' limiter
        j = jnp.clip(jnp.round(t).astype(jnp.int32), 1, max(nw - 2, 1))
        return j, t - j, plane_w
    p0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, nw - 2)
    frac = jnp.clip(t - p0, 0.0, 1.0)
    return p0, frac, plane_w



def w_kernel_correction(
    npixel: int, cellsize, wstep, w_support: int, dtype, beta=None
):
    """Image-plane correction for ES-kernel w-gridding: divide the
    summed w-plane image by the w-kernel's transform evaluated at
    ``wstep * |n(l,m) - 1|`` — the w-axis analogue of
    :func:`gridding.grid_correction` (NUFFT/Poisson argument along w;
    ducc0 improved w-stacking, Arras+ 2021). [npixel, npixel] real.
    """
    import numpy as _np

    from .gridding import es_kernel

    h = w_support / 2.0
    q, wq = _np.polynomial.legendre.leggauss(8 * w_support)
    q = jnp.asarray(q, dtype=dtype)
    wq = jnp.asarray(wq, dtype=dtype)
    phi = (wq * es_kernel(q, w_support, beta)).astype(dtype)
    x = (jnp.arange(npixel, dtype=dtype) - npixel // 2) * jnp.asarray(
        cellsize, dtype
    )
    l2 = jnp.clip(x[None, :] ** 2 + x[:, None] ** 2, 0.0, 1.0)
    # stable 1 - sqrt(1-r2): the naive form cancels to ~eps32 ABSOLUTE
    # error in nu, which wstep (hundreds of wavelengths) amplifies to
    # ~1e-5 of correction error — the measured round-5 on-chip f32 floor
    nu = l2 / (1.0 + jnp.sqrt(1.0 - l2))
    X = (jnp.asarray(wstep, dtype) * nu) * jnp.asarray(
        2.0 * np.pi * h, dtype
    )

    def add_q(carry, inputs):
        wphi, qq = inputs
        return carry + wphi * jnp.cos(X * qq), None

    c0 = jnp.zeros_like(X)
    c, _ = jax.lax.scan(add_q, c0, (phi, q))
    c = c * jnp.asarray(h, dtype)
    return jnp.where(jnp.abs(c) > 1e-30, c, 1.0)


def _npad_for(npixel: int, padding, family: str | None = None) -> int:
    """Padded uv-grid size: ``padding`` (ducc0-style oversampling factor,
    may be fractional) times npixel, rounded up to a 128-multiple — OR,
    when a 7-smooth multiple of 56 lands within 6% of that, the
    56-family grid instead: tile 56 gives buf = 64 slot-kernel panels
    (4*buf = 512 = exactly four 128-wide MXU lane tiles vs 288 = 2.25
    at tile 64), measured 30.0 -> 27.6 ms on the 10M/1024^2 BASELINE
    invert (1280/t64 -> 1344/t56).

    ``family`` overrides ``config.grid_family()`` — the jit entry points
    resolve the config in their non-jit wrappers and pass it through as a
    static argument, so ``set_grid_family()`` after a first call forces a
    retrace instead of silently reusing the stale geometry."""
    up = lambda n: -(-int(n) // 128) * 128  # noqa: E731
    base = max(up(npixel * padding), up(npixel + 1))
    if family is None:
        from .. import config as _config

        family = _config.grid_family()
    if family == "base":
        return base
    best56 = None
    # Only consider 56-family grids that are >= the 128-rounded base:
    # effective oversampling must never DECREASE vs the validated t64
    # geometry (round-3 regression: npixel=128 got 168 < 256, breaking
    # plan-path parity at small image sizes).
    n = -(-base // 56) * 56
    while n <= base * 1.06:
        m = n
        for p in (2, 3, 5, 7):
            while m % p == 0:
                m //= p
        if m == 1:
            best56 = n
            break
        n += 56
    if best56 is not None and best56 <= base * 1.06:
        return best56
    return base


def _tile_for(npad: int) -> int:
    """Largest supported tile size dividing the padded grid; 56 first
    (the MXU-exact buf-64 configuration — see _npad_for)."""
    for ts in (56, 64, 48, 32, 16, 8):
        if npad % ts == 0:
            return ts
    return 8


@partial(
    jax.jit,
    static_argnames=(
        "npixel",
        "support",
        "nw",
        "do_wstacking",
        "padding",
        "gridder",
        "w_interp",
        "family",
        "prepix",
    ),
)
def _invert_core_jit(
    u,
    v,
    w,
    vals,
    wgt,
    u_lo=None,
    v_lo=None,
    *,
    npixel: int,
    cellsize: float,
    support: int = 8,
    nw: int = 1,
    do_wstacking: bool = True,
    padding: int = 2,
    gridder: str | None = None,
    w_interp: str = "linear",
    family: str | None = None,
    prepix: bool = False,
):
    npad = _npad_for(npixel, padding, family)
    beta = _es_beta(support, npad / npixel)
    scale = npad * cellsize
    if prepix:
        # compensated mode: u/v arrive as padded-grid pixel coordinates
        # split (hi, lo) in f32 by the caller (host-f64 positions; the
        # tiled kernels subtract lo after the small hi difference)
        u_pix, v_pix = u, v
    else:
        u_pix = -u * scale + npad // 2
        v_pix = v * scale + npad // 2
    weighted = vals * wgt.astype(vals.dtype)

    if gridder is None:
        # fused Pallas path on accelerators (4.8x the XLA tiled pipeline at
        # the 10M-vis BASELINE config); tiled XLA on CPU (tests)
        gridder = "tiled" if jax.default_backend() == "cpu" else "fused"
    if w_interp in ("quadratic", "eskernel"):
        gridder = "tiled"  # the multi-plane stencils live in the tiled path
    if prepix and gridder != "tiled":
        raise ValueError("prepix coordinates need the tiled gridder")
    if gridder in ("tiled", "fused"):
        if gridder == "fused":
            from .gridding_fused import fused_grid_wstack as _grid_fn

            grid_kw = {}
        else:
            from .gridding_tiled import tiled_grid as _grid_fn

            grid_kw = {"unit": 256}
            if w_interp == "quadratic":
                grid_kw["w_order"] = 2
            elif w_interp == "eskernel":
                grid_kw["w_order"] = support
            if u_lo is not None:
                grid_kw["u_lo"] = u_lo
                grid_kw["v_lo"] = v_lo

        ts = _tile_for(npad)
        if not do_wstacking or nw <= 1:
            nw_kw = {
                k: v for k, v in grid_kw.items() if k in ("u_lo", "v_lo")
            } if gridder == "tiled" else {}
            grid = _grid_fn(
                u_pix,
                v_pix,
                weighted,
                npixel=npad,
                support=support,
                tile=ts,
                beta=beta,
                **nw_kw,
            )
            dirty = (npad * npad) * ifft(grid)
        else:
            p0, frac, plane_w = _w_planes(
                w, nw, w_interp, w_support=support
            )
            # smaller units for many w-planes: bounds the one-padded-unit-
            # per-tile overhead (nplanes*ntiles tiles) in the matmul stage
            grids = _grid_fn(
                u_pix,
                v_pix,
                weighted,
                p0,
                frac,
                npixel=npad,
                support=support,
                nplanes=nw,
                tile=ts,
                beta=beta,
                **grid_kw,
            )
            fov = npad * cellsize

            def accum(carry, inputs):
                g, wp = inputs
                img = (npad * npad) * ifft(g)
                wb = w_beam(npad, fov, wp).astype(img.dtype)
                return carry + img * wb, None

            dirty0 = jnp.zeros_like(grids[0])
            dirty, _ = jax.lax.scan(accum, dirty0, (grids, plane_w))
            if w_interp == "eskernel":
                dirty = dirty / w_kernel_correction(
                    npad, cellsize, plane_w[1] - plane_w[0], support,
                    u.dtype,
                )
        corr = grid_correction(npad, support, dtype=u.dtype, beta=beta)
        dirty = jnp.real(dirty) / corr
        dirty = extract_mid(dirty, npixel)
        return dirty, jnp.sum(wgt)

    if not do_wstacking or nw <= 1:
        grid, in_grid = convolutional_grid(
            u_pix, v_pix, weighted, npad, support
        )
        dirty = (npad * npad) * ifft(grid)
    else:
        p0, frac, plane_w = _w_planes(w, nw)
        fracc = frac.astype(vals.dtype)
        # scatter into [nw, npixel, npixel] via a flattened plane-major
        # index; each vis feeds its two adjacent w-planes (linear w-kernel)
        from .gridding import pswf_kernel_weights

        iu0, ku = pswf_kernel_weights(u_pix, support, beta)
        iv0, kv = pswf_kernel_weights(v_pix, support, beta)
        in_grid = (
            (iu0 >= 0)
            & (iu0 + support <= npad)
            & (iv0 >= 0)
            & (iv0 + support <= npad)
        )
        weighted = jnp.where(in_grid, weighted, 0.0)
        iu0 = jnp.clip(iu0, 0, npad - support)
        iv0 = jnp.clip(iv0, 0, npad - support)
        rows = iv0[:, None, None] + jnp.arange(support)[None, :, None]
        cols = iu0[:, None, None] + jnp.arange(support)[None, None, :]
        cell_idx = rows * npad + cols  # [N, S, S]
        k2 = (kv[:, :, None] * ku[:, None, :]).astype(vals.dtype)
        grids = jnp.zeros((nw * npad * npad,), dtype=vals.dtype)
        low = k2 * (weighted * (1.0 - fracc))[:, None, None]
        high = k2 * (weighted * fracc)[:, None, None]
        idx_low = (p0[:, None, None] * (npad * npad) + cell_idx).reshape(-1)
        idx_high = (
            (p0[:, None, None] + 1) * (npad * npad) + cell_idx
        ).reshape(-1)
        grids = grids.at[idx_low].add(low.reshape(-1))
        grids = grids.at[idx_high].add(high.reshape(-1))
        grids = grids.reshape(nw, npad, npad)

        fov = npad * cellsize

        def accum(carry, inputs):
            g, wp = inputs
            img = (npad * npad) * ifft(g)
            wb = w_beam(npad, fov, wp).astype(img.dtype)
            return carry + img * wb, None

        # zeros_like(grids[0]) (not a fresh zeros) so the carry inherits
        # the mesh-varying type under shard_map
        dirty0 = jnp.zeros_like(grids[0])
        dirty, _ = jax.lax.scan(accum, dirty0, (grids, plane_w))

    corr = grid_correction(npad, support, dtype=u.dtype, beta=beta)
    dirty = jnp.real(dirty) / corr
    dirty = extract_mid(dirty, npixel)
    sumwt = jnp.sum(wgt)
    return dirty, sumwt


def invert_core(
    u,
    v,
    w,
    vals,
    wgt,
    u_lo=None,
    v_lo=None,
    *,
    npixel: int,
    cellsize: float,
    support: int = 8,
    nw: int = 1,
    do_wstacking: bool = True,
    padding: int = 2,
    gridder: str | None = None,
    w_interp: str = "linear",
    family: str | None = None,
    prepix: bool = False,
):
    """Grid + FFT + w-stack one (channel, pol) visibility block.

    The uv grid is internally padded by ``padding`` (like ducc0) so the
    kernel taper correction is only evaluated on the well-conditioned inner
    region of the band.

    Thin non-jit wrapper: resolves ``config.grid_family()`` here and
    passes it as a static argument so ``set_grid_family()`` between calls
    forces a retrace rather than silently reusing a stale geometry.

    :param u, v, w: [N] baseline coordinates in wavelengths
    :param vals: [N] complex visibilities
    :param wgt: [N] imaging weights (flag-multiplied)
    :return: (dirty [npixel, npixel] real, sumwt scalar)
    """
    if family is None:
        from .. import config as _config

        family = _config.grid_family()
    return _invert_core_jit(
        u, v, w, vals, wgt, u_lo, v_lo,
        npixel=npixel, cellsize=cellsize, support=support, nw=nw,
        do_wstacking=do_wstacking, padding=padding, gridder=gridder,
        w_interp=w_interp, family=family, prepix=prepix,
    )


@partial(
    jax.jit,
    static_argnames=(
        "support",
        "nw",
        "do_wstacking",
        "padding",
        "gridder",
        "w_interp",
        "family",
        "prepix",
    ),
)
def _predict_core_jit(
    u,
    v,
    w,
    image,
    u_lo=None,
    v_lo=None,
    *,
    cellsize: float,
    support: int = 8,
    nw: int = 1,
    do_wstacking: bool = True,
    padding: int = 2,
    gridder: str | None = None,
    w_interp: str = "linear",
    family: str | None = None,
    prepix: bool = False,
):
    npixel = image.shape[-1]
    npad = _npad_for(npixel, padding, family)
    beta = _es_beta(support, npad / npixel)
    scale = npad * cellsize
    if prepix:
        u_pix, v_pix = u, v  # see _invert_core_jit
    else:
        u_pix = -u * scale + npad // 2
        v_pix = v * scale + npad // 2
    corr = grid_correction(npad, support, dtype=u.dtype, beta=beta)
    img_pad = pad_mid(image, npad)
    img_c = (img_pad / corr).astype(
        jnp.result_type(image.dtype, jnp.complex64)
    )

    from .gridding import pswf_kernel_weights

    if gridder is None:
        gridder = "tiled" if jax.default_backend() == "cpu" else "fused"
    if w_interp in ("quadratic", "eskernel"):
        gridder = "tiled"  # the multi-plane stencils live in the tiled path
    if prepix and gridder != "tiled":
        raise ValueError("prepix coordinates need the tiled gridder")
    if gridder in ("tiled", "fused"):
        if gridder == "fused":
            from .gridding_fused import fused_degrid_wstack as _degrid_fn

            degrid_kw = {}
        else:
            from .gridding_tiled import tiled_degrid as _degrid_fn

            degrid_kw = {"unit": 256}
            if w_interp == "quadratic":
                degrid_kw["w_order"] = 2
            elif w_interp == "eskernel":
                degrid_kw["w_order"] = support
            if u_lo is not None:
                degrid_kw["u_lo"] = u_lo
                degrid_kw["v_lo"] = v_lo

        ts = _tile_for(npad)
        if not do_wstacking or nw <= 1:
            grid = fft(img_c)
            nw_kw = {
                k: v for k, v in degrid_kw.items()
                if k in ("u_lo", "v_lo")
            } if gridder == "tiled" else {}
            return _degrid_fn(
                u_pix, v_pix, grid, support=support, tile=ts, beta=beta,
                **nw_kw,
            )
        p0, frac, plane_w = _w_planes(
            w, nw, w_interp, w_support=support
        )
        if w_interp == "eskernel":
            img_c = img_c / w_kernel_correction(
                npad, cellsize, plane_w[1] - plane_w[0], support,
                u.dtype,
            )
        fov = npad * cellsize

        def make_grid(wp):
            wb = jnp.conj(w_beam(npad, fov, wp)).astype(img_c.dtype)
            return fft(img_c * wb)

        grids = jax.lax.map(make_grid, plane_w)
        return _degrid_fn(
            u_pix,
            v_pix,
            grids,
            p0,
            frac,
            support=support,
            nplanes=nw,
            tile=ts,
            beta=beta,
            **degrid_kw,
        )

    chunk = 131072  # bound the [chunk, S, S] gather temporaries

    if not do_wstacking or nw <= 1:
        grid = fft(img_c)
        n = u_pix.shape[0]
        pad = (-n) % chunk
        nb = (n + pad) // chunk

        def one(args):
            up, vp = args
            vals, _ = convolutional_degrid(up, vp, grid, support)
            return vals

        vals = jax.lax.map(
            one,
            (
                jnp.pad(u_pix, (0, pad)).reshape(nb, chunk),
                jnp.pad(v_pix, (0, pad)).reshape(nb, chunk),
            ),
        ).reshape(-1)[:n]
        return vals
    p0, frac, plane_w = _w_planes(w, nw)
    fov = npad * cellsize

    def make_grid(wp):
        wb = jnp.conj(w_beam(npad, fov, wp)).astype(img_c.dtype)
        return fft(img_c * wb)

    grids = jax.lax.map(make_grid, plane_w)  # [nw, n, n]
    gflat = grids.reshape(-1)
    n = u_pix.shape[0]
    pad = (-n) % chunk
    nb = (n + pad) // chunk

    def one(args):
        up, vp, pp, fr = args
        iu0, ku = pswf_kernel_weights(up, support)
        iv0, kv = pswf_kernel_weights(vp, support)
        in_grid = (
            (iu0 >= 0)
            & (iu0 + support <= npad)
            & (iv0 >= 0)
            & (iv0 + support <= npad)
        )
        iu0 = jnp.clip(iu0, 0, npad - support)
        iv0 = jnp.clip(iv0, 0, npad - support)
        rows = iv0[:, None, None] + jnp.arange(support)[None, :, None]
        cols = iu0[:, None, None] + jnp.arange(support)[None, None, :]
        cell_idx = rows * npad + cols
        k2 = (kv[:, :, None] * ku[:, None, :]).astype(img_c.dtype)
        low = jnp.sum(
            gflat[(pp[:, None, None] * npad * npad + cell_idx).reshape(-1)]
            .reshape(cell_idx.shape)
            * k2,
            axis=(1, 2),
        )
        high = jnp.sum(
            gflat[
                ((pp[:, None, None] + 1) * npad * npad + cell_idx).reshape(-1)
            ].reshape(cell_idx.shape)
            * k2,
            axis=(1, 2),
        )
        fracc = fr.astype(img_c.dtype)
        vals = low * (1.0 - fracc) + high * fracc
        return jnp.where(in_grid, vals, 0.0)

    vals = jax.lax.map(
        one,
        (
            jnp.pad(u_pix, (0, pad)).reshape(nb, chunk),
            jnp.pad(v_pix, (0, pad)).reshape(nb, chunk),
            jnp.pad(p0, (0, pad)).reshape(nb, chunk),
            jnp.pad(frac, (0, pad)).reshape(nb, chunk),
        ),
    ).reshape(-1)[:n]
    return vals


def predict_core(
    u,
    v,
    w,
    image,
    u_lo=None,
    v_lo=None,
    *,
    cellsize: float,
    support: int = 8,
    nw: int = 1,
    do_wstacking: bool = True,
    padding: int = 2,
    gridder: str | None = None,
    w_interp: str = "linear",
    family: str | None = None,
    prepix: bool = False,
):
    """Degrid visibilities from an image plane (adjoint of invert_core).

    Thin non-jit wrapper resolving ``config.grid_family()`` to a static
    argument (see :func:`invert_core`).

    :param image: [npixel, npixel] real model image
    :return: [N] complex visibilities
    """
    if family is None:
        from .. import config as _config

        family = _config.grid_family()
    return _predict_core_jit(
        u, v, w, image, u_lo, v_lo,
        cellsize=cellsize, support=support, nw=nw,
        do_wstacking=do_wstacking, padding=padding, gridder=gridder,
        w_interp=w_interp, family=family, prepix=prepix,
    )


# --------------------------------------------------------------------------
# reusable imaging plans
# --------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["gp", "plane_w", "wb_r", "wb_i", "corr_c"],
    meta_fields=[
        "npixel",
        "npad",
        "cellsize",
        "support",
        "nw",
        "do_wstacking",
        "ncopies",
    ],
)
@_dataclass(frozen=True)
class ImagingPlan:
    """Precomputed invert/predict geometry for one set of (u, v, w).

    The reference re-bins uvw on every ducc0 call (imaging/ng.py:146-293);
    imaging pipelines (CLEAN major cycles, self-cal) call invert/predict
    repeatedly on identical coordinates, so the N-entry segment sort —
    ~40% of an invert at the 10M-vis BASELINE config — is hoisted here
    and amortised (see ops/gridding_plan.py). The central w-beam stack and
    grid-correction are precomputed too: the padded outer 3/4 of each
    image plane is discarded by ``extract_mid`` anyway, so the per-call
    w-stack multiply/accumulate only ever touches the central
    ``npixel**2`` region.
    """

    gp: object  # GridPlan over the padded uv grid
    plane_w: jax.Array  # [nw] w-plane centres
    wb_r: jax.Array | None  # [nw, npixel, npixel] central Re(w_beam)
    wb_i: jax.Array | None  # [nw, npixel, npixel] central Im(w_beam)
    corr_c: jax.Array  # [npixel, npixel] central grid correction
    npixel: int
    npad: int
    cellsize: float
    support: int
    nw: int
    do_wstacking: bool
    # entry copies per visibility: 1 (linear w / 2d) or w_support // 2
    # (ES-kernel w-gridding plans — see make_imaging_plan)
    ncopies: int = 1


def make_imaging_plan(
    u,
    v,
    w,
    *,
    npixel: int,
    cellsize: float,
    support: int = 8,
    nw: int = 1,
    do_wstacking: bool = True,
    padding: int = 2,
    w_interp: str = "linear",
    chunk: int = 512,
    w_range=None,
    compensated: bool | None = None,
) -> ImagingPlan:
    """Build a reusable plan for :func:`invert_with_plan` /
    :func:`predict_with_plan` (same contract as invert_core/predict_core).

    ``compensated``: force (True) / suppress (False) the split-coordinate
    mode; ``None`` auto-enables it for host numpy f64 coordinates on
    f32-only devices (x64 off).
    """
    from .gridding_plan import make_grid_plan

    npad = _npad_for(npixel, padding)
    beta = _es_beta(support, npad / npixel)
    scale = npad * cellsize
    # f64 coordinates keep their precision through the plan build (the
    # stored payload taps are evaluated at the f64 positions, then cast
    # to f32 — see _payload_stack): positional quantisation drops from
    # ~(npad/2) eps_32 pixels (~1e-5 relative vis error at 1024^2) to
    # the f32 rounding of the taps themselves (~1e-7). On an f32-only
    # device (x64 off), HOST numpy f64 coordinates trigger the
    # COMPENSATED mode instead: the pixel positions are computed in f64
    # on the host and shipped as split (hi, lo) f32 pairs; the kernels
    # subtract the residual after the small hi difference — same
    # positional exactness, pure-f32 device arithmetic.
    u_lo = v_lo = None
    wstack = do_wstacking and nw > 1
    if compensated is None:
        compensated = (
            isinstance(u, np.ndarray)
            and u.dtype == np.float64
            and not jax.config.jax_enable_x64
        )
    if w_interp == "eskernel" and wstack:
        # ES-kernel w-gridding on the FUSED plan path: each visibility
        # becomes w_support//2 entry copies, copy c covering the plane
        # pair (j0+2c, j0+2c+1) through the kernel's existing lo/hi
        # panels — arbitrary per-pair weights (a, b) map exactly onto
        # the (1-frac, frac) form as frac' = b/(a+b) with the pair mass
        # (a+b) folded into the stored ku taps (taps_scale) at zero
        # runtime cost. The image-plane w-kernel correction folds into
        # corr_c. Uniform-over-the-field w accuracy at fused-gridder
        # speed (round 5; the core/tiled route serves the same math
        # ~10x slower).
        if support != 8:
            raise ValueError(
                "eskernel plans need the support-8 tap payload"
            )
        ssw = support
        halfw = ssw / 2.0
        u64 = np.asarray(u, np.float64)
        v64 = np.asarray(v, np.float64)
        w64 = np.asarray(w, np.float64)
        up64 = -u64 * scale + npad // 2
        vp64 = v64 * scale + npad // 2
        if w_range is not None:
            wmin, wmax = float(w_range[0]), float(w_range[1])
        else:
            wmin, wmax = float(w64.min()), float(w64.max())
        if nw < ssw + 2:
            raise ValueError(
                f"eskernel plans need nw >= {ssw + 2}, got {nw}"
            )
        ni = nw - ssw
        rng_w = wmax - wmin
        wstep = rng_w / max(ni - 1, 1) if rng_w > 0 else 1.0
        w_lo_edge = wmin - (ssw / 2) * wstep
        t = (w64 - w_lo_edge) / wstep
        j0 = np.clip(
            np.floor(t).astype(np.int32) - (ssw // 2 - 1), 0, nw - ssw
        )

        def es_np(nu):
            b = _es_beta(ssw, 2.0)
            nu2 = np.clip(nu * nu, 0.0, 1.0)
            k = np.exp(b * (np.sqrt(1.0 - nu2) - 1.0))
            return np.where(np.abs(nu) < 1.0, k, 0.0)

        ncopies = ssw // 2
        p0_list, frac_list, ts_list = [], [], []
        for c in range(ncopies):
            a = es_np((j0 + 2 * c - t) / halfw)
            b = es_np((j0 + 2 * c + 1 - t) / halfw)
            m = a + b
            safe = np.where(m > 0, m, 1.0)
            p0_list.append(j0 + 2 * c)
            frac_list.append((b / safe).astype(np.float64))
            ts_list.append(m.astype(np.float64))
        p0_np = np.concatenate(p0_list)
        frac_np = np.concatenate(frac_list)
        ts_np = np.concatenate(ts_list)
        up_t = np.tile(up64, ncopies)
        vp_t = np.tile(vp64, ncopies)
        plane_w_np = w_lo_edge + wstep * np.arange(nw)
        if jax.config.jax_enable_x64:
            u_pix = jnp.asarray(up_t)
            v_pix = jnp.asarray(vp_t)
        else:
            u_hi = up_t.astype(np.float32)
            v_hi = vp_t.astype(np.float32)
            u_pix = jnp.asarray(u_hi)
            v_pix = jnp.asarray(v_hi)
            u_lo = jnp.asarray((up_t - u_hi).astype(np.float32))
            v_lo = jnp.asarray((vp_t - v_hi).astype(np.float32))
        gp = make_grid_plan(
            u_pix,
            v_pix,
            jnp.asarray(p0_np),
            jnp.asarray(frac_np.astype(np.float32)),
            npixel=npad,
            support=support,
            nplanes=nw,
            tile=_tile_for(npad),
            chunk=chunk,
            beta=beta,
            u_lo=u_lo,
            v_lo=v_lo,
            taps_scale=jnp.asarray(ts_np.astype(np.float32)),
        )
        plane_w = jnp.asarray(plane_w_np.astype(np.float32))
        fov = npad * cellsize
        wb = jax.lax.map(
            lambda wp: extract_mid(w_beam(npad, fov, wp), npixel),
            plane_w,
        )
        wb_r = jnp.real(wb).astype(jnp.float32)
        wb_i = jnp.imag(wb).astype(jnp.float32)
        corr_c = extract_mid(
            grid_correction(npad, support, dtype=jnp.float32, beta=beta),
            npixel,
        ) * extract_mid(
            w_kernel_correction(
                npad, cellsize, wstep, ssw, jnp.float32
            ),
            npixel,
        )
        return ImagingPlan(
            gp=gp,
            plane_w=plane_w,
            wb_r=wb_r,
            wb_i=wb_i,
            corr_c=corr_c,
            npixel=npixel,
            npad=npad,
            cellsize=float(cellsize),
            support=support,
            nw=nw,
            do_wstacking=do_wstacking,
            ncopies=ncopies,
        )
    if compensated:
        up64 = -np.asarray(u, np.float64) * scale + npad // 2
        vp64 = np.asarray(v, np.float64) * scale + npad // 2
        u_hi = up64.astype(np.float32)
        v_hi = vp64.astype(np.float32)
        u_pix = jnp.asarray(u_hi)
        v_pix = jnp.asarray(v_hi)
        u_lo = jnp.asarray((up64 - u_hi).astype(np.float32))
        v_lo = jnp.asarray((vp64 - v_hi).astype(np.float32))
        if wstack:
            # host-side f64 w-plane split (frac is f32-exact to 6e-8)
            w64 = np.asarray(w, np.float64)
            if w_range is not None:
                wmin, wmax = float(w_range[0]), float(w_range[1])
            else:
                wmin, wmax = float(w64.min()), float(w64.max())
            wstep = max((wmax - wmin) / max(nw - 1, 1), 1e-30)
            t = (w64 - wmin) / wstep
            plane_w = jnp.asarray(
                (wmin + wstep * np.arange(nw)).astype(np.float32)
            )
            if w_interp == "nearest":
                p0 = jnp.asarray(
                    np.clip(np.round(t).astype(np.int32), 0, nw - 1)
                )
                frac = None
            else:
                p0n = np.clip(np.floor(t).astype(np.int32), 0, nw - 2)
                p0 = jnp.asarray(p0n)
                frac = jnp.asarray(
                    np.clip(t - p0n, 0.0, 1.0).astype(np.float32)
                )
            nplanes = nw
        else:
            p0, frac = None, None
            plane_w = jnp.zeros((1,), dtype=jnp.float32)
            nplanes = 1
    else:
        cdt = (
            jnp.float64
            if getattr(u, "dtype", None) == jnp.float64
            else jnp.float32
        )
        u_pix = (-u * scale + npad // 2).astype(cdt)
        v_pix = (v * scale + npad // 2).astype(cdt)
        if wstack:
            p0, frac, plane_w = _w_planes(
                w, nw, w_interp, w_range=w_range
            )
            nplanes = nw
        else:
            p0, frac = None, None
            plane_w = jnp.zeros((1,), dtype=jnp.float32)
            nplanes = 1
    gp = make_grid_plan(
        u_pix,
        v_pix,
        p0,
        frac,
        npixel=npad,
        support=support,
        nplanes=nplanes,
        tile=_tile_for(npad),
        chunk=chunk,
        beta=beta,
        u_lo=u_lo,
        v_lo=v_lo,
    )
    if wstack:
        fov = npad * cellsize
        wb = jax.lax.map(
            lambda wp: extract_mid(w_beam(npad, fov, wp), npixel), plane_w
        )
        wb_r = jnp.real(wb).astype(jnp.float32)
        wb_i = jnp.imag(wb).astype(jnp.float32)
    else:
        wb_r = wb_i = None
    corr_c = extract_mid(
        grid_correction(npad, support, dtype=jnp.float32, beta=beta),
        npixel,
    )
    return ImagingPlan(
        gp=gp,
        plane_w=plane_w,
        wb_r=wb_r,
        wb_i=wb_i,
        corr_c=corr_c,
        npixel=npixel,
        npad=npad,
        cellsize=float(cellsize),
        support=support,
        nw=nw,
        do_wstacking=do_wstacking,
    )


def _resolve_plan_statics(precision, tail):
    """Resolve the config-driven static arguments OUTSIDE the jit cache so
    ``set_gridder_precision()`` / ``set_invert_tail()`` between calls force
    a retrace instead of silently reusing the stale compiled program."""
    from .. import config as _config

    if precision == "config" or precision == ("config",):
        precision = _config.gridder_precision()
    if tail is None:
        tail = _config.invert_tail()
    return precision, tail


def invert_with_plan(
    plan: ImagingPlan,
    vals,
    wgt=None,
    *,
    values_sorted: bool = False,
    interpret: bool | None = None,
    precision: str | None = "config",
    tail: str | None = None,
):
    """Grid + FFT + w-stack using a precomputed plan.

    With ``values_sorted=True`` both ``vals`` and ``wgt`` must already be
    in plan order (``sort_values``), skipping the per-call value sort.
    ``tail``: image-transform path ("fft"/"matmul"; None = config —
    the epsilon regimes pin "fft", see accuracy.py).
    Returns (dirty [npixel, npixel] real, sumwt scalar).

    Thin non-jit wrapper: the config-driven ``precision``/``tail`` knobs
    are resolved here and passed to the jit as static arguments.
    """
    precision, tail = _resolve_plan_statics(precision, tail)
    return _invert_with_plan_jit(
        plan, vals, wgt, values_sorted=values_sorted,
        interpret=interpret, precision=precision, tail=tail,
    )


@partial(
    jax.jit,
    static_argnames=("values_sorted", "interpret", "precision", "tail"),
)
def _invert_with_plan_jit(
    plan: ImagingPlan,
    vals,
    wgt=None,
    *,
    values_sorted: bool = False,
    interpret: bool | None = None,
    precision: str | None = "config",
    tail: str | None = None,
):
    from .gridding_plan import grid_with_plan

    weighted = vals if wgt is None else vals * wgt.astype(vals.dtype)
    if plan.ncopies > 1:
        # eskernel plan: w_support//2 entry copies per visibility (the
        # per-copy ES pair weights live in the stored taps)
        if values_sorted:
            raise ValueError(
                "values_sorted is not supported on eskernel plans"
            )
        weighted = jnp.tile(weighted, plan.ncopies)
    grids = grid_with_plan(
        plan.gp, weighted, values_sorted=values_sorted,
        interpret=interpret, precision=precision,
    )
    dirty = uv_grids_to_dirty(plan, grids, tail=tail)
    sumwt = (
        jnp.asarray(vals.shape[0], jnp.float32)
        if wgt is None
        else jnp.sum(wgt)
    )
    return dirty, sumwt


def _dft_tail_matrix(npad: int, npixel: int):
    """Centred pruned-IDFT matrix pair (cos, sin) [npixel, npad]:
    ``ctr = (Wr + i Wi) @ g @ (Wr + i Wi)^T`` equals
    ``extract_mid(ifft(g), npixel)`` exactly (both axes separable).

    The phase is reduced exactly in INTEGER arithmetic before the trig:
    (p - n/2)(k - N/2) mod N fits int32 and a direct f32 ``cos`` of the
    unreduced angle (up to ~2e6 rad) would be meaningless.
    """
    k = jnp.arange(npad, dtype=jnp.int32) - npad // 2
    p = jnp.arange(npixel, dtype=jnp.int32) - npixel // 2
    pk = p[:, None] * k[None, :]
    red = jnp.mod(pk, npad)  # exact in int32
    ang = (2.0 * jnp.pi / npad) * red.astype(jnp.float32)
    inv_n = jnp.float32(1.0 / npad)
    return jnp.cos(ang) * inv_n, jnp.sin(ang) * inv_n


# DFT-matmul precision: HIGH = bf16x3 (3-pass) on the MXU — the same
# policy the fused gridder kernel uses, measured image-level
# indistinguishable from f32 while halving the pass count vs the
# package default HIGHEST (f32 = 6 bf16 passes).
_DFT_MM_PRECISION = jax.lax.Precision.HIGH


def _mm(eq, a, b):
    return jnp.einsum(eq, a, b, precision=_DFT_MM_PRECISION)


def _matmul_tail_ctr(grids, npad: int, npixel: int):
    """``extract_mid(ifft(grids), npixel)`` as two pruned-DFT matmuls
    per plane (real arithmetic; 8 real matmuls) — the transform runs on
    the MXU instead of the VPU FFT and never materialises the padded
    image. Returns (re, im) of the central region [nw, np, np]."""
    wr, wi = _dft_tail_matrix(npad, npixel)
    gr = jnp.real(grids)
    gi = jnp.imag(grids)
    # axis -2: A = W @ g  (batched over planes)
    ar = _mm("pk,...kx->...px", wr, gr) - _mm("pk,...kx->...px", wi, gi)
    ai = _mm("pk,...kx->...px", wr, gi) + _mm("pk,...kx->...px", wi, gr)
    # axis -1: ctr = A @ W^T
    cr = _mm("...pk,qk->...pq", ar, wr) - _mm("...pk,qk->...pq", ai, wi)
    ci = _mm("...pk,qk->...pq", ar, wi) + _mm("...pk,qk->...pq", ai, wr)
    return cr, ci


def uv_grids_to_dirty(plan: ImagingPlan, grids, tail: str | None = None):
    """Image-side tail of an invert: per-plane inverse transform to the
    central npixel^2, w-beam multiply + plane sum, grid correction.
    Split out so sharded inverts can psum the uv grids across a mesh
    before this replicated tail (parallel/fused.py).

    ``tail``: "fft" (batched XLA ifft2 at npad^2) or "matmul" (pruned
    DFT matmuls npad->npixel on the MXU — skips the padded-region
    compute and any non-power-of-two FFT radix penalty). ``None`` reads
    ``config.invert_tail()``.
    """
    npad = plan.npad
    if tail is None:
        from .. import config as _config

        tail = _config.invert_tail()
    wstack = plan.do_wstacking and plan.nw > 1
    if tail == "matmul":
        cr, ci = _matmul_tail_ctr(grids, npad, plan.npixel)
        if wstack:
            dirty = jnp.sum(cr * plan.wb_r - ci * plan.wb_i, axis=0)
        else:
            dirty = cr  # leading plane axis kept, like the fft path
        return dirty * jnp.float32(npad * npad) / plan.corr_c
    if wstack:
        # the padded outer region is discarded by extract_mid anyway
        ctr = extract_mid(ifft(grids), plan.npixel)  # [nw, np, np]
        dirty = jnp.sum(
            jnp.real(ctr) * plan.wb_r - jnp.imag(ctr) * plan.wb_i, axis=0
        )
    else:
        dirty = jnp.real(extract_mid(ifft(grids), plan.npixel))
    return dirty * jnp.float32(npad * npad) / plan.corr_c


def uv_grids_to_dirty_scattered(plan: ImagingPlan, grids, axis: str):
    """Sharded invert tail (round 5, VERDICT r4 item 6): instead of
    ``psum(grids)`` (ring traffic 2 x nw*npad^2 c64 — 232 MB/cycle at
    the flagship config) followed by a REPLICATED tail, reduce-scatter
    the w-plane grids over the mesh axis (1 x data), run the per-plane
    ifft + w-beam sum on the LOCAL plane subset only (n-way parallel
    tail), and psum the summed real npixel^2 partial image (8 MB).
    Ring traffic drops ~2x and the tail compute divides by the mesh
    size; on TPU the backend schedules the reduce-scatter/psum pair
    asynchronously against neighbouring compute.

    Only used under ``shard_map`` (needs a named mesh axis); numerics
    match the replicated tail up to f32 plane-sum reordering.
    """
    from ..config import czeros

    npad = plan.npad
    wstack = plan.do_wstacking and plan.nw > 1
    if not wstack:
        grids = jax.lax.psum(grids, axis)
        return uv_grids_to_dirty(plan, grids, tail="fft")
    n = jax.lax.psum(1, axis)  # static int under shard_map tracing
    nw = grids.shape[0]
    pad = (-nw) % n
    if pad:
        # zero planes contribute zero image; the (clamped) w-beam rows
        # they would select multiply zeros
        grids = jnp.concatenate(
            [grids, czeros((pad,) + grids.shape[1:], grids.dtype)]
        )
    local = jax.lax.psum_scatter(
        grids, axis, scatter_dimension=0, tiled=True
    )
    k = local.shape[0]
    i0 = jax.lax.axis_index(axis) * k
    ctr = extract_mid(ifft(local), plan.npixel)  # [k, np, np]
    wb_r = jax.lax.dynamic_slice_in_dim(plan.wb_r, i0, k, 0)
    wb_i = jax.lax.dynamic_slice_in_dim(plan.wb_i, i0, k, 0)
    part = jnp.sum(jnp.real(ctr) * wb_r - jnp.imag(ctr) * wb_i, axis=0)
    dirty = jax.lax.psum(part, axis)
    return dirty * jnp.float32(npad * npad) / plan.corr_c


def _matmul_head_grids(zr, zi, npad: int, npixel: int):
    """``fft(pad_mid(z, npad))`` as two input-pruned DFT matmuls: the
    image is zero outside the central npixel^2, so the forward transform
    is F z F^T with F = npad * (Wr - i Wi)^T of the tail matrices.
    Returns (re, im) of the [.., npad, npad] grids."""
    wr, wi = _dft_tail_matrix(npad, npixel)
    n = jnp.float32(npad)
    # axis -2: A = F @ z, F[k, p] = npad*(wr[p,k] - i*wi[p,k])
    ar = (
        _mm("pk,...px->...kx", wr, zr) + _mm("pk,...px->...kx", wi, zi)
    ) * n
    ai = (
        _mm("pk,...px->...kx", wr, zi) - _mm("pk,...px->...kx", wi, zr)
    ) * n
    # axis -1: G = A @ F^T
    gr_ = (
        _mm("...kx,xq->...kq", ar, wr) + _mm("...kx,xq->...kq", ai, wi)
    ) * n
    gi_ = (
        _mm("...kx,xq->...kq", ai, wr) - _mm("...kx,xq->...kq", ar, wi)
    ) * n
    return gr_, gi_


def image_to_uv_grids(plan: ImagingPlan, image, head: str | None = None):
    """Image-side head of a predict: grid correction, (conjugate) w-beam
    multiply, pad + FFT to the w-stacked uv grids. Split out so sharded
    predicts can broadcast the grids to every shard (parallel/fused.py).

    ``head``: "fft" or "matmul" (input-pruned forward DFT on the MXU —
    the mirror of :func:`uv_grids_to_dirty`'s tail). ``None`` reads
    ``config.invert_tail()`` (one knob drives both directions).
    """
    npad = plan.npad
    if head is None:
        from .. import config as _config

        head = _config.invert_tail()
    wstack = plan.do_wstacking and plan.nw > 1
    if head == "matmul" and jnp.issubdtype(
        jnp.asarray(image).dtype, jnp.complexfloating
    ):
        head = "fft"  # real-split head assumes a real image
    if head == "matmul":
        corr = image / plan.corr_c
        if wstack:
            zr = corr[None] * plan.wb_r
            zi = corr[None] * (-plan.wb_i)
        else:
            zr = corr[None]
            zi = jnp.zeros_like(zr)
        gr_, gi_ = _matmul_head_grids(zr, zi, npad, plan.npixel)
        return jax.lax.complex(gr_, gi_)
    z = (image / plan.corr_c).astype(
        jnp.result_type(image.dtype, jnp.complex64)
    )
    if wstack:
        zc = z[None] * jax.lax.complex(plan.wb_r, -plan.wb_i).astype(z.dtype)
        return fft(pad_mid(zc, npad))  # batched over planes
    return fft(pad_mid(z, npad))[None]


def predict_with_plan(
    plan: ImagingPlan,
    image,
    *,
    to_sorted: bool = False,
    interpret: bool | None = None,
    precision: str | None = "config",
    tail: str | None = None,
):
    """Degrid model-image visibilities using a precomputed plan.

    ``to_sorted=True`` returns plan-ordered values that can feed straight
    back into ``invert_with_plan(values_sorted=True)`` (e.g. residual
    visibilities in a major-cycle loop) with no per-call sorting at all.

    Thin non-jit wrapper: the config-driven ``precision``/``tail`` knobs
    are resolved here and passed to the jit as static arguments.
    """
    precision, tail = _resolve_plan_statics(precision, tail)
    return _predict_with_plan_jit(
        plan, image, to_sorted=to_sorted, interpret=interpret,
        precision=precision, tail=tail,
    )


@partial(
    jax.jit,
    static_argnames=("to_sorted", "interpret", "precision", "tail"),
)
def _predict_with_plan_jit(
    plan: ImagingPlan,
    image,
    *,
    to_sorted: bool = False,
    interpret: bool | None = None,
    precision: str | None = "config",
    tail: str | None = None,
):
    from .gridding_plan import degrid_with_plan

    # the image is zero outside the central npixel^2, so the correction and
    # the (conjugate) w-beam multiplies only happen there, pre-padding
    grids = image_to_uv_grids(plan, image, head=tail)
    vals = degrid_with_plan(
        plan.gp, grids, to_sorted=to_sorted, interpret=interpret,
        precision=precision,
    )
    if plan.ncopies > 1:
        if to_sorted:
            raise ValueError(
                "to_sorted is not supported on eskernel plans"
            )
        # sum the per-copy ES-weighted plane-pair contributions
        vals = vals.reshape(plan.ncopies, -1).sum(axis=0)
    return vals


# --------------------------------------------------------------------------
# drivers on data models
# --------------------------------------------------------------------------


@_dataclass(frozen=True)
class VisibilityImagingPlan:
    """Per-image-channel :class:`ImagingPlan` set for one (Visibility,
    Image template) pair, plus the driver settings it was built for.

    Built once by :func:`make_visibility_plan` and passed as ``plan=`` to
    :func:`invert_visibility` / :func:`predict_visibility`; the geometry
    sort is then shared across polarisations, PSF+dirty inverts, and every
    major cycle of a pipeline (the reference re-bins uvw inside ducc0 on
    every call, imaging/ng.py:146-293).
    """

    plans: tuple  # one ImagingPlan per image channel
    support: int
    nw: int
    do_wstacking: bool
    mfs: bool
    npixel: int
    nchan: int


def make_visibility_plan(
    vis: Visibility,
    model: Image,
    context: str = "ng",
    support: int = 8,
    nw: int | None = None,
    **kwargs,
) -> VisibilityImagingPlan:
    """Precompute gridding geometry for ``invert_visibility`` /
    ``predict_visibility`` on these (vis, model) coordinates."""
    if context == "awprojection":
        raise ValueError("plans are not supported for awprojection")
    do_wstacking = context not in ("2d",) and kwargs.get(
        "do_wstacking", True
    )
    nchan_img = model.nchan
    nwp = _nw_for(vis, model, do_wstacking, nw)
    mfs = nchan_img == 1 and vis.nchan > 1
    coords = kwargs.get("coords", "device")
    if coords == "host64":
        # host-f64 coordinate path (epsilon regimes): positions are
        # computed in numpy f64, which triggers the compensated
        # split-(hi, lo) plan mode on f32 devices and f64-native plans
        # under x64 — zero kernel runtime cost (see make_imaging_plan)
        uvw_l = np.einsum(
            "tbs,f->tbfs",
            np.asarray(vis.uvw, np.float64),
            np.asarray(vis.frequency, np.float64) / C_M_S,
        )
    else:
        uvw_l = vis.uvw_lambda
    plans = []
    for ichan in range(nchan_img):
        fsel = slice(None) if mfs else slice(ichan, ichan + 1)
        uu = uvw_l[:, :, fsel, 0].reshape(-1)
        vv = uvw_l[:, :, fsel, 1].reshape(-1)
        ww = uvw_l[:, :, fsel, 2].reshape(-1)
        plans.append(
            make_imaging_plan(
                uu,
                vv,
                ww,
                npixel=model.npixel,
                cellsize=model.cellsize,
                support=support,
                nw=nwp,
                do_wstacking=do_wstacking,
                w_range=kwargs.get("w_range"),
                w_interp=kwargs.get("w_interp", "linear"),
                # fractional ducc0-style oversampling: with the ES beta
                # scaled to sigma (gridding._es_beta), 1.25 keeps the
                # aliasing floor ~1e-6 (vs 1e-7 at 2.0) and makes the
                # FFT/w-stack tail (1280^2 vs 2048^2 at the BASELINE
                # config) 1.65x faster end to end
                padding=kwargs.get("padding", 1.25),
            )
        )
    return VisibilityImagingPlan(
        plans=tuple(plans),
        support=support,
        nw=nwp,
        do_wstacking=do_wstacking,
        mfs=mfs,
        npixel=model.npixel,
        nchan=nchan_img,
    )


# Automatic plan cache for the composed public API: the reference re-bins
# uvw on every ducc0 call (ng.py:146-293), and round-2 measurements showed
# a cold invert_visibility pays a ~69 ms value sort + ~157 ms plan build
# that repeated calls on the SAME coordinates (PSF+dirty, major cycles,
# per-pol loops) never need to repeat. Keyed on the uvw/frequency buffer
# IDENTITY (strong refs pin the ids), so a second call with the same
# Visibility coordinates hits the ~31 ms steady state automatically.
from collections import OrderedDict

_PLAN_CACHE: "OrderedDict[tuple, tuple]" = OrderedDict()


def _auto_plan(
    vis: Visibility, model: Image, support: int, nwp: int,
    do_wstacking: bool, padding, coords: str = "device",
    w_interp: str = "linear",
) -> "VisibilityImagingPlan | None":
    from ..config import plan_cache_size

    size = plan_cache_size()
    if size <= 0:
        return None
    if w_interp not in ("linear", "nearest", "eskernel"):
        # quadratic etc. live in the tiled core path only
        return None
    key = (
        id(vis.uvw), id(vis.frequency), tuple(vis.uvw.shape),
        model.npixel, float(model.cellsize), model.nchan, vis.nchan,
        int(support), int(nwp), bool(do_wstacking), padding, coords,
        w_interp,
    )
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        uvw_ref, freq_ref, plan = hit
        if uvw_ref is vis.uvw and freq_ref is vis.frequency:
            _PLAN_CACHE.move_to_end(key)
            return plan
        del _PLAN_CACHE[key]  # id reuse after GC: stale entry
    # padding 2 matches the core-path (invert_core/predict_core) numbers
    # exactly; callers wanting the faster 1.25 production envelope pass
    # padding= explicitly (as make_visibility_plan defaults to)
    plan = make_visibility_plan(
        vis, model,
        context="ng" if do_wstacking else "2d",
        support=support, nw=nwp, do_wstacking=do_wstacking,
        padding=2 if padding is None else padding,
        coords=coords, w_interp=w_interp,
    )
    _PLAN_CACHE[key] = (vis.uvw, vis.frequency, plan)
    while len(_PLAN_CACHE) > size:
        _PLAN_CACHE.popitem(last=False)
    return plan


def _nw_for(
    vis: Visibility, im: Image, do_wstacking: bool, nw=None, wmax=None
) -> int:
    """Static w-plane count: reference-style heuristic from the maximum |w|
    and field of view (imaging/base.py:699-744). ``wmax`` (wavelengths)
    overrides the per-vis maximum — streamed pipelines pass the global
    maximum so every slab stacks onto identical planes."""
    if not do_wstacking:
        return 1
    if nw is not None:
        return int(nw)
    if wmax is None:
        wmax = float(
            np.max(np.abs(np.asarray(vis.uvw[..., 2])))
            * np.max(np.asarray(vis.frequency))
            / C_M_S
        )
    fov = im.npixel * im.cellsize
    # Cornwell+2012 eq. 24-ish sampling: dw ~ 1/(fov^2) scaled for safety
    nw_est = int(np.ceil(4.0 * wmax * fov * fov)) + 1
    return max(2, min(nw_est, 256)) if wmax > 0 else 1


def _nw_wkernel_for(vis, model, support: int, sigma_w: float = 2.0):
    """Plane count for ES-kernel w-gridding: plane spacing
    1/(2*sigma_w*numax) with numax = |n-1| at the image corner, plus
    ``support`` margin planes (accuracy.nw law is not needed — the
    kernel bounds the w error at its aliasing floor uniformly)."""
    import math as _math

    uvw = np.asarray(vis.uvw, np.float64)
    f = np.asarray(vis.frequency, np.float64) / C_M_S
    wl = uvw[..., 2:3] * f
    wmin, wmax = float(wl.min()), float(wl.max())
    fov = model.npixel * float(model.cellsize)
    numax = 1.0 - _math.sqrt(max(0.0, 1.0 - min(1.0, 2 * (fov / 2) ** 2)))
    if numax <= 0.0 or wmax <= wmin:
        return support + 2
    dw = 1.0 / (2.0 * sigma_w * numax)
    ni = int(_math.ceil((wmax - wmin) / dw)) + 1
    return ni + support


def _prepix_rows(vis, model, fsel, npad):
    """Host-f64 padded-grid pixel coordinates for the compensated
    epsilon core path: (u_hi, u_lo, v_hi, v_lo, w). Under x64 the f64
    coordinates pass through natively (lo = None); on f32 devices they
    ship as split (hi, lo) pairs the tiled kernels recombine after the
    small hi difference."""
    uvw = np.asarray(vis.uvw, np.float64)  # [T, B, 3] metres
    f = np.asarray(vis.frequency, np.float64)[fsel] / C_M_S
    scale = npad * float(model.cellsize)
    up = -uvw[..., 0:1] * f * scale + npad // 2
    vp = uvw[..., 1:2] * f * scale + npad // 2
    wl = uvw[..., 2:3] * f
    if jax.config.jax_enable_x64:
        return (
            jnp.asarray(up.reshape(-1)), None,
            jnp.asarray(vp.reshape(-1)), None,
            jnp.asarray(wl.reshape(-1)),
        )
    uh = up.astype(np.float32)
    vh = vp.astype(np.float32)
    return (
        jnp.asarray(uh.reshape(-1)),
        jnp.asarray((up - uh).astype(np.float32).reshape(-1)),
        jnp.asarray(vh.reshape(-1)),
        jnp.asarray((vp - vh).astype(np.float32).reshape(-1)),
        jnp.asarray(wl.astype(np.float32).reshape(-1)),
    )


def invert_visibility(
    vis: Visibility,
    model: Image,
    dopsf: bool = False,
    normalise: bool = True,
    context: str = "ng",
    support: int = 8,
    nw: int | None = None,
    plan: VisibilityImagingPlan | None = None,
    **kwargs,
):
    """Visibility -> dirty image / PSF (imaging/imaging.py:58-105,
    ng.py:146-294). Returns (Image, sumwt [nchan, npol]).

    Contexts: "2d" (no w-correction), "ng"/"wg" (w-stacking; one TPU kernel
    serves both reference backends), "awprojection" (CF-driven path).
    Pass ``plan`` from :func:`make_visibility_plan` to reuse precomputed
    gridding geometry (PSF+dirty, all pols, repeated major cycles).
    Pass ``epsilon=`` (reference ng.py:59 contract) to have support /
    padding / nw / coordinate mode / kernel precision selected from the
    measured accuracy envelope (:mod:`.accuracy`); raises when the
    requested tolerance is infeasible in the current configuration.
    """
    if context == "awprojection":
        from .griddata_ops import invert_awprojection

        return invert_awprojection(
            vis, model, gcfcf=kwargs.get("gcfcf"), normalise=normalise
        )
    do_wstacking = context not in ("2d",) and kwargs.get(
        "do_wstacking", True
    )
    if kwargs.get("epsilon") is not None:
        from .accuracy import gridding_params_for_epsilon, nw_for_epsilon

        acc = gridding_params_for_epsilon(
            kwargs.pop("epsilon"), do_wstacking=do_wstacking
        )
        support = acc.support
        kwargs["padding"] = acc.padding
        if do_wstacking:
            if acc.w_interp == "eskernel":
                nw = _nw_wkernel_for(vis, model, acc.support)
            else:
                nw = nw_for_epsilon(
                    _nw_for(vis, model, do_wstacking, nw), acc.epsilon,
                    acc.w_interp,
                )
        if acc.w_interp != "linear":
            kwargs["w_interp"] = acc.w_interp
        plan_capable = (
            acc.gridder is None
            and acc.w_interp == "eskernel"
            and acc.support == 8
            and do_wstacking
            and nw is not None and nw >= acc.support + 2
        )
        if plan_capable:
            # f32 rows ride the eskernel PLAN path: the fused Pallas
            # gridder with w_support//2 entry copies and ES pair weights
            # folded into the taps — the same field-uniform w accuracy
            # as the tiled core route at ~10x its speed (round 5)
            kwargs["coords"] = "host64"
        elif acc.gridder is not None or acc.w_interp == "eskernel":
            # deep x64 rows (and 2d eskernel) use the tiled core path
            plan, kwargs["auto_plan"] = None, False
            kwargs["gridder"] = acc.gridder or "tiled"
            if acc.coords == "host64":
                # compensated (hi, lo) pixel coordinates from host f64
                kwargs["prepix"] = True
        else:
            kwargs["coords"] = (
                "host64" if acc.coords == "host64" else "device"
            )
        if acc.precision is not None:
            kwargs["precision"] = acc.precision
        # epsilon paths always pin the fft transform: the default
        # matmul-HIGH path adds ~2.5e-5 (measured on chip), which eats
        # the accuracy budget of every regime
        kwargs["tail"] = "fft"
    svis = shift_vis_to_image(vis, model, tangent=True, inverse=False)

    ms = svis.flagged_vis
    ms = convert_pol_frame(
        ms, vis.polarisation_frame, model.polarisation_frame, polaxis=3
    )
    wgt = svis.flagged_imaging_weight
    if vis.npol != model.npol and wgt.shape[-1] != ms.shape[-1]:
        # conversion changed pol count; use pol-0 weights as common weight
        wgt = jnp.broadcast_to(wgt[..., :1], ms.shape[:-1] + (ms.shape[-1],))
    if dopsf:
        # unit amplitude in the first polarisation only (ng.py:235-238)
        from ..config import zeros_like_safe

        newms = zeros_like_safe(ms)
        newms = newms.at[..., 0].set(1.0)
        ms = newms

    nchan_img, npol_img = model.nchan, model.npol
    npixel = model.npixel
    uvw_l = svis.uvw_lambda  # [T, B, F, 3]
    nwp = _nw_for(vis, model, do_wstacking, nw)

    mfs = nchan_img == 1 and vis.nchan > 1
    if plan is None and kwargs.get(
        "auto_plan", jax.default_backend() != "cpu"
    ):
        plan = _auto_plan(
            vis, model, support, nwp, do_wstacking,
            kwargs.get("padding"), kwargs.get("coords", "device"),
            kwargs.get("w_interp", "linear"),
        )
    pixels = jnp.zeros_like(model.pixels)
    sumwt = jnp.zeros((nchan_img, npol_img), dtype=wgt.dtype)

    def chan_rows(fsel):
        uu = uvw_l[:, :, fsel, 0].reshape(-1)
        vv = uvw_l[:, :, fsel, 1].reshape(-1)
        ww = uvw_l[:, :, fsel, 2].reshape(-1)
        return uu, vv, ww

    prepix = bool(kwargs.get("prepix"))
    if prepix:
        npad_pp = _npad_for(npixel, kwargs.get("padding") or 2)
    for ichan in range(nchan_img):
        fsel = slice(None) if mfs else slice(ichan, ichan + 1)
        ulo = vlo = None
        if prepix:
            uu, ulo, vv, vlo, ww = _prepix_rows(
                svis, model, fsel, npad_pp
            )
        elif plan is None:
            uu, vv, ww = chan_rows(fsel)
        for pol in range(npol_img):
            vals = ms[:, :, fsel, pol].reshape(-1)
            wv = wgt[:, :, fsel, pol].reshape(-1)
            if plan is not None:
                dirty, swt = invert_with_plan(
                    plan.plans[ichan], vals, wv,
                    precision=kwargs.get("precision", "config"),
                    tail=kwargs.get("tail"),
                )
            else:
                dirty, swt = invert_core(
                    uu,
                    vv,
                    ww,
                    vals,
                    wv,
                    ulo,
                    vlo,
                    prepix=prepix,
                    npixel=npixel,
                    cellsize=model.cellsize,
                    w_interp=kwargs.get("w_interp", "linear"),
                    support=support,
                    nw=nwp,
                    do_wstacking=do_wstacking,
                    padding=kwargs.get("padding") or 2,
                    gridder=kwargs.get("gridder"),
                )
            pixels = pixels.at[ichan, pol].set(
                dirty.astype(pixels.dtype)
            )
            sumwt = sumwt.at[ichan, pol].set(swt)

    out = model.with_pixels(pixels)
    if normalise:
        out = normalise_sumwt(out, sumwt)
    return out, sumwt


def predict_visibility(
    vis: Visibility,
    model: Image,
    context: str = "ng",
    support: int = 8,
    nw: int | None = None,
    plan: VisibilityImagingPlan | None = None,
    **kwargs,
) -> Visibility:
    """Model image -> visibility (imaging/imaging.py:28-57, ng.py:38-143).

    Contexts: "2d", "ng"/"wg", "awprojection". Pass ``plan`` from
    :func:`make_visibility_plan` to reuse precomputed gridding geometry.
    Pass ``epsilon=`` (reference ng.py:59 contract) to have support /
    padding / nw / coordinate mode / kernel precision selected from the
    measured accuracy envelope (:mod:`.accuracy`).
    """
    if context == "awprojection":
        from .griddata_ops import predict_awprojection

        return predict_awprojection(vis, model, gcfcf=kwargs.get("gcfcf"))
    do_wstacking = context not in ("2d",) and kwargs.get(
        "do_wstacking", True
    )
    if kwargs.get("epsilon") is not None:
        from .accuracy import gridding_params_for_epsilon, nw_for_epsilon

        acc = gridding_params_for_epsilon(
            kwargs.pop("epsilon"), do_wstacking=do_wstacking
        )
        support = acc.support
        kwargs["padding"] = acc.padding
        if do_wstacking:
            if acc.w_interp == "eskernel":
                nw = _nw_wkernel_for(vis, model, acc.support)
            else:
                nw = nw_for_epsilon(
                    _nw_for(vis, model, do_wstacking, nw), acc.epsilon,
                    acc.w_interp,
                )
        if acc.w_interp != "linear":
            kwargs["w_interp"] = acc.w_interp
        plan_capable = (
            acc.gridder is None
            and acc.w_interp == "eskernel"
            and acc.support == 8
            and do_wstacking
            and nw is not None and nw >= acc.support + 2
        )
        if plan_capable:
            # f32 rows ride the eskernel PLAN path: the fused Pallas
            # gridder with w_support//2 entry copies and ES pair weights
            # folded into the taps — the same field-uniform w accuracy
            # as the tiled core route at ~10x its speed (round 5)
            kwargs["coords"] = "host64"
        elif acc.gridder is not None or acc.w_interp == "eskernel":
            # deep x64 rows (and 2d eskernel) use the tiled core path
            plan, kwargs["auto_plan"] = None, False
            kwargs["gridder"] = acc.gridder or "tiled"
            if acc.coords == "host64":
                # compensated (hi, lo) pixel coordinates from host f64
                kwargs["prepix"] = True
        else:
            kwargs["coords"] = (
                "host64" if acc.coords == "host64" else "device"
            )
        if acc.precision is not None:
            kwargs["precision"] = acc.precision
        # epsilon paths always pin the fft transform: the default
        # matmul-HIGH path adds ~2.5e-5 (measured on chip), which eats
        # the accuracy budget of every regime
        kwargs["tail"] = "fft"
    uvw_l = vis.uvw_lambda
    nchan_img, npol_img = model.nchan, model.npol
    nwp = _nw_for(vis, model, do_wstacking, nw)
    mfs = nchan_img == 1 and vis.nchan > 1
    if plan is None and kwargs.get(
        "auto_plan", jax.default_backend() != "cpu"
    ):
        plan = _auto_plan(
            vis, model, support, nwp, do_wstacking,
            kwargs.get("padding"), kwargs.get("coords", "device"),
            kwargs.get("w_interp", "linear"),
        )

    from ..config import czeros

    cdtype = jnp.result_type(vis.vis.dtype, jnp.complex64)
    newvis = czeros(vis.vis.shape[:3] + (npol_img,), cdtype)
    prepix = bool(kwargs.get("prepix"))
    if prepix:
        npad_pp = _npad_for(model.npixel, kwargs.get("padding") or 2)
    for ichan in range(nchan_img):
        fsel = slice(None) if mfs else slice(ichan, ichan + 1)
        tb_shape = uvw_l[:, :, fsel, 0].shape
        ulo = vlo = None
        if prepix:
            uu, ulo, vv, vlo, ww = _prepix_rows(
                vis, model, fsel, npad_pp
            )
        elif plan is None:
            uu = uvw_l[:, :, fsel, 0].reshape(-1)
            vv = uvw_l[:, :, fsel, 1].reshape(-1)
            ww = uvw_l[:, :, fsel, 2].reshape(-1)
        for pol in range(npol_img):
            if plan is not None:
                vals = predict_with_plan(
                    plan.plans[ichan], model.pixels[ichan, pol],
                    precision=kwargs.get("precision", "config"),
                    tail=kwargs.get("tail"),
                )
            else:
                vals = predict_core(
                    uu,
                    vv,
                    ww,
                    model.pixels[ichan, pol],
                    ulo,
                    vlo,
                    prepix=prepix,
                    cellsize=model.cellsize,
                    w_interp=kwargs.get("w_interp", "linear"),
                    support=support,
                    nw=nwp,
                    do_wstacking=do_wstacking,
                    padding=kwargs.get("padding") or 2,
                    gridder=kwargs.get("gridder"),
                )
            newvis = newvis.at[:, :, fsel, pol].add(
                vals.reshape(tb_shape).astype(cdtype)
            )
    newvis = convert_pol_frame(
        newvis, model.polarisation_frame, vis.polarisation_frame, polaxis=3
    )
    out = vis.replace(vis=newvis.astype(vis.vis.dtype))
    return shift_vis_to_image(out, model, tangent=True, inverse=True)


def visibility_recentre(uvw, dl, dm):
    """Compensate for w-kernel re-centring (imaging/base.py:805-815):
    (u, v, w) -> (u - w*dl, v - w*dm, w)."""
    uvw = jnp.asarray(uvw)
    u = uvw[..., 0] - uvw[..., 2] * dl
    v = uvw[..., 1] - uvw[..., 2] * dm
    return jnp.stack([u, v, uvw[..., 2]], axis=-1)


def create_image_from_visibility(vis: Visibility, **kwargs) -> Image:
    """Template image from visibility metadata
    (imaging/base.py:299-440): cellsize from max baseline, npixel padded.
    """
    nchan = kwargs.get("nchan", vis.nchan)
    frequency = np.asarray(
        kwargs.get("frequency", np.asarray(vis.frequency))
    )
    if nchan == 1:
        frequency = np.array([np.mean(frequency)])
        channel_bandwidth = np.array(
            [np.sum(np.asarray(vis.channel_bandwidth))]
        )
    else:
        frequency = frequency[:nchan]
        channel_bandwidth = np.asarray(vis.channel_bandwidth)[:nchan]
    pol_frame = kwargs.get(
        "polarisation_frame", vis.polarisation_frame
    )
    pol_frame = getattr(pol_frame, "name", str(pol_frame))
    npixel = int(kwargs.get("npixel", 512))
    cellsize = kwargs.get("cellsize", None)
    if cellsize is None:
        k = np.max(frequency) / C_M_S
        uvmax = float(
            np.max(np.abs(np.asarray(vis.uvw[..., :2]))) * k
        )
        criticalcellsize = 1.0 / (2.0 * uvmax) if uvmax > 0 else 0.001
        cellsize = criticalcellsize / float(
            kwargs.get("oversampling", 3.0)
        )
    return create_image(
        npixel=npixel,
        cellsize=float(cellsize),
        phasecentre=np.asarray(vis.phasecentre),
        frequency=frequency,
        channel_bandwidth=channel_bandwidth,
        polarisation_frame=pol_frame,
    )


def advise_wide_field(
    vis: Visibility,
    delA: float = 0.02,
    oversampling_synthesised_beam: float = 3.0,
    guard_band_image: float = 6.0,
    facets: int = 1,
    verbose: bool = False,
) -> dict:
    """Advice on imaging parameters (imaging/base.py:441-790), host-side.

    Key-for-key identical output set to the reference: wavelength/uv
    extrema, primary-beam/image/facet fields of view, synthesized beam,
    cellsize, npixels rounded to 2 / {2,3} / {2,3,4,5}-smooth sizes, w /
    time / frequency sampling at image, facet and primary-beam scales,
    and w-stack / w-projection plane counts with kernel support at both
    the image and primary-beam field of view. The station/dish diameter
    comes from the visibility's configuration metadata
    (``vis.station_diameter``, cf. configuration.diameter at
    imaging/base.py:506).
    """
    freq = np.asarray(vis.frequency)
    max_wavelength = C_M_S / np.min(freq)
    min_wavelength = C_M_S / np.max(freq)
    uvw = np.asarray(vis.uvw)
    maximum_baseline = (
        np.max(np.abs(uvw)) / min_wavelength if uvw.size else 1.0
    )
    maximum_w = np.max(np.abs(uvw[..., 2])) / min_wavelength
    if maximum_baseline <= 0.0:
        raise ValueError("Error in UVW coordinates: all uvw are zero")

    diameter = float(getattr(vis, "station_diameter", 35.0) or 35.0)
    if diameter <= 0.0:
        raise ValueError("Station/dish diameter must be greater than zero")
    primary_beam_fov = max_wavelength / diameter
    image_fov = primary_beam_fov * guard_band_image
    facet_fov = (
        primary_beam_fov * guard_band_image / facets
        if facets > 1
        else image_fov
    )

    synthesized_beam = 1.0 / maximum_baseline
    cellsize = synthesized_beam / oversampling_synthesised_beam

    def pwr2(n):
        return int(2 ** int(np.ceil(np.log(n) / np.log(2.0))))

    def pwr23(n):
        best = pwr2(n)
        if best * 3 // 4 >= n:
            best = best * 3 // 4
        return best

    def pwr2345(n):
        # smallest {2,3,4,5}-power >= n (base.py:563-575 without pyfftw)
        number = np.array([2, 3, 4, 5])
        ex = np.ceil(np.log(n) / np.log(number)).astype("int")
        return int(min(np.power(number[:], ex[:])))

    npixels = int(round(image_fov / cellsize))
    npixels2 = pwr2(npixels)
    npixels23 = pwr23(npixels)
    npixels_min = pwr2345(npixels)

    # Cornwell, Humphreys & Voronkov (2012) eq. 24
    w_sampling_image = np.sqrt(2.0 * delA) / (np.pi * image_fov**2)
    w_sampling_facet = (
        np.sqrt(2.0 * delA) / (np.pi * facet_fov**2)
        if facets > 1
        else w_sampling_image
    )
    w_sampling_primary_beam = np.sqrt(2.0 * delA) / (
        np.pi * primary_beam_fov**2
    )

    time_sampling_image = 86400.0 * (synthesized_beam / image_fov)
    time_sampling_primary_beam = 86400.0 * (
        synthesized_beam / primary_beam_fov
    )
    max_freq = np.max(freq)
    freq_sampling_image = max_freq * (synthesized_beam / image_fov)
    freq_sampling_primary_beam = max_freq * (
        synthesized_beam / primary_beam_fov
    )

    wstep_primary_beam = w_sampling_primary_beam
    vis_slices_primary_beam = max(
        1, int(2 * maximum_w / wstep_primary_beam)
    )
    wprojection_planes_primary_beam = vis_slices_primary_beam
    nwpixels_primary_beam = int(
        2.0 * wprojection_planes_primary_beam * primary_beam_fov
    )
    nwpixels_primary_beam -= nwpixels_primary_beam % 2

    wstep_image = w_sampling_image
    vis_slices_image = max(1, int(2 * maximum_w / wstep_image))
    wprojection_planes_image = vis_slices_image
    nwpixels_image = int(2.0 * wprojection_planes_image * image_fov)
    nwpixels_image -= nwpixels_image % 2

    advice = {
        "delA": delA,
        "oversampling_synthesised_beam": oversampling_synthesised_beam,
        "guard_band_image": guard_band_image,
        "facets": facets,
        "verbose": verbose,
        "max_wavelength": max_wavelength,
        "min_wavelength": min_wavelength,
        "maximum_baseline": maximum_baseline,
        "maximum_w": maximum_w,
        "diameter": diameter,
        "primary_beam_fov": primary_beam_fov,
        "image_fov": image_fov,
        "facet_fov": facet_fov,
        "synthesized_beam": synthesized_beam,
        "cellsize": cellsize,
        "npixels": npixels,
        "npixels2": npixels2,
        "npixels23": npixels23,
        "npixels_min": npixels_min,
        "w_sampling_image": w_sampling_image,
        "w_sampling_facet": w_sampling_facet,
        "w_sampling_primary_beam": w_sampling_primary_beam,
        "time_sampling_image": time_sampling_image,
        "time_sampling_primary_beam": time_sampling_primary_beam,
        "max_freq": max_freq,
        "freq_sampling_image": freq_sampling_image,
        "freq_sampling_primary_beam": freq_sampling_primary_beam,
        "wstep_primary_beam": wstep_primary_beam,
        "vis_slices_primary_beam": vis_slices_primary_beam,
        "wprojection_planes_primary_beam": (
            wprojection_planes_primary_beam
        ),
        "nwpixels_primary_beam": nwpixels_primary_beam,
        "wstep_image": wstep_image,
        "vis_slices_image": vis_slices_image,
        "wprojection_planes_image": wprojection_planes_image,
        "nwpixels_image": nwpixels_image,
        # convenience aliases (round-1 API; primary-beam advice is the
        # reference's default recommendation)
        "wstep": wstep_primary_beam,
        "vis_slices": vis_slices_primary_beam,
    }
    if verbose:
        for k, v in advice.items():
            log.info("advise_wide_field: (%s) %s", k, v)
    return advice


# --------------------------------------------------------------------------
# reference-named backend entries (imaging/ng.py:38,146, imaging/wg.py:35,
# 157): on TPU one fused kernel serves both the ducc0 and CUDA contracts.
# --------------------------------------------------------------------------


def predict_ng(bvis, model, **kwargs):
    """Reference-named nifty-gridder predict (ng.py:38-143)."""
    kwargs.pop("context", None)
    return predict_visibility(bvis, model, context="ng", **kwargs)


def invert_ng(bvis, model, dopsf=False, normalise=True, **kwargs):
    """Reference-named nifty-gridder invert (ng.py:146-294)."""
    kwargs.pop("context", None)
    return invert_visibility(
        bvis, model, dopsf=dopsf, normalise=normalise, context="ng",
        **kwargs,
    )


def predict_wg(bvis, model, **kwargs):
    """Reference-named GPU-gridder predict (wg.py:35-154)."""
    kwargs.pop("context", None)
    return predict_visibility(bvis, model, context="wg", **kwargs)


def invert_wg(bvis, model, dopsf=False, normalise=True, **kwargs):
    """Reference-named GPU-gridder invert (wg.py:157-303)."""
    kwargs.pop("context", None)
    return invert_visibility(
        bvis, model, dopsf=dopsf, normalise=normalise, context="wg",
        **kwargs,
    )


def rad_deg_arcsec(x):
    """Stringify x in radian, degree, and arcsec forms
    (imaging/base.py:793-802)."""
    return (
        f"{x:.3g} (rad) {180.0 * x / np.pi:.3g} (deg) "
        f"{3600.0 * 180.0 * x / np.pi:.3g} (asec)"
    )
