"""GridData-facing gridding API and AW-projection (framework L2/L3, C7/C8).

Equivalents of /root/reference/src/ska_sdp_func_python/grid_data/gridding.py
(public GridData API) and imaging/base.py predict/invert_awprojection
(:158-260). The reference drives these with oversampled ConvolutionFunction
patches in a per-row python loop; here the CF is a device array
[nw, oversample, oversample, S, S] and the grid/degrid are batched
gather/scatter kernels. (The reference's own AW path is legacy/untested —
tests/imaging/test_imaging.py:29-35 skips it — the hot path remains
ops/imaging.invert/predict.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import czeros as _czeros
from ..models.griddata import GridData
from ..models.image import Image
from ..models.visibility import Visibility
from .fft import fft, ifft
from .gridding import grid_correction, grid_weights_nearest, reweight_imaging_weights
from .pswf import grdsf, w_beam

__all__ = [
    "convolution_mapping_visibility",
    "spatial_mapping",
    "create_pswf_convolutionfunction",
    "create_awterm_convolutionfunction",
    "create_griddata_from_image",
    "grid_visibility_to_griddata",
    "degrid_visibility_from_griddata",
    "grid_visibility_weight_to_griddata",
    "griddata_merge_weights",
    "griddata_visibility_reweight",
    "fft_griddata_to_image",
    "fft_image_to_griddata",
    "predict_awprojection",
    "invert_awprojection",
]


def create_griddata_from_image(im: Image, polarisation_frame=None) -> GridData:
    """Empty uv grid matching an image template."""
    frame = (
        str(getattr(polarisation_frame, "name", polarisation_frame))
        if polarisation_frame is not None
        else im.polarisation_frame
    )
    cdtype = jnp.result_type(im.pixels.dtype, jnp.complex64)
    return GridData(
        pixels=_czeros(im.pixels.shape, cdtype),
        frequency=im.frequency,
        cellsize=im.cellsize,
        polarisation_frame=frame,
    )


def create_pswf_convolutionfunction(
    support: int = 8, oversampling: int = 16, nw: int = 1
):
    """Oversampled PSWF gridding kernel [nw, oversampling, oversampling,
    support, support] (equivalent of the datamodels CF constructor used at
    gridding.py:76-78)."""
    half = support // 2
    # 1-D oversampled kernel: offsets (cell - frac) for frac = k/oversampling
    k1d = np.zeros((oversampling, support))
    for k in range(oversampling):
        frac = k / oversampling
        cells = np.arange(support) - (half - 1) - frac
        nu = cells / half
        vals = (1.0 - nu**2) * np.asarray(grdsf(jnp.asarray(nu))[0])
        vals[np.abs(nu) >= 1.0] = 0.0
        s = vals.sum()
        k1d[k] = vals / s if s != 0 else vals
    cf = np.einsum("ay,bx->abyx", k1d, k1d)  # [ov, ov, S, S]
    cf = np.broadcast_to(cf, (nw,) + cf.shape).copy()
    return jnp.asarray(cf)


def create_awterm_convolutionfunction(
    im: Image,
    nw: int = 1,
    wstep: float = 0.0,
    oversampling: int = 16,
    support: int = 8,
    use_aaf: bool = True,
):
    """W-dependent (and optionally anti-aliased) CF kernels.

    Computes each w-plane kernel as the FT of the w-beam over the image
    support, sampled at ``oversampling`` sub-cell offsets.
    Returns (gcf image-plane correction [ny, nx], cf [nw, ov, ov, S, S]).
    """
    npixel = im.npixel
    base = create_pswf_convolutionfunction(support, oversampling, nw=1)[0]
    fov = npixel * im.cellsize
    cfs = []
    w_values = (np.arange(nw) - nw // 2) * wstep
    for w in w_values:
        if w == 0.0:
            cfs.append(np.asarray(base))
            continue
        # kernel = FT of w-beam restricted to the support, oversampled:
        # evaluate on an oversampled uv patch via FFT of the padded w-beam
        nsub = support * oversampling
        wb = np.asarray(w_beam(npixel, fov, w))
        pad = np.zeros(
            (npixel * oversampling, npixel * oversampling), dtype=complex
        )
        lo = (npixel * oversampling - npixel) // 2
        pad[lo : lo + npixel, lo : lo + npixel] = wb
        kern = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(pad)))
        c = pad.shape[0] // 2
        patch = kern[
            c - nsub // 2 : c + nsub // 2, c - nsub // 2 : c + nsub // 2
        ]
        patch = patch.reshape(support, oversampling, support, oversampling)
        cf_w = patch.transpose(1, 3, 0, 2)  # [ov, ov, S, S]
        norm = np.abs(cf_w.sum(axis=(2, 3)))[..., None, None]
        cf_w = cf_w / np.where(norm > 0, norm, 1.0)
        if use_aaf:
            cf_w = cf_w * np.asarray(base)
            s = cf_w.sum(axis=(2, 3))[..., None, None]
            cf_w = cf_w / np.where(np.abs(s) > 0, s, 1.0)
        cfs.append(cf_w)
    gcf = 1.0 / np.asarray(
        grid_correction(npixel, support, dtype=jnp.float64)
    )
    return jnp.asarray(gcf), jnp.asarray(np.stack(cfs))


def _pswf_cf_correction(npixel: int, support: int = 8):
    """Image-plane correction matching create_pswf_convolutionfunction:
    the DTFT of the zero-offset row-normalised sampled kernel. Multiply the
    image by 1/corr (i.e. pass gcf = 1/corr)."""
    import numpy as _np

    half = support // 2
    cells = _np.arange(support) - (half - 1)
    nu = cells / half
    vals = (1.0 - nu**2) * _np.asarray(grdsf(jnp.asarray(nu))[0])
    vals[_np.abs(nu) >= 1.0] = 0.0
    vals = vals / vals.sum()
    x = (_np.arange(npixel) - npixel // 2) / npixel
    c = _np.sum(
        vals[None, :] * _np.cos(2.0 * _np.pi * x[:, None] * cells[None, :]),
        axis=1,
    )
    # the AW path grids at image resolution (no padding), so clamp the
    # taper to avoid amplifying the aliased band edge
    c = _np.maximum(c, 0.05)
    return jnp.asarray(_np.outer(c, c))


def _uv_mapping(vis: Visibility, gd_shape, cellsize, oversampling, nw, wstep):
    """Per-(t,b,f) fractional grid coords, sub-cell offsets and w-planes
    (gridding.py:33-157)."""
    npixel = gd_shape[-1]
    scale = npixel * cellsize
    uvw_l = vis.uvw_lambda
    u_pix = -uvw_l[..., 0] * scale + npixel // 2
    v_pix = uvw_l[..., 1] * scale + npixel // 2
    # floor-based fractional offsets: cell j of the patch sits at offset
    # j - (half-1) - frac from u_pix, matching the CF table rows built with
    # frac = k / oversampling
    iu = jnp.floor(u_pix).astype(jnp.int32)
    iv = jnp.floor(v_pix).astype(jnp.int32)
    fu = jnp.round((u_pix - iu) * oversampling).astype(jnp.int32)
    fv = jnp.round((v_pix - iv) * oversampling).astype(jnp.int32)
    iu = jnp.where(fu >= oversampling, iu + 1, iu)
    fu = jnp.where(fu >= oversampling, 0, fu)
    iv = jnp.where(fv >= oversampling, iv + 1, iv)
    fv = jnp.where(fv >= oversampling, 0, fv)
    if nw > 1 and wstep > 0:
        pw = jnp.clip(
            jnp.round(uvw_l[..., 2] / wstep).astype(jnp.int32) + nw // 2,
            0,
            nw - 1,
        )
    else:
        pw = jnp.zeros(u_pix.shape, dtype=jnp.int32)
    return iu, iv, fu, fv, pw


@partial(jax.jit, static_argnames=("support",))
def _cf_grid_single(iu, iv, fu, fv, pw, vals, cf, grid, support):
    """Scatter CF-weighted vis patches into one (chan, pol) grid plane."""
    npixel = grid.shape[-1]
    half = support // 2
    i0u = iu - (half - 1)
    i0v = iv - (half - 1)
    ok = (
        (i0u >= 0)
        & (i0u + support <= npixel)
        & (i0v >= 0)
        & (i0v + support <= npixel)
    )
    vals = jnp.where(ok, vals, 0.0)
    i0u = jnp.clip(i0u, 0, npixel - support)
    i0v = jnp.clip(i0v, 0, npixel - support)
    patches = cf[pw, fv, fu] * vals[:, None, None]  # [N, S, S]
    rows = i0v[:, None, None] + jnp.arange(support)[None, :, None]
    cols = i0u[:, None, None] + jnp.arange(support)[None, None, :]
    flat = (rows * npixel + cols).reshape(-1)
    out = grid.reshape(-1).at[flat].add(patches.reshape(-1))
    return out.reshape(npixel, npixel), jnp.sum(
        jnp.where(ok, jnp.abs(vals) * 0 + 1.0, 0.0)
    )


def grid_visibility_to_griddata(
    vis: Visibility, griddata: GridData, cf=None, oversampling: int = 16,
    nw: int = 1, wstep: float = 0.0,
):
    """Grid weighted visibility onto a GridData (gridding.py:160-255).

    Returns (GridData, sumwt [nchan, npol]). The body is jitted: one
    dispatch per call (deep eager queues are unreliable on the axon
    tunnel, and compiled is what we want on TPU anyway).
    """
    if cf is None:
        cf = create_pswf_convolutionfunction(8, oversampling, nw=max(nw, 1))
    return _grid_visibility_to_griddata_jit(
        vis, griddata, cf, oversampling, nw, wstep
    )


@partial(jax.jit, static_argnames=("oversampling", "nw", "wstep"))
def _grid_visibility_to_griddata_jit(
    vis, griddata, cf, oversampling, nw, wstep
):
    support = cf.shape[-1]
    nchan_g, npol = griddata.pixels.shape[:2]
    mfs = nchan_g == 1 and vis.nchan > 1
    iu, iv, fu, fv, pw = _uv_mapping(
        vis, griddata.pixels.shape, griddata.cellsize, oversampling, nw, wstep
    )
    vis_w = vis.flagged_vis * vis.flagged_imaging_weight.astype(
        vis.vis.dtype
    )
    cf = cf.astype(vis.vis.dtype)
    pixels = jnp.zeros_like(griddata.pixels)
    sumwt = jnp.zeros((nchan_g, npol), dtype=vis.weight.dtype)
    for ichan in range(nchan_g):
        fsel = slice(None) if mfs else slice(ichan, ichan + 1)
        for pol in range(npol):
            grid, _ = _cf_grid_single(
                iu[:, :, fsel].reshape(-1),
                iv[:, :, fsel].reshape(-1),
                fu[:, :, fsel].reshape(-1),
                fv[:, :, fsel].reshape(-1),
                pw[:, :, fsel].reshape(-1),
                vis_w[:, :, fsel, pol].reshape(-1),
                cf,
                pixels[ichan, pol],
                support,
            )
            pixels = pixels.at[ichan, pol].set(grid)
            sumwt = sumwt.at[ichan, pol].add(
                jnp.sum(vis.flagged_imaging_weight[:, :, fsel, pol])
            )
    return griddata.replace(pixels=pixels), sumwt


@partial(jax.jit, static_argnames=("support",))
def _cf_degrid_single(iu, iv, fu, fv, pw, cf, grid, support):
    npixel = grid.shape[-1]
    half = support // 2
    i0u = iu - (half - 1)
    i0v = iv - (half - 1)
    ok = (
        (i0u >= 0)
        & (i0u + support <= npixel)
        & (i0v >= 0)
        & (i0v + support <= npixel)
    )
    i0u = jnp.clip(i0u, 0, npixel - support)
    i0v = jnp.clip(i0v, 0, npixel - support)
    rows = i0v[:, None, None] + jnp.arange(support)[None, :, None]
    cols = i0u[:, None, None] + jnp.arange(support)[None, None, :]
    idx = rows * npixel + cols
    patch = grid.reshape(-1)[idx.reshape(-1)].reshape(idx.shape)
    kern = jnp.conj(cf[pw, fv, fu])
    vals = jnp.sum(patch * kern, axis=(1, 2))
    return jnp.where(ok, vals, 0.0)


def degrid_visibility_from_griddata(
    vis: Visibility, griddata: GridData, cf=None, oversampling: int = 16,
    nw: int = 1, wstep: float = 0.0,
) -> Visibility:
    """Degrid visibility from a GridData (gridding.py:502-590). Jitted body
    (single dispatch)."""
    if cf is None:
        cf = create_pswf_convolutionfunction(8, oversampling, nw=max(nw, 1))
    return _degrid_visibility_from_griddata_jit(
        vis, griddata, cf, oversampling, nw, wstep
    )


@partial(jax.jit, static_argnames=("oversampling", "nw", "wstep"))
def _degrid_visibility_from_griddata_jit(
    vis, griddata, cf, oversampling, nw, wstep
):
    support = cf.shape[-1]
    nchan_g, npol = griddata.pixels.shape[:2]
    mfs = nchan_g == 1 and vis.nchan > 1
    iu, iv, fu, fv, pw = _uv_mapping(
        vis, griddata.pixels.shape, griddata.cellsize, oversampling, nw, wstep
    )
    cf = cf.astype(griddata.pixels.dtype)
    from ..config import zeros_like_safe

    newvis = zeros_like_safe(vis.vis)
    for ichan in range(nchan_g):
        fsel = slice(None) if mfs else slice(ichan, ichan + 1)
        shape = iu[:, :, fsel].shape
        for pol in range(npol):
            vals = _cf_degrid_single(
                iu[:, :, fsel].reshape(-1),
                iv[:, :, fsel].reshape(-1),
                fu[:, :, fsel].reshape(-1),
                fv[:, :, fsel].reshape(-1),
                pw[:, :, fsel].reshape(-1),
                cf,
                griddata.pixels[ichan, pol],
                support,
            )
            newvis = newvis.at[:, :, fsel, pol].add(
                vals.reshape(shape).astype(newvis.dtype)
            )
    return vis.replace(vis=newvis)


def grid_visibility_weight_to_griddata(vis: Visibility, griddata: GridData):
    """Nearest-cell weight density (gridding.py:258-332)."""
    npixel = griddata.npixel
    scale = npixel * griddata.cellsize
    uvw_l = vis.uvw_lambda
    u_pix = (-uvw_l[..., 0] * scale + npixel // 2).reshape(-1)
    v_pix = (uvw_l[..., 1] * scale + npixel // 2).reshape(-1)
    nchan_g, npol = griddata.pixels.shape[:2]
    pixels = jnp.zeros_like(jnp.real(griddata.pixels))
    sumwt = jnp.zeros((nchan_g, npol))
    fw = vis.flagged_weight
    for pol in range(npol):
        density, swt = grid_weights_nearest(
            u_pix, v_pix, fw[..., pol].reshape(-1), npixel
        )
        pixels = pixels.at[0, pol].add(density)
        sumwt = sumwt.at[0, pol].add(swt)
    return (
        griddata.replace(pixels=pixels.astype(griddata.pixels.dtype)),
        sumwt,
    )


def griddata_merge_weights(gd_list):
    """Merge weight grids (gridding.py:337-359)."""
    gd0, sumwt = gd_list[0]
    pixels = gd0.pixels
    total = jnp.asarray(sumwt)
    for gd, swt in gd_list[1:]:
        pixels = pixels + gd.pixels
        total = total + jnp.asarray(swt)
    return gd0.replace(pixels=pixels), total


def griddata_visibility_reweight(
    vis: Visibility,
    griddata: GridData,
    weighting: str = "uniform",
    robustness: float = 0.0,
    sumwt=None,
) -> Visibility:
    """Reweight imaging weights from a gridded density
    (gridding.py:362-500)."""
    if weighting == "natural":
        return vis.replace(imaging_weight=vis.weight)
    npixel = griddata.npixel
    scale = npixel * griddata.cellsize
    uvw_l = vis.uvw_lambda
    u_pix = (-uvw_l[..., 0] * scale + npixel // 2).reshape(-1)
    v_pix = (uvw_l[..., 1] * scale + npixel // 2).reshape(-1)
    fw = vis.flagged_weight
    T, B, F, P = fw.shape
    new_imwt = jnp.zeros_like(fw)
    for pol in range(P):
        density = jnp.real(griddata.pixels[0, pol])
        imwt = reweight_imaging_weights(
            u_pix,
            v_pix,
            fw[..., pol].reshape(-1),
            density,
            weighting=weighting,
            robustness=robustness,
            sumwt=None if sumwt is None else jnp.sum(jnp.asarray(sumwt)),
        )
        new_imwt = new_imwt.at[..., pol].set(imwt.reshape(T, B, F))
    return vis.replace(imaging_weight=new_imwt)


def fft_griddata_to_image(griddata: GridData, template: Image, gcf=None):
    """uv grid -> image with grid correction (gridding.py:593-621)."""
    npixel = griddata.npixel
    img = (npixel * npixel) * ifft(griddata.pixels)
    img = jnp.real(img)
    if gcf is not None:
        img = img * jnp.asarray(gcf)
    return template.replace(pixels=img.astype(template.pixels.dtype))


def fft_image_to_griddata(im: Image, griddata: GridData, gcf=None):
    """Image -> uv grid with grid correction (gridding.py:624-645)."""
    pixels = im.pixels
    if gcf is not None:
        pixels = pixels * jnp.asarray(gcf)
    grid = fft(pixels.astype(griddata.pixels.dtype))
    return griddata.replace(pixels=grid)


def invert_awprojection(
    vis: Visibility, model: Image, gcfcf=None, normalise: bool = True,
    **kwargs,
):
    """AW-projection invert driven by a (gcf, cf) pair
    (imaging/base.py:204-260)."""
    from .imaging import normalise_sumwt, shift_vis_to_image

    if gcfcf is None:
        cf = create_pswf_convolutionfunction(8, 16, 1)
        gcf = 1.0 / _pswf_cf_correction(model.npixel, 8)
    else:
        gcf, cf = gcfcf
    svis = shift_vis_to_image(vis, model, tangent=True, inverse=False)
    gd = create_griddata_from_image(model)
    gd, sumwt = grid_visibility_to_griddata(
        svis, gd, cf=cf, nw=cf.shape[0], **kwargs
    )
    out = fft_griddata_to_image(gd, model, gcf=gcf)
    if normalise:
        out = normalise_sumwt(out, sumwt)
    return out, sumwt


def predict_awprojection(
    vis: Visibility, model: Image, gcfcf=None, **kwargs
) -> Visibility:
    """AW-projection predict driven by a (gcf, cf) pair
    (imaging/base.py:158-201)."""
    from .imaging import shift_vis_to_image

    if gcfcf is None:
        cf = create_pswf_convolutionfunction(8, 16, 1)
        gcf = 1.0 / _pswf_cf_correction(model.npixel, 8)
    else:
        gcf, cf = gcfcf
    gd = create_griddata_from_image(model)
    gd = fft_image_to_griddata(model, gd, gcf=gcf)
    newvis = degrid_visibility_from_griddata(
        vis, gd, cf=cf, nw=cf.shape[0], **kwargs
    )
    return shift_vis_to_image(newvis, model, tangent=True, inverse=True)


def spatial_mapping(
    griddata: GridData, u, v, w, cf=None, oversampling: int = 16,
    nw: int = 1, wstep: float = 0.0,
):
    """Map per-row (u, v, w) [wavelengths] into grid coordinates
    (grid_data/gridding.py:60-157).

    With a CF: returns (pu_grid, pu_offset, pv_grid, pv_offset, pwc_grid,
    pwc_fraction) — integer cell, oversampled sub-cell offset, and w-plane
    index/fraction. Without: (pu_grid, pv_grid, pu_conj, pv_conj).
    The reference routes this through two astropy WCS objects; the grid
    WCS reduces to the affine u_pix = -u*n*cellsize + n//2 (see GridData).
    """
    npixel = griddata.npixel
    scale = npixel * griddata.cellsize
    u = jnp.asarray(u)
    v = jnp.asarray(v)
    w = jnp.asarray(w)
    u_pix = -u * scale + npixel // 2
    v_pix = v * scale + npixel // 2
    if cf is None:
        pu = jnp.round(u_pix).astype(jnp.int32)
        pv = jnp.round(v_pix).astype(jnp.int32)
        puc = jnp.round(u * scale + npixel // 2).astype(jnp.int32)
        pvc = jnp.round(-v * scale + npixel // 2).astype(jnp.int32)
        return pu, pv, puc, pvc
    if hasattr(cf, "shape"):
        nw = cf.shape[0]
        oversampling = cf.shape[1]
    iu = jnp.floor(u_pix).astype(jnp.int32)
    iv = jnp.floor(v_pix).astype(jnp.int32)
    fu = jnp.round((u_pix - iu) * oversampling).astype(jnp.int32)
    fv = jnp.round((v_pix - iv) * oversampling).astype(jnp.int32)
    iu = jnp.where(fu >= oversampling, iu + 1, iu)
    fu = jnp.where(fu >= oversampling, 0, fu)
    iv = jnp.where(fv >= oversampling, iv + 1, iv)
    fv = jnp.where(fv >= oversampling, 0, fv)
    if nw > 1 and wstep > 0.0:
        pw_pix = w / wstep + nw // 2
        pw = jnp.clip(jnp.round(pw_pix).astype(jnp.int32), 0, nw - 1)
        pw_frac = pw_pix - pw
    else:
        pw = jnp.zeros(u_pix.shape, dtype=jnp.int32)
        pw_frac = jnp.zeros_like(u_pix)
    return iu, fu, iv, fv, pw, pw_frac


def convolution_mapping_visibility(
    vis: Visibility, griddata: GridData, chan: int, cf=None, **kwargs
):
    """Visibility -> grid/CF mapping for one channel
    (grid_data/gridding.py:33-58)."""
    uvw_l = vis.uvw_lambda
    u = jnp.nan_to_num(uvw_l[..., chan, 0].reshape(-1))
    v = jnp.nan_to_num(uvw_l[..., chan, 1].reshape(-1))
    w = jnp.nan_to_num(uvw_l[..., chan, 2].reshape(-1))
    return spatial_mapping(griddata, u, v, w, cf=cf, **kwargs)
