"""Deconvolution drivers (framework L3, C18): CLEAN orchestration on Image
cubes, beam fitting, and restore.

Re-design of /root/reference/src/ska_sdp_func_python/image/deconvolution.py:
the reference scatters the cube into per-channel image lists and loops
channels/pols in python (deconvolution.py:1047-1115); here the cube stays a
device array and channels/pols batch through the jitted minor-cycle kernels.
The radler C++ backend (deconvolution.py:163-262) is replaced by the
framework's own kernels (ops/cleaners.py).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..models.image import Image
from .cleaners import hogbom, hogbom_complex, msclean, msmfsclean
from .image_ops import (
    convert_clean_beam_to_degrees,
    convert_clean_beam_to_pixels,
)
from .taylor import (
    calculate_image_frequency_moments,
    calculate_image_from_frequency_taylor_terms,
)

log = logging.getLogger("ska-sdp-func-python-tpu")

__all__ = [
    "deconvolve_cube",
    "deconvolve_list",
    "restore_list",
    "radler_deconvolve_list",
    "fit_psf",
    "restore_cube",
    "find_window",
    "bound_psf",
    "common_arguments",
    "check_psf_peak",
    "find_window_list",
    "bound_psf_list",
    "hogbom_kernel_list",
    "complex_hogbom_kernel_list",
    "msclean_kernel_list",
    "mmclean_kernel_list",
]


def common_arguments(**kwargs):
    """Extract common clean arguments (deconvolution.py:514-540)."""
    gain = kwargs.get("gain", 0.1)
    if gain <= 0.0 or gain >= 2.0:
        raise ValueError("Loop gain must be between 0 and 2")
    thresh = kwargs.get("threshold", 0.0)
    if thresh < 0.0:
        raise ValueError("Threshold must be positive or zero")
    niter = kwargs.get("niter", 100)
    if niter < 0:
        raise ValueError("niter must be greater than zero")
    fracthresh = kwargs.get("fractional_threshold", 0.01)
    if fracthresh < 0.0 or fracthresh > 1.0:
        raise ValueError("Fractional threshold should be in range 0.0, 1.0")
    scales = kwargs.get("scales", [0, 3, 10, 30])
    return fracthresh, gain, niter, thresh, scales


def find_window(dirty: Image, window_shape=None, **kwargs):
    """Construct the clean window (deconvolution.py:282-350): None,
    "quarter", "no_edge", or an explicit ``mask`` array/Image."""
    mask = kwargs.get("mask", None)
    if mask is not None:
        return jnp.asarray(getattr(mask, "pixels", mask))
    if window_shape is None:
        return None
    ny, nx = dirty.pixels.shape[-2:]
    window = np.zeros(dirty.pixels.shape)
    if window_shape == "quarter":
        qx, qy = nx // 4, ny // 4
        window[..., qy + 1 : 3 * qy, qx + 1 : 3 * qx] = 1.0
    elif window_shape == "no_edge":
        edge = kwargs.get("window_edge", 16)
        window[..., edge + 1 : ny - edge, edge + 1 : nx - edge] = 1.0
    else:
        raise ValueError(f"Window shape {window_shape} is not recognized")
    return jnp.asarray(window)


def bound_psf(dirty: Image, psf: Image, psf_support=None) -> Image:
    """Crop the PSF to +/- psf_support pixels about its centre
    (deconvolution.py:352-392)."""
    ny, nx = dirty.pixels.shape[-2:]
    if psf_support is None:
        psf_support = max(ny // 2, nx // 2)
    py, px = psf.pixels.shape[-2:]
    if psf_support <= py // 2 and psf_support <= px // 2:
        cy, cx = py // 2, px // 2
        cropped = psf.pixels[
            ...,
            cy - psf_support : cy + psf_support,
            cx - psf_support : cx + psf_support,
        ]
        return psf.replace(pixels=cropped)
    return psf


def deconvolve_cube(
    dirty: Image, psf: Image, sensitivity: Image = None, prefix: str = "", **kwargs
):
    """CLEAN a dirty image cube (deconvolution.py:50-160, 1047-1115).

    Algorithms: 'hogbom' | 'hogbom-complex' | 'msclean' |
    'msmfsclean'/'mfsmsclean'/'mmclean'.

    :return: (component Image, residual Image)
    """
    algorithm = kwargs.get("algorithm", "msclean")
    window = find_window(
        dirty,
        kwargs.get("window_shape", None),
        **{k: v for k, v in kwargs.items() if k != "window_shape"},
    )
    psf = bound_psf(dirty, psf, kwargs.get("psf_support", None))
    fracthresh, gain, niter, thresh, scales = common_arguments(**kwargs)

    nchan, npol = dirty.nchan, dirty.npol
    comp = jnp.zeros_like(dirty.pixels)
    res = jnp.zeros_like(dirty.pixels)

    def win_for(chan, pol):
        if window is None:
            return None
        return window[min(chan, window.shape[0] - 1), pol]

    if algorithm == "hogbom":
        if window is None:
            # all (chan, pol) lanes batched through one vmapped while_loop
            ny, nx = dirty.pixels.shape[-2:]
            d2 = dirty.pixels.reshape(-1, ny, nx)
            p2 = psf.pixels.reshape(-1, *psf.pixels.shape[-2:])
            ok = jnp.max(p2, axis=(-2, -1)) > 0.0
            # lanes with empty PSFs get a unit delta so the loop is benign;
            # their outputs are masked out below (reference skips them)
            delta = jnp.zeros_like(p2).at[
                :, p2.shape[-2] // 2, p2.shape[-1] // 2
            ].set(1.0)
            p2_safe = jnp.where(ok[:, None, None], p2, delta)
            cb, rb = jax.vmap(
                lambda d, p: hogbom(
                    d,
                    p,
                    None,
                    gain=gain,
                    thresh=thresh,
                    niter=niter,
                    fracthresh=fracthresh,
                )
            )(d2, p2_safe)
            okm = ok[:, None, None]
            comp = jnp.where(okm, cb, 0.0).reshape(dirty.pixels.shape)
            res = jnp.where(okm, rb, 0.0).reshape(dirty.pixels.shape)
            return dirty.replace(pixels=comp), dirty.replace(pixels=res)
        for chan in range(nchan):
            for pol in range(npol):
                if float(jnp.max(psf.pixels[chan, pol])) <= 0.0:
                    continue
                c, r = hogbom(
                    dirty.pixels[chan, pol],
                    psf.pixels[chan, pol],
                    win_for(chan, pol),
                    gain=gain,
                    thresh=thresh,
                    niter=niter,
                    fracthresh=fracthresh,
                )
                comp = comp.at[chan, pol].set(c)
                res = res.at[chan, pol].set(r)
    elif algorithm == "hogbom-complex":
        if npol != 4:
            raise ValueError("hogbom-complex requires stokesIQUV images")
        for chan in range(nchan):
            for pol in (0, 3):
                if float(jnp.max(psf.pixels[chan, pol])) <= 0.0:
                    continue
                c, r = hogbom(
                    dirty.pixels[chan, pol],
                    psf.pixels[chan, pol],
                    win_for(chan, pol),
                    gain=gain,
                    thresh=thresh,
                    niter=niter,
                    fracthresh=fracthresh,
                )
                comp = comp.at[chan, pol].set(c)
                res = res.at[chan, pol].set(r)
            cq, cu, rq, ru = hogbom_complex(
                dirty.pixels[chan, 1],
                dirty.pixels[chan, 2],
                psf.pixels[chan, 1],
                psf.pixels[chan, 2],
                win_for(chan, 1),
                gain=gain,
                thresh=thresh,
                niter=niter,
                fracthresh=fracthresh,
            )
            comp = comp.at[chan, 1].set(cq).at[chan, 2].set(cu)
            res = res.at[chan, 1].set(rq).at[chan, 2].set(ru)
    elif algorithm == "msclean":
        sens = sensitivity.pixels if sensitivity is not None else None
        for chan in range(nchan):
            for pol in range(npol):
                if float(jnp.max(psf.pixels[chan, pol])) <= 0.0:
                    continue
                c, r = msclean(
                    dirty.pixels[chan, pol],
                    psf.pixels[chan, pol],
                    win_for(chan, pol),
                    sens[chan, pol] if sens is not None else None,
                    gain=gain,
                    thresh=thresh,
                    niter=niter,
                    scales=tuple(scales),
                    fracthresh=fracthresh,
                )
                comp = comp.at[chan, pol].set(c)
                res = res.at[chan, pol].set(r)
    elif algorithm in ("msmfsclean", "mfsmsclean", "mmclean"):
        return _mmclean_cube(
            dirty, psf, sensitivity, window, **kwargs
        )
    else:
        raise ValueError(f"deconvolve_cube: Unknown algorithm {algorithm}")

    return dirty.replace(pixels=comp), dirty.replace(pixels=res)


def _mmclean_cube(dirty, psf, sensitivity, window, **kwargs):
    """MSMFS on a channel cube via frequency moments
    (deconvolution.py:645-830)."""
    fracthresh, gain, niter, thresh, scales = common_arguments(**kwargs)
    gain = kwargs.get("gain", 0.7)
    findpeak = kwargs.get("findpeak", "RASCIL")
    nmoment = kwargs.get("nmoment", 3)
    nchan = dirty.nchan
    if not nchan > 2 * (nmoment - 1):
        raise ValueError(
            f"Requires nchan > 2*(nmoment-1) ({nchan} > {2 * (nmoment - 1)})"
        )
    dirty_taylor = calculate_image_frequency_moments(dirty, nmoment=nmoment)
    nmoment_for_psf = 2 * nmoment if nmoment > 1 else 1
    psf_taylor = calculate_image_frequency_moments(
        psf, nmoment=nmoment_for_psf
    )
    psf_peak = jnp.max(psf_taylor.pixels)
    dpix = dirty_taylor.pixels / psf_peak
    ppix = psf_taylor.pixels / psf_peak
    if sensitivity is not None:
        sens_taylor = (
            calculate_image_frequency_moments(sensitivity, nmoment=nmoment)
            .pixels
            / nchan
        )
    else:
        sens_taylor = None
    if window is not None:
        w_taylor = calculate_image_frequency_moments(
            dirty.replace(pixels=window.astype(dirty.pixels.dtype)),
            nmoment=nmoment,
        ).pixels / nchan
    else:
        w_taylor = None

    npol = dirty.npol
    comp_t = jnp.zeros_like(dpix)
    res_t = jnp.zeros_like(dpix)
    for pol in range(npol):
        if float(jnp.max(ppix[0, 0])) <= 0.0:
            continue
        c, r = msmfsclean(
            dpix[:, pol],
            ppix[:, 0],
            w_taylor[0, pol] if w_taylor is not None else None,
            sens_taylor[:, pol] if sens_taylor is not None else None,
            gain=gain,
            thresh=thresh,
            niter=niter,
            scales=tuple(scales),
            fracthresh=fracthresh,
            findpeak=findpeak,
        )
        comp_t = comp_t.at[:, pol].set(c)
        res_t = res_t.at[:, pol].set(r)

    # the reference back-transforms the psf_peak-NORMALISED moment comps
    # directly (deconvolution.py:735-737 divides dirty/psf by psf_peak and
    # never multiplies back): with channel psfs of unit peak, psf_peak ~
    # nchan and the normalised moment-0 quantities are already in
    # per-channel flux units
    comp_taylor = dirty_taylor.replace(pixels=comp_t)
    res_taylor = dirty_taylor.replace(pixels=res_t)
    comp = calculate_image_from_frequency_taylor_terms(dirty, comp_taylor)
    residual = calculate_image_from_frequency_taylor_terms(dirty, res_taylor)
    return comp, residual


def fit_psf(psf: Image) -> dict:
    """Fit a 2-D Gaussian to the PSF core (deconvolution.py:1119-1160).

    Host-side least-squares on the central 15x15 pixels (scipy replaces
    astropy's LevMar fitter). Returns {bmaj, bmin, bpa} in degrees.
    """
    from scipy.optimize import least_squares

    npixel = psf.pixels.shape[3]
    sl = slice(npixel // 2 - 7, npixel // 2 + 8)
    z = np.asarray(psf.pixels[0, 0, sl, sl])
    y, x = np.mgrid[sl, sl]

    def gauss2d(p, x, y):
        amp, x0, y0, sx, sy, th = p
        ct, st = np.cos(th), np.sin(th)
        a = ct**2 / (2 * sx**2) + st**2 / (2 * sy**2)
        b = st * ct * (1 / (2 * sx**2) - 1 / (2 * sy**2))
        c = st**2 / (2 * sx**2) + ct**2 / (2 * sy**2)
        return amp * np.exp(
            -(a * (x - x0) ** 2 + 2 * b * (x - x0) * (y - y0) + c * (y - y0) ** 2)
        )

    p0 = [float(z.max()), float(x.mean()), float(y.mean()), 1.5, 1.5, 0.0]
    try:
        sol = least_squares(
            lambda p: (gauss2d(p, x, y) - z).ravel(), p0, method="lm"
        )
        sx, sy, th = abs(sol.x[3]), abs(sol.x[4]), sol.x[5]
        if sx <= 0.0 or sy <= 0.0 or not sol.success:
            beam_pixels = (1.0, 1.0, 0.0)
        else:
            beam_pixels = (sx, sy, th)
    except Exception:  # pragma: no cover - fit failure fallback
        log.warning("fit_psf: fit failed, using 1 pixel stddev")
        beam_pixels = (1.0, 1.0, 0.0)
    return convert_clean_beam_to_degrees(psf, beam_pixels)


def restore_cube(
    model: Image, psf: Image = None, residual: Image = None, clean_beam=None
) -> Image:
    """Convolve the model with the clean beam and add residuals
    (deconvolution.py:949-1045, 1162-1191)."""
    if clean_beam is None:
        if psf is None:
            raise ValueError(
                "restore_cube: either psf or clean_beam must be specified"
            )
        clean_beam = fit_psf(psf)
    beam_pixels = convert_clean_beam_to_pixels(model, clean_beam)
    ny, nx = model.pixels.shape[-2:]
    sx, sy, th = beam_pixels
    iy = jnp.arange(ny) - ny // 2
    ix = jnp.arange(nx) - nx // 2
    yy, xx = jnp.meshgrid(iy, ix, indexing="ij")
    ct, st = jnp.cos(th), jnp.sin(th)
    a = ct**2 / (2 * sx**2) + st**2 / (2 * sy**2)
    b = st * ct * (1 / (2 * sx**2) - 1 / (2 * sy**2))
    c = st**2 / (2 * sx**2) + ct**2 / (2 * sy**2)
    # peak-normalised clean beam (reference normalises the kernel to peak 1,
    # deconvolution.py:1018-1026)
    gk = jnp.exp(-(a * xx**2 + 2 * b * xx * yy + c * yy**2))
    kernel_f = jnp.fft.fft2(jnp.fft.ifftshift(gk))
    img_f = jnp.fft.fft2(model.pixels, axes=(-2, -1))
    restored = jnp.real(
        jnp.fft.ifft2(img_f * kernel_f[None, None], axes=(-2, -1))
    )
    if residual is not None:
        restored = restored + residual.pixels
    out = model.replace(pixels=restored.astype(model.pixels.dtype))
    return out.replace(
        clean_beam=jnp.asarray(
            [
                np.deg2rad(clean_beam["bmaj"]),
                np.deg2rad(clean_beam["bmin"]),
                np.deg2rad(clean_beam["bpa"]),
            ]
        )
    )


def deconvolve_list(
    dirty_list, psf_list, sensitivity_list=None, prefix: str = "", **kwargs
):
    """CLEAN a list of single-channel images (deconvolution.py:50-160 list
    API). Returns (component list, residual list)."""
    from .image_iterators import image_gather_channels, image_scatter_channels

    dirty = image_gather_channels(dirty_list)
    psf = image_gather_channels(psf_list)
    sensitivity = (
        image_gather_channels(sensitivity_list)
        if sensitivity_list is not None
        else None
    )
    comp, residual = deconvolve_cube(
        dirty, psf, sensitivity=sensitivity, prefix=prefix, **kwargs
    )
    return (
        image_scatter_channels(comp),
        image_scatter_channels(residual),
    )


def restore_list(
    model_list, psf_list=None, residual_list=None, clean_beam=None
):
    """Restore a list of single-channel images
    (deconvolution.py:949-1045 list API)."""
    from .image_iterators import image_gather_channels, image_scatter_channels

    model = image_gather_channels(model_list)
    psf = image_gather_channels(psf_list) if psf_list is not None else None
    residual = (
        image_gather_channels(residual_list)
        if residual_list is not None
        else None
    )
    restored = restore_cube(
        model, psf=psf, residual=residual, clean_beam=clean_beam
    )
    return image_scatter_channels(restored)


def radler_deconvolve_list(dirty_list, psf_list, **kwargs):
    """API-parity shim for the reference's optional C++ radler backend
    (deconvolution.py:163-262): serves the same algorithm names with the
    framework's own kernels (radler 'multiscale' -> msclean; otherwise
    hogbom-family)."""
    algorithm = kwargs.pop("algorithm", "multiscale")
    mapping = {
        "multiscale": "msclean",
        "msclean": "msclean",
        "hogbom": "hogbom",
        "generic_clean": "hogbom",
        "iuwt": "msclean",
        "more_sane": "msclean",
    }
    comp_list, _ = deconvolve_list(
        dirty_list, psf_list, algorithm=mapping.get(algorithm, "msclean"),
        **kwargs,
    )
    return comp_list


# ---------------------------------------------------------------------------
# reference-named list-API kernels (deconvolution.py:265-948). The cube
# drivers above batch channels on device; these wrappers keep the
# reference's [chan]-list calling convention for pipeline compatibility.
# ---------------------------------------------------------------------------


def check_psf_peak(psf_list):
    """Assert every PSF in the list has unit peak
    (deconvolution.py:265-279)."""
    for ipsf, psf in enumerate(psf_list):
        pmax = float(jnp.max(psf.pixels))
        if abs(pmax - 1.0) > 1e-6:
            raise ValueError(
                f"check_psf_peak: PSF {ipsf} does not have unit peak "
                f"{pmax}"
            )
    return True


def find_window_list(dirty_list, prefix="", window_shape=None, **kwargs):
    """Clean windows for a list of dirty images
    (deconvolution.py:282-350)."""
    return [
        find_window(d, window_shape=window_shape, **kwargs)
        for d in dirty_list
    ]


def bound_psf_list(dirty_list, prefix="", psf_list=None, psf_support=None):
    """Crop each PSF in a list to +/- psf_support pixels
    (deconvolution.py:352-392)."""
    return [
        bound_psf(d, p, psf_support=psf_support)
        for d, p in zip(dirty_list, psf_list)
    ]


def _kernel_list(algorithm, dirty_list, psf_list, window_list, 
                 sensitivity_list=None, prefix="", **kwargs):
    if window_list is not None:
        kwargs = dict(kwargs)
        w0 = window_list[0]
        kwargs.setdefault("mask", getattr(w0, "pixels", w0))
    kwargs.pop("algorithm", None)
    return deconvolve_list(
        dirty_list, psf_list, sensitivity_list=sensitivity_list,
        prefix=prefix, algorithm=algorithm, **kwargs,
    )


def hogbom_kernel_list(
    dirty_list, prefix, psf_list, window_list=None, **kwargs
):
    """Hogbom CLEAN over a channel list (deconvolution.py:543-642)."""
    return _kernel_list(
        "hogbom", dirty_list, psf_list, window_list, prefix=prefix,
        **kwargs,
    )


def complex_hogbom_kernel_list(
    dirty_list, psf_list, window_list=None, **kwargs
):
    """Complex Hogbom CLEAN of stokesIQUV channel lists
    (deconvolution.py:394-511)."""
    return _kernel_list(
        "hogbom-complex", dirty_list, psf_list, window_list, **kwargs
    )


def msclean_kernel_list(
    dirty_list, prefix, psf_list, window_list=None,
    sensitivity_list=None, **kwargs,
):
    """MultiScale CLEAN over a channel list (deconvolution.py:827-946)."""
    return _kernel_list(
        "msclean", dirty_list, psf_list, window_list,
        sensitivity_list=sensitivity_list, prefix=prefix, **kwargs,
    )


def mmclean_kernel_list(
    dirty_list, prefix, psf_list, window_list=None,
    sensitivity_list=None, **kwargs,
):
    """MultiScale Multi-Frequency CLEAN over a channel list
    (deconvolution.py:645-824)."""
    return _kernel_list(
        "mmclean", dirty_list, psf_list, window_list,
        sensitivity_list=sensitivity_list, prefix=prefix, **kwargs,
    )
