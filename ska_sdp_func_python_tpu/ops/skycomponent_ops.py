"""Sky-component operations (framework L3, C24/C25).

TPU-first redesign of /root/reference/src/ska_sdp_func_python/sky_component/
operations.py and taylor_terms.py. The reference loops per-component python
objects; here components are a batched ``SkyComponents`` pytree, so beam
application, insertion and matching are vectorised. Catalogue-style algebra
(matching, Voronoi partitioning, source finding, fits) is host-side numpy /
scipy — it is setup, not hot path (reference delegates to astropy/photutils
there too).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..models.components import SkyComponents
from ..models.image import Image
from ..utils.arrays import (
    insert_array,
    insert_function_L,
    insert_function_pswf,
    insert_function_sinc,
)
from .gain_ops import apply_jones
from .image_ops import convert_clean_beam_to_pixels

log = logging.getLogger("ska-sdp-func-python-tpu")

__all__ = [
    "apply_beam_to_skycomponent",
    "apply_voltage_pattern_to_skycomponent",
    "filter_skycomponents_by_flux",
    "find_nearest_skycomponent_index",
    "find_nearest_skycomponent",
    "find_separation_skycomponents",
    "find_skycomponent_matches",
    "select_components_by_separation",
    "remove_neighbouring_components",
    "find_skycomponents",
    "insert_skycomponent",
    "restore_skycomponent",
    "voronoi_decomposition",
    "image_voronoi_iter",
    "partition_skycomponent_neighbours",
    "fit_skycomponent",
    "fit_skycomponent_spectral_index",
    "calculate_skycomponent_taylor_terms",
]


def _component_pixels(sc: SkyComponents, im: Image):
    """Fractional pixel positions [ncomp] (ix, iy) of components in im."""
    ix, iy = im.radec_to_pixel(sc.direction[:, 0], sc.direction[:, 1])
    return ix, iy


def apply_beam_to_skycomponent(
    sc: SkyComponents, beam: Image, inverse: bool = False
) -> SkyComponents:
    """Scale component fluxes by the beam value at their position
    (sky_component/operations.py:366-448). Out-of-image components get zero
    flux."""
    ix, iy = _component_pixels(sc, beam)
    x = jnp.round(ix).astype(jnp.int32)
    y = jnp.round(iy).astype(jnp.int32)
    ny, nx = beam.pixels.shape[-2:]
    ok = (x >= 0) & (x < nx) & (y >= 0) & (y < ny)
    xc = jnp.clip(x, 0, nx - 1)
    yc = jnp.clip(y, 0, ny - 1)
    bvals = jnp.moveaxis(beam.pixels[:, :, yc, xc], -1, 0)  # [ncomp, nc, np]
    bvals = jnp.real(bvals)
    if inverse:
        nonzero = jnp.all(bvals != 0.0, axis=(1, 2))[:, None, None]
        scaled = jnp.where(
            nonzero, sc.flux / jnp.where(bvals != 0.0, bvals, 1.0),
            sc.flux * bvals,
        )
    else:
        scaled = sc.flux * bvals
    flux = jnp.where(ok[:, None, None], scaled, 0.0)
    return sc.replace(flux=flux)


def apply_voltage_pattern_to_skycomponent(
    sc: SkyComponents, vp: Image, inverse: bool = False
) -> SkyComponents:
    """Apply a voltage-pattern Jones matrix per component
    (sky_component/operations.py:448-563): flux' = E flux_22 E^H."""
    ix, iy = _component_pixels(sc, vp)
    x = jnp.clip(jnp.round(ix).astype(jnp.int32), 0, vp.pixels.shape[-1] - 1)
    y = jnp.clip(jnp.round(iy).astype(jnp.int32), 0, vp.pixels.shape[-2] - 1)
    # vp pixels are complex [nchan, 4, ny, nx] -> per-comp Jones [c, f, 2, 2]
    ej = jnp.moveaxis(vp.pixels[:, :, y, x], -1, 0)
    ncomp, nchan = ej.shape[0], ej.shape[1]
    ej22 = ej.reshape(ncomp, nchan, 2, 2)
    flux22 = sc.flux.reshape(ncomp, sc.nchan, 2, 2).astype(ej22.dtype)
    out = apply_jones(ej22, flux22, inverse=inverse)
    return sc.replace(flux=jnp.real(out.reshape(sc.flux.shape)))


def filter_skycomponents_by_flux(
    sc: SkyComponents, flux_min: float = -np.inf, flux_max: float = np.inf
) -> SkyComponents:
    """Keep components whose max Stokes-I flux lies in [flux_min, flux_max]
    (sky_component/operations.py:565-581). Host-side (changes batch size)."""
    fmax = np.asarray(jnp.max(sc.flux[:, :, 0], axis=1))
    keep = np.where((fmax > flux_min) & (fmax < flux_max))[0]
    return sc.select(keep)


def _angular_separation(d1, d2):
    """Great-circle separation [rad] between [..,2] (ra,dec) arrays."""
    ra1, dec1 = d1[..., 0], d1[..., 1]
    ra2, dec2 = d2[..., 0], d2[..., 1]
    sin_d = np.sin((dec2 - dec1) / 2) ** 2
    sin_r = np.sin((ra2 - ra1) / 2) ** 2
    h = sin_d + np.cos(dec1) * np.cos(dec2) * sin_r
    return 2 * np.arcsin(np.minimum(1.0, np.sqrt(h)))


def find_separation_skycomponents(
    comps_test: SkyComponents, comps_ref: SkyComponents = None
):
    """Pairwise separation matrix [ntest, nref]
    (sky_component/operations.py:105-135)."""
    if comps_ref is None:
        comps_ref = comps_test
    d1 = np.asarray(comps_test.direction)[:, None, :]
    d2 = np.asarray(comps_ref.direction)[None, :, :]
    return _angular_separation(d1, d2)


def find_nearest_skycomponent_index(home, comps: SkyComponents) -> int:
    """(sky_component/operations.py:65-83)."""
    home = np.asarray(home)[None, :]
    seps = _angular_separation(home, np.asarray(comps.direction))
    return int(np.argmin(seps))


def find_nearest_skycomponent(home, comps: SkyComponents):
    """Returns (index, separation rad)
    (sky_component/operations.py:86-102)."""
    idx = find_nearest_skycomponent_index(home, comps)
    sep = _angular_separation(
        np.asarray(home), np.asarray(comps.direction)[idx]
    )
    return idx, float(sep)


def find_skycomponent_matches(
    comps_test: SkyComponents, comps_ref: SkyComponents, tol: float = 1e-7
):
    """List of (itest, iref, separation) matches within tol
    (sky_component/operations.py:138-182)."""
    seps = find_separation_skycomponents(comps_test, comps_ref)
    matches = []
    for itest in range(seps.shape[0]):
        iref = int(np.argmin(seps[itest]))
        if seps[itest, iref] < tol:
            matches.append((itest, iref, float(seps[itest, iref])))
    return matches


def select_components_by_separation(
    home, comps: SkyComponents, rmax: float = 2 * np.pi, rmin: float = 0.0
) -> SkyComponents:
    """(sky_component/operations.py:185-210)."""
    seps = _angular_separation(
        np.asarray(home)[None, :], np.asarray(comps.direction)
    )
    keep = np.where((seps >= rmin) & (seps <= rmax))[0]
    return comps.select(keep)


def remove_neighbouring_components(comps: SkyComponents, distance: float):
    """Keep the brightest of any pair closer than ``distance`` rad
    (sky_component/operations.py:213-253). Returns (kept indices, comps)."""
    ncomp = comps.ncomp
    seps = find_separation_skycomponents(comps)
    fluxes = np.asarray(jnp.sum(comps.flux[:, :, 0], axis=1))
    keep = np.ones(ncomp, dtype=bool)
    for i in range(ncomp):
        if not keep[i]:
            continue
        for j in range(i + 1, ncomp):
            if keep[j] and seps[i, j] < distance:
                if fluxes[i] >= fluxes[j]:
                    keep[j] = False
                else:
                    keep[i] = False
                    break
    idx = np.where(keep)[0]
    return list(idx), comps.select(idx)


def _deblend_island(det, mask, npixels, nlevels, contrast):
    """photutils-style multi-threshold deblending of one island.

    Re-segments the island at ``nlevels`` exponentially-spaced
    thresholds between its floor and peak; the level producing the most
    children that each hold >= ``npixels`` pixels and >= ``contrast``
    of the island flux defines watershed markers, and every island
    pixel is assigned to its marker basin (photutils
    ``deblend_sources`` semantics — beyond the reference, whose
    ``detect_sources`` keeps blended islands merged)."""
    from scipy import ndimage

    vals = det[mask]
    tot = float(vals.sum())
    tmin, tmax = float(vals.min()), float(vals.max())
    if tot <= 0 or tmax <= tmin:
        return [mask]
    f = (np.exp(np.linspace(0.0, 1.0, nlevels + 2)[1:-1]) - 1.0) / (
        np.e - 1.0
    )
    best = None
    for lev in tmin + (tmax - tmin) * f:
        lab, n = ndimage.label(mask & (det > lev))
        if n < 2:
            continue
        idx = np.arange(1, n + 1)
        sizes = ndimage.sum_labels(
            np.ones(det.shape, np.float64), lab, idx
        )
        flux = ndimage.sum_labels(det, lab, idx)
        ok = (sizes >= npixels) & (flux / tot >= contrast)
        if int(ok.sum()) >= 2 and (
            best is None or int(ok.sum()) > best[1]
        ):
            markers = np.where(np.isin(lab, idx[ok]), lab, 0)
            best = (markers, int(ok.sum()))
    if best is None:
        return [mask]
    markers = best[0].astype(np.int32)
    # watershed over inverted intensity: basins flood outward from the
    # child peaks; outside-island pixels are barriers
    inv = np.full(det.shape, 255, np.uint8)
    inv[mask] = np.clip(
        (tmax - det[mask]) * (254.0 / (tmax - tmin)), 0, 254
    ).astype(np.uint8)
    seeds = markers.copy()
    seeds[~mask] = -1
    ws = ndimage.watershed_ift(
        inv, seeds, structure=np.ones((3, 3), int)
    )
    out = []
    assigned = np.zeros(det.shape, bool)
    groups = np.unique(markers[markers > 0])
    for g in groups:
        m = mask & (ws == g)
        assigned |= m
        out.append(m)
    # island pixels the watershed left unassigned join the brightest
    # child (photutils attaches them to the nearest basin)
    rest = mask & ~assigned
    if rest.any() and out:
        peak = int(
            np.argmax([float(det[m].max()) if m.any() else -np.inf
                       for m in out])
        )
        out[peak] = out[peak] | rest
    return [m for m in out if m.sum() >= npixels] or [mask]


def find_skycomponents(
    im: Image,
    fwhm: float = 1.0,
    threshold: float = 1.0,
    npixels: int = 5,
    deblend: bool = False,
    nlevels: int = 32,
    contrast: float = 0.001,
) -> SkyComponents:
    """Segmentation-based source finding (sky_component/operations.py:
    256-363). Host-side scipy.ndimage labelling replaces photutils;
    ``deblend=True`` (opt-in) additionally splits blended islands by
    multi-threshold watershed (photutils ``deblend_sources`` semantics,
    which the reference's plain ``detect_sources`` lacks). The default
    ``False`` preserves reference parity: one component per island."""
    from scipy import ndimage

    pixels = np.asarray(im.pixels)
    # sum over channels/pols for detection (reference uses mean Stokes I)
    det = pixels.mean(axis=(0, 1))
    if fwhm > 0:
        det = ndimage.gaussian_filter(det, fwhm / np.sqrt(8 * np.log(2)))
    labels, nlab = ndimage.label(det > threshold)
    dirs, fluxes = [], []
    island_masks = []
    for lab in range(1, nlab + 1):
        mask = labels == lab
        if mask.sum() < npixels:
            continue
        if deblend:
            island_masks.extend(
                _deblend_island(det, mask, npixels, nlevels, contrast)
            )
        else:
            island_masks.append(mask)
    for mask in island_masks:
        # flux-weighted centroid
        yy, xx = np.nonzero(mask)
        wts = det[yy, xx]
        cy = float(np.sum(yy * wts) / np.sum(wts))
        cx = float(np.sum(xx * wts) / np.sum(wts))
        ra, dec = im.pixel_to_radec(cx, cy)
        dirs.append([float(ra), float(dec)])
        # per-chan/pol summed flux over the island
        fluxes.append(pixels[:, :, yy, xx].sum(axis=-1))
    if not dirs:
        return SkyComponents.from_lists(
            np.zeros((0, 2)),
            np.zeros((0, im.nchan, im.npol)),
            np.asarray(im.frequency),
            polarisation_frame=im.polarisation_frame,
        )
    return SkyComponents.from_lists(
        np.asarray(dirs),
        np.stack(fluxes),
        np.asarray(im.frequency),
        polarisation_frame=im.polarisation_frame,
    )


def insert_skycomponent(
    im: Image,
    sc: SkyComponents,
    insert_method: str = "Nearest",
    bandwidth: float = 1.0,
    support: int = 8,
) -> Image:
    """Insert components into an image
    (sky_component/operations.py:583-668)."""
    support = int(support / bandwidth)
    ix, iy = _component_pixels(sc, im)
    # host-f64 astrometry returns numpy positions; the fori_loop body
    # below indexes with a tracer, so move them on device here
    ix, iy = jnp.asarray(ix), jnp.asarray(iy)
    flux = sc.flux  # [ncomp, nchan, npol]
    if flux.shape[1] != im.nchan:
        if flux.shape[1] == 1:
            flux = jnp.broadcast_to(
                flux, (flux.shape[0], im.nchan, flux.shape[2])
            )
        else:
            flux = jax.vmap(
                lambda f: jax.vmap(
                    lambda fp: jnp.interp(im.frequency, sc.frequency, fp),
                    in_axes=1,
                    out_axes=1,
                )(f)
            )(flux)
    pixels = im.pixels
    if insert_method == "Nearest":
        x = jnp.round(ix).astype(jnp.int32)
        y = jnp.round(iy).astype(jnp.int32)
        ny, nx = pixels.shape[-2:]
        ok = (x >= 0) & (x < nx) & (y >= 0) & (y < ny)
        fl = jnp.where(ok[:, None, None], flux, 0.0)
        xc = jnp.clip(x, 0, nx - 1)
        yc = jnp.clip(y, 0, ny - 1)
        pixels = pixels.at[:, :, yc, xc].add(
            jnp.moveaxis(fl, 0, -1).astype(pixels.dtype)
        )
    else:
        fn = {
            "Lanczos": insert_function_L,
            "Sinc": insert_function_sinc,
            "PSWF": insert_function_pswf,
        }[insert_method]

        def body(i, px):
            return insert_array(
                px, ix[i], iy[i], flux[i], bandwidth, support, fn
            )

        pixels = jax.lax.fori_loop(0, sc.ncomp, body, pixels)
    return im.replace(pixels=pixels)


def restore_skycomponent(
    im: Image, sc: SkyComponents, clean_beam: dict = None
) -> Image:
    """Add clean-beam Gaussians at component positions
    (sky_component/operations.py:671-741)."""
    if clean_beam is None:
        clean_beam = {"bmaj": 1e-2, "bmin": 1e-2, "bpa": 0.0}
    sx, sy, th = convert_clean_beam_to_pixels(im, clean_beam)
    ix, iy = _component_pixels(sc, im)
    ny, nx = im.pixels.shape[-2:]
    yy = jnp.arange(ny)[:, None]
    xx = jnp.arange(nx)[None, :]
    ct, st = np.cos(th), np.sin(th)
    a = ct**2 / (2 * sx**2) + st**2 / (2 * sy**2)
    b = st * ct * (1 / (2 * sx**2) - 1 / (2 * sy**2))
    c = st**2 / (2 * sx**2) + ct**2 / (2 * sy**2)
    flux = sc.flux
    if flux.shape[1] != im.nchan and flux.shape[1] == 1:
        flux = jnp.broadcast_to(flux, (flux.shape[0], im.nchan, flux.shape[2]))
    elif flux.shape[1] != im.nchan and im.nchan == 1:
        # multi-channel components restored onto an MFS image: the MFS
        # dirty image is the channel-mean, so restore the channel-mean
        # flux (matches continuum predict/invert normalisation)
        flux = jnp.mean(flux, axis=1, keepdims=True)

    def add_one(pixels, args):
        cx, cy, fl = args
        dx = xx - cx
        dy = yy - cy
        g = jnp.exp(-(a * dx**2 + 2 * b * dx * dy + c * dy**2))
        return (
            pixels
            + fl[:, :, None, None] * g[None, None, :, :].astype(pixels.dtype),
            None,
        )

    pixels, _ = jax.lax.scan(
        add_one, im.pixels, (ix, iy, flux.astype(im.pixels.dtype))
    )
    out = im.replace(pixels=pixels)
    return out.replace(
        clean_beam=jnp.asarray(
            [
                np.deg2rad(clean_beam["bmaj"]),
                np.deg2rad(clean_beam["bmin"]),
                np.deg2rad(clean_beam["bpa"]),
            ]
        )
    )


def voronoi_decomposition(im: Image, comps: SkyComponents):
    """Voronoi decomposition of an image by component positions
    (sky_component/operations.py:744-783). Returns (vertices array,
    label image [ny, nx] of nearest-component index)."""
    ix, iy = _component_pixels(comps, im)
    ix = np.asarray(ix)
    iy = np.asarray(iy)
    ny, nx = im.pixels.shape[-2:]
    yy, xx = np.mgrid[0:ny, 0:nx]
    d2 = (xx[None] - ix[:, None, None]) ** 2 + (
        yy[None] - iy[:, None, None]
    ) ** 2
    labels = np.argmin(d2, axis=0)
    points = np.stack([ix, iy], axis=-1)
    return points, labels


def image_voronoi_iter(im: Image, comps: SkyComponents):
    """Yield masked images, one per Voronoi cell
    (sky_component/operations.py:786-815)."""
    _, labels = voronoi_decomposition(im, comps)
    for i in range(comps.ncomp):
        mask = jnp.asarray((labels == i).astype(float))
        yield im.replace(pixels=im.pixels * mask[None, None, :, :])


def partition_skycomponent_neighbours(comps: SkyComponents, targets):
    """Partition components by nearest target direction
    (sky_component/operations.py:818-832)."""
    targets = np.asarray(targets).reshape(-1, 2)
    seps = _angular_separation(
        np.asarray(comps.direction)[:, None, :], targets[None, :, :]
    )
    owner = np.argmin(seps, axis=1)
    return [
        comps.select(np.where(owner == k)[0]) for k in range(len(targets))
    ]


def fit_skycomponent(im: Image, sc_guess, **kwargs) -> SkyComponents:
    """Fit a 2-D Gaussian at an approximate position
    (sky_component/operations.py:835-916). Host-side scipy."""
    from scipy.optimize import least_squares

    pixels = np.asarray(im.pixels[0, 0])
    if isinstance(sc_guess, SkyComponents):
        direction = np.asarray(sc_guess.direction[0])
    else:
        direction = np.asarray(sc_guess)
    ix, iy = im.radec_to_pixel(direction[0], direction[1])
    x0, y0 = float(ix), float(iy)
    ny, nx = pixels.shape
    half = 7
    xlo = int(np.clip(round(x0) - half, 0, nx - 2 * half))
    ylo = int(np.clip(round(y0) - half, 0, ny - 2 * half))
    z = pixels[ylo : ylo + 2 * half + 1, xlo : xlo + 2 * half + 1]
    yy, xx = np.mgrid[ylo : ylo + 2 * half + 1, xlo : xlo + 2 * half + 1]

    def gauss(p):
        amp, cx, cy, sx, sy = p
        return amp * np.exp(
            -((xx - cx) ** 2 / (2 * sx**2) + (yy - cy) ** 2 / (2 * sy**2))
        )

    p0 = [float(z.max()), x0, y0, 2.0, 2.0]
    sol = least_squares(lambda p: (gauss(p) - z).ravel(), p0)
    amp, cx, cy = sol.x[0], sol.x[1], sol.x[2]
    ra, dec = im.pixel_to_radec(cx, cy)
    flux = np.full((im.nchan, im.npol), amp)
    return SkyComponents.from_lists(
        [[float(ra), float(dec)]],
        flux[None],
        np.asarray(im.frequency),
        polarisation_frame=im.polarisation_frame,
    )


def fit_skycomponent_spectral_index(sc: SkyComponents):
    """Power-law spectral index per component from Stokes-I flux
    (sky_component/operations.py:919-943). Returns [ncomp] array."""
    freq = np.asarray(sc.frequency)
    flux = np.asarray(sc.flux[:, :, 0])
    if len(freq) < 2:
        return np.zeros(sc.ncomp)
    out = np.zeros(sc.ncomp)
    for i in range(sc.ncomp):
        good = flux[i] > 0
        if good.sum() < 2:
            out[i] = 0.0
            continue
        out[i] = np.polyfit(
            np.log(freq[good]), np.log(flux[i][good]), 1
        )[0]
    return out


def calculate_skycomponent_taylor_terms(
    sc: SkyComponents, nmoment: int = 1, reference_frequency=None
):
    """Per-component Taylor expansion of flux vs frequency
    (sky_component/taylor_terms.py:32-80). Returns [ncomp, nmoment, npol]."""
    from .taylor import moment_weights

    w = moment_weights(sc.frequency, reference_frequency, nmoment)
    pinv = jnp.linalg.pinv(w, rcond=1e-7)
    return jnp.einsum("mc,ncp->nmp", pinv.astype(sc.flux.dtype), sc.flux)


def find_skycomponent_matches_atomic(comps_test, comps_ref, tol=1e-7):
    """Brute-force (non-catalog) match of candidates to a reference set
    (sky_component/operations.py:129-153); many-to-one allowed.

    :return: list of (test index, ref index, separation rad)
    """
    seps = np.asarray(
        find_separation_skycomponents(comps_test, comps_ref)
    )  # [ntest, nref]
    matches = []
    for test in range(comps_test.ncomp):
        best = int(np.argmin(seps[test, :]))
        if seps[test, best] < tol:
            matches.append((test, best, float(seps[test, best])))
    return matches


def select_neighbouring_components(comps, target_comps):
    """Assign each component to its nearest target
    (sky_component/operations.py:205-225).

    :return: (indices into target_comps [ncomp], separations [ncomp] rad)
    """
    seps = find_separation_skycomponents(comps, target_comps)  # [ncomp, ntgt]
    idx = jnp.argmin(seps, axis=1)
    return idx, jnp.min(seps, axis=1)
