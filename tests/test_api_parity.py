"""API parity with the reference: every public symbol of
ska_sdp_func_python has a same-named equivalent here, and the new
reference-named helpers behave like their reference counterparts."""

import ast
import os

import numpy as np
import jax.numpy as jnp
import pytest

import ska_sdp_func_python_tpu as pkg

REF = "/root/reference/src/ska_sdp_func_python"


def _reference_symbols():
    syms = []
    for root, _dirs, files in os.walk(REF):
        for f in files:
            if not f.endswith(".py") or f == "__init__.py":
                continue
            p = os.path.join(root, f)
            tree = ast.parse(open(p).read())
            for n in tree.body:
                if isinstance(
                    n, (ast.FunctionDef, ast.ClassDef)
                ) and not n.name.startswith("_"):
                    syms.append((os.path.relpath(p, REF), n.name))
    return syms


def _our_namespace():
    names = set()
    stack = [pkg]
    seen = set()
    while stack:
        mod = stack.pop()
        if id(mod) in seen:
            continue
        seen.add(id(mod))
        for k in dir(mod):
            if k.startswith("_"):
                continue
            names.add(k)
            v = getattr(mod, k)
            if (
                getattr(v, "__name__", "").startswith(
                    "ska_sdp_func_python_tpu"
                )
                and hasattr(v, "__path__")  # subpackage
            ):
                stack.append(v)
    import ska_sdp_func_python_tpu.ops as ops
    import ska_sdp_func_python_tpu.utils.coordinates as coords
    import ska_sdp_func_python_tpu.pipeline as pipeline

    for mod in (ops, coords, pipeline):
        names.update(k for k in dir(mod) if not k.startswith("_"))
    return names


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_every_reference_symbol_has_equivalent():
    ours = _our_namespace()
    missing = [
        f"{f}:{n}" for f, n in _reference_symbols() if n not in ours
    ]
    assert not missing, f"missing equivalents: {missing}"


# ---------------------------------------------------------------------------
# behaviour of the reference-named helpers
# ---------------------------------------------------------------------------


def test_spheroidal_function_matches_grdsf_core(rng):
    from ska_sdp_func_python_tpu.ops import spheroidal_function, grdsf

    nu = jnp.asarray(rng.uniform(0, 1, 64))
    v1 = np.asarray(spheroidal_function(nu))
    v2 = np.asarray(grdsf(nu)[0])
    np.testing.assert_allclose(v1, v2, atol=1e-12)
    assert float(spheroidal_function(jnp.asarray(1.5))) == 0.0


def test_find_max_abs_stack_and_argmax(rng):
    from ska_sdp_func_python_tpu.ops import argmax, find_max_abs_stack

    a = rng.normal(size=(3, 16, 16))
    coupling = np.diag(rng.uniform(0.5, 2.0, 3))
    scaled = a / np.diag(coupling)[:, None, None]
    es, ey, ex = np.unravel_index(
        np.argmax(np.abs(scaled)), scaled.shape
    )
    x, y, s = find_max_abs_stack(jnp.asarray(a), None, None, coupling)
    assert (int(s), int(x), int(y)) == (es, ey, ex)
    iy, ix = argmax(jnp.asarray(a[0]))
    ey2, ex2 = np.unravel_index(np.argmax(a[0]), a[0].shape)
    assert (int(iy), int(ix)) == (ey2, ex2)


def test_overlap_indices_inner_and_edge():
    from ska_sdp_func_python_tpu.ops import overlapIndices

    res = np.zeros((64, 64))
    psf = np.zeros((16, 16))
    (rl0, ru0, rl1, ru1), (pl0, pu0, pl1, pu1) = overlapIndices(
        res, psf, 32, 40
    )
    assert (ru0 - rl0, ru1 - rl1) == (pu0 - pl0, pu1 - pl1)
    assert (rl0, ru0, rl1, ru1) == (24, 40, 32, 48)
    # near the edge the overlap shrinks symmetrically
    (rl0, ru0, rl1, ru1), (pl0, pu0, pl1, pu1) = overlapIndices(
        res, psf, 2, 2
    )
    assert rl0 == 0 and rl1 == 0
    assert (ru0 - rl0, ru1 - rl1) == (pu0 - pl0, pu1 - pl1)


def test_msmfs_helper_roundtrip(rng):
    """principal solution + update helpers are self-consistent with the
    reference algebra on random inputs."""
    from ska_sdp_func_python_tpu.ops import (
        calculate_scale_moment_principal_solution,
        find_global_optimum,
        find_optimum_scale_zero_moment,
        update_moment_model,
        update_scale_moment_residual,
    )

    ns, nm, ny, nx = 2, 2, 16, 16
    smres = jnp.asarray(rng.normal(size=(ns, nm, ny, nx)))
    hs = np.stack([np.eye(nm) + 0.1 * np.ones((nm, nm))] * ns)
    ihs = np.linalg.inv(hs)
    smpsol = calculate_scale_moment_principal_solution(smres, ihs)
    expect = np.einsum("smn,smxy->snxy", ihs, np.asarray(smres))
    np.testing.assert_allclose(np.asarray(smpsol), expect, atol=1e-10)

    mx, my, mscale = find_optimum_scale_zero_moment(smpsol, None, None)
    es, ey, ex = np.unravel_index(
        np.argmax(np.abs(expect[:, 0])), expect[:, 0].shape
    )
    assert int(mscale) == es
    ms2, mx2, my2, mval = find_global_optimum(
        hs, ihs, smres, None, None, "Algorithm1"
    )
    assert int(ms2) == es and int(mx2) == ey and int(my2) == ex
    np.testing.assert_allclose(
        np.asarray(mval), expect[es, :, ey, ex], atol=1e-10
    )

    ssmmpsf = jnp.asarray(rng.normal(size=(ns, ns, nm, nm, ny, nx)))
    lhs, rhs = (4, 12, 2, 10), (5, 13, 3, 11)
    upd = update_scale_moment_residual(
        smres, ssmmpsf, lhs, rhs, 0.7, 1, mval
    )
    patch = np.einsum(
        "stqxy,q->stxy",
        np.asarray(ssmmpsf)[1, :, :, :, 5:13, 3:11],
        np.asarray(mval),
    )
    expect_upd = np.asarray(smres).copy()
    expect_upd[:, :, 4:12, 2:10] -= 0.7 * patch
    np.testing.assert_allclose(np.asarray(upd), expect_upd, atol=1e-10)

    scalestack = jnp.asarray(rng.normal(size=(ns, ny, nx)))
    model = jnp.zeros((nm, ny, nx))
    out = update_moment_model(model, scalestack, lhs, rhs, 0.7, 1, mval)
    expect_m = np.zeros((nm, ny, nx))
    blob = np.asarray(scalestack)[1, 5:13, 3:11]
    for t in range(nm):
        expect_m[t, 4:12, 2:10] += 0.7 * float(mval[t]) * blob
    np.testing.assert_allclose(np.asarray(out), expect_m, atol=1e-10)


def test_skycomponent_taylor_roundtrips(rng):
    from ska_sdp_func_python_tpu.models import SkyComponents
    from ska_sdp_func_python_tpu.ops import (
        calculate_skycomponent_list_taylor_terms,
        gather_skycomponents_from_channels,
        interpolate_skycomponents_frequency,
        transpose_skycomponents_to_channels,
    )

    nchan = 6
    freq = 1e8 + 1e6 * np.arange(nchan)
    x = (freq - freq[nchan // 2]) / freq[nchan // 2]
    # flux exactly polynomial of degree 2 -> degree-2 smooth is lossless
    coeffs = rng.normal(size=(3, 2))  # 2 comps
    flux = np.stack(
        [np.polyval(coeffs[::-1, k], x) for k in range(2)]
    )[..., None]
    sc = SkyComponents.from_lists(
        rng.uniform(-0.1, 0.1, (2, 2)), flux, freq
    )
    sm = interpolate_skycomponents_frequency(sc, nmoment=3)
    np.testing.assert_allclose(
        np.asarray(sm.flux), np.asarray(sc.flux), atol=1e-8
    )
    # taylor terms evaluated back on the frequency grid reproduce flux
    tt = calculate_skycomponent_list_taylor_terms(sc, nmoment=3)
    vand = x[:, None] ** np.arange(3)[None, :]
    recon = np.einsum("cm,kmp->kcp", vand, np.asarray(tt.flux))
    np.testing.assert_allclose(recon, np.asarray(sc.flux), atol=1e-8)
    # transpose/gather roundtrip
    per_chan = transpose_skycomponents_to_channels(sc)
    assert len(per_chan) == nchan and per_chan[0].flux.shape[1] == 1
    back = gather_skycomponents_from_channels(per_chan)
    np.testing.assert_allclose(
        np.asarray(back.flux), np.asarray(sc.flux), atol=0
    )


def test_image_list_taylor_matches_cube(rng):
    from ska_sdp_func_python_tpu.models import create_image
    from ska_sdp_func_python_tpu.ops import (
        calculate_frequency_taylor_terms_from_image,
        calculate_frequency_taylor_terms_from_image_list,
        calculate_image_frequency_moments,
        calculate_image_list_frequency_moments,
        image_scatter_channels,
    )

    nchan, npix = 4, 32
    freq = 1e8 + 1e6 * np.arange(nchan)
    cube = create_image(
        npixel=npix, cellsize=1e-4, phasecentre=(0.0, -0.6),
        frequency=freq,
    )
    cube = cube.replace(
        pixels=jnp.asarray(rng.normal(size=cube.pixels.shape))
    )
    im_list = image_scatter_channels(cube)
    m_cube = calculate_image_frequency_moments(cube, nmoment=2)
    m_list = calculate_image_list_frequency_moments(im_list, nmoment=2)
    np.testing.assert_allclose(
        np.asarray(m_list.pixels), np.asarray(m_cube.pixels), atol=1e-8
    )
    t_cube = calculate_frequency_taylor_terms_from_image(cube, nmoment=2)
    t_list = calculate_frequency_taylor_terms_from_image_list(
        im_list, nmoment=2
    )
    assert len(t_list) == 2
    for m in range(2):
        np.testing.assert_allclose(
            np.asarray(t_list[m].pixels[0]),
            np.asarray(t_cube.pixels[m]),
            atol=1e-8,
        )


def test_kernel_list_wrappers_match_cube(rng):
    from ska_sdp_func_python_tpu.models import create_image
    from ska_sdp_func_python_tpu.ops import (
        check_psf_peak,
        deconvolve_cube,
        hogbom_kernel_list,
        image_scatter_channels,
    )

    npix = 64
    freq = np.array([1e8, 1.1e8])
    dirty = create_image(
        npixel=npix, cellsize=1e-4, phasecentre=(0.0, -0.6),
        frequency=freq,
    )
    psf = dirty.replace(
        pixels=jnp.zeros_like(dirty.pixels)
        .at[:, :, npix // 2, npix // 2].set(1.0)
        .at[:, :, npix // 2, npix // 2 + 1].set(0.4)
    )
    dirty = dirty.replace(
        pixels=jnp.zeros_like(dirty.pixels)
        .at[:, :, 40, 24].set(1.0)
        .at[:, :, 40, 25].set(0.4)
    )
    assert check_psf_peak(image_scatter_channels(psf))
    comp_list, res_list = hogbom_kernel_list(
        image_scatter_channels(dirty), "", image_scatter_channels(psf),
        niter=20, gain=0.2,
    )
    comp_cube, res_cube = deconvolve_cube(
        dirty, psf, algorithm="hogbom", niter=20, gain=0.2
    )
    np.testing.assert_allclose(
        np.asarray(comp_list[0].pixels),
        np.asarray(comp_cube.pixels[:1]),
        atol=1e-6,
    )


def test_spatial_mapping_roundtrip(rng):
    from ska_sdp_func_python_tpu.models import create_image
    from ska_sdp_func_python_tpu.ops import (
        create_griddata_from_image,
        create_pswf_convolutionfunction,
        spatial_mapping,
    )

    npix = 128
    im = create_image(
        npixel=npix, cellsize=1e-3, phasecentre=(0.0, -0.6),
        frequency=np.array([1e8]),
    )
    gd = create_griddata_from_image(im)
    n = 200
    u = jnp.asarray(rng.uniform(-400, 400, n))
    v = jnp.asarray(rng.uniform(-400, 400, n))
    w = jnp.asarray(rng.uniform(-20, 20, n))
    pu, pv, puc, pvc = spatial_mapping(gd, u, v, w)
    scale = npix * im.cellsize
    np.testing.assert_array_equal(
        np.asarray(pu), np.round(-np.asarray(u) * scale + npix // 2)
    )
    # conjugate point mirrors about the grid centre
    np.testing.assert_array_equal(
        np.asarray(pu) + np.asarray(puc), np.full(n, npix)
    )
    cf = create_pswf_convolutionfunction(support=8, oversampling=16, nw=4)
    iu, fu, iv, fv, pw, pwf = spatial_mapping(
        gd, u, v, w, cf=cf, nw=4, wstep=10.0
    )
    assert int(jnp.max(fu)) < 16 and int(jnp.min(fu)) >= 0
    assert int(jnp.max(pw)) <= 3 and int(jnp.min(pw)) >= 0
    # fractional offset reconstructs the pixel coordinate
    u_pix = -np.asarray(u) * scale + npix // 2
    rec = np.asarray(iu) + np.asarray(fu) / 16.0
    np.testing.assert_allclose(rec, u_pix, atol=1.0 / 16.0 + 1e-6)


def test_matches_and_neighbours(rng):
    from ska_sdp_func_python_tpu.models import SkyComponents
    from ska_sdp_func_python_tpu.ops import (
        find_skycomponent_matches_atomic,
        select_neighbouring_components,
    )

    base = rng.uniform(-0.2, 0.2, (5, 2))
    ref = SkyComponents.from_lists(
        base, np.ones((5, 1, 1)), np.array([1e8])
    )
    test = SkyComponents.from_lists(
        base[[2, 0]] + 1e-9, np.ones((2, 1, 1)), np.array([1e8])
    )
    matches = find_skycomponent_matches_atomic(test, ref, tol=1e-6)
    assert [(t, r) for t, r, _ in matches] == [(0, 2), (1, 0)]
    idx, seps = select_neighbouring_components(test, ref)
    assert list(np.asarray(idx)) == [2, 0]
    assert float(jnp.max(seps)) < 1e-6


def test_backend_entry_aliases(rng):
    """invert_ng/predict_ng (and wg) reproduce the context-dispatch path."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from simul import make_visibility
    from ska_sdp_func_python_tpu.ops import (
        create_image_from_visibility,
        dp3_gaincal,
        invert_ng,
        invert_visibility,
        predict_ng,
    )

    vis = make_visibility(nants=6, ntimes=2, nchan=1, rmax=200.0)
    vis = vis.replace(
        vis=jnp.asarray(
            rng.normal(size=vis.vis.shape)
            + 1j * rng.normal(size=vis.vis.shape)
        ).astype(vis.vis.dtype)
    )
    model = create_image_from_visibility(vis, npixel=64, nchan=1)
    d1, s1 = invert_ng(vis, model, nw=2)
    d2, s2 = invert_visibility(vis, model, context="ng", nw=2)
    np.testing.assert_allclose(
        np.asarray(d1.pixels), np.asarray(d2.pixels), atol=1e-10
    )
    p1 = predict_ng(vis, d1, nw=2)
    assert p1.vis.shape == vis.vis.shape
    cal = dp3_gaincal(vis, "T", True)
    assert cal.vis.shape == vis.vis.shape
