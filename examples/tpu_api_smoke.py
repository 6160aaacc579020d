"""One-pass smoke of the public API on the real accelerator.

Exercises every major public entry point once with small shapes, verifying
the library is axon-tunnel safe end to end (no complex host<->device
transfers, no unimplemented eager ops). Prints PASS/FAIL per group.
"""

import sys
import traceback

import numpy as np

sys.path.insert(0, ".")


def group(name):
    def deco(fn):
        def run():
            try:
                fn()
                print(f"PASS {name}")
            except Exception:
                print(f"FAIL {name}")
                tb = traceback.format_exc()
                print("  " + "\n  ".join(
                    [l for l in tb.split("\n") if "/root/repo" in l][-2:]
                ))
                print("  " + tb.strip().split("\n")[-1][:120])
        return run
    return deco


def main():
    import jax
    import jax.numpy as jnp

    from ska_sdp_func_python_tpu.config import expi
    from ska_sdp_func_python_tpu.models import (
        SkyComponents,
        SkyModel,
        create_gaintable_from_visibility,
        create_named_configuration,
        create_visibility,
    )
    import ska_sdp_func_python_tpu.ops as ops

    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(1)
    cfg = create_named_configuration("LOW", rmax=300.0)
    vis = create_visibility(cfg, np.linspace(-0.05, 0.05, 2), [1.2e8, 1.21e8])
    model = ops.create_image_from_visibility(vis, npixel=128, nchan=1)
    ra, dec = model.pixel_to_radec(70, 60)
    comps = SkyComponents.from_lists(
        [[float(ra), float(dec)]], [[[1.0], [1.0]]], vis.frequency
    )
    vis = ops.dft_skycomponent_visibility(vis, comps)

    checks = []

    @group("calibration: solve/apply/chain/gaincal")
    def c1():
        gt = create_gaintable_from_visibility(vis, jones_type="T")
        gt = gt.replace(gain=jnp.broadcast_to(
            expi(jnp.asarray(rng.normal(0, 0.2, gt.gain.shape[:3])))[..., None, None],
            gt.gain.shape))
        corrupted = ops.apply_gaintable(vis, gt)
        sol = ops.solve_gaintable(corrupted, vis, phase_only=True)
        float(np.asarray(sol.residual).max())
        cvis, gts = ops.calibrate_chain(corrupted, vis, calibration_context="T")
        float(np.asarray(jnp.abs(cvis.vis)).max())
        out = ops.gaincal(corrupted, vis, calibration_context="T")
        float(np.asarray(jnp.abs(out.vis)).max())
    checks.append(c1)

    @group("imaging: weight/invert/predict/psf/advise")
    def c2():
        wvis = ops.weight_visibility(vis, model, weighting="robust")
        dirty, swt = ops.invert_visibility(wvis, model, context="ng")
        float(np.asarray(dirty.pixels).max())
        psf, _ = ops.invert_visibility(wvis, model, dopsf=True, context="2d")
        float(np.asarray(psf.pixels).max())
        pred = ops.predict_visibility(vis, dirty, context="ng")
        float(np.asarray(jnp.abs(pred.vis)).max())
        ops.advise_wide_field(vis)
    checks.append(c2)

    @group("awprojection + griddata API")
    def c3():
        dirty, _ = ops.invert_visibility(vis, model, context="awprojection")
        float(np.asarray(dirty.pixels).max())
        gd = ops.create_griddata_from_image(model)
        gd, swt = ops.grid_visibility_weight_to_griddata(vis, gd)
        rv = ops.griddata_visibility_reweight(vis, gd, weighting="uniform")
        float(np.asarray(rv.imaging_weight).max())
    checks.append(c3)

    @group("deconvolution: hogbom/msclean/restore/fit_psf")
    def c4():
        dirty, _ = ops.invert_visibility(vis, model, context="2d")
        psf, _ = ops.invert_visibility(vis, model, dopsf=True, context="2d")
        comp, res = ops.deconvolve_cube(
            dirty, psf, algorithm="hogbom", niter=50, gain=0.2)
        float(np.asarray(res.pixels).max())
        comp2, res2 = ops.deconvolve_cube(
            dirty, psf, algorithm="msclean", niter=20, scales=[0, 3])
        restored = ops.restore_cube(comp, psf=psf, residual=res)
        float(np.asarray(restored.pixels).max())
    checks.append(c4)

    @group("visibility ops: phaserotate/convert/integrate")
    def c5():
        r = ops.phaserotate_visibility(vis, (0.01, np.deg2rad(-34.9)))
        float(np.asarray(jnp.abs(r.vis)).max())
        i = ops.integrate_visibility_by_channel(vis)
        float(np.asarray(jnp.abs(i.vis)).max())
        s = ops.subtract_visibility(vis, vis)
        float(np.asarray(jnp.abs(s.vis)).max())
    checks.append(c5)

    @group("sky components: insert/find/beam/taylor")
    def c6():
        im = ops.insert_skycomponent(model, comps, insert_method="Lanczos")
        found = ops.find_skycomponents(im, threshold=0.1, npixels=1)
        assert found.ncomp >= 1
        b = ops.apply_beam_to_skycomponent(comps, model.replace(
            pixels=0.5 * jnp.ones_like(model.pixels)))
        float(np.asarray(b.flux).max())
        t = ops.calculate_skycomponent_taylor_terms(comps, nmoment=2)
        float(np.asarray(t).max())
    checks.append(c6)

    @group("skymodel predict/invert")
    def c7():
        sm = SkyModel(image=model, components=comps, gaintable=None, mask=None)
        pred = ops.skymodel_predict_calibrate(vis, sm, context="2d")
        float(np.asarray(jnp.abs(pred.vis)).max())
        dirty, swt = ops.skymodel_calibrate_invert(vis, sm, context="2d")
        float(np.asarray(dirty.pixels).max())
    checks.append(c7)

    for c in checks:
        c()


if __name__ == "__main__":
    main()
