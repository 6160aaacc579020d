"""Scaling-efficiency harness (BASELINE config 5 infrastructure).

Measures distributed invert + gain solve wall time at 1/2/4/8 devices on
whatever mesh is available and reports efficiency relative to 1 device.
On this environment it runs on the virtual CPU mesh (one real TPU chip is
tunnelled), so the numbers validate the *harness and sharding*, not ICI
bandwidth; on a real pod slice the same script reports true scaling.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python bench_scaling.py
"""

import json
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, ".")
    import jax

    if jax.config.jax_platforms in (None, "", "axon,cpu"):
        # default to the virtual CPU mesh when only the tunnel chip exists
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ska_sdp_func_python_tpu.models import (
        SkyComponents,
        create_named_configuration,
        create_visibility,
    )
    from ska_sdp_func_python_tpu.ops import (
        create_image_from_visibility,
        dft_skycomponent_visibility,
    )
    from ska_sdp_func_python_tpu.parallel import (
        distributed_invert,
        distributed_solve_gaintable,
        make_mesh,
    )

    ndev_all = len(jax.devices())
    cfg = create_named_configuration("LOW", rmax=1000.0)
    vis = create_visibility(cfg, np.linspace(-0.1, 0.1, 4), [1.2e8])
    model = create_image_from_visibility(vis, npixel=256, nchan=1)
    comps = SkyComponents.from_lists(
        [[0.0, np.deg2rad(-35.0)]], [[[1.0]]], vis.frequency
    )
    vis = dft_skycomponent_visibility(vis, comps)
    print(
        f"# {cfg.nants} stations, "
        f"{vis.ntimes * vis.nbaselines / 1e3:.0f}k vis, devices={ndev_all}",
        file=sys.stderr,
    )

    results = {}
    sizes = [n for n in (1, 2, 4, 8) if n <= ndev_all]
    for n in sizes:
        mesh = make_mesh(devices=jax.devices()[:n], axis_names=("data",))

        def run():
            d, s = distributed_invert(vis, model, mesh)
            gt = distributed_solve_gaintable(vis, None, mesh)
            d.pixels.block_until_ready()
            gt.gain.block_until_ready()

        run()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        results[n] = min(times)
    base = results[sizes[0]] * sizes[0]
    for n in sizes:
        eff = base / (results[n] * n)
        print(
            json.dumps(
                {
                    "metric": f"selfcal_step_scaling_{n}dev",
                    "value": round(results[n] * 1e3, 1),
                    "unit": "ms",
                    "vs_baseline": round(eff, 3),
                }
            )
        )

    # ---- full fused self-cal cycle (the production sharded_ical) ----
    from ska_sdp_func_python_tpu.models import (
        create_gaintable_from_visibility,
    )
    from ska_sdp_func_python_tpu.ops import apply_gaintable
    from ska_sdp_func_python_tpu.parallel import sharded_ical

    rng = np.random.default_rng(5)
    gt = create_gaintable_from_visibility(vis, jones_type="T")
    ph = rng.normal(0, 0.3, gt.gain.shape[:2])
    eye = np.eye(gt.gain.shape[-1])
    gain = np.exp(1j * ph)[:, :, None, None, None] * eye[None, None, None]
    corrupted = apply_gaintable(vis, gt.replace(gain=jnp.asarray(gain)))
    nvis = vis.ntimes * vis.nbaselines * vis.nchan
    nmajor = 2
    cyc = {}
    # on the virtual CPU mesh the Pallas kernels run in interpret mode
    # (slow); keep to the end sizes — the harness shape is what matters
    # here, real efficiency numbers come from a real pod slice
    ical_sizes = [sizes[0], sizes[-1]] if len(sizes) > 1 else sizes
    for n in ical_sizes:
        mesh = make_mesh(devices=jax.devices()[:n], axis_names=("data",))

        def run_ical():
            c, r, s, g = sharded_ical(
                corrupted, model, mesh, context="ng", nmajor=nmajor,
                calibration_context="T", algorithm="hogbom",
                niter=100, gain=0.2, fractional_threshold=0.01,
            )
            np.asarray(r.pixels.ravel()[0])

        run_ical()  # compile (plans rebuilt per call; cycle jit cached)
        t0 = time.perf_counter()
        run_ical()
        cyc[n] = (time.perf_counter() - t0) / nmajor
    sizes = ical_sizes
    base = cyc[sizes[0]] * sizes[0]
    for n in sizes:
        eff = base / (cyc[n] * n)
        print(
            json.dumps(
                {
                    "metric": f"sharded_ical_cycle_{n}dev",
                    "value": round(nvis / cyc[n] / 1e6, 3),
                    "unit": "Mvis/s per fused major cycle "
                    f"(incl. per-call setup; {n} devices)",
                    "vs_baseline": round(eff, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
