"""Scaling model for the sharded fused self-cal cycle (VERDICT r3 item 7).

Real multi-chip hardware is not available in this environment, so the
honest deliverables are measured where measurement is possible and
modelled where it is not:

1. **Collective audit** (measured): compile `parallel.sharded_ical`'s
   per-cycle SPMD program on an 8-device virtual CPU mesh and read every
   collective op + payload shape out of the optimized HLO. This verifies
   the README claim that per-cycle communication is one psum of the
   normal equations (O(nants^2) per term) plus one psum of the uv grids
   (O(nw * npad^2)) — independent of visibility count.
2. **Weak scaling** (measured, CPU): cycle wall time at 1/2/4/8 virtual
   devices with per-device visibility count held fixed. CPU collectives
   ride shared memory, so this measures program-structure overhead
   (replicated compute, reshards), not network time.
3. **Projected efficiency** (modelled): per-cycle comm time on stated
   link bandwidths (v5p ICI, v5e-pod ICI, DCN) from the measured
   payload bytes, against the measured v5e per-device cycle compute
   time (BENCH invert/fused-cycle numbers). Efficiency = compute /
   (compute + comm) for a weak-scaled cycle.

Run: python bench_scaling_model.py            (orchestrates subprocesses)
     python bench_scaling_model.py --child N  (one mesh size; internal)
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

# bytes per HLO element type
_DT = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "c128": 16, "c64": 8,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}

_OPS = (
    "all-reduce", "all-gather", "reduce-scatter", "all-to-all",
    "collective-permute",
)
_SHAPE = re.compile(r"([a-z]+\d*)\[([\d,]*)\]")


def parse_collectives(hlo: str):
    """[(op, shape_str, bytes)] for every collective op in the HLO text
    (lines of the form ``%name = <shape> all-reduce(...)``; tuple shapes
    and ``-start`` async forms included, ``-done``/GTE lines skipped)."""
    out = []
    for line in hlo.splitlines():
        for op in _OPS:
            if f" {op}(" in line or f" {op}-start(" in line:
                break
        else:
            continue
        if "=" not in line:
            continue
        lhs, rhs = line.split("=", 1)
        shapes = rhs.split(op)[0]
        nbytes = 0
        for sm in _SHAPE.finditer(shapes):
            dt, dims = sm.group(1), sm.group(2)
            if dt not in _DT:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DT[dt]
        out.append((op, shapes.strip(), nbytes))
    return out


def _obs(ndev, ntimes_per_dev=2, nants=40, npixel=256, rmax=2000.0):
    from simul import make_visibility
    from ska_sdp_func_python_tpu.models import SkyComponents
    from ska_sdp_func_python_tpu.ops import (
        create_image_from_visibility,
        dft_skycomponent_visibility,
    )

    vis = make_visibility(
        nants=nants, ntimes=ntimes_per_dev * ndev, nchan=1, rmax=rmax
    )
    model = create_image_from_visibility(
        vis, npixel=npixel, oversampling=4.0, nchan=1
    )
    ra, dec = model.pixel_to_radec(npixel // 2 + 12, npixel // 2 + 9)
    comps = SkyComponents.from_lists(
        [[float(ra), float(dec)]], np.ones((1, 1, 1)), model.frequency
    )
    vis = dft_skycomponent_visibility(vis, comps)
    return vis, model


def child(ndev: int, audit: bool):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ska_sdp_func_python_tpu.parallel import make_mesh, sharded_ical

    assert len(jax.devices()) == ndev, (len(jax.devices()), ndev)
    mesh = make_mesh(axis_names=("data",))
    vis, model = _obs(ndev)
    nvis = int(np.prod(vis.vis.shape[:3]))
    kw = dict(
        nmajor=1, calibration_context="T", algorithm="hogbom",
        niter=100, gain=0.2, fractional_threshold=0.01, context="ng",
    )
    hlo_out = [] if audit else None
    t0 = time.time()
    sharded_ical(vis, model, mesh, hlo_out=hlo_out, **kw)
    compile_s = time.time() - t0
    # warm per-cycle time: 3 more cycles on the compiled program
    kw["nmajor"] = 3
    t0 = time.time()
    _, residual, restored, _ = sharded_ical(vis, model, mesh, **kw)
    per_cycle = (time.time() - t0) / 3
    row = {
        "ndev": ndev,
        "nvis": nvis,
        "nvis_per_dev": nvis // ndev,
        "per_cycle_s": round(per_cycle, 4),
        "compile_s": round(compile_s, 1),
        "peak_restored": round(float(np.max(np.asarray(restored.pixels))), 4),
    }
    if audit:
        colls = parse_collectives(hlo_out[0])
        row["collectives"] = [
            {"op": op, "shape": sh, "bytes": b} for op, sh, b in colls
        ]
        row["collective_bytes_total"] = sum(b for _, _, b in colls)
    print("CHILD" + json.dumps(row), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--audit", action="store_true")
    args = ap.parse_args()
    if args.child is not None:
        child(args.child, args.audit)
        return

    rows = []
    for ndev in (1, 2, 4, 8):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={ndev}"
        )
        env["JAX_PLATFORMS"] = "cpu"
        cmd = [sys.executable, __file__, "--child", str(ndev)]
        if ndev == 8:
            cmd.append("--audit")
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=1800, env=env
        )
        for line in out.stdout.splitlines():
            if line.startswith("CHILD"):
                rows.append(json.loads(line[5:]))
                break
        else:
            print(f"# ndev={ndev} FAILED:\n{out.stderr[-2000:]}",
                  file=sys.stderr)

    base = next((r for r in rows if r["ndev"] == 1), None)
    for r in rows:
        if base:
            # weak scaling: perfect efficiency keeps per-cycle time flat
            r["weak_efficiency_cpu"] = round(
                base["per_cycle_s"] / r["per_cycle_s"], 3
            )
        print(json.dumps({k: v for k, v in r.items()
                          if k != "collectives"}), flush=True)

    audit = next((r for r in rows if "collectives" in r), None)
    if audit:
        agg = {}
        for c in audit["collectives"]:
            key = (c["op"], c["shape"])
            agg[key] = agg.get(key, 0) + 1
        print("# per-cycle collectives (8-dev SPMD program):",
              file=sys.stderr)
        for (op, sh), cnt in sorted(agg.items()):
            b = next(c["bytes"] for c in audit["collectives"]
                     if c["op"] == op and c["shape"] == sh)
            print(f"#   {cnt}x {op:20s} {sh:40s} {b/1e6:10.3f} MB",
                  file=sys.stderr)
        total = audit["collective_bytes_total"]
        # ---- projected efficiency on real interconnects ----
        # The audited payloads are nvis-independent; scale them to the
        # BASELINE flagship config (10M vis, 512 ants, 76 solve
        # intervals, 1024^2 at padding 1.25 -> npad 1344, nw 8) where
        # the measured per-device fused cycle is ~113 ms on one v5e
        # (round 5: Benes permutation engine + quad slot kernel).
        # Round-5 collective structure (audited above): the uv grids
        # ride ONE reduce-scatter (ring moves (N-1)/N * S ~ 1S, vs the
        # old all-reduce's 2S) into an N-way-parallel tail, whose
        # npixel^2 f32 partial-image sum is the only remaining
        # all-reduce of the imaging leg.
        grid_bytes = 8 * 1344 * 1344 * 8          # c64[nw, npad, npad]
        img_bytes = 1024 * 1024 * 4               # f32 partial image
        ne_bytes = 76 * 512 * 512 * (8 + 4)       # c64 NE + f32 weights
        proj = []
        for name, bw_gbs, lat_us in (
            ("v5p ICI (90 GB/s/link, 3D torus)", 90.0, 1.0),
            ("v5e pod ICI (45 GB/s/link)", 45.0, 1.0),
            ("DCN multi-host (12.5 GB/s)", 12.5, 50.0),
        ):
            # reduce-scatter moves (N-1)/N * S ~ 1S per device; the
            # all-reduces move ~2S
            t_comm = (
                1.0 * grid_bytes + 2.0 * (img_bytes + ne_bytes)
            ) / (bw_gbs * 1e9) + lat_us * 1e-6
            t_compute = 0.113  # measured fused cycle, one v5e (r5)
            proj.append({
                "link": name,
                "comm_ms": round(t_comm * 1e3, 3),
                "efficiency_weak_16dev": round(
                    t_compute / (t_compute + t_comm), 4
                ),
            })
        print(json.dumps({
            "metric": "scaling_model",
            "audited_collective_bytes": total,
            "baseline_grid_rs_bytes": grid_bytes,
            "baseline_image_psum_bytes": img_bytes,
            "baseline_ne_psum_bytes": ne_bytes,
            "projected": proj,
        }), flush=True)


if __name__ == "__main__":
    main()
