"""Roofline / MFU accounting for the flagship kernels (VERDICT r3 item 5).

Gives every performance claim a denominator: for a measured kernel time
this module reports what fraction of the chip's peak MXU throughput and
peak HBM bandwidth the operation used, from analytic FLOP/byte models of
the work actually performed. The reference never answers "is X Mvis/s
good?" (its ducc0 backend defaults to threads=4, ng.py:58, with no
roofline statement either) — the TPU rebuild should.

Peaks are for one TPU v5e (v5litepod) chip:
- MXU: 197 TFLOP/s bf16 (394 TOP/s int8). f32 matmuls run as bf16
  multi-pass (bf16x3 = 3 passes for f32-accurate products), so bf16
  peak is the honest denominator for executed-FLOP accounting.
- HBM: 16 GB at 819 GB/s.

Two FLOP counts per op:
- ``useful``: the algorithmically required FLOPs (what any
  implementation of the math must do).
- ``executed``: what the kernel actually issues on the MXU given its
  dense-tile geometry (wasted lanes included) — executed/time vs peak
  is hardware utilisation; useful/time vs peak is algorithmic
  efficiency. Both are reported.

Byte models count HBM traffic once per logical pass (VMEM reuse inside
a kernel program is not traffic).
"""

from __future__ import annotations

__all__ = [
    "V5E_PEAK_BF16_FLOPS",
    "V5E_HBM_BYTES_PER_S",
    "invert_model",
    "predict_model",
    "hogbom_model",
    "solver_model",
    "fused_cycle_model",
    "roofline",
]

V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9

# fused-gridder payload: support-8 plans carry a 24-row f32 payload per
# visibility (2 in-tile offsets, frac, value re/im, back-sort keys, 16
# precomputed rotated ES taps — gridding_plan.GridPlan docstring)
_PAYLOAD_ROWS = 24


def _complex_mac_flops() -> int:
    # complex multiply-accumulate = 4 real mults + 4 real adds
    return 8


def invert_model(
    nvis: int,
    npixel: int,
    npad: int,
    support: int = 8,
    nw: int = 8,
    tile: int = 56,
    chunk: int = 512,
    planes_touched: int = 2,
) -> dict:
    """FLOPs/bytes for one plan-path w-stacked invert (fused Pallas
    grid kernel + batched ifft + w-beam + correction tail)."""
    s = support
    # useful: each vis scatters s*s taps onto planes_touched w-planes
    useful = nvis * planes_touched * s * s * _complex_mac_flops()
    # executed: the slot kernel contracts per 4-chunk aligned block a
    # [4*(s+1), chunk/ (chunk// ... )] dense panel; empirically the
    # kernel issues ~dense lhs [4*(s+1)*2, s*(s+1)] per chunk of
    # visibilities per plane leg — model as dense outer-product panels:
    # per chunk: [2*chunk rows] x [s+1 taps] x [s taps] MACs x 2 planes
    executed = (
        nvis * planes_touched * (s + 1) * (s + 1) * _complex_mac_flops()
    )
    # HBM: payload stream (24 f32 rows/vis) read once; uv grid written
    # once per tile then read by the assemble + FFT stages; FFT tail is
    # ~2.5 passes (ifft rows+cols) over nw planes of npad^2 c64 plus
    # the w-beam multiply-accumulate pass and the final correction read
    grid_bytes = nw * npad * npad * 8
    bytes_moved = (
        nvis * _PAYLOAD_ROWS * 4  # payload stream
        + 2 * grid_bytes  # tile writes + assemble read
        + 3.5 * grid_bytes  # batched ifft + w-beam accumulate
        + npixel * npixel * 4  # correction + extract
    )
    return {"useful_flops": useful, "executed_flops": executed,
            "bytes": bytes_moved}


def predict_model(
    nvis: int,
    npixel: int,
    npad: int,
    support: int = 8,
    nw: int = 8,
    planes_touched: int = 2,
) -> dict:
    """FLOPs/bytes for one plan-path w-stacked predict (FFT head +
    fused Pallas degrid kernel): same tap arithmetic as invert, grid
    read instead of written, plus the back-sort."""
    m = invert_model(
        nvis, npixel, npad, support=support, nw=nw,
        planes_touched=planes_touched,
    )
    # degrid adds the back-sort pass (read+write of the N-entry value
    # stream ~3 f32 rows) on top of the mirrored traffic
    m["bytes"] += nvis * 3 * 4 * 2
    return m


def hogbom_model(niter: int, patch: int = 512) -> dict:
    """FLOPs/bytes for ``niter`` Hogbom minor cycles on a VMEM-resident
    image (ops/cleaners.py Pallas loop): per iteration one argmax scan
    over the image + one patch-sized PSF subtraction. HBM traffic is
    only the initial image/psf load and final writeback — the loop is
    VMEM-resident, which is exactly why it beats the XLA while_loop."""
    img_elems = patch * patch
    per_iter = img_elems * 2 + img_elems * 2  # argmax scan + subtract
    return {
        "useful_flops": niter * per_iter,
        "executed_flops": niter * per_iter,
        "bytes": 3 * img_elems * 4,
    }


def solver_model(niter: int, nsol: int, nants: int, nchan: int = 1) -> dict:
    """FLOPs/bytes for the batched StefCal solve: per iteration each
    antenna's update is a length-nants complex dot over the normal
    equations ([nsol, nants, nants, nchan] resident)."""
    per_iter = nsol * nants * nants * nchan * _complex_mac_flops() * 2
    ne_bytes = nsol * nants * nants * nchan * 8 * 2
    return {
        "useful_flops": niter * per_iter,
        "executed_flops": niter * per_iter,
        "bytes": ne_bytes,  # loaded once; iterations are HBM-resident
    }


def roofline(model: dict, time_s: float) -> dict:
    """Fold a FLOP/byte model and a measured time into utilisation
    fractions against the v5e peaks (fields merged into bench JSON)."""
    return {
        "useful_gflop": round(model["useful_flops"] / 1e9, 2),
        "moved_gb": round(model["bytes"] / 1e9, 3),
        "mxu_frac": round(
            model["executed_flops"] / time_s / V5E_PEAK_BF16_FLOPS, 4
        ),
        "mxu_frac_useful": round(
            model["useful_flops"] / time_s / V5E_PEAK_BF16_FLOPS, 4
        ),
        "hbm_frac": round(
            model["bytes"] / time_s / V5E_HBM_BYTES_PER_S, 4
        ),
    }


def fused_cycle_model(
    nvis: int,
    npixel: int,
    npad: int,
    nants: int,
    nsol: int,
    support: int = 8,
    nw: int = 8,
    clean_niter: int = 300,
    solver_niter: int = 30,
) -> dict:
    """FLOPs/bytes for one fused self-cal major cycle (pipeline.
    _fused_selfcal_cycle): degrid (predict) + product-form normal
    equations + StefCal + gain apply + two fixed-permutation value
    sorts + invert + in-graph CLEAN. The sorts are the measured
    bandwidth hogs beyond the gridders (~5 f32 rows r/w each way)."""
    inv = invert_model(nvis, npixel, npad, support=support, nw=nw)
    pre = predict_model(nvis, npixel, npad, support=support, nw=nw)
    sol = solver_model(solver_niter, nsol, nants)
    cln = hogbom_model(clean_niter, patch=npixel)
    # normal equations: per vis one complex product + scatter into
    # [nsol, nants, nants]; apply: one gather + complex multiply per vis
    ne_flops = nvis * 2 * _complex_mac_flops()
    # two permutation sorts: XLA lax.sort carries ~5 payload rows, each
    # a comparison sort with ~log2(N) r/w passes but measured at a flat
    # ~33-37 ms floor; count 2 logical r/w passes of the payload
    sort_bytes = 2 * (nvis * 5 * 4 * 4)
    return {
        "useful_flops": (
            inv["useful_flops"] + pre["useful_flops"]
            + sol["useful_flops"] + cln["useful_flops"] + ne_flops
        ),
        "executed_flops": (
            inv["executed_flops"] + pre["executed_flops"]
            + sol["executed_flops"] + cln["executed_flops"] + ne_flops
        ),
        "bytes": (
            inv["bytes"] + pre["bytes"] + sol["bytes"] + cln["bytes"]
            + sort_bytes + nvis * 8 * 4  # NE build + apply streams
        ),
    }
