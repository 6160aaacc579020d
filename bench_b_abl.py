"""Ablation of the fused grid kernel: where do the ~49 ms go?

Variants (all on the 24-row tap payload, default dot precision):
  dma    = stream walk only: DMA chunks, accumulate raw payload rows
  fact   = + ku/kv factor construction (tile-broadcast + masks)
  lhs    = + the 4-block lhs build (no dot)
  dot    = full kernel (lhs x ku dot + accumulate)
  dot2   = full kernel, fori_loop replaced by unrolled-when (same work)

Run: python bench_b_abl.py [dma fact lhs dot ...]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench_b_opt import host_payload, np_tap_payload

NVIS = int(10e6)
NPAD = 2048
NW = 8
SUPPORT = 8
LANE = 128
TS = 64
CHUNK = int(__import__("os").environ.get("ABL_CHUNK", 512))
BUF = TS + SUPPORT
NTA = NPAD // TS
NTILES = NTA * NTA
NSEG = NTILES * (NW - 1)


def make_kernel(mode):
    def kern(starts_ref, counts_ref, payload_hbm, out_ref, scratch, sems):
        seg = pl.program_id(0)
        start = starts_ref[seg]
        count = counts_ref[seg]
        aligned = (start // LANE) * LANE
        off = start - aligned
        nchunks = (off + count + CHUNK - 1) // CHUNK
        depth = scratch.shape[0]

        r = jax.lax.broadcasted_iota(jnp.int32, (BUF, CHUNK), 0).astype(
            jnp.float32
        )
        cix = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        nrows = scratch.shape[1]

        def get_dma(slot, i):
            col = 0 if mode == "fixed" else aligned + i * CHUNK
            return pltpu.make_async_copy(
                payload_hbm.at[:nrows, pl.ds(col, CHUNK)],
                scratch.at[slot],
                sems.at[slot],
            )

        if mode != "nodma":
            for d in range(depth - 1):
                @pl.when(d < nchunks)
                def _(d=d):
                    get_dma(d, d).start()

        dn = (((1,), (1,)), ((), ()))

        def body(i, _):
            nxt = i + depth - 1

            if mode != "nodma":
                @pl.when(nxt < nchunks)
                def _():
                    get_dma(nxt % depth, nxt).start()

            slot = i % depth
            if mode != "nodma":
                get_dma(slot, i).wait()
            data = scratch[slot]
            gidx = aligned + i * CHUNK + cix
            valid = (gidx >= start) & (gidx < start + count)
            frac = jnp.where(valid, data[2][None, :], 0.0)
            vr = jnp.where(valid, data[3][None, :], 0.0)
            vi = jnp.where(valid, data[4][None, :], 0.0)
            if mode in ("dma", "dma8", "fixed", "nodma", "dma4"):
                out_ref[0, 0:1, :] += (
                    jnp.zeros((1, BUF), jnp.float32)
                    + jnp.sum(vr[:, :BUF] + vi[:, :BUF] + frac[:, :BUF],
                              axis=0, keepdims=True)
                )
                return 0
            rel_u = data[0][None, :]
            rel_v = data[1][None, :]
            reps = BUF // 8
            kv = jnp.concatenate([data[16:24]] * reps, axis=0)
            kv = jnp.where((r >= rel_v) & (r < rel_v + SUPPORT), kv, 0.0)
            ku = jnp.concatenate([data[8:16]] * reps, axis=0)
            ku = jnp.where((r >= rel_u) & (r < rel_u + SUPPORT), ku, 0.0)
            if mode == "fact":
                out_ref[0, 0:BUF, :] += (kv + ku)[:, :BUF]
                return 0
            w0 = 1.0 - frac
            w1 = frac
            lhs = jnp.concatenate(
                [kv * (vr * w0), kv * (vr * w1), kv * (vi * w0),
                 kv * (vi * w1)],
                axis=0,
            )
            if mode == "lhs":
                out_ref[0, :, :] += lhs[:, :BUF]
                return 0
            out_ref[0, :, :] += jax.lax.dot_general(
                lhs, ku, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision="default")
            return 0

        jax.lax.fori_loop(0, nchunks, body, 0)

    return kern


def make_fn(mode):
    nrows = {"dma8": 8, "dma4": 8}.get(mode, 24)
    depth = {"dma4": 4}.get(mode, 2)

    @jax.jit
    def fn(payload, starts, counts):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(NSEG,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (1, 4 * BUF, BUF), lambda s, st, ct: (s, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((depth, nrows, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((depth,)),
            ],
        )
        out = pl.pallas_call(
            make_kernel(mode), grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NSEG, 4 * BUF, BUF),
                                           jnp.float32),
        )(starts, counts, payload)
        return jnp.sum(out[::97, 0])

    return fn


def np_grid_slots(starts, counts, chunk, nslots, ncols):
    """Slot -> (segment, payload column, is_first) maps; every segment
    gets >=1 slot so its output block is zeroed+written."""
    acol = starts // chunk
    ecol = (starts + counts + chunk - 1) // chunk
    slot_counts = np.maximum(ecol - acol, 1)
    offs = np.concatenate([[0], np.cumsum(slot_counts)]).astype(np.int32)
    total = int(offs[-1])
    assert total <= nslots, (total, nslots)
    sidx = np.arange(nslots, dtype=np.int32)
    seg = np.searchsorted(offs, sidx, side="right") - 1
    segc = np.clip(seg, 0, NSEG - 1)
    col = acol[segc] + (sidx - offs[segc])
    first = (sidx == offs[segc]).astype(np.int32)
    live = sidx < total
    col = np.where(live, np.clip(col, 0, ncols - 1), ncols - 1)
    seg = np.where(live, segc, NSEG - 1)
    first = np.where(live, first, 0)
    return seg.astype(np.int32), col.astype(np.int32), first


def make_slot_fn(precision):
    def kern(seg_ref, col_ref, first_ref, starts_ref, counts_ref,
             payload_ref, out_ref):
        i = pl.program_id(0)
        seg = seg_ref[i]
        col = col_ref[i]
        start = starts_ref[seg]
        count = counts_ref[seg]
        r = jax.lax.broadcasted_iota(jnp.int32, (BUF, CHUNK), 0).astype(
            jnp.float32
        )
        gidx = col * CHUNK + jax.lax.broadcasted_iota(
            jnp.int32, (1, CHUNK), 1
        )
        valid = (gidx >= start) & (gidx < start + count)
        data = payload_ref[...]
        frac = jnp.where(valid, data[2][None, :], 0.0)
        vr = jnp.where(valid, data[3][None, :], 0.0)
        vi = jnp.where(valid, data[4][None, :], 0.0)
        rel_u = data[0][None, :]
        rel_v = data[1][None, :]
        reps = BUF // 8
        kv = jnp.concatenate([data[16:24]] * reps, axis=0)
        kv = jnp.where((r >= rel_v) & (r < rel_v + SUPPORT), kv, 0.0)
        ku = jnp.concatenate([data[8:16]] * reps, axis=0)
        ku = jnp.where((r >= rel_u) & (r < rel_u + SUPPORT), ku, 0.0)
        w0 = 1.0 - frac
        w1 = frac
        lhs = jnp.concatenate(
            [kv * (vr * w0), kv * (vr * w1), kv * (vi * w0),
             kv * (vi * w1)],
            axis=0,
        )
        dn = (((1,), (1,)), ((), ()))
        contrib = jax.lax.dot_general(
            lhs, ku, dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=precision)

        @pl.when(first_ref[i] == 1)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        out_ref[0, :, :] += contrib

    nslots = NVIS // CHUNK + NSEG + 3

    @jax.jit
    def fn(payload, starts, counts, seg, col, first):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(nslots,),
            in_specs=[
                pl.BlockSpec(
                    (24, CHUNK),
                    lambda i, sg, sc, fi, st, ct: (0, sc[i]),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 4 * BUF, BUF),
                lambda i, sg, sc, fi, st, ct: (sg[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NSEG, 4 * BUF, BUF),
                                           jnp.float32),
        )(seg, col, first, starts, counts, payload)
        return jnp.sum(out[::97, 0])

    return fn, nslots


def main():
    which = sys.argv[1:] or ["dma", "fact", "lhs", "dot"]
    if "slot" in which or "slothi" in which:
        t0 = time.perf_counter()
        payload, starts, counts = host_payload(TS)
        payload = np_tap_payload(payload, TS)
        # chunk-multiple padding for the block-spec'd payload
        extra = (-payload.shape[1]) % CHUNK
        if extra:
            payload = np.pad(payload, ((0, 0), (0, extra)))
        print(f"host prep {time.perf_counter()-t0:.1f}s", flush=True)
        ncols = payload.shape[1] // CHUNK
        for mode in which:
            prec = "default" if mode == "slot" else None
            fn, nslots = make_slot_fn(prec)
            seg, col, first = np_grid_slots(
                starts, counts, CHUNK, nslots, ncols)
            args = [jnp.asarray(x) for x in
                    (payload, starts, counts, seg, col, first)]
            float(np.asarray(args[0][0, 0]))
            t0 = time.perf_counter()
            out = fn(*args)
            s = float(np.asarray(out))
            print(f"{mode} compile+first {time.perf_counter()-t0:5.1f}s",
                  flush=True)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(*args)
                float(np.asarray(out))
                best = min(best, time.perf_counter() - t0)
            print(f"{mode} best {best*1e3:8.1f} ms  (sum={s:.6g})",
                  flush=True)
        return
    t0 = time.perf_counter()
    payload, starts, counts = host_payload(TS)
    payload = np_tap_payload(payload, TS)
    print(f"host prep {time.perf_counter()-t0:.1f}s", flush=True)
    payload = jnp.asarray(payload)
    starts = jnp.asarray(starts)
    counts = jnp.asarray(counts)
    float(np.asarray(payload[0, 0]))
    for mode in which:
        fn = make_fn(mode)
        t0 = time.perf_counter()
        out = fn(payload, starts, counts)
        s = float(np.asarray(out))
        print(f"{mode:6s} compile+first {time.perf_counter()-t0:5.1f}s",
              flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(payload, starts, counts)
            float(np.asarray(out))
            best = min(best, time.perf_counter() - t0)
        print(f"{mode:6s} best {best*1e3:8.1f} ms  (sum={s:.4g})",
              flush=True)


if __name__ == "__main__":
    main()
