"""Tune the fused-gridder Pallas stage (stage B) in isolation.

Builds the sorted payload stream with numpy on the host (no 260 s stage-A
compile), uploads it once per tile size, then times the Pallas segment
kernel across (tile, chunk, matmul-precision) variants. Each variant
compiles in a few seconds, so this is the fast iteration loop for kernel
tuning. Add ``+asm`` to a variant to include the XLA combine/assemble.

Run: python bench_b_opt.py 64:512:none 32:256:none 64:512:none+asm ...
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

NVIS = int(10e6)
NPIX = 1024
NPAD = 2048
CELL = 5e-5
NW = 8
SUPPORT = 8
LANE = 128
WRANGE = 50.0
NSEGP = NW - 1


def host_payload(ts):
    nta = NPAD // ts
    ntiles = nta * nta
    nseg = ntiles * NSEGP
    rng = np.random.default_rng(7)
    scale = NPAD * CELL
    umax = 0.33 * NPIX / (NPIX * CELL) / 2
    u = rng.uniform(-umax, umax, NVIS).astype(np.float32)
    v = rng.uniform(-umax, umax, NVIS).astype(np.float32)
    w = rng.uniform(-WRANGE, WRANGE, NVIS).astype(np.float32)
    vr = rng.normal(size=NVIS).astype(np.float32)
    vi = rng.normal(size=NVIS).astype(np.float32)

    u_pix = (-u * scale + NPAD // 2).astype(np.float32)
    v_pix = (v * scale + NPAD // 2).astype(np.float32)
    wmin, wmax = w.min(), w.max()
    wstep = (wmax - wmin) / (NW - 1)
    wf = (w - wmin) / wstep
    p0 = np.clip(np.floor(wf).astype(np.int32), 0, NW - 2)
    frac = (wf - p0).astype(np.float32)

    half = SUPPORT // 2
    iu0 = np.floor(u_pix).astype(np.int32) - (half - 1)
    iv0 = np.floor(v_pix).astype(np.int32) - (half - 1)
    in_grid = ((iu0 >= 0) & (iu0 + SUPPORT <= NPAD)
               & (iv0 >= 0) & (iv0 + SUPPORT <= NPAD))
    vr = np.where(in_grid, vr, 0.0).astype(np.float32)
    vi = np.where(in_grid, vi, 0.0).astype(np.float32)
    iu0c = np.clip(iu0, 0, NPAD - SUPPORT)
    iv0c = np.clip(iv0, 0, NPAD - SUPPORT)
    base = (iv0c // ts) * nta + (iu0c // ts)
    seg = (p0 * ntiles + base).astype(np.int32)
    seg = np.where(in_grid, seg, nseg).astype(np.int32)

    order = np.argsort(seg, kind="stable")
    seg_s = seg[order]
    cols = [u_pix[order], v_pix[order], frac[order], vr[order], vi[order]]
    npad_ = (-NVIS) % LANE + 2048
    z = np.zeros(npad_, np.float32)
    cols = [np.concatenate([c, z]) for c in cols]
    zfull = np.zeros_like(cols[0])
    payload = np.stack(cols + [zfull, zfull, zfull])
    starts = np.searchsorted(seg_s, np.arange(nseg), side="left")
    ends = np.searchsorted(seg_s, np.arange(nseg), side="right")
    counts = (ends - starts).astype(np.int32)
    return payload, starts.astype(np.int32), counts


def np_tap_payload(payload, ts):
    """Numpy mirror of gridding_fused._payload_stack (24-row tap form)."""
    u_s, v_s, f_s, r3, r4 = payload[:5]
    half = SUPPORT // 2
    beta = 2.3 * SUPPORT
    iu0 = np.floor(u_s).astype(np.int32) - (half - 1)
    iv0 = np.floor(v_s).astype(np.int32) - (half - 1)
    iu0c = np.clip(iu0, 0, NPAD - SUPPORT)
    iv0c = np.clip(iv0, 0, NPAD - SUPPORT)

    def taps(pix, i0):
        k = np.arange(SUPPORT, dtype=np.float32)[:, None]
        nu = (i0.astype(np.float32)[None, :] + k - pix[None, :]) / (
            SUPPORT / 2.0)
        nu2 = np.clip(nu * nu, 0.0, 1.0)
        t = np.exp(beta * (np.sqrt(1.0 - nu2) - 1.0)).astype(np.float32)
        return np.where(np.abs(nu) < 1.0, t, 0.0).astype(np.float32)

    def rot8(t8, idx):
        rel8 = idx % 8
        out = np.zeros_like(t8)
        for s in range(8):
            out += np.where(rel8[None, :] == s, np.roll(t8, s, axis=0), 0.0)
        return out.astype(np.float32)

    rel_u = (iu0c % ts).astype(np.float32)
    rel_v = (iv0c % ts).astype(np.float32)
    z = np.zeros_like(u_s)
    head = np.stack([rel_u, rel_v, f_s, r3, r4, z, z, z])
    return np.concatenate(
        [head, rot8(taps(u_s, iu0c), iu0c), rot8(taps(v_s, iv0c), iv0c)]
    ).astype(np.float32)


def make_stage_b(ts, chunk, precision, with_asm=False):
    """with_asm: full _grid_execute (kernel + combine + assemble).
    Otherwise: the pallas slot kernel alone (raw [nseg, 4buf, buf] out)."""
    from functools import partial as _partial

    from ska_sdp_func_python_tpu.ops.gridding_fused import (
        _grid_execute, _grid_slot_kernel, _grid_slots, pl, pltpu)

    nta = NPAD // ts
    nseg = nta * nta * NSEGP
    buf = ts + SUPPORT

    @jax.jit
    def stage_b(payload, starts, counts):
        # pad the payload columns to a chunk multiple for the block spec
        extra = (-payload.shape[1]) % chunk + chunk
        payload_p = jnp.pad(payload, ((0, 0), (0, extra)))
        vals = jnp.concatenate(
            [payload_p[3:5],
             jnp.zeros((6, payload_p.shape[1]), jnp.float32)])
        nslots = NVIS // chunk + nseg + 3
        slot_seg, slot_col, slot_first = _grid_slots(
            starts, counts, nslots=nslots,
            ncols=payload_p.shape[1] // chunk, nseg=nseg, chunk=chunk,
        )
        if with_asm:
            grids = _grid_execute(
                starts, counts, slot_seg, slot_col, slot_first, payload_p,
                vals, npixel=NPAD, support=SUPPORT, nplanes=NW,
                nseg_planes=NSEGP, nplanes_out=2, wstacked=True,
                tile=ts, chunk=chunk, interpret=False, precision=precision,
            )
            return (jnp.sum(jnp.real(grids)),
                    jnp.sum(jnp.abs(grids[0, ::97])))
        nrows = payload_p.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(nslots,),
            in_specs=[
                pl.BlockSpec(
                    (nrows, chunk),
                    lambda i, sg, sc, fi, st, ct: (0, sc[i]),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (2, chunk),
                    lambda i, sg, sc, fi, st, ct: (0, sc[i]),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 4 * buf, buf),
                lambda i, sg, sc, fi, st, ct: (sg[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        kernel = _partial(
            _grid_slot_kernel, buf=buf, support=SUPPORT, chunk=chunk,
            ntiles=nta * nta, ntile_axis=nta, tile=ts, nplanes_out=2,
            precision=precision, use_taps=nrows == 24,
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nseg, 4 * buf, buf),
                                           jnp.float32),
        )(slot_seg, slot_col, slot_first, starts, counts, payload_p,
          vals)
        return jnp.sum(out[::97, 0]), jnp.sum(jnp.abs(out[::97, 0]))

    return stage_b


def main():
    variants = sys.argv[1:] or ["64:512:none"]
    cache = {}
    tap_cache = {}
    for vtag in variants:
        with_asm = vtag.endswith("+asm")
        core = vtag[:-4] if with_asm else vtag
        parts = core.split(":")
        tstr, cstr, pstr = parts[:3]
        tap = len(parts) > 3 and parts[3] == "tap"
        ts, chunk = int(tstr), int(cstr)
        precision = None if pstr == "none" else pstr
        if ts not in cache:
            t0 = time.perf_counter()
            payload, starts, counts = host_payload(ts)
            print(f"ts={ts} host prep {time.perf_counter()-t0:.1f}s",
                  flush=True)
            t0 = time.perf_counter()
            payload = jnp.asarray(payload)
            starts = jnp.asarray(starts)
            counts = jnp.asarray(counts)
            float(np.asarray(payload[0, 0]))
            print(f"ts={ts} h2d {time.perf_counter()-t0:.1f}s", flush=True)
            cache[ts] = (payload, starts, counts)
        payload, starts, counts = cache[ts]
        if tap:
            if ts not in tap_cache:
                t0 = time.perf_counter()
                tp = np_tap_payload(np.asarray(payload), ts)
                print(f"ts={ts} tap prep {time.perf_counter()-t0:.1f}s",
                      flush=True)
                tp = jnp.asarray(tp)
                float(np.asarray(tp[0, 0]))
                tap_cache[ts] = tp
            payload = tap_cache[ts]
        fn = make_stage_b(ts, chunk, precision, with_asm)
        t0 = time.perf_counter()
        out = fn(payload, starts, counts)
        s0 = float(np.asarray(out[0]))
        chk = float(np.asarray(out[1]))
        print(f"{vtag:20s} compile+first {time.perf_counter()-t0:6.1f}s",
              flush=True)
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(payload, starts, counts)
            float(np.asarray(out[0]))
            best = min(best, time.perf_counter() - t0)
        print(f"{vtag:20s} best {best*1e3:8.1f} ms   sum={s0:.6g} "
              f"chk={chk:.8g}", flush=True)


if __name__ == "__main__":
    main()
