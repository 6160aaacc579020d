"""Split timing for the fused gridder at the BASELINE config:
A = prep + segment-key sort + payload stack (everything before pallas)
B = pallas segment kernel + plane combine + overlap-add assemble
C = per-plane ifft + w-beam accumulate (+ correction)
Run: python bench_fused_stages.py [A|B|C|full ...]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from ska_sdp_func_python_tpu.ops.imaging import _w_planes
from ska_sdp_func_python_tpu.ops.fft import ifft
from ska_sdp_func_python_tpu.ops.pswf import w_beam

NVIS = int(10e6)
NPIX = 1024
NPAD = 2048
CELL = 5e-5
NW = 8
SUPPORT = 8
TS = 64
CHUNK = 512
BUF = TS + SUPPORT
NTA = NPAD // TS
NTILES = NTA * NTA
NSEGP = NW - 1
NSEG = NTILES * NSEGP
LANE = 128


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0].ravel()[0]
    return float(np.asarray(jnp.real(leaf)))


def timeit(name, fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    fetch(out)
    print(f"{name} compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name} best {best*1e3:8.1f} ms", flush=True)
    return out


@jax.jit
def stage_a(u, v, w, vr, vi):
    scale = NPAD * CELL
    u_pix = -u * scale + NPAD // 2
    v_pix = v * scale + NPAD // 2
    vals = jax.lax.complex(vr, vi)
    p0, frac, plane_w = _w_planes(w, NW, "linear")
    half = SUPPORT // 2
    iu0 = jnp.floor(u_pix).astype(jnp.int32) - (half - 1)
    iv0 = jnp.floor(v_pix).astype(jnp.int32) - (half - 1)
    in_grid = ((iu0 >= 0) & (iu0 + SUPPORT <= NPAD)
               & (iv0 >= 0) & (iv0 + SUPPORT <= NPAD))
    vals = jnp.where(in_grid, vals, 0.0)
    iu0c = jnp.clip(iu0, 0, NPAD - SUPPORT)
    iv0c = jnp.clip(iv0, 0, NPAD - SUPPORT)
    base = (iv0c // TS) * NTA + (iu0c // TS)
    p0c = jnp.clip(p0, 0, NW - 2)
    seg = (p0c * NTILES + base).astype(jnp.int32)
    seg = jnp.where(in_grid, seg, jnp.asarray(NSEG, jnp.int32))
    seg_s, u_s, v_s, f_s, vr_s, vi_s = jax.lax.sort(
        (seg, u_pix, v_pix, frac.astype(jnp.float32),
         jnp.real(vals), jnp.imag(vals)), num_keys=1)
    n = u_s.shape[0]
    npad_ = (-n) % LANE + CHUNK
    pz = jnp.zeros((npad_,), jnp.float32)
    u_s = jnp.concatenate([u_s, pz])
    v_s = jnp.concatenate([v_s, pz])
    f_s = jnp.concatenate([f_s, pz])
    vr_s = jnp.concatenate([vr_s, pz])
    vi_s = jnp.concatenate([vi_s, pz])
    z = jnp.zeros_like(u_s)
    payload = jnp.stack([u_s, v_s, f_s, vr_s, vi_s, z, z, z])
    counts = jnp.bincount(seg_s, length=NSEG + 1)[:NSEG].astype(jnp.int32)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    return payload, starts, counts, plane_w


@jax.jit
def stage_b(payload, starts, counts):
    from ska_sdp_func_python_tpu.ops.gridding_fused import (
        _seg_kernel, pl, pltpu)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NSEG,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec((1, 2 * BUF, BUF), lambda s, st, ct: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * BUF, BUF), lambda s, st, ct: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = partial(_seg_kernel, buf=BUF, support=SUPPORT, chunk=CHUNK,
                     ntiles=NTILES, ntile_axis=NTA, tile=TS, nplanes_out=2)
    tr, ti = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((NSEG, 2 * BUF, BUF), jnp.float32),
            jax.ShapeDtypeStruct((NSEG, 2 * BUF, BUF), jnp.float32),
        ),
    )(starts, counts, payload)

    tr = tr.reshape(NSEGP, NTILES, 2, BUF, BUF)
    ti = ti.reshape(NSEGP, NTILES, 2, BUF, BUF)
    zt = jnp.zeros((1, NTILES, BUF, BUF), jnp.float32)
    acc_r = (jnp.concatenate([tr[:, :, 0], zt], axis=0)
             + jnp.concatenate([zt, tr[:, :, 1]], axis=0))
    acc_i = (jnp.concatenate([ti[:, :, 0], zt], axis=0)
             + jnp.concatenate([zt, ti[:, :, 1]], axis=0))
    acc = jax.lax.complex(acc_r, acc_i)
    acc = acc.reshape(NW, NTA, NTA, BUF, BUF)

    def assemble(tiles):
        a = tiles[:, :, :TS, :TS]
        b = jnp.pad(tiles[:, :, :TS, TS:],
                    ((0, 0), (0, 0), (0, 0), (0, TS - SUPPORT)))
        c = jnp.pad(tiles[:, :, TS:, :TS],
                    ((0, 0), (0, 0), (0, TS - SUPPORT), (0, 0)))
        d = jnp.pad(tiles[:, :, TS:, TS:],
                    ((0, 0), (0, 0), (0, TS - SUPPORT), (0, TS - SUPPORT)))

        def flatten(x):
            return x.transpose(0, 2, 1, 3).reshape(NPAD, NPAD)

        g = flatten(a)
        g = g + jnp.roll(flatten(b), TS, axis=1)
        g = g + jnp.roll(flatten(c), TS, axis=0)
        g = g + jnp.roll(jnp.roll(flatten(d), TS, axis=0), TS, axis=1)
        return g

    return jax.vmap(assemble)(acc)


@jax.jit
def stage_c(grids, plane_w):
    fov = NPAD * CELL

    def accum(carry, inputs):
        g, wp = inputs
        img = (NPAD * NPAD) * ifft(g)
        wb = w_beam(NPAD, fov, wp).astype(img.dtype)
        return carry + img * wb, None

    dirty0 = jnp.zeros_like(grids[0])
    dirty, _ = jax.lax.scan(accum, dirty0, (grids, plane_w))
    return jnp.real(dirty)


def main():
    which = sys.argv[1:] or ["A", "B", "C"]
    rng = np.random.default_rng(7)
    scale = NPIX * CELL
    umax = 0.33 * NPIX / scale / 2
    u = jnp.asarray(rng.uniform(-umax, umax, NVIS).astype(np.float32))
    v = jnp.asarray(rng.uniform(-umax, umax, NVIS).astype(np.float32))
    w = jnp.asarray(rng.uniform(-50.0, 50.0, NVIS).astype(np.float32))
    vr = jnp.asarray(rng.normal(size=NVIS).astype(np.float32))
    vi = jnp.asarray(rng.normal(size=NVIS).astype(np.float32))

    payload, starts, counts, plane_w = timeit("A sort+prep", stage_a,
                                              u, v, w, vr, vi)
    if "B" in which or "C" in which:
        grids = timeit("B pallas+asm", stage_b, payload, starts, counts)
    if "C" in which:
        dirty = timeit("C fft+wbeam", stage_c, grids, plane_w)
        print("checksum", float(np.asarray(jnp.sum(jnp.abs(dirty)))))


if __name__ == "__main__":
    main()
