"""Stage-level timing of the tiled w-stack gridder at the bench config.

Breaks tiled_grid (nw=8, 10M vis, npad=2048, tile=64, unit=256) into:
  S1 sort          key-value sort of 2N entries, 5 payloads
  S2 unitprep      counts/offsets/searchsorted + the unit-layout gathers
  S3 matmul        the lax.map dense-kernel einsum loop
  S4 reduce        cumsum segmented reduction + tile overlap-add assemble
  S5 fft           8x 2048^2 ifft + w-beam accumulate
Each stage jitted separately; timing forces a tiny d2h fetch.
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from ska_sdp_func_python_tpu.ops.gridding import es_kernel
from ska_sdp_func_python_tpu.ops.imaging import _w_planes
from ska_sdp_func_python_tpu.ops.fft import ifft
from ska_sdp_func_python_tpu.ops.pswf import w_beam

NVIS = int(10e6)
NPIX = 1024
PAD = 2
NPAD = PAD * NPIX
CELL = 5e-5
NW = 8
SUPPORT = 8
TS = 64
UNIT = 256
BUF = TS + SUPPORT
NTA = NPAD // TS
NTILES = NTA * NTA
NTOT = NTILES * NW


def fetch(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    fetch(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


@jax.jit
def prep(u, v, w, vr, vi):
    scale = NPAD * CELL
    u_pix = -u * scale + NPAD // 2
    v_pix = v * scale + NPAD // 2
    vals = jax.lax.complex(vr, vi)
    p0, frac, plane_w = _w_planes(w, NW, "linear")
    half = SUPPORT // 2
    iu0 = jnp.floor(u_pix).astype(jnp.int32) - (half - 1)
    iv0 = jnp.floor(v_pix).astype(jnp.int32) - (half - 1)
    in_grid = (
        (iu0 >= 0) & (iu0 + SUPPORT <= NPAD)
        & (iv0 >= 0) & (iv0 + SUPPORT <= NPAD)
    )
    vals = jnp.where(in_grid, vals, 0.0)
    iu0c = jnp.clip(iu0, 0, NPAD - SUPPORT)
    iv0c = jnp.clip(iv0, 0, NPAD - SUPPORT)
    tu = iu0c // TS
    tv = iv0c // TS
    fracc = frac.astype(vals.dtype)
    tid_lo = (p0 * NTILES + tv * NTA + tu).astype(jnp.int32)
    tid_hi = ((p0 + 1) * NTILES + tv * NTA + tu).astype(jnp.int32)
    trash = jnp.asarray(NTOT, jnp.int32)
    tid_lo = jnp.where(in_grid, tid_lo, trash)
    tid_hi = jnp.where(in_grid, tid_hi, trash)
    u_all = jnp.concatenate([u_pix, u_pix])
    v_all = jnp.concatenate([v_pix, v_pix])
    vals_all = jnp.concatenate([vals * (1.0 - fracc), vals * fracc])
    tid_all = jnp.concatenate([tid_lo, tid_hi])
    return (tid_all, u_all, v_all, jnp.real(vals_all), jnp.imag(vals_all),
            plane_w)


@jax.jit
def s1_sort(tid_all, u_all, v_all, vr_all, vi_all):
    return jax.lax.sort(
        (tid_all, u_all, v_all, vr_all, vi_all), num_keys=1
    )


@jax.jit
def s2_unitprep(tid_s, u_s, v_s, vr_s, vi_s):
    n = tid_s.shape[0]
    counts = jnp.bincount(tid_s, length=NTOT + 1)[:NTOT]
    starts = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]]
    )
    unit_counts = -(-counts // UNIT)
    unit_offsets = jnp.concatenate(
        [jnp.zeros((1,), unit_counts.dtype), jnp.cumsum(unit_counts)]
    )
    max_units = n // UNIT + NTOT + 1
    uidx = jnp.arange(max_units)
    unit_tile = (
        jnp.searchsorted(unit_offsets, uidx, side="right") - 1
    ).astype(jnp.int32)
    unit_tile_c = jnp.clip(unit_tile, 0, NTOT - 1)
    k_within = uidx - unit_offsets[unit_tile_c]
    unit_start = starts[unit_tile_c] + k_within * UNIT
    unit_valid = uidx < unit_offsets[-1]
    take = unit_start[:, None] + jnp.arange(UNIT)[None, :]
    row_valid = (
        take < (starts[unit_tile_c] + counts[unit_tile_c])[:, None]
    ) & unit_valid[:, None]
    take = jnp.clip(take, 0, n - 1)
    tv0 = ((unit_tile_c % NTILES) // NTA * TS).astype(u_s.dtype)
    tu0 = ((unit_tile_c % NTILES) % NTA * TS).astype(u_s.dtype)
    flat_take = take.reshape(-1)
    uu_u = u_s[flat_take].reshape(max_units, UNIT)
    vv_u = v_s[flat_take].reshape(max_units, UNIT)
    vr_u = jnp.where(row_valid, vr_s[flat_take].reshape(max_units, UNIT), 0.0)
    vi_u = jnp.where(row_valid, vi_s[flat_take].reshape(max_units, UNIT), 0.0)
    return uu_u, vv_u, vr_u, vi_u, tv0, tu0, unit_offsets


@jax.jit
def s3_matmul(uu_u, vv_u, vr_u, vi_u, tv0, tu0):
    max_units = uu_u.shape[0]
    rdtype = uu_u.dtype
    r_cells = jnp.arange(BUF, dtype=rdtype)
    half_f = jnp.asarray(SUPPORT // 2, dtype=rdtype)

    def unit_tiles(args):
        uu, vv, vr, vi, tv0_u, tu0_u = args
        kv = es_kernel(
            (tv0_u[:, None, None] + r_cells[None, :, None] - vv[:, None, :])
            / half_f, SUPPORT)
        ku = es_kernel(
            (tu0_u[:, None, None] + r_cells[None, :, None] - uu[:, None, :])
            / half_f, SUPPORT)
        tr = jnp.einsum("urc,uxc->urx", kv * vr[:, None, :], ku,
                        preferred_element_type=rdtype)
        ti = jnp.einsum("urc,uxc->urx", kv * vi[:, None, :], ku,
                        preferred_element_type=rdtype)
        return tr, ti

    ub = 256
    pad_units = (-max_units) % ub
    nb = (max_units + pad_units) // ub

    def padr(x):
        return jnp.pad(x, ((0, pad_units),) + ((0, 0),) * (x.ndim - 1))

    tr, ti = jax.lax.map(
        unit_tiles,
        (padr(uu_u).reshape(nb, ub, UNIT), padr(vv_u).reshape(nb, ub, UNIT),
         padr(vr_u).reshape(nb, ub, UNIT), padr(vi_u).reshape(nb, ub, UNIT),
         padr(tv0).reshape(nb, ub), padr(tu0).reshape(nb, ub)))
    return (tr.reshape(-1, BUF, BUF)[:max_units],
            ti.reshape(-1, BUF, BUF)[:max_units])


@jax.jit
def s4_reduce(tr, ti, unit_offsets):
    max_units = tr.shape[0]
    rdtype = tr.dtype
    zeros1 = jnp.zeros((1, BUF, BUF), dtype=rdtype)
    cr = jnp.concatenate([zeros1, jnp.cumsum(tr, axis=0)])
    ci = jnp.concatenate([zeros1, jnp.cumsum(ti, axis=0)])
    lo = jnp.clip(unit_offsets[:-1], 0, max_units)
    hi = jnp.clip(unit_offsets[1:], 0, max_units)
    acc = jax.lax.complex(cr[hi] - cr[lo], ci[hi] - ci[lo])
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

        grid = flatten(a)
        grid = grid + jnp.roll(flatten(b), TS, axis=1)
        grid = grid + jnp.roll(flatten(c), TS, axis=0)
        grid = grid + jnp.roll(jnp.roll(flatten(d), TS, axis=0), TS, axis=1)
        return grid

    return jax.vmap(assemble)(acc)


@jax.jit
def s5_fft(grids, plane_w):
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
    rng = np.random.default_rng(7)
    scale = NPIX * CELL
    umax = 0.33 * NPIX / scale / 2
    u = jnp.asarray(rng.uniform(-umax, umax, NVIS).astype(np.float32))
    v = jnp.asarray(rng.uniform(-umax, umax, NVIS).astype(np.float32))
    w = jnp.asarray(rng.uniform(-50.0, 50.0, NVIS).astype(np.float32))
    vr = jnp.asarray(rng.normal(size=NVIS).astype(np.float32))
    vi = jnp.asarray(rng.normal(size=NVIS).astype(np.float32))

    t, pre = timeit(prep, u, v, w, vr, vi)
    print(f"S0 prep      {t*1e3:8.1f} ms", flush=True)
    tid_all, u_all, v_all, vr_all, vi_all, plane_w = pre
    t, srt = timeit(s1_sort, tid_all, u_all, v_all, vr_all, vi_all)
    print(f"S1 sort      {t*1e3:8.1f} ms", flush=True)
    t, up = timeit(s2_unitprep, *srt)
    print(f"S2 unitprep  {t*1e3:8.1f} ms  (max_units={up[0].shape[0]})",
          flush=True)
    uu_u, vv_u, vr_u, vi_u, tv0, tu0, unit_offsets = up
    t, mm = timeit(s3_matmul, uu_u, vv_u, vr_u, vi_u, tv0, tu0)
    print(f"S3 matmul    {t*1e3:8.1f} ms", flush=True)
    t, grids = timeit(s4_reduce, mm[0], mm[1], unit_offsets)
    print(f"S4 reduce    {t*1e3:8.1f} ms", flush=True)
    t, dirty = timeit(s5_fft, grids, plane_w)
    print(f"S5 fft       {t*1e3:8.1f} ms", flush=True)
    print(f"checksum {float(np.asarray(jnp.sum(jnp.abs(dirty)))):.5g}")


if __name__ == "__main__":
    main()
