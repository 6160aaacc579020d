"""CLEAN minor-cycle kernels (framework L2, C17): Hogbom, complex Hogbom,
multi-scale, and multi-scale multi-frequency CLEAN.

TPU-native redesign of /root/reference/src/ska_sdp_func_python/image/
cleaners.py. The reference runs python ``for`` loops with numpy patch
subtraction (cleaners.py:83-118, :403-452, :831-876). Here each minor cycle
is a ``lax.while_loop`` that stays on device:

* the greedy peak search is a fused argmax over the (scale x) image;
* the PSF patch subtraction uses PSFs pre-padded to twice the image size so
  every update is a static-shape ``dynamic_slice`` — no data-dependent
  shapes, no host synchronisation per iteration;
* early stopping is the while-loop condition (matching the reference's
  break semantics, including its 0.9 threshold factor for hogbom/msclean).

Independent channels batch with ``vmap`` (see ops/deconvolution.py).
Numerical parity with the reference kernels is asserted differentially in
tests/test_cleaners.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .pswf import grdsf

__all__ = [
    "hogbom",
    "hogbom_complex",
    "msclean",
    "msmfsclean",
    "create_scalestack",
    "convolve_scalestack",
    "convolve_convolve_scalestack",
    "argmax",
    "overlapIndices",
    "find_max_abs_stack",
    "spheroidal_function",
    "calculate_scale_moment_residual",
    "calculate_scale_scale_moment_moment_psf",
    "calculate_scale_inverse_moment_moment_hessian",
    "calculate_scale_moment_principal_solution",
    "find_optimum_scale_zero_moment",
    "find_global_optimum",
    "update_scale_moment_residual",
    "update_moment_model",
]


def _pad_psf_like(psf, ny, nx):
    """Embed psf into a (2*ny, 2*nx) zero canvas with the psf centre pixel at
    (ny, nx), so ``dynamic_slice(canvas, (ny - my, nx - mx))`` reproduces the
    reference's overlapIndices patch logic (cleaners.py:235-277) with static
    shapes."""
    py, px = psf.shape[-2:]
    canvas = jnp.zeros(psf.shape[:-2] + (2 * ny, 2 * nx), dtype=psf.dtype)
    oy = ny - py // 2
    ox = nx - px // 2
    return jax.lax.dynamic_update_slice(
        canvas,
        psf,
        (0,) * (psf.ndim - 2) + (oy, ox),
    )


def _argmax2d(a):
    idx = jnp.argmax(a)
    ny, nx = a.shape[-2:]
    return idx // nx, idx % nx


# ---------------------------------------------------------------------------
# Pallas fast path: the ENTIRE minor-cycle loop as one kernel with the
# residual, component image and PSF canvas resident in VMEM.
#
# The XLA while_loop version below pays ~94 us/iteration at 512^2 — not
# for data (each iteration touches ~3 MB, a few microseconds at HBM
# bandwidth) but for per-iteration op dispatch and HBM round-trips of the
# loop state. Keeping the loop on-core cuts an iteration to a handful of
# VMEM passes: peak search (max + first-index reduction), a dynamic-shift
# PSF subtraction via pltpu.roll, and a masked component accumulate.
# ---------------------------------------------------------------------------


def _hogbom_pallas_kernel(
    dirty_ref,
    canvas_ref,
    win_ref,
    comps_ref,
    res_ref,
    *,
    nx: int,
    py_lo: int,
    py_hi: int,
    px_lo: int,
    px_hi: int,
    gain: float,
    thresh: float,
    fracthresh: float,
    niter: int,
    stop_factor: float,
):
    """One program: run the full Hogbom loop with everything in VMEM.

    ``canvas_ref`` holds the PSF rolled so its centre pixel sits at
    (0, 0); ``pltpu.roll(canvas, my, 0) / (.., mx, 1)`` then places the
    centre at the current peak, and the (py_lo..py_hi, px_lo..px_hi)
    window around the peak masks off the wrap-around — reproducing the
    reference's overlapIndices patch clipping (cleaners.py:235-277)
    with no data-dependent shapes."""
    from jax.experimental.pallas import tpu as pltpu

    res_ref[...] = dirty_ref[...]
    comps_ref[...] = jnp.zeros_like(comps_ref)
    canvas = canvas_ref[...]
    pmax = jnp.max(canvas)
    psf_c = canvas[0, 0]
    absthresh = jnp.maximum(
        jnp.float32(thresh),
        jnp.float32(fracthresh) * jnp.max(jnp.abs(dirty_ref[...])),
    )
    ny_, nx_ = res_ref.shape
    rr = jax.lax.broadcasted_iota(jnp.int32, (ny_, nx_), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (ny_, nx_), 1)
    lin = rr * nx + cc
    win = win_ref[...] if win_ref is not None else None

    def cond(carry):
        i, done = carry
        return (i < niter) & jnp.logical_not(done)

    def body(carry):
        i, _ = carry
        res = res_ref[...]
        search = jnp.abs(res * win) if win is not None else jnp.abs(res)
        m = jnp.max(search)
        best = jnp.min(
            jnp.where(search == m, lin, jnp.int32(ny_ * nx))
        )
        myi = best // nx
        mxi = best - myi * nx
        val = jnp.sum(jnp.where(lin == best, res, 0.0))
        mval = val * gain / pmax
        rolled = pltpu.roll(pltpu.roll(canvas, myi, 0), mxi, 1)
        dy = rr - myi
        dx = cc - mxi
        valid = (
            (dy >= py_lo) & (dy < py_hi) & (dx >= px_lo) & (dx < px_hi)
        )
        res_ref[...] = res - jnp.where(valid, rolled, 0.0) * mval
        comps_ref[...] = comps_ref[...] + jnp.where(
            lin == best, mval, 0.0
        )
        val_new = val - mval * psf_c
        done2 = jnp.abs(val_new) < stop_factor * absthresh
        return i + 1, done2

    jax.lax.while_loop(cond, body, (jnp.int32(0), False))


def _hogbom_pallas_list_kernel(
    dirty_ref,
    canvas_ref,
    win_ref,
    comps_ref,
    res_ref,
    *,
    nx: int,
    py_lo: int,
    py_hi: int,
    px_lo: int,
    px_hi: int,
    gain: float,
    thresh: float,
    fracthresh: float,
    niter: int,
    stop_factor: float,
):
    """Large-image variant: components are emitted as a compact
    [niter, 128] (y, x, val, used) row list instead of an image, and the
    residual aliases the dirty input — VMEM holds res + canvas + one
    temporary, which fits 1024^2 f32."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    canvas = canvas_ref[...]
    pmax = jnp.max(canvas)
    psf_c = canvas[0, 0]
    absthresh = jnp.maximum(
        jnp.float32(thresh),
        jnp.float32(fracthresh) * jnp.max(jnp.abs(res_ref[...])),
    )
    ny_, nx_ = res_ref.shape
    rr = jax.lax.broadcasted_iota(jnp.int32, (ny_, nx_), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (ny_, nx_), 1)
    lin = rr * nx + cc
    win = win_ref[...] if win_ref is not None else None
    comps_ref[...] = jnp.zeros_like(comps_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def cond(carry):
        i, done = carry
        return (i < niter) & jnp.logical_not(done)

    def body(carry):
        i, _ = carry
        res = res_ref[...]
        search = jnp.abs(res * win) if win is not None else jnp.abs(res)
        m = jnp.max(search)
        best = jnp.min(
            jnp.where(search == m, lin, jnp.int32(ny_ * nx))
        )
        myi = best // nx
        mxi = best - myi * nx
        val = jnp.sum(jnp.where(lin == best, res, 0.0))
        mval = val * gain / pmax
        rolled = pltpu.roll(pltpu.roll(canvas, myi, 0), mxi, 1)
        dy = rr - myi
        dx = cc - mxi
        valid = (
            (dy >= py_lo) & (dy < py_hi) & (dx >= px_lo) & (dx < px_hi)
        )
        res_ref[...] = res - jnp.where(valid, rolled, 0.0) * mval
        row = (
            jnp.where(col == 0, myi.astype(jnp.float32), 0.0)
            + jnp.where(col == 1, mxi.astype(jnp.float32), 0.0)
            + jnp.where(col == 2, mval, 0.0)
            + jnp.where(col == 3, 1.0, 0.0)
        )
        comps_ref[pl.dslice(i, 1), :] = row
        val_new = val - mval * psf_c
        done2 = jnp.abs(val_new) < stop_factor * absthresh
        return i + 1, done2

    jax.lax.while_loop(cond, body, (jnp.int32(0), False))


# max pixels for the VMEM-resident kernel (res + comps + canvas + dirty
# + a couple of temporaries, f32): 512^2 uses ~6 MB of the ~16 MB VMEM;
# above it, up to 1024^2, the list-output kernel (aliased residual, no
# comps image in VMEM) takes over
_PALLAS_CLEAN_MAX_PIXELS = 512 * 512
_PALLAS_CLEAN_LIST_MAX_PIXELS = 1024 * 1024


def _pallas_clean_ok(dirty, psf, interpret, niter=None):
    if not (interpret or jax.default_backend() == "tpu"):
        return False
    ny, nx = dirty.shape[-2:]
    py, px = psf.shape[-2:]
    if not (
        py <= ny and px <= nx and nx % 128 == 0
        and not jnp.iscomplexobj(dirty)
    ):
        return False
    if ny * nx <= _PALLAS_CLEAN_MAX_PIXELS:
        return True
    # list-output variant: the [niter, 128] component list must also
    # fit VMEM next to the residual and canvas
    return (
        ny * nx <= _PALLAS_CLEAN_LIST_MAX_PIXELS
        and (niter is None or niter <= 2048)
    )


@partial(
    jax.jit,
    static_argnames=(
        "gain", "thresh", "niter", "fracthresh", "stop_factor",
        "interpret", "has_window",
    ),
)
def _hogbom_pallas(
    dirty,
    psf,
    window=None,
    *,
    gain: float,
    thresh: float,
    niter: int,
    fracthresh: float,
    stop_factor: float = 0.9,
    interpret: bool = False,
    has_window: bool = False,
):
    import jax.experimental.pallas as pl

    dirty = dirty.astype(jnp.float32)
    psf = psf.astype(jnp.float32)
    ny, nx = dirty.shape
    py, px = psf.shape
    cy, cx = py // 2, px // 2
    embed = jnp.zeros((ny, nx), jnp.float32).at[:py, :px].set(psf)
    canvas = jnp.roll(embed, (-cy, -cx), axis=(0, 1))
    args = [dirty, canvas]
    if has_window:
        args.append(
            jnp.broadcast_to(window, dirty.shape).astype(jnp.float32)
        )
    use_list = ny * nx > _PALLAS_CLEAN_MAX_PIXELS
    kernel = partial(
        _hogbom_pallas_list_kernel if use_list else _hogbom_pallas_kernel,
        nx=nx,
        py_lo=-cy,
        py_hi=py - cy,
        px_lo=-cx,
        px_hi=px - cx,
        gain=float(gain),
        thresh=float(thresh),
        fracthresh=float(fracthresh),
        niter=int(niter),
        stop_factor=float(stop_factor),
    )
    if not has_window:
        kernel = partial(kernel, win_ref=None)

        def kern(dirty_ref, canvas_ref, comps_ref, res_ref):
            kernel(dirty_ref, canvas_ref, comps_ref=comps_ref,
                   res_ref=res_ref)
    else:
        kern = kernel
    if not use_list:
        comps, res = pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((ny, nx), jnp.float32),
                jax.ShapeDtypeStruct((ny, nx), jnp.float32),
            ),
            interpret=interpret,
        )(*args)
        return comps, res
    nlist = max(int(niter), 8)
    clist, res = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((nlist, 128), jnp.float32),
            jax.ShapeDtypeStruct((ny, nx), jnp.float32),
        ),
        # the residual starts as (and replaces) the dirty image, so the
        # kernel never holds both plus a component image in VMEM
        input_output_aliases={0: 1},
        interpret=interpret,
    )(*args)
    yi = clist[:, 0].astype(jnp.int32)
    xi = clist[:, 1].astype(jnp.int32)
    vals = jnp.where(clist[:, 3] > 0.0, clist[:, 2], 0.0)
    comps = jnp.zeros((ny, nx), jnp.float32).at[yi, xi].add(vals)
    return comps, res


@partial(
    jax.jit,
    static_argnames=(
        "gain", "thresh", "niter", "fracthresh", "use_pallas"
    ),
)
def hogbom(
    dirty,
    psf,
    window=None,
    gain: float = 0.1,
    thresh: float = 0.0,
    niter: int = 100,
    fracthresh: float = 0.01,
    use_pallas: bool | None = None,
):
    """Hogbom CLEAN (cleaners.py:23-133). Returns (comps, residual).

    :param dirty: [ny, nx]; :param psf: [py, px] with unit peak
    :param window: optional [ny, nx] search window (1 = allowed)
    :param use_pallas: force (True) or disable (False) the VMEM-resident
        Pallas loop; None = automatic (TPU backend, image fits VMEM).
        ``True`` on a CPU backend runs the kernel in interpret mode.
    """
    ny, nx = dirty.shape
    interpret = jax.default_backend() != "tpu"
    auto = use_pallas is None and _pallas_clean_ok(
        dirty, psf, interpret=False, niter=niter
    )
    forced = use_pallas and _pallas_clean_ok(
        dirty, psf, interpret=interpret, niter=niter
    )
    if auto or forced:
        return _hogbom_pallas(
            dirty,
            psf,
            window,
            gain=float(gain),
            thresh=float(thresh),
            niter=niter,
            fracthresh=float(fracthresh),
            stop_factor=0.9,
            interpret=interpret,
            has_window=window is not None,
        )
    pmax = jnp.max(psf)
    psf_big = _pad_psf_like(psf, ny, nx)
    absthresh = jnp.maximum(thresh, fracthresh * jnp.max(jnp.abs(dirty)))

    def cond(state):
        res, comps, i, done = state
        return (i < niter) & (~done)

    def body(state):
        res, comps, i, done = state
        search = jnp.abs(res * window) if window is not None else jnp.abs(res)
        my, mx = _argmax2d(search)
        mval = res[my, mx] * gain / pmax
        patch = jax.lax.dynamic_slice(
            psf_big, (ny - my, nx - mx), (ny, nx)
        )
        res_new = res - patch * mval
        comps_new = comps.at[my, mx].add(mval)
        # freeze converged lanes: required for correctness under vmap,
        # where the while_loop runs lock-step until every lane stops
        res = jnp.where(done, res, res_new)
        comps = jnp.where(done, comps, comps_new)
        stop = done | (jnp.abs(res_new[my, mx]) < 0.9 * absthresh)
        return res, comps, i + 1, stop

    res0 = dirty
    comps0 = jnp.zeros_like(dirty)
    res, comps, _, _ = jax.lax.while_loop(
        cond, body, (res0, comps0, 0, False)
    )
    return comps, res


def _hogbom_complex_pallas_kernel(
    dq_ref,
    du_ref,
    canvas_ref,
    win_ref,
    cq_ref,
    cu_ref,
    rq_ref,
    ru_ref,
    *,
    nx: int,
    py_lo: int,
    py_hi: int,
    px_lo: int,
    px_hi: int,
    gain: float,
    thresh: float,
    fracthresh: float,
    niter: int,
):
    """Complex (Q+iU) Hogbom as one VMEM-resident loop: the peak search
    is over the polarised intensity sqrt(Q^2+U^2) and the (real) PSF
    patch subtracts a complex loop value from both planes."""
    from jax.experimental.pallas import tpu as pltpu

    rq_ref[...] = dq_ref[...]
    ru_ref[...] = du_ref[...]
    cq_ref[...] = jnp.zeros_like(cq_ref)
    cu_ref[...] = jnp.zeros_like(cu_ref)
    canvas = canvas_ref[...]
    pmax = jnp.max(canvas)
    psf_c = canvas[0, 0]
    mod0 = jnp.sqrt(dq_ref[...] ** 2 + du_ref[...] ** 2)
    absthresh = jnp.maximum(
        jnp.float32(thresh), jnp.float32(fracthresh) * jnp.max(mod0)
    )
    ny_, nx_ = rq_ref.shape
    rr = jax.lax.broadcasted_iota(jnp.int32, (ny_, nx_), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (ny_, nx_), 1)
    lin = rr * nx + cc
    win = win_ref[...] if win_ref is not None else None

    def cond(carry):
        i, done = carry
        return (i < niter) & jnp.logical_not(done)

    def body(carry):
        i, _ = carry
        rq = rq_ref[...]
        ru = ru_ref[...]
        if win is not None:
            search = jnp.sqrt((rq * win) ** 2 + (ru * win) ** 2)
        else:
            search = jnp.sqrt(rq * rq + ru * ru)
        m = jnp.max(search)
        best = jnp.min(
            jnp.where(search == m, lin, jnp.int32(ny_ * nx))
        )
        myi = best // nx
        mxi = best - myi * nx
        is_best = lin == best
        vq = jnp.sum(jnp.where(is_best, rq, 0.0))
        vu = jnp.sum(jnp.where(is_best, ru, 0.0))
        mq = vq * gain / pmax
        mu = vu * gain / pmax
        rolled = pltpu.roll(pltpu.roll(canvas, myi, 0), mxi, 1)
        dy = rr - myi
        dx = cc - mxi
        valid = (
            (dy >= py_lo) & (dy < py_hi) & (dx >= px_lo) & (dx < px_hi)
        )
        patch = jnp.where(valid, rolled, 0.0)
        rq_ref[...] = rq - patch * mq
        ru_ref[...] = ru - patch * mu
        cq_ref[...] = cq_ref[...] + jnp.where(is_best, mq, 0.0)
        cu_ref[...] = cu_ref[...] + jnp.where(is_best, mu, 0.0)
        vq_new = vq - mq * psf_c
        vu_new = vu - mu * psf_c
        done2 = jnp.sqrt(vq_new**2 + vu_new**2) < absthresh
        return i + 1, done2

    jax.lax.while_loop(cond, body, (jnp.int32(0), False))


def _hogbom_complex_pallas_list_kernel(
    dq_ref,
    du_ref,
    canvas_ref,
    win_ref,
    clist_ref,
    rq_ref,
    ru_ref,
    *,
    nx: int,
    py_lo: int,
    py_hi: int,
    px_lo: int,
    px_hi: int,
    gain: float,
    thresh: float,
    fracthresh: float,
    niter: int,
):
    """Large-image complex variant (the real list kernel's trick at
    1024^2): components are emitted as a compact [niter, 128]
    (y, x, mq, mu, used) row list and BOTH residuals alias their dirty
    inputs, so VMEM holds rq + ru + canvas + loop temporaries only.
    The peak search compares |Q+iU|^2 (no sqrt materialisation)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    canvas = canvas_ref[...]
    pmax = jnp.max(canvas)
    psf_c = canvas[0, 0]
    mod2 = rq_ref[...] ** 2 + ru_ref[...] ** 2
    absthresh = jnp.maximum(
        jnp.float32(thresh),
        jnp.float32(fracthresh) * jnp.sqrt(jnp.max(mod2)),
    )
    ny_, nx_ = rq_ref.shape
    rr = jax.lax.broadcasted_iota(jnp.int32, (ny_, nx_), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (ny_, nx_), 1)
    lin = rr * nx + cc
    win = win_ref[...] if win_ref is not None else None
    clist_ref[...] = jnp.zeros_like(clist_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def cond(carry):
        i, done = carry
        return (i < niter) & jnp.logical_not(done)

    def body(carry):
        i, _ = carry
        rq = rq_ref[...]
        ru = ru_ref[...]
        if win is not None:
            search = (rq * win) ** 2 + (ru * win) ** 2
        else:
            search = rq * rq + ru * ru
        m = jnp.max(search)
        best = jnp.min(
            jnp.where(search == m, lin, jnp.int32(ny_ * nx))
        )
        myi = best // nx
        mxi = best - myi * nx
        is_best = lin == best
        vq = jnp.sum(jnp.where(is_best, rq, 0.0))
        vu = jnp.sum(jnp.where(is_best, ru, 0.0))
        mq = vq * gain / pmax
        mu = vu * gain / pmax
        rolled = pltpu.roll(pltpu.roll(canvas, myi, 0), mxi, 1)
        dy = rr - myi
        dx = cc - mxi
        valid = (
            (dy >= py_lo) & (dy < py_hi) & (dx >= px_lo) & (dx < px_hi)
        )
        patch = jnp.where(valid, rolled, 0.0)
        rq_ref[...] = rq - patch * mq
        ru_ref[...] = ru - patch * mu
        row = (
            jnp.where(col == 0, myi.astype(jnp.float32), 0.0)
            + jnp.where(col == 1, mxi.astype(jnp.float32), 0.0)
            + jnp.where(col == 2, mq, 0.0)
            + jnp.where(col == 3, mu, 0.0)
            + jnp.where(col == 4, 1.0, 0.0)
        )
        clist_ref[pl.dslice(i, 1), :] = row
        vq_new = vq - mq * psf_c
        vu_new = vu - mu * psf_c
        done2 = vq_new**2 + vu_new**2 < absthresh * absthresh
        return i + 1, done2

    jax.lax.while_loop(cond, body, (jnp.int32(0), False))


@partial(
    jax.jit,
    static_argnames=(
        "gain", "thresh", "niter", "fracthresh", "interpret",
        "has_window",
    ),
)
def _hogbom_complex_pallas(
    dirty_q,
    dirty_u,
    psf_q,
    window=None,
    *,
    gain: float,
    thresh: float,
    niter: int,
    fracthresh: float,
    interpret: bool = False,
    has_window: bool = False,
):
    import jax.experimental.pallas as pl

    dq = dirty_q.astype(jnp.float32)
    du = dirty_u.astype(jnp.float32)
    psf = psf_q.astype(jnp.float32)
    ny, nx = dq.shape
    py, px = psf.shape
    cy, cx = py // 2, px // 2
    embed = jnp.zeros((ny, nx), jnp.float32).at[:py, :px].set(psf)
    canvas = jnp.roll(embed, (-cy, -cx), axis=(0, 1))
    args = [dq, du, canvas]
    if has_window:
        args.append(jnp.broadcast_to(window, dq.shape).astype(jnp.float32))
    use_list = ny * nx > _PALLAS_CLEAN_MAX_PIXELS
    kernel = partial(
        _hogbom_complex_pallas_list_kernel
        if use_list
        else _hogbom_complex_pallas_kernel,
        nx=nx,
        py_lo=-cy,
        py_hi=py - cy,
        px_lo=-cx,
        px_hi=px - cx,
        gain=float(gain),
        thresh=float(thresh),
        fracthresh=float(fracthresh),
        niter=int(niter),
    )
    shp = jax.ShapeDtypeStruct((ny, nx), jnp.float32)
    if not use_list:
        if not has_window:
            kernel = partial(kernel, win_ref=None)

            def kern(dq_ref, du_ref, canvas_ref, cq, cu, rq, ru):
                kernel(dq_ref, du_ref, canvas_ref, cq_ref=cq, cu_ref=cu,
                       rq_ref=rq, ru_ref=ru)
        else:
            kern = kernel
        return pl.pallas_call(
            kern,
            out_shape=(shp, shp, shp, shp),
            interpret=interpret,
        )(*args)
    if not has_window:
        kernel = partial(kernel, win_ref=None)

        def kern(dq_ref, du_ref, canvas_ref, clist, rq, ru):
            kernel(dq_ref, du_ref, canvas_ref, clist_ref=clist,
                   rq_ref=rq, ru_ref=ru)
    else:
        kern = kernel
    nlist = max(int(niter), 8)
    clist, rq, ru = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((nlist, 128), jnp.float32),
            shp,
            shp,
        ),
        # both residuals start as (and replace) their dirty inputs —
        # VMEM never holds dirty and residual pairs simultaneously
        input_output_aliases={0: 1, 1: 2},
        interpret=interpret,
    )(*args)
    yi = clist[:, 0].astype(jnp.int32)
    xi = clist[:, 1].astype(jnp.int32)
    used = clist[:, 4] > 0.0
    cq = jnp.zeros((ny, nx), jnp.float32).at[yi, xi].add(
        jnp.where(used, clist[:, 2], 0.0)
    )
    cu = jnp.zeros((ny, nx), jnp.float32).at[yi, xi].add(
        jnp.where(used, clist[:, 3], 0.0)
    )
    return cq, cu, rq, ru


@partial(
    jax.jit,
    static_argnames=(
        "gain", "thresh", "niter", "fracthresh", "use_pallas"
    ),
)
def hogbom_complex(
    dirty_q,
    dirty_u,
    psf_q,
    psf_u,
    window=None,
    gain: float = 0.1,
    thresh: float = 0.0,
    niter: int = 100,
    fracthresh: float = 0.01,
    use_pallas: bool | None = None,
):
    """Complex Hogbom CLEAN of Q+iU (cleaners.py:136-232).

    Returns (comps_q, comps_u, res_q, res_u)."""
    # <=512^2: the 6-image VMEM-resident kernel; above it (to 1024^2)
    # the list-output kernel aliases both residuals onto the dirty
    # inputs and emits (y, x, mq, mu) rows — same trick as the real
    # Hogbom list variant
    interpret = jax.default_backend() != "tpu"
    auto = use_pallas is None and _pallas_clean_ok(
        dirty_q, psf_q, interpret=False, niter=niter
    )
    forced = use_pallas and _pallas_clean_ok(
        dirty_q, psf_q, interpret=interpret, niter=niter
    )
    if auto or forced:
        cq, cu, rq, ru = _hogbom_complex_pallas(
            dirty_q,
            dirty_u,
            psf_q,
            window,
            gain=float(gain),
            thresh=float(thresh),
            niter=niter,
            fracthresh=float(fracthresh),
            interpret=interpret,
            has_window=window is not None,
        )
        return cq, cu, rq, ru
    dirty = dirty_q + 1j * dirty_u
    ny, nx = dirty.shape
    pmax = jnp.max(psf_q)
    psf_big = _pad_psf_like(psf_q.astype(dirty.dtype), ny, nx)
    absthresh = jnp.maximum(thresh, fracthresh * jnp.max(jnp.abs(dirty)))

    def cond(state):
        res, comps, i, done = state
        return (i < niter) & (~done)

    def body(state):
        res, comps, i, done = state
        search = (
            jnp.abs(res * window) if window is not None else jnp.abs(res)
        )
        my, mx = _argmax2d(search)
        mval = res[my, mx] * gain / pmax
        patch = jax.lax.dynamic_slice(
            psf_big, (ny - my, nx - mx), (ny, nx)
        )
        res_new = res - patch * mval
        comps_new = comps.at[my, mx].add(mval)
        res = jnp.where(done, res, res_new)
        comps = jnp.where(done, comps, comps_new)
        stop = done | (jnp.abs(res_new[my, mx]) < absthresh)
        return res, comps, i + 1, stop

    res, comps, _, _ = jax.lax.while_loop(
        cond, body, (dirty, jnp.zeros_like(dirty), 0, False)
    )
    return jnp.real(comps), jnp.imag(comps), jnp.real(res), jnp.imag(res)


def create_scalestack(npixel_y: int, npixel_x: int, scales, norm=True):
    """Scale basis blobs [nscales, ny, nx] (cleaners.py:473-507): truncated
    paraboloid tapered by the PSWF, centred at (ceil(n/2), ceil(n/2))."""
    nscales = len(scales)
    ycen = int(np.ceil(float(npixel_y) / 2.0))
    xcen = int(np.ceil(float(npixel_x) / 2.0))
    iy = jnp.arange(npixel_y)[:, None] - ycen
    ix = jnp.arange(npixel_x)[None, :] - xcen
    stacks = []
    for scale in scales:
        if scale > 0:
            # f64 on CPU (x64 parity tests); TPU has no f64 — avoid the
            # truncation warning by requesting only what exists
            rdt = (
                jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
            )
            r = jnp.sqrt((iy**2 + ix**2).astype(rdt)) / (scale / 2.0)
            blob = grdsf(jnp.minimum(r, 1.0))[0] * (1.0 - r**2)
            blob = jnp.where(r < 1.0, blob, 0.0)
            blob = jnp.maximum(blob, 0.0)
            if norm:
                blob = blob / jnp.sum(blob)
            stacks.append(blob)
        else:
            blob = jnp.zeros((npixel_y, npixel_x))
            blob = blob.at[ycen, xcen].set(1.0)
            stacks.append(blob)
    return jnp.stack(stacks)


def _cfft(img):
    return jnp.fft.fftshift(
        jnp.fft.fft2(jnp.fft.fftshift(img, axes=(-2, -1)), axes=(-2, -1)),
        axes=(-2, -1),
    )


def _cifft(img):
    return jnp.fft.ifftshift(
        jnp.fft.ifft2(jnp.fft.ifftshift(img, axes=(-2, -1)), axes=(-2, -1)),
        axes=(-2, -1),
    )


def convolve_scalestack(scalestack, img):
    """FFT-convolve img with every scale (cleaners.py:511-531)."""
    ximg = _cfft(img)
    xscale = _cfft(scalestack)
    return jnp.real(_cifft(ximg[None] * jnp.conj(xscale)))


def convolve_convolve_scalestack(scalestack, img):
    """Doubly scale-convolved image [ns, ns, ny, nx]
    (cleaners.py:534-562)."""
    ximg = _cfft(img)
    xscale = _cfft(scalestack)
    xmult = (
        ximg[None, None] * xscale[None, :] * jnp.conj(xscale[:, None])
    )
    return jnp.real(_cifft(xmult))


@partial(jax.jit, static_argnames=("niter",))
def _msclean_loop(
    res_stack,
    psf_ss_big,
    pscale_big,
    coupling_diag,
    windowstack,
    sensitivity,
    gain,
    absthresh,
    niter,
):
    nscales, ny, nx = res_stack.shape

    def cond(state):
        res, comps, i, done = state
        return (i < niter) & (~done)

    def body(state):
        res, comps, i, done = state
        scaled = res / coupling_diag[:, None, None]
        if windowstack is not None:
            scaled = scaled * windowstack
        if sensitivity is not None:
            # reference multiplies sensitivity twice when searching
            # (cleaners.py:592-597); replicate
            scaled = scaled * sensitivity * sensitivity
        search = jnp.abs(scaled)
        flat = jnp.argmax(search)
        mscale = flat // (ny * nx)
        rem = flat % (ny * nx)
        my, mx = rem // nx, rem % nx
        mval = res[mscale, my, mx] / coupling_diag[mscale]
        stop = jnp.abs(res[mscale, my, mx]) < 0.9 * absthresh

        # cross-scale PSF patch subtraction, static shapes
        patch = jax.lax.dynamic_slice(
            psf_ss_big,
            (0, mscale, ny - my, nx - mx),
            (nscales, 1, ny, nx),
        )[:, 0]
        cpatch = jax.lax.dynamic_slice(
            pscale_big, (mscale, ny - my, nx - mx), (1, ny, nx)
        )[0]
        stop = done | stop
        res_new = res - patch * (gain * mval)
        comps_new = comps + cpatch * (gain * mval)
        res = jnp.where(stop, res, res_new)
        comps = jnp.where(stop, comps, comps_new)
        return res, comps, i + 1, stop

    comps0 = jnp.zeros((ny, nx), dtype=res_stack.dtype)
    res, comps, _, _ = jax.lax.while_loop(
        cond, body, (res_stack, comps0, 0, False)
    )
    return comps, res


def _msclean_pallas_kernel(
    res_ref,
    canv_ref,
    pblob_ref,
    cdiag_ref,
    comps_ref,
    res_out_ref,
    *,
    gain: float,
    thresh: float,
    fracthresh: float,
    niter: int,
):
    """The full msclean minor-cycle loop in one VMEM-resident program.

    ``res_ref`` holds the coupling-scaled residual stack [ns, ny, nx]
    (res_stack / coupling_diag — the search image, so the loop never
    rescales); ``canv_ref`` [ns_peak, ns, py, px] the cross-scale PSF
    stacks pre-divided by coupling_diag[s'] (support-bounded via the
    driver's ``psf_support``/bound_psf crop, deconvolution.py:92-107 —
    what makes the stack fit VMEM, per the reference's own contract);
    ``pblob_ref`` [ns, py, px] the component placement blobs. Peak
    placement follows the Hogbom Pallas kernel: zero-pad the selected
    stack to image size, ``pltpu.roll`` the blob centre onto the peak,
    and mask the patch window (reproducing overlapIndices clipping,
    reference cleaners.py:235-277) — the scale selection is a one-hot
    masked sum over the support-sized stacks (no gathers, no
    branches)."""
    from jax.experimental.pallas import tpu as pltpu

    ns, ny, nx = res_ref.shape
    py, px = canv_ref.shape[-2:]
    cy, cx = py // 2, px // 2
    res_out_ref[...] = res_ref[...]
    comps_ref[...] = jnp.zeros_like(comps_ref)
    cdiag = cdiag_ref[...]  # [1, ns]
    sidx = jax.lax.broadcasted_iota(jnp.int32, (ns, ny, nx), 0)
    rr = jax.lax.broadcasted_iota(jnp.int32, (ns, ny, nx), 1)
    cc = jax.lax.broadcasted_iota(jnp.int32, (ns, ny, nx), 2)
    lin = (sidx * ny + rr) * nx + cc
    si1 = jax.lax.broadcasted_iota(jnp.int32, (1, ns), 1)
    cd0 = jnp.sum(jnp.where(si1 == 0, cdiag, 0.0))
    absthresh = jnp.maximum(
        jnp.float32(thresh),
        jnp.float32(fracthresh) * cd0 * jnp.max(jnp.abs(res_out_ref[0])),
    )
    rr2 = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    cc2 = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)

    def cond(carry):
        i, done = carry
        return (i < niter) & jnp.logical_not(done)

    def body(carry):
        i, _ = carry
        res = res_out_ref[...]
        search = jnp.abs(res)
        m = jnp.max(search)
        best = jnp.min(jnp.where(search == m, lin, jnp.int32(ns * ny * nx)))
        ms = best // (ny * nx)
        rem = best - ms * (ny * nx)
        my = rem // nx
        mx = rem - my * nx
        mval = jnp.sum(jnp.where(lin == best, res, 0.0))
        cd_ms = jnp.sum(jnp.where(si1 == ms, cdiag, 0.0))
        # reference stop rule (cleaners.py:600-607): peak of the raw
        # scale-residual below 0.9*absthresh ends the loop BEFORE the
        # subtraction
        stop = jnp.abs(mval * cd_ms) < 0.9 * absthresh
        # zero loop gain on the stop iteration: subtracting zero replaces
        # branching, so every iteration runs ONE roll set (the pl.when
        # per-scale form paid the full-stack roll traffic in every
        # predicated branch — measured 0.7x the XLA loop)
        gm = jnp.where(stop, 0.0, gain * mval)
        dy = rr2 - my
        dx = cc2 - mx
        valid = (
            (dy >= -cy) & (dy < py - cy) & (dx >= -cx) & (dx < px - cx)
        )
        # one-hot select the peak scale's cross-stack and blob on the
        # SUPPORT-SIZED arrays (no gathers, no branches), then pad+roll
        # once. The mask iotas are built at the full operand rank —
        # Mosaic cannot shape-cast a 1-D mask up (infer-vector-layout:
        # unsupported shape cast on vector<3xi1> -> 3x1x1x1)
        sel4 = (
            jax.lax.broadcasted_iota(
                jnp.int32, canv_ref.shape, 0
            ) == ms
        )
        csel_small = jnp.sum(
            jnp.where(sel4, canv_ref[...], 0.0), axis=0
        )  # [ns, py, px]
        sel3 = (
            jax.lax.broadcasted_iota(
                jnp.int32, pblob_ref.shape, 0
            ) == ms
        )
        blob_small = jnp.sum(
            jnp.where(sel3, pblob_ref[...], 0.0), axis=0
        )  # [py, px]
        csel = jnp.pad(
            csel_small, ((0, 0), (0, ny - py), (0, nx - px))
        )
        rolled = pltpu.roll(
            pltpu.roll(csel, my + (ny - cy), 1), mx + (nx - cx), 2
        )
        res_out_ref[...] = res_out_ref[...] - jnp.where(
            valid[None], rolled, 0.0
        ) * gm
        blob = jnp.pad(blob_small, ((0, ny - py), (0, nx - px)))
        rolledb = pltpu.roll(
            pltpu.roll(blob, my + (ny - cy), 0), mx + (nx - cx), 1
        )
        comps_ref[...] = comps_ref[...] + jnp.where(
            valid, rolledb, 0.0
        ) * gm
        return i + 1, stop

    jax.lax.while_loop(cond, body, (jnp.int32(0), False))


def _msclean_corner_kernel(
    res_ref,
    canv_ref,
    cdiag_ref,
    ath_ref,
    clist_ref,
    res_out_ref,
    shift_ref,
    *,
    gain: float,
    thresh: float,
    fracthresh: float,
    niter: int,
):
    """Corner-frame msclean minor-cycle loop (attempt 2 at the VMEM
    kernel; VERDICT r3 item 6).

    The round-3 kernel (`_msclean_pallas_kernel`) lost to the XLA loop
    (19.0k vs 26.5k minor cycles/s at 512^2) because every iteration
    paid rank-3 traffic: a [ns, ny, nx] ``jnp.pad`` of the selected
    cross-stack plus two rank-3 ``pltpu.roll``s plus full-stack
    masked subtracts. Here the geometry is inverted: instead of moving
    the PSF patch to the peak, the RESIDUAL planes are rolled so the
    peak always sits at the static patch centre (cy, cx), and the
    subtraction is a static-window ``res[s, :py, :px] -=`` of the
    support-sized cross-stack — rank-2 ops only, no pads, and the
    per-iteration roll traffic equals the unavoidable subtract traffic.
    Components are emitted as (y, x, scale, gm, used) rows (the complex
    Hogbom list-kernel trick) and rebuilt outside bit-identically to
    ``_msclean_loop``'s patch accumulation. The cumulative frame shift
    is carried through the loop and undone once after it.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ns, ny, nx = res_ref.shape
    py, px = canv_ref.shape[-2:]
    cy, cx = py // 2, px // 2
    res_out_ref[...] = res_ref[...]
    clist_ref[...] = jnp.zeros_like(clist_ref)
    cdiag = cdiag_ref[...]  # [1, ns]
    si1 = jax.lax.broadcasted_iota(jnp.int32, (1, ns), 1)
    cd0 = jnp.sum(jnp.where(si1 == 0, cdiag, 0.0))
    col0 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    # block-chained calls (niter beyond the VMEM component-list cap)
    # pass the FIRST block's threshold in ath_ref col 0 (>= 0); a
    # negative value means "compute from this block's residual" — the
    # reference semantics tie fracthresh to the INITIAL peak
    ath_in = jnp.sum(jnp.where(col0 == 0, ath_ref[...], 0.0))
    computed = jnp.maximum(
        jnp.float32(thresh),
        jnp.float32(fracthresh) * cd0 * jnp.max(jnp.abs(res_out_ref[0])),
    )
    absthresh = jnp.where(ath_in >= 0.0, ath_in, computed)
    rr = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    lin = rr * nx + cc
    # patch-window iotas (support-sized, for the edge-clip mask)
    pr = jax.lax.broadcasted_iota(jnp.int32, (py, px), 0)
    pc = jax.lax.broadcasted_iota(jnp.int32, (py, px), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def cond(carry):
        i, done, sy, sx = carry
        return (i < niter) & jnp.logical_not(done)

    def body(carry):
        i, _, sy, sx = carry
        # per-plane maxima (rank-2 reduces), then scalar plane pick
        m = jnp.float32(-1.0)
        for s in range(ns):
            m = jnp.maximum(m, jnp.max(jnp.abs(res_out_ref[s])))
        ms = jnp.int32(ns)
        for s in range(ns - 1, -1, -1):
            m_s = jnp.max(jnp.abs(res_out_ref[s]))
            ms = jnp.where(m_s >= m, jnp.int32(s), ms)
        # one-hot extract the peak plane (rank-2), then the lin trick
        psel = jnp.zeros((ny, nx), jnp.float32)
        for s in range(ns):
            psel = psel + jnp.where(ms == s, 1.0, 0.0) * res_out_ref[s]
        best = jnp.min(
            jnp.where(jnp.abs(psel) == m, lin, jnp.int32(ny * nx))
        )
        pm_y = best // nx
        pm_x = best - pm_y * nx
        mval = jnp.sum(jnp.where(lin == best, psel, 0.0))
        cd_ms = jnp.sum(jnp.where(si1 == ms, cdiag, 0.0))
        # reference stop rule (cleaners.py:600-607): raw scale-residual
        # peak below 0.9*absthresh stops BEFORE the subtraction
        stop = jnp.abs(mval * cd_ms) < 0.9 * absthresh
        gm = jnp.where(stop, 0.0, gain * mval)
        # roll every plane so the peak lands at the patch centre
        nyc, nxc = jnp.int32(ny), jnp.int32(nx)
        dy = jax.lax.rem(jnp.int32(cy) - pm_y + nyc, nyc)
        dx = jax.lax.rem(jnp.int32(cx) - pm_x + nxc, nxc)
        for s in range(ns):
            res_out_ref[s] = pltpu.roll(
                pltpu.roll(res_out_ref[s], dy, 0), dx, 1
            )
        sy = jax.lax.rem(sy + dy, nyc)
        sx = jax.lax.rem(sx + dx, nxc)
        # true peak position (for the component row and the edge clip)
        ty = jax.lax.rem(jnp.int32(cy) - sy + nyc, nyc)
        tx = jax.lax.rem(jnp.int32(cx) - sx + nxc, nxc)
        # overlapIndices clipping: patch pixels whose TRUE coordinates
        # fall off the image receive nothing
        valid = (
            (ty - cy + pr >= 0) & (ty - cy + pr < ny)
            & (tx - cx + pc >= 0) & (tx - cx + pc < nx)
        )
        for sp in range(ns):
            csel = jnp.zeros((py, px), jnp.float32)
            for s in range(ns):
                csel = csel + jnp.where(ms == s, 1.0, 0.0) * canv_ref[s, sp]
            res_out_ref[sp, 0:py, 0:px] = res_out_ref[
                sp, 0:py, 0:px
            ] - jnp.where(valid, csel, 0.0) * gm
        row = (
            jnp.where(col == 0, ty.astype(jnp.float32), 0.0)
            + jnp.where(col == 1, tx.astype(jnp.float32), 0.0)
            + jnp.where(col == 2, ms.astype(jnp.float32), 0.0)
            + jnp.where(col == 3, gm, 0.0)
            + jnp.where(col == 4, jnp.where(stop, 0.0, 1.0), 0.0)
        )
        clist_ref[pl.dslice(i, 1), :] = row
        return i + 1, stop, sy, sx

    _, _, sy, sx = jax.lax.while_loop(
        cond, body, (jnp.int32(0), False, jnp.int32(0), jnp.int32(0))
    )
    # undo the accumulated frame shift once
    for s in range(ns):
        res_out_ref[s] = pltpu.roll(
            pltpu.roll(
                res_out_ref[s],
                jax.lax.rem(jnp.int32(ny) - sy, jnp.int32(ny)), 0,
            ),
            jax.lax.rem(jnp.int32(nx) - sx, jnp.int32(nx)), 1,
        )
    # Mosaic cannot store scalars to VMEM — write a full [1, 128] row;
    # col 2 carries the absthresh used (bitcast into the int row) so
    # block-chained calls can reuse it
    # Mosaic rejects SCALAR tpu.bitcast: broadcast to a [1, 128] row
    # first, bitcast the vector, then select col 2
    ath_bits = jax.lax.bitcast_convert_type(
        jnp.zeros((1, 128), jnp.float32) + absthresh, jnp.int32
    )
    shift_ref[...] = (
        jnp.where(col == 0, sy, 0)
        + jnp.where(col == 1, sx, 0)
        + jnp.where(col == 2, ath_bits, 0)
    )


@partial(
    jax.jit,
    static_argnames=("gain", "thresh", "fracthresh", "niter", "interpret"),
)
def _msclean_pallas_corner(
    res_stack,
    psf_ss,
    pscalestack,
    coupling_diag,
    *,
    gain: float,
    thresh: float,
    fracthresh: float,
    niter: int,
    interpret: bool = False,
):
    """Corner-frame Pallas msclean: VMEM loop emits component rows; the
    comps image is rebuilt by an XLA scan that replays
    ``_msclean_loop``'s patch accumulation order bit-identically."""
    import jax.experimental.pallas as pl

    ns, ny, nx = res_stack.shape
    py, px = psf_ss.shape[-2:]
    inv = (1.0 / coupling_diag).astype(jnp.float32)
    res_scaled = res_stack.astype(jnp.float32) * inv[:, None, None]
    # canv[s_peak, s'] = psf_ss[s', s_peak] / coupling_diag[s']
    canv = (
        psf_ss.astype(jnp.float32).transpose(1, 0, 2, 3)
        * inv[None, :, None, None]
    )
    # block-chained kernel calls lift the VMEM component-list cap: the
    # [cap, 128] list stays resident per call and blocks pass the
    # residual + the FIRST block's absthreshold forward (reference
    # semantics tie fracthresh to the initial peak). A stopped clean
    # makes later blocks exit after one peak search (~free).
    cap = _CORNER_LIST_CAP
    nblocks = max(1, -(-int(niter) // cap))
    cdiag_row = coupling_diag.astype(jnp.float32).reshape(1, ns)
    ath = jnp.full((1, 128), -1.0, jnp.float32)
    res_cur = res_scaled
    clists = []
    for b in range(nblocks):
        nb = min(cap, int(niter) - b * cap)
        kernel = partial(
            _msclean_corner_kernel,
            gain=float(gain),
            thresh=float(thresh),
            fracthresh=float(fracthresh),
            niter=nb,
        )
        clist_b, res_cur, shift = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((max(nb, 8), 128), jnp.float32),
                jax.ShapeDtypeStruct((ns, ny, nx), jnp.float32),
                jax.ShapeDtypeStruct((1, 128), jnp.int32),
            ),
            input_output_aliases={0: 1},
            interpret=interpret,
        )(res_cur, canv, cdiag_row, ath)
        clists.append(clist_b[:nb])
        if b + 1 < nblocks:
            ath_val = jax.lax.bitcast_convert_type(
                shift[0, 2], jnp.float32
            )
            ath = jnp.full((1, 128), ath_val, jnp.float32)
    clist = (
        clists[0] if nblocks == 1 else jnp.concatenate(clists, axis=0)
    )
    res_scaled_out = res_cur
    res = res_scaled_out * coupling_diag[:, None, None].astype(jnp.float32)
    # rebuild comps exactly as _msclean_loop accumulates them: a scan of
    # dynamic-slice blob patches in emission order
    pscale_big = _pad_psf_like(pscalestack.astype(jnp.float32), ny, nx)

    def step(comps, row):
        ty = row[0].astype(jnp.int32)
        tx = row[1].astype(jnp.int32)
        ms = row[2].astype(jnp.int32)
        gm = row[3] * row[4]
        cpatch = jax.lax.dynamic_slice(
            pscale_big, (ms, ny - ty, nx - tx), (1, ny, nx)
        )[0]
        return comps + cpatch * gm, None

    comps, _ = jax.lax.scan(
        step, jnp.zeros((ny, nx), jnp.float32), clist
    )
    return comps, res


# per-kernel-call component-list residency caps (block-chained beyond)
_CORNER_LIST_CAP = 8192
_MSMFS_LIST_CAP = 4096

_MSCLEAN_PALLAS_MAX_PIXELS = 512 * 512
_MSCLEAN_PALLAS_MAX_PSF = 256 * 256


def _msclean_pallas_ok(dirty, psf, nscales, window, sensitivity, interpret):
    """Shape gate for the VMEM-resident msclean kernels. The
    corner-frame kernel (round 4) IS auto-selected on TPU: measured
    110.3k minor cycles/s at 512^2 / 4 scales / 256-support PSF vs the
    XLA while_loop's 56.4k (two-point slope 2000->16000 iters, identical
    residuals). The round-3 kernel ('v1') stays opt-in for reference —
    its per-iteration rank-3 pad+roll traffic measured 19.0k."""
    if not (interpret or jax.default_backend() == "tpu"):
        return False
    if window is not None or sensitivity is not None:
        return False
    ny, nx = dirty.shape[-2:]
    py, px = psf.shape[-2:]
    return (
        nscales <= 4
        and ny * nx <= _MSCLEAN_PALLAS_MAX_PIXELS
        and py * px <= _MSCLEAN_PALLAS_MAX_PSF
        and py <= ny and px <= nx
        and nx % 128 == 0 and px % 128 == 0 and py % 8 == 0
    )


@partial(
    jax.jit,
    static_argnames=("gain", "thresh", "fracthresh", "niter", "interpret"),
)
def _msclean_pallas(
    res_stack,
    psf_ss,
    pscalestack,
    coupling_diag,
    *,
    gain: float,
    thresh: float,
    fracthresh: float,
    niter: int,
    interpret: bool = False,
):
    import jax.experimental.pallas as pl

    ns, ny, nx = res_stack.shape
    inv = (1.0 / coupling_diag).astype(jnp.float32)
    res_scaled = res_stack.astype(jnp.float32) * inv[:, None, None]
    # canv[s_peak, s'] = psf_ss[s', s_peak] / coupling_diag[s']
    canv = (
        psf_ss.astype(jnp.float32).transpose(1, 0, 2, 3)
        * inv[None, :, None, None]
    )
    kernel = partial(
        _msclean_pallas_kernel,
        gain=float(gain),
        thresh=float(thresh),
        fracthresh=float(fracthresh),
        niter=int(niter),
    )
    comps, res_scaled_out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((ns, ny, nx), jnp.float32),
        ),
        input_output_aliases={0: 1},
        interpret=interpret,
    )(res_scaled, canv, pscalestack.astype(jnp.float32),
      coupling_diag.astype(jnp.float32).reshape(1, ns))
    return comps, res_scaled_out * coupling_diag[:, None, None].astype(
        jnp.float32
    )


def msclean(
    dirty,
    psf,
    window=None,
    sensitivity=None,
    gain: float = 0.1,
    thresh: float = 0.0,
    niter: int = 100,
    scales=(0, 3, 10, 30),
    fracthresh: float = 0.01,
    use_pallas: bool | None = None,
):
    """Multi-scale CLEAN (Cornwell 2008; cleaners.py:279-468).

    On TPU, when the PSF is support-bounded (``deconvolve_cube``'s
    ``psf_support`` / :func:`bound_psf`) so the cross-scale PSF stack
    fits VMEM, the whole minor-cycle loop runs as one Pallas program
    (``use_pallas=None`` auto-selects; windows/sensitivity fall back to
    the XLA while_loop).

    Returns (comps, residual)."""
    ny, nx = dirty.shape
    pmax = jnp.max(psf)
    lpsf = psf / pmax
    ldirty = dirty / pmax
    scalestack = create_scalestack(ny, nx, scales, norm=True)
    pscalestack = create_scalestack(
        psf.shape[0], psf.shape[1], scales, norm=True
    )
    res_stack = convolve_scalestack(scalestack, ldirty)
    psf_ss = convolve_convolve_scalestack(pscalestack, lpsf)
    coupling = jnp.max(psf_ss, axis=(-2, -1))  # [ns, ns]
    coupling_diag = jnp.diagonal(coupling)

    if use_pallas is None:
        # corner-frame kernel auto-selects on TPU (110.3k vs XLA 56.4k
        # minor cycles/s at 512^2 — see _msclean_pallas_ok); CPU keeps
        # the XLA loop (interpret-mode pallas is slow)
        # the component list is block-chained (cap 8192 rows per kernel
        # call), so niter is unbounded (round 5; was gated <= 16384)
        use_pallas = (
            jax.default_backend() == "tpu"
            and _msclean_pallas_ok(
                dirty, psf, len(scales), window, sensitivity, False
            )
        )
    if use_pallas:
        fn = (
            _msclean_pallas if use_pallas == "v1" else
            _msclean_pallas_corner
        )
        comps, res = fn(
            res_stack,
            psf_ss,
            pscalestack,
            coupling_diag,
            gain=float(gain),
            thresh=float(thresh),
            fracthresh=float(fracthresh),
            niter=int(niter),
            interpret=jax.default_backend() != "tpu",
        )
        return comps, pmax * res[0]

    if window is None:
        windowstack = None
    else:
        windowstack = (
            convolve_scalestack(scalestack, jnp.asarray(window)) > 0.9
        ).astype(dirty.dtype)

    absthresh = jnp.maximum(
        thresh, fracthresh * jnp.max(jnp.abs(res_stack[0]))
    )
    psf_ss_big = _pad_psf_like(
        psf_ss.reshape(-1, psf.shape[0], psf.shape[1]), ny, nx
    ).reshape(len(scales), len(scales), 2 * ny, 2 * nx)
    pscale_big = _pad_psf_like(pscalestack, ny, nx)
    comps, res = _msclean_loop(
        res_stack,
        psf_ss_big,
        pscale_big,
        coupling_diag,
        windowstack,
        sensitivity,
        gain,
        absthresh,
        niter,
    )
    return comps, pmax * res[0]


# ------------------------------------------------------------------
# MSMFS (Rau & Cornwell 2011 Algorithm 1, image-plane parts)
# ------------------------------------------------------------------


def calculate_scale_moment_residual(residual, scalestack):
    """[nscales, nmoment, ny, nx] (cleaners.py:1034-1052)."""
    return jnp.stack(
        [
            convolve_scalestack(scalestack, residual[t])
            for t in range(residual.shape[0])
        ],
        axis=1,
    )


def calculate_scale_scale_moment_moment_psf(psf, scalestack):
    """[ns, ns, nm, nm, ny, nx] (cleaners.py:1055-1078)."""
    nmoment2 = psf.shape[0]
    nmoment = max(nmoment2 // 2, 1)
    nscales = scalestack.shape[0]
    out = []
    for t in range(nmoment):
        row = []
        for q in range(nmoment):
            row.append(convolve_convolve_scalestack(scalestack, psf[t + q]))
        out.append(jnp.stack(row))
    # out[t][q] has shape [ns, ns, ny, nx]; want [ns, ns, t, q, ny, nx]
    return jnp.stack([jnp.stack(row) for row in out]).transpose(
        2, 3, 0, 1, 4, 5
    )


def calculate_scale_inverse_moment_moment_hessian(ssmmpsf):
    """Hessian and inverse per scale (cleaners.py:1081-1104)."""
    nscales = ssmmpsf.shape[0]
    ny, nx = ssmmpsf.shape[-2:]
    hess = ssmmpsf[
        jnp.arange(nscales), jnp.arange(nscales), :, :, ny // 2, nx // 2
    ]
    return hess, jnp.linalg.inv(hess)


@partial(jax.jit, static_argnames=("niter", "findpeak"))
def _msmfs_loop(
    smres,
    ssmm_big,
    pscale_big,
    hsmmpsf,
    ihsmmpsf,
    windowstack,
    sensitivity,
    gain,
    absthresh,
    niter,
    findpeak,
):
    nscales, nmoment, ny, nx = smres.shape

    def find_peak(smres):
        smpsol = jnp.einsum("smn,smxy->snxy", ihsmmpsf, smres)
        if findpeak == "CASA":
            dchisq = 2.0 * jnp.einsum(
                "smxy,smxy->sxy", smpsol, smres
            ) - jnp.einsum(
                "smn,smxy,snxy->sxy", hsmmpsf, smpsol, smpsol
            )
            crit = dchisq[:, None]
        else:  # Algorithm1 / RASCIL
            crit = smpsol
        search = crit[:, 0]
        if windowstack is not None:
            search = search * windowstack
        if sensitivity is not None:
            search = search * sensitivity
        flat = jnp.argmax(jnp.abs(search))
        mscale = flat // (ny * nx)
        rem = flat % (ny * nx)
        # reference finds x,y from the *unwindowed* smpsol of that scale
        # (cleaners.py:1152-1155); replicate
        inner = jnp.abs(
            jax.lax.dynamic_slice(
                smpsol, (mscale, 0, 0, 0), (1, 1, ny, nx)
            )[0, 0]
        )
        flat2 = jnp.argmax(inner)
        my, mx = flat2 // nx, flat2 % nx
        mval = jax.lax.dynamic_slice(
            smpsol, (mscale, 0, my, mx), (1, nmoment, 1, 1)
        )[0, :, 0, 0]
        return mscale, my, mx, mval

    def cond(state):
        smres, model, i, done = state
        return (i < niter) & (~done)

    def body(state):
        smres, model, i, done = state
        mscale, my, mx, mval = find_peak(smres)
        stop = done | (jnp.abs(mval[0]) < absthresh)
        patch = jax.lax.dynamic_slice(
            ssmm_big,
            (mscale, 0, 0, 0, ny - my, nx - mx),
            (1, nscales, nmoment, nmoment, ny, nx),
        )[0]
        smres_new = smres - gain * jnp.einsum(
            "stqxy,q->stxy", patch, mval
        )
        cpatch = jax.lax.dynamic_slice(
            pscale_big, (mscale, ny - my, nx - mx), (1, ny, nx)
        )[0]
        model_new = model + gain * mval[:, None, None] * cpatch[None]
        smres = jnp.where(stop, smres, smres_new)
        model = jnp.where(stop, model, model_new)
        return smres, model, i + 1, stop

    model0 = jnp.zeros((nmoment, ny, nx), dtype=smres.dtype)
    smres, model, _, _ = jax.lax.while_loop(
        cond, body, (smres, model0, 0, False)
    )
    return model, smres


def _msmfs_corner_kernel(
    smres_ref,
    canv_ref,
    ih_ref,
    ath_ref,
    clist_ref,
    smres_out_ref,
    shift_ref,
    crit_ref,
    *,
    gain: float,
    thresh: float,
    fracthresh: float,
    niter: int,
    nm: int,
):
    """Corner-frame MSMFS minor-cycle loop (VERDICT r4 item 4): the
    msclean corner redesign applied to the scale-MOMENT stacks.

    Two structural wins over the XLA ``_msmfs_loop``:

    * the reference recomputes the FULL principal solution
      ``smpsol[s, n] = sum_m ih[s, m, n] smres[s, m]`` every iteration
      (cleaners.py:1107-1123) although the peak search reads only its
      moment-0 plane and the update only one pixel's moment vector.
      Here only the moment-0 planes (``crit``, a VMEM scratch) are
      rebuilt per iteration, and the peak's moment vector comes from a
      patch-window reduce after the roll;
    * like the msclean corner kernel, the residual planes are ROLLED so
      the peak sits at the static patch centre — the scale-scale
      moment-moment PSF subtraction is a static-window rank-2 loop with
      no pads and no [.., 2ny, 2nx] padded-PSF dynamic slices.

    Components are emitted as (ty, tx, mscale, used, gain*mval[0..nm])
    rows; the moment model is rebuilt outside by an XLA scan replaying
    ``update_moment_model``'s accumulation bit-identically.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ns = smres_ref.shape[0]
    ny, nx = smres_ref.shape[-2:]
    py, px = canv_ref.shape[-2:]
    cy, cx = py // 2, px // 2
    smres_out_ref[...] = smres_ref[...]
    clist_ref[...] = jnp.zeros_like(clist_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def ih_scalar(s, m, n):
        """ih[s, m, n] from the [ns, 128] padded flat rows (static s)."""
        return jnp.sum(
            jnp.where(col == m * nm + n, ih_ref[s:s + 1, :], 0.0)
        )

    # block-chained calls reuse the first block's threshold (see
    # _msclean_corner_kernel)
    ath_in = jnp.sum(jnp.where(col == 0, ath_ref[...], 0.0))
    computed = jnp.maximum(
        jnp.float32(thresh),
        jnp.float32(fracthresh) * jnp.max(jnp.abs(smres_out_ref[0, 0])),
    )
    absthresh = jnp.where(ath_in >= 0.0, ath_in, computed)
    rr = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    lin = rr * nx + cc
    pr = jax.lax.broadcasted_iota(jnp.int32, (py, px), 0)
    pc = jax.lax.broadcasted_iota(jnp.int32, (py, px), 1)
    centre = (pr == cy) & (pc == cx)

    def cond(carry):
        i, done, sy, sx = carry
        return (i < niter) & jnp.logical_not(done)

    def body(carry):
        i, _, sy, sx = carry
        # moment-0 principal-solution planes (the search criterion)
        for s in range(ns):
            acc = jnp.zeros((ny, nx), jnp.float32)
            for m in range(nm):
                acc = acc + ih_scalar(s, m, 0) * smres_out_ref[s, m]
            crit_ref[s] = acc
        m = jnp.float32(-1.0)
        for s in range(ns):
            m = jnp.maximum(m, jnp.max(jnp.abs(crit_ref[s])))
        ms = jnp.int32(ns)
        for s in range(ns - 1, -1, -1):
            m_s = jnp.max(jnp.abs(crit_ref[s]))
            ms = jnp.where(m_s >= m, jnp.int32(s), ms)
        psel = jnp.zeros((ny, nx), jnp.float32)
        for s in range(ns):
            psel = psel + jnp.where(ms == s, 1.0, 0.0) * crit_ref[s]
        best = jnp.min(
            jnp.where(jnp.abs(psel) == m, lin, jnp.int32(ny * nx))
        )
        pm_y = best // nx
        pm_x = best - pm_y * nx
        # roll every (scale, moment) plane: peak -> static patch centre
        nyc, nxc = jnp.int32(ny), jnp.int32(nx)
        dy = jax.lax.rem(jnp.int32(cy) - pm_y + nyc, nyc)
        dx = jax.lax.rem(jnp.int32(cx) - pm_x + nxc, nxc)
        for s in range(ns):
            for q in range(nm):
                smres_out_ref[s, q] = pltpu.roll(
                    pltpu.roll(smres_out_ref[s, q], dy, 0), dx, 1
                )
        sy = jax.lax.rem(sy + dy, nyc)
        sx = jax.lax.rem(sx + dx, nxc)
        ty = jax.lax.rem(jnp.int32(cy) - sy + nyc, nyc)
        tx = jax.lax.rem(jnp.int32(cx) - sx + nxc, nxc)
        # peak moment vector: mval[n] = sum_m ih[ms, m, n] smres[ms, m]
        # at the (now centred) peak — patch-window centre reduces
        sm = []
        for q in range(nm):
            v = jnp.float32(0.0)
            for s in range(ns):
                v = v + jnp.where(ms == s, 1.0, 0.0) * jnp.sum(
                    jnp.where(
                        centre, smres_out_ref[s, q, 0:py, 0:px], 0.0
                    )
                )
            sm.append(v)
        mval = []
        for n in range(nm):
            v = jnp.float32(0.0)
            for q in range(nm):
                for s in range(ns):
                    v = v + jnp.where(ms == s, 1.0, 0.0) * ih_scalar(
                        s, q, n
                    ) * sm[q]
            mval.append(v)
        stop = jnp.abs(mval[0]) < absthresh
        gm = [jnp.where(stop, 0.0, jnp.float32(gain) * v) for v in mval]
        # overlapIndices clip: true coords off the image receive nothing
        valid = (
            (ty - cy + pr >= 0) & (ty - cy + pr < ny)
            & (tx - cx + pc >= 0) & (tx - cx + pc < nx)
        )
        # canv is stored compactly as [s, t, qp+q, py, px]: the
        # moment-moment PSF depends only on qp+q (psf[t+q] in
        # calculate_scale_scale_moment_moment_psf), so the VMEM canvas
        # holds 2*nm-1 planes per (s, t) instead of nm^2
        for t in range(ns):
            csel = []
            for j in range(2 * nm - 1):
                c = jnp.zeros((py, px), jnp.float32)
                for s in range(ns):
                    c = c + jnp.where(
                        ms == s, 1.0, 0.0
                    ) * canv_ref[s, t, j]
                csel.append(c)
            for qp in range(nm):
                acc = jnp.zeros((py, px), jnp.float32)
                for q in range(nm):
                    acc = acc + csel[qp + q] * gm[q]
                smres_out_ref[t, qp, 0:py, 0:px] = smres_out_ref[
                    t, qp, 0:py, 0:px
                ] - jnp.where(valid, acc, 0.0)
        row = (
            jnp.where(col == 0, ty.astype(jnp.float32), 0.0)
            + jnp.where(col == 1, tx.astype(jnp.float32), 0.0)
            + jnp.where(col == 2, ms.astype(jnp.float32), 0.0)
            + jnp.where(col == 3, jnp.where(stop, 0.0, 1.0), 0.0)
        )
        for n in range(nm):
            row = row + jnp.where(col == 4 + n, gm[n], 0.0)
        clist_ref[pl.dslice(i, 1), :] = row
        return i + 1, stop, sy, sx

    _, _, sy, sx = jax.lax.while_loop(
        cond, body, (jnp.int32(0), False, jnp.int32(0), jnp.int32(0))
    )
    for s in range(ns):
        for q in range(nm):
            smres_out_ref[s, q] = pltpu.roll(
                pltpu.roll(
                    smres_out_ref[s, q],
                    jax.lax.rem(jnp.int32(ny) - sy, jnp.int32(ny)), 0,
                ),
                jax.lax.rem(jnp.int32(nx) - sx, jnp.int32(nx)), 1,
            )
    # Mosaic rejects SCALAR tpu.bitcast: broadcast to a [1, 128] row
    # first, bitcast the vector, then select col 2
    ath_bits = jax.lax.bitcast_convert_type(
        jnp.zeros((1, 128), jnp.float32) + absthresh, jnp.int32
    )
    shift_ref[...] = (
        jnp.where(col == 0, sy, 0)
        + jnp.where(col == 1, sx, 0)
        + jnp.where(col == 2, ath_bits, 0)
    )


@partial(
    jax.jit,
    static_argnames=(
        "gain", "thresh", "fracthresh", "niter", "interpret",
    ),
)
def _msmfs_pallas_corner(
    smres,
    ssmmpsf,
    ihsmmpsf,
    pscalestack,
    *,
    gain: float,
    thresh: float,
    fracthresh: float,
    niter: int,
    interpret: bool = False,
):
    """Corner-frame Pallas MSMFS minor cycles; moment model rebuilt by an
    XLA scan over the emitted component rows."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ns, nm, ny, nx = smres.shape
    py, px = ssmmpsf.shape[-2:]
    # compact moment canvas: ssmm[s, t, qp, q] depends only on qp+q
    canv = jnp.stack(
        [
            ssmmpsf[:, :, min(j, nm - 1), j - min(j, nm - 1)]
            for j in range(2 * nm - 1)
        ],
        axis=2,
    ).astype(jnp.float32)  # [ns, ns, 2nm-1, py, px]
    ih_flat = jnp.zeros((ns, 128), jnp.float32)
    ih_flat = ih_flat.at[:, : nm * nm].set(
        ihsmmpsf.astype(jnp.float32).reshape(ns, nm * nm)
    )
    # block-chained kernel calls (cap rows of component list resident
    # per call) lift the niter VMEM gate — see _msclean_pallas_corner
    cap = _MSMFS_LIST_CAP
    nblocks = max(1, -(-int(niter) // cap))
    ath = jnp.full((1, 128), -1.0, jnp.float32)
    cur = smres.astype(jnp.float32)
    clists = []
    for b in range(nblocks):
        nb = min(cap, int(niter) - b * cap)
        kernel = partial(
            _msmfs_corner_kernel,
            gain=float(gain),
            thresh=float(thresh),
            fracthresh=float(fracthresh),
            niter=nb,
            nm=nm,
        )
        clist_b, cur, shift = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((max(nb, 8), 128), jnp.float32),
                jax.ShapeDtypeStruct((ns, nm, ny, nx), jnp.float32),
                jax.ShapeDtypeStruct((1, 128), jnp.int32),
            ),
            input_output_aliases={0: 1},
            scratch_shapes=[pltpu.VMEM((ns, ny, nx), jnp.float32)],
            interpret=interpret,
        )(cur, canv, ih_flat, ath)
        clists.append(clist_b[:nb])
        if b + 1 < nblocks:
            ath_val = jax.lax.bitcast_convert_type(
                shift[0, 2], jnp.float32
            )
            ath = jnp.full((1, 128), ath_val, jnp.float32)
    clist = (
        clists[0] if nblocks == 1 else jnp.concatenate(clists, axis=0)
    )
    smres_out = cur
    pscale_big = _pad_psf_like(pscalestack.astype(jnp.float32), ny, nx)

    def step(model, row):
        ty = row[0].astype(jnp.int32)
        tx = row[1].astype(jnp.int32)
        ms = row[2].astype(jnp.int32)
        gm = row[4:4 + nm] * row[3]
        cpatch = jax.lax.dynamic_slice(
            pscale_big, (ms, ny - ty, nx - tx), (1, ny, nx)
        )[0]
        return model + gm[:, None, None] * cpatch[None], None

    model, _ = jax.lax.scan(
        step, jnp.zeros((nm, ny, nx), jnp.float32), clist
    )
    return model, smres_out


def _msmfs_pallas_ok(
    dirty, psf_patch_shape, nscales, nmoment, window, sensitivity,
    findpeak, niter, interpret,
):
    """Shape gate for the corner-frame MSMFS kernel: windowless
    RASCIL/Algorithm1 peak finding, stacks + cross-scale moment PSF
    canvases resident in VMEM."""
    if not (interpret or jax.default_backend() == "tpu"):
        return False
    if window is not None or sensitivity is not None:
        return False
    if findpeak not in ("RASCIL", "Algorithm1"):
        return False
    ny, nx = dirty.shape[-2:]
    py, px = psf_patch_shape
    # smres counted once (in/out alias), compact [ns, ns, 2nm-1] canvas
    vmem = (
        nscales * nmoment * ny * nx
        + nscales * ny * nx  # crit scratch
        + nscales * nscales * (2 * nmoment - 1) * py * px
    ) * 4
    return (
        nscales <= 4
        and nmoment <= 3
        and vmem <= 11 * 1024 * 1024
        and py <= ny and px <= nx
        and nx % 128 == 0 and px % 128 == 0
        and py % 8 == 0 and ny % 8 == 0
    )


def msmfsclean(
    dirty,
    psf,
    window=None,
    sensitivity=None,
    gain: float = 0.1,
    thresh: float = 0.0,
    niter: int = 100,
    scales=(0, 3, 10, 30),
    fracthresh: float = 0.01,
    findpeak: str = "RASCIL",
    use_pallas: bool | None = None,
):
    """Multi-scale multi-frequency CLEAN (Rau-Cornwell Algorithm 1, image
    plane; cleaners.py:686-1031) on moment cubes.

    :param dirty: [nmoment, ny, nx] frequency-moment dirty images
    :param psf: [2*nmoment (or 1), ny, nx] moment PSFs
    :return: (moment model [nmoment, ny, nx], residual [nmoment, ny, nx])

    Memory note: the padded scale-scale moment-moment PSF is
    [ns, ns, nm, nm, 2ny, 2nx]; batch channels accordingly.
    """
    nmoment, ny, nx = dirty.shape
    pmax = jnp.max(psf)
    lpsf = psf / pmax
    ldirty = dirty / pmax
    scalestack = create_scalestack(ny, nx, scales, norm=True)
    pscalestack = create_scalestack(
        psf.shape[-2], psf.shape[-1], scales, norm=True
    )
    smres = calculate_scale_moment_residual(ldirty, scalestack)
    ssmmpsf = calculate_scale_scale_moment_moment_psf(lpsf, pscalestack)
    hsmmpsf, ihsmmpsf = calculate_scale_inverse_moment_moment_hessian(
        ssmmpsf
    )
    if use_pallas is None:
        use_pallas = _msmfs_pallas_ok(
            dirty, psf.shape[-2:], len(scales), nmoment, window,
            sensitivity, findpeak, niter, False,
        )
    if use_pallas:
        model, smres_out = _msmfs_pallas_corner(
            smres,
            ssmmpsf,
            ihsmmpsf,
            pscalestack,
            gain=float(gain),
            thresh=float(thresh),
            fracthresh=float(fracthresh),
            niter=int(niter),
            interpret=jax.default_backend() != "tpu",
        )
        return model, pmax * smres_out[0]
    if window is None:
        windowstack = None
    else:
        windowstack = (
            convolve_scalestack(scalestack, jnp.asarray(window)) > 0.9
        ).astype(dirty.dtype)
    absthresh = jnp.maximum(
        thresh, fracthresh * jnp.max(jnp.abs(smres[0, 0]))
    )
    ns = len(scales)
    py, px = psf.shape[-2:]
    ssmm_big = _pad_psf_like(
        ssmmpsf.reshape(-1, py, px), ny, nx
    ).reshape(ns, ns, nmoment, nmoment, 2 * ny, 2 * nx)
    pscale_big = _pad_psf_like(pscalestack, ny, nx)
    model, smres_out = _msmfs_loop(
        smres,
        ssmm_big,
        pscale_big,
        hsmmpsf,
        ihsmmpsf,
        windowstack,
        sensitivity,
        gain,
        absthresh,
        niter,
        findpeak,
    )
    return model, pmax * smres_out[0]


# ---------------------------------------------------------------------------
# reference-named public minor-cycle helpers (cleaners.py:235-277, 565-684,
# 901-1031, 1107-1157). The batched loops above fuse these; they are exposed
# standalone for API parity and for callers composing their own cycles.
# ---------------------------------------------------------------------------


def argmax(a):
    """Unravelled index of the maximum (cleaners.py:270-277)."""
    a = jnp.asarray(a)
    return jnp.unravel_index(jnp.argmax(a), a.shape)


def overlapIndices(res, psf, peakx, peaky):
    """Overlap limits of a PSF centred at (peakx, peaky) within res
    (cleaners.py:235-268). Host-side integer math; returns
    ((res x0, x1, y0, y1), (psf x0, x1, y0, y1))."""
    nx, ny = res.shape[0], res.shape[1]
    px_half, py_half = psf.shape[0] // 2, psf.shape[1] // 2
    res_lower = (max(0, peakx - px_half), max(0, peaky - py_half))
    res_upper = (min(nx, peakx + px_half), min(peaky + py_half, ny))
    psf_lower = (
        max(0, px_half + (res_lower[0] - peakx)),
        max(0, py_half + (res_lower[1] - peaky)),
    )
    psf_upper = (
        min(psf.shape[0], px_half + (res_upper[0] - peakx)),
        min(py_half + (res_upper[1] - peaky), psf.shape[1]),
    )
    return (
        (res_lower[0], res_upper[0], res_lower[1], res_upper[1]),
        (psf_lower[0], psf_upper[0], psf_lower[1], psf_upper[1]),
    )


def find_max_abs_stack(stack, sensitivity, windowstack, couplingmatrix):
    """Peak of |stack/coupling| over (scale, y, x) (cleaners.py:565-610).

    :return: (x, y, scale) indices of the absolute maximum
    """
    stack = jnp.asarray(stack)
    resid = stack / jnp.diagonal(jnp.asarray(couplingmatrix))[
        :, None, None
    ]
    if windowstack is not None:
        resid = resid * jnp.asarray(windowstack)
    if sensitivity is not None:
        resid = resid * jnp.asarray(sensitivity)
    nscales, ny, nx = resid.shape
    flat = jnp.argmax(jnp.abs(resid))
    scale = flat // (ny * nx)
    rem = flat % (ny * nx)
    return rem // nx, rem % nx, scale


def spheroidal_function(vnu):
    """Schwab PSWF (m=6, alpha=1) rational approximation
    (cleaners.py:613-683); vectorised over ``vnu`` (0 outside |nu|<=1)."""
    vnu = jnp.abs(jnp.asarray(vnu, dtype=jnp.float64))
    from .pswf import grdsf

    value, _ = grdsf(jnp.clip(vnu, 0.0, 1.0))
    return jnp.where(vnu > 1.0, 0.0, value)


def calculate_scale_moment_principal_solution(smresidual, ihsmmpsf):
    """Decouple moments per scale: einsum smn,smxy->snxy
    (cleaners.py:1107-1122)."""
    return jnp.einsum(
        "smn,smxy->snxy", jnp.asarray(ihsmmpsf), jnp.asarray(smresidual)
    )


def find_optimum_scale_zero_moment(smpsol, sensitivity, windowstack):
    """Peak of the zero-moment decoupled residual (cleaners.py:1125-1157).

    :return: (x, y, scale). The (x, y) are found on the unwindowed image
        of the optimum scale, as in the reference.
    """
    smpsol = jnp.asarray(smpsol)
    search = smpsol[:, 0]
    if windowstack is not None:
        search = search * jnp.asarray(windowstack)
    if sensitivity is not None:
        search = search * jnp.asarray(sensitivity)
    nscales, ny, nx = search.shape
    scale = jnp.argmax(
        jnp.max(jnp.abs(search).reshape(nscales, -1), axis=1)
    )
    inner = jnp.abs(
        jax.lax.dynamic_slice(
            smpsol, (scale, 0, 0, 0), (1, 1, ny, nx)
        )[0, 0]
    )
    flat = jnp.argmax(inner)
    return flat // nx, flat % nx, scale


def find_global_optimum(
    hsmmpsf, ihsmmpsf, smresidual, windowstack, sensitivity, findpeak
):
    """Optimum (scale, x, y, moment values) for one MSMFS minor cycle
    (cleaners.py:901-974); Algorithm1 / CASA / RASCIL variants."""
    smpsol = calculate_scale_moment_principal_solution(
        smresidual, ihsmmpsf
    )
    if findpeak == "CASA":
        dchisq = 2.0 * jnp.einsum(
            "smxy,smxy->sxy", smpsol, jnp.asarray(smresidual)
        ) - jnp.einsum(
            "smn,smxy,snxy->sxy", jnp.asarray(hsmmpsf), smpsol, smpsol
        )
        mx, my, mscale = find_optimum_scale_zero_moment(
            dchisq[:, None], sensitivity, windowstack
        )
    else:  # Algorithm1 / RASCIL
        mx, my, mscale = find_optimum_scale_zero_moment(
            smpsol, sensitivity, windowstack
        )
    nmoment = smpsol.shape[1]
    mval = jax.lax.dynamic_slice(
        smpsol, (mscale, 0, mx, my), (1, nmoment, 1, 1)
    )[0, :, 0, 0]
    return mscale, mx, my, mval


def update_scale_moment_residual(
    smresidual, ssmmpsf, lhs, rhs, gain, mscale, mval
):
    """Subtract the scaled component from the scale-moment residuals
    (cleaners.py:977-1003, Algorithm 1 lines 30-32). Functional: returns
    the updated array."""
    smresidual = jnp.asarray(smresidual)
    patch = jnp.einsum(
        "stqxy,q->stxy",
        jnp.asarray(ssmmpsf)[
            mscale, :, :, :, rhs[0] : rhs[1], rhs[2] : rhs[3]
        ],
        jnp.asarray(mval),
    )
    return smresidual.at[:, :, lhs[0] : lhs[1], lhs[2] : lhs[3]].add(
        -gain * patch
    )


def update_moment_model(m_model, scalestack, lhs, rhs, gain, mscale, mval):
    """Add the scaled blob to the moment model (cleaners.py:1006-1031,
    Algorithm 1 lines 28-33). Functional: returns the updated array."""
    m_model = jnp.asarray(m_model)
    blob = jnp.asarray(scalestack)[
        mscale, rhs[0] : rhs[1], rhs[2] : rhs[3]
    ]
    add = gain * jnp.asarray(mval)[:, None, None] * blob[None]
    return m_model.at[:, lhs[0] : lhs[1], lhs[2] : lhs[3]].add(add)
