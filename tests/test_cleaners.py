"""M4 CLEAN kernel tests: differential parity against the reference's
numpy cleaners (importable — numpy only), plus invariants."""

import numpy as np
import jax.numpy as jnp
import pytest

from ska_sdp_func_python_tpu.ops.cleaners import (
    create_scalestack,
    convolve_scalestack,
    convolve_convolve_scalestack,
    hogbom,
    hogbom_complex,
    msclean,
    msmfsclean,
)

import reference_oracle


def _make_dirty_psf(rng, n=64, nsrc=10):
    """Synthetic dirty/psf pair: random components convolved with a
    plausible PSF (sinc-gaussian)."""
    iy, ix = np.mgrid[0:n, 0:n]
    r2 = (iy - n // 2) ** 2 + (ix - n // 2) ** 2
    psf = np.exp(-r2 / (2 * 2.5**2)) + 0.1 * np.exp(-r2 / (2 * 8.0**2))
    psf *= np.cos(0.5 * np.sqrt(r2)) ** 2
    psf /= psf.max()
    truth = np.zeros((n, n))
    ys = rng.integers(10, n - 10, nsrc)
    xs = rng.integers(10, n - 10, nsrc)
    truth[ys, xs] = rng.uniform(0.5, 2.0, nsrc)
    from numpy.fft import fft2, ifft2, fftshift

    dirty = np.real(
        fftshift(ifft2(fft2(fftshift(truth)) * fft2(fftshift(psf))))
    )
    return dirty, psf


class TestHogbomParity:
    def test_matches_reference(self, rng):
        ref = reference_oracle.load_cleaners()
        dirty, psf = _make_dirty_psf(rng)
        c_ref, r_ref = ref.hogbom(
            dirty.copy(), psf.copy(), None, 0.1, 0.0, 50, 0.01
        )
        c, r = hogbom(
            jnp.asarray(dirty),
            jnp.asarray(psf),
            None,
            gain=0.1,
            thresh=0.0,
            niter=50,
            fracthresh=0.01,
        )
        np.testing.assert_allclose(np.asarray(c), c_ref, atol=1e-10)
        np.testing.assert_allclose(np.asarray(r), r_ref, atol=1e-10)

    def test_with_window(self, rng):
        ref = reference_oracle.load_cleaners()
        dirty, psf = _make_dirty_psf(rng)
        window = np.zeros_like(dirty)
        window[16:48, 16:48] = 1.0
        c_ref, r_ref = ref.hogbom(
            dirty.copy(), psf.copy(), window, 0.1, 0.0, 30, 0.01
        )
        c, r = hogbom(
            jnp.asarray(dirty),
            jnp.asarray(psf),
            jnp.asarray(window),
            gain=0.1,
            niter=30,
            fracthresh=0.01,
        )
        np.testing.assert_allclose(np.asarray(c), c_ref, atol=1e-10)
        np.testing.assert_allclose(np.asarray(r), r_ref, atol=1e-10)

    def test_complex_hogbom_matches(self, rng):
        ref = reference_oracle.load_cleaners()
        dq, psf = _make_dirty_psf(rng)
        du, _ = _make_dirty_psf(rng)
        cq_r, cu_r, rq_r, ru_r = ref.hogbom_complex(
            dq.copy(), du.copy(), psf.copy(), psf.copy(), None, 0.1, 0.0,
            30, 0.01,
        )
        cq, cu, rq, ru = hogbom_complex(
            jnp.asarray(dq),
            jnp.asarray(du),
            jnp.asarray(psf),
            jnp.asarray(psf),
            None,
            gain=0.1,
            niter=30,
            fracthresh=0.01,
        )
        np.testing.assert_allclose(np.asarray(cq), cq_r, atol=1e-10)
        np.testing.assert_allclose(np.asarray(ru), ru_r, atol=1e-10)


class TestMscleanParity:
    def test_scalestack_matches(self):
        ref = reference_oracle.load_cleaners()
        scales = [0, 3, 10]
        ss_ref = ref.create_scalestack([3, 64, 64], scales, norm=True)
        ss = create_scalestack(64, 64, scales, norm=True)
        np.testing.assert_allclose(np.asarray(ss), ss_ref, atol=1e-12)

    def test_convolve_matches(self, rng):
        ref = reference_oracle.load_cleaners()
        img = rng.normal(size=(64, 64))
        scales = [0, 3, 10]
        ss = ref.create_scalestack([3, 64, 64], scales, norm=True)
        conv_ref = ref.convolve_scalestack(ss, img)
        conv = convolve_scalestack(jnp.asarray(ss), jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(conv), conv_ref, atol=1e-10)
        cc_ref = ref.convolve_convolve_scalestack(ss, img)
        cc = convolve_convolve_scalestack(jnp.asarray(ss), jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(cc), cc_ref, atol=1e-10)

    def test_msclean_matches_reference(self, rng):
        ref = reference_oracle.load_cleaners()
        dirty, psf = _make_dirty_psf(rng)
        scales = [0, 3, 10]
        c_ref, r_ref = ref.msclean(
            dirty.copy(), psf.copy(), None, None, 0.1, 0.0, 30, scales, 0.01
        )
        c, r = msclean(
            jnp.asarray(dirty),
            jnp.asarray(psf),
            None,
            None,
            gain=0.1,
            thresh=0.0,
            niter=30,
            scales=scales,
            fracthresh=0.01,
        )
        np.testing.assert_allclose(np.asarray(c), c_ref, atol=1e-8)
        np.testing.assert_allclose(np.asarray(r), r_ref, atol=1e-8)


class TestMsmfsParity:
    @pytest.mark.parametrize("findpeak", ["RASCIL", "CASA"])
    def test_msmfs_matches_reference(self, rng, findpeak):
        ref = reference_oracle.load_cleaners()
        nmoment, n = 2, 48
        dirty = np.zeros((nmoment, n, n))
        d0, psf0 = _make_dirty_psf(rng, n=n, nsrc=6)
        d1, _ = _make_dirty_psf(rng, n=n, nsrc=6)
        dirty[0] = d0
        dirty[1] = 0.2 * d1
        psf = np.zeros((2 * nmoment, n, n))
        for m in range(2 * nmoment):
            psf[m] = psf0 * (1.0 / (1.0 + m))
        scales = [0, 4]
        c_ref, r_ref = ref.msmfsclean(
            dirty.copy(), psf.copy(), None, None, 0.1, 0.0, 20, scales,
            0.01, findpeak,
        )
        c, r = msmfsclean(
            jnp.asarray(dirty),
            jnp.asarray(psf),
            None,
            None,
            gain=0.1,
            thresh=0.0,
            niter=20,
            scales=scales,
            fracthresh=0.01,
            findpeak=findpeak,
        )
        np.testing.assert_allclose(np.asarray(c), c_ref, atol=1e-8)
        np.testing.assert_allclose(np.asarray(r), r_ref, atol=1e-8)


class TestCleanPhysics:
    def test_hogbom_reduces_residual(self, rng):
        dirty, psf = _make_dirty_psf(rng)
        c, r = hogbom(
            jnp.asarray(dirty), jnp.asarray(psf), niter=200,
            fracthresh=0.001, gain=0.2,
        )
        assert float(jnp.max(jnp.abs(r))) < 0.5 * np.max(np.abs(dirty))
        assert float(jnp.sum(jnp.abs(c))) > 0


class TestWindowedAndSensitivityParity:
    def test_msclean_with_window_matches(self, rng):
        ref = reference_oracle.load_cleaners()
        dirty, psf = _make_dirty_psf(rng)
        window = np.zeros_like(dirty)
        window[20:44, 16:48] = 1.0
        c_ref, r_ref = ref.msclean(
            dirty.copy(), psf.copy(), window, None, 0.1, 0.0, 25,
            [0, 3, 10], 0.01,
        )
        c, r = msclean(
            jnp.asarray(dirty), jnp.asarray(psf), jnp.asarray(window),
            None, gain=0.1, thresh=0.0, niter=25, scales=[0, 3, 10],
            fracthresh=0.01,
        )
        np.testing.assert_allclose(np.asarray(c), c_ref, atol=1e-8)
        np.testing.assert_allclose(np.asarray(r), r_ref, atol=1e-8)

    def test_msclean_with_sensitivity_matches(self, rng):
        ref = reference_oracle.load_cleaners()
        dirty, psf = _make_dirty_psf(rng)
        yy, xx = np.mgrid[0:64, 0:64]
        sens = 1.0 / (1.0 + 0.001 * ((yy - 32) ** 2 + (xx - 32) ** 2))
        sens /= sens.max()
        c_ref, r_ref = ref.msclean(
            dirty.copy(), psf.copy(), None, sens, 0.1, 0.0, 25,
            [0, 3, 10], 0.01,
        )
        c, r = msclean(
            jnp.asarray(dirty), jnp.asarray(psf), None, jnp.asarray(sens),
            gain=0.1, thresh=0.0, niter=25, scales=[0, 3, 10],
            fracthresh=0.01,
        )
        np.testing.assert_allclose(np.asarray(c), c_ref, atol=1e-8)
        np.testing.assert_allclose(np.asarray(r), r_ref, atol=1e-8)

    def test_msmfs_with_window_matches(self, rng):
        ref = reference_oracle.load_cleaners()
        nmoment, n = 2, 48
        d0, psf0 = _make_dirty_psf(rng, n=n, nsrc=6)
        d1, _ = _make_dirty_psf(rng, n=n, nsrc=6)
        dirty = np.stack([d0, 0.2 * d1])
        psf = np.stack([psf0 / (1.0 + m) for m in range(2 * nmoment)])
        window = np.zeros((n, n))
        window[10:38, 8:40] = 1.0
        c_ref, r_ref = ref.msmfsclean(
            dirty.copy(), psf.copy(), window, None, 0.1, 0.0, 15,
            [0, 4], 0.01, "RASCIL",
        )
        c, r = msmfsclean(
            jnp.asarray(dirty), jnp.asarray(psf), jnp.asarray(window),
            None, gain=0.1, thresh=0.0, niter=15, scales=[0, 4],
            fracthresh=0.01, findpeak="RASCIL",
        )
        np.testing.assert_allclose(np.asarray(c), c_ref, atol=1e-8)
        np.testing.assert_allclose(np.asarray(r), r_ref, atol=1e-8)

    def test_hogbom_complex_with_window(self, rng):
        ref = reference_oracle.load_cleaners()
        dq, psf = _make_dirty_psf(rng)
        du, _ = _make_dirty_psf(rng)
        window = np.zeros_like(dq)
        window[16:48, 16:48] = 1.0
        cq_r, cu_r, rq_r, ru_r = ref.hogbom_complex(
            dq.copy(), du.copy(), psf.copy(), psf.copy(), window,
            0.1, 0.0, 25, 0.01,
        )
        cq, cu, rq, ru = hogbom_complex(
            jnp.asarray(dq), jnp.asarray(du), jnp.asarray(psf),
            jnp.asarray(psf), jnp.asarray(window),
            gain=0.1, niter=25, fracthresh=0.01,
        )
        np.testing.assert_allclose(np.asarray(cq), cq_r, atol=1e-10)
        np.testing.assert_allclose(np.asarray(rq), rq_r, atol=1e-10)


class TestPallasHogbomParity:
    """The Pallas VMEM-resident Hogbom loop (both the comps-image and
    the large-image comps-list variants) must be bit-identical to the
    XLA while_loop path (interpret mode on CPU; the same kernels were
    verified bit-exact on the real chip)."""

    def _setup(self, rng, n=128):
        yy, xx = np.mgrid[0:n, 0:n]
        psf = np.exp(
            -(((yy - n // 2) / 3.0) ** 2 + ((xx - n // 2) / 3.0) ** 2)
        ).astype(np.float32)
        dirty = np.zeros((n, n), np.float32)
        for (y, x, f) in [(40, 50, 2.0), (80, 90, 1.5), (42, 52, 0.8)]:
            dirty += f * np.roll(np.roll(psf, y - n // 2, 0), x - n // 2, 1)
        dirty += rng.normal(0, 0.01, dirty.shape).astype(np.float32)
        return jnp.asarray(dirty), jnp.asarray(psf)

    def test_image_variant_matches_xla(self, rng):
        d, p = self._setup(rng)
        c0, r0 = hogbom(d, p, None, gain=0.1, niter=60, use_pallas=False)
        c1, r1 = hogbom(d, p, None, gain=0.1, niter=60, use_pallas=True)
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
        np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))

    def test_list_variant_matches_xla(self, rng, monkeypatch):
        from ska_sdp_func_python_tpu.ops import cleaners as cl

        d, p = self._setup(rng)
        # niter differs from the image-variant test so the jit cache
        # cannot reuse that trace: the kernel choice is made at trace
        # time from the (patched) size threshold
        c0, r0 = hogbom(d, p, None, gain=0.1, niter=59, use_pallas=False)
        # force the large-image (comps-list + aliased residual) kernel
        monkeypatch.setattr(cl, "_PALLAS_CLEAN_MAX_PIXELS", 64)
        c1, r1 = cl._hogbom_pallas(
            d, p, None, gain=0.1, thresh=0.0, niter=59,
            fracthresh=0.01, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
        np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))

    def test_window_variant_matches_xla(self, rng):
        d, p = self._setup(rng)
        win = jnp.asarray(
            (np.mgrid[0:128, 0:128][1] < 100).astype(np.float32)
        )
        c0, r0 = hogbom(d, p, win, gain=0.1, niter=40, use_pallas=False)
        c1, r1 = hogbom(d, p, win, gain=0.1, niter=40, use_pallas=True)
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
        np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))

    def test_complex_variant_matches_xla(self, rng):
        """Pallas complex Hogbom vs the XLA loop (1e-6: the polarised
        modulus uses sqrt(q^2+u^2) vs complex abs' hypot, so agreement
        is f32-level rather than bit-exact)."""
        d, p = self._setup(rng)
        du = jnp.asarray(
            np.roll(np.asarray(d), 5, axis=1) * np.float32(0.5)
        )
        o0 = hogbom_complex(d, du, p, p, None, gain=0.1, niter=50,
                            use_pallas=False)
        o1 = hogbom_complex(d, du, p, p, None, gain=0.1, niter=50,
                            use_pallas=True)
        for a, b in zip(o0, o1):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )

    def test_complex_list_variant_matches_xla(self, rng):
        """>512^2 images take the aliased-residual list kernel (the
        1024^2 complex lane, VERDICT round-2 item 5): parity vs the XLA
        loop at 640^2."""
        n = 640
        d = jnp.zeros((n, n), jnp.float32)
        d = d.at[300, 260].set(1.0).at[420, 500].set(-0.7)
        d = d + jnp.asarray(
            rng.normal(0, 0.01, (n, n)).astype(np.float32)
        )
        du = jnp.asarray(
            np.roll(np.asarray(d), 7, axis=0) * np.float32(0.6)
        )
        pn = 128
        yy, xx = np.mgrid[0:pn, 0:pn]
        p = jnp.asarray(
            np.exp(
                -(((yy - pn // 2) / 3.0) ** 2
                  + ((xx - pn // 2) / 3.0) ** 2)
            ).astype(np.float32)
        )
        o0 = hogbom_complex(d, du, p, p, None, gain=0.2, niter=30,
                            use_pallas=False)
        o1 = hogbom_complex(d, du, p, p, None, gain=0.2, niter=30,
                            use_pallas=True)
        for a, b in zip(o0, o1):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )


class TestPallasMscleanParity:
    """The Pallas VMEM-resident msclean loop must match the XLA
    while_loop path (interpret on CPU; support-bounded PSF as in the
    deconvolve_cube psf_support contract)."""

    def _setup(self, rng, n=256, pn=128):
        from ska_sdp_func_python_tpu.ops.cleaners import msclean  # noqa

        yy, xx = np.mgrid[0:pn, 0:pn]
        psf = np.exp(
            -(((yy - pn // 2) / 3.0) ** 2 + ((xx - pn // 2) / 3.0) ** 2)
        ).astype(np.float32)
        dirty = np.zeros((n, n), np.float32)
        big = np.zeros((n, n), np.float32)
        big[n // 2 - pn // 2:n // 2 + pn // 2,
            n // 2 - pn // 2:n // 2 + pn // 2] = psf
        for (y, x, f) in [(100, 120, 2.0), (180, 200, 1.4), (104, 124, 0.9)]:
            dirty += f * np.roll(np.roll(big, y - n // 2, 0), x - n // 2, 1)
        # extended emission for the larger scales
        dirty += 0.5 * np.exp(
            -(((np.mgrid[0:n, 0:n][0] - 150) / 25.0) ** 2
              + ((np.mgrid[0:n, 0:n][1] - 80) / 25.0) ** 2)
        ).astype(np.float32)
        dirty += rng.normal(0, 0.005, dirty.shape).astype(np.float32)
        return jnp.asarray(dirty), jnp.asarray(psf)

    def test_matches_xla(self, rng):
        from ska_sdp_func_python_tpu.ops.cleaners import msclean

        d, p = self._setup(rng)
        c0, r0 = msclean(d, p, gain=0.1, niter=40, use_pallas=False)
        c1, r1 = msclean(d, p, gain=0.1, niter=40, use_pallas=True)
        scale = float(np.max(np.abs(np.asarray(c0)))) or 1.0
        np.testing.assert_allclose(
            np.asarray(c1), np.asarray(c0), atol=1e-5 * scale
        )
        np.testing.assert_allclose(
            np.asarray(r1), np.asarray(r0),
            atol=1e-5 * float(np.max(np.abs(np.asarray(r0)))),
        )

    def test_gate_requires_bounded_psf(self):
        from ska_sdp_func_python_tpu.ops import cleaners as cl

        d = jnp.zeros((512, 512), jnp.float32)
        p_big = jnp.zeros((512, 512), jnp.float32)
        p_ok = jnp.zeros((256, 256), jnp.float32)
        assert not cl._msclean_pallas_ok(d, p_big, 4, None, None, True)
        assert cl._msclean_pallas_ok(d, p_ok, 4, None, None, True)
        assert not cl._msclean_pallas_ok(
            d, p_ok, 4, jnp.ones_like(d), None, True
        )


class TestPallasMsmfsParity:
    """The corner-frame MSMFS kernel must match the XLA _msmfs_loop
    (interpret on CPU; bounded moment PSF)."""

    def _setup(self, rng, n=256, pn=128, nmoment=2):
        yy, xx = np.mgrid[0:pn, 0:pn]
        psf0 = np.exp(
            -(((yy - pn // 2) / 3.0) ** 2 + ((xx - pn // 2) / 3.0) ** 2)
        ).astype(np.float32)
        psf = np.zeros((2 * nmoment, pn, pn), np.float32)
        for m in range(2 * nmoment):
            psf[m] = psf0 / (1.0 + 0.3 * m)
        big = np.zeros((n, n), np.float32)
        big[n // 2 - pn // 2:n // 2 + pn // 2,
            n // 2 - pn // 2:n // 2 + pn // 2] = psf0
        dirty = np.zeros((nmoment, n, n), np.float32)
        for (y, x, f) in [(100, 120, 2.0), (180, 200, 1.4), (96, 116, 0.9)]:
            blob = f * np.roll(np.roll(big, y - n // 2, 0), x - n // 2, 1)
            dirty[0] += blob
            dirty[1] += 0.25 * blob
        dirty[0] += 0.4 * np.exp(
            -(((np.mgrid[0:n, 0:n][0] - 150) / 20.0) ** 2
              + ((np.mgrid[0:n, 0:n][1] - 80) / 20.0) ** 2)
        ).astype(np.float32)
        dirty += rng.normal(0, 0.004, dirty.shape).astype(np.float32)
        return jnp.asarray(dirty), jnp.asarray(psf)

    def test_matches_xla(self, rng):
        d, p = self._setup(rng)
        kw = dict(gain=0.1, niter=25, scales=[0, 4], fracthresh=0.01)
        c0, r0 = msmfsclean(d, p, use_pallas=False, **kw)
        c1, r1 = msmfsclean(d, p, use_pallas=True, **kw)
        cs = float(np.max(np.abs(np.asarray(c0)))) or 1.0
        rs = float(np.max(np.abs(np.asarray(r0)))) or 1.0
        np.testing.assert_allclose(
            np.asarray(c1), np.asarray(c0), atol=1e-5 * cs
        )
        np.testing.assert_allclose(
            np.asarray(r1), np.asarray(r0), atol=1e-5 * rs
        )

    def test_gate(self):
        from ska_sdp_func_python_tpu.ops import cleaners as cl

        d = jnp.zeros((3, 256, 256), jnp.float32)
        ok = cl._msmfs_pallas_ok(
            d, (128, 128), 4, 3, None, None, "RASCIL", 1000, True
        )
        assert ok
        assert not cl._msmfs_pallas_ok(
            d, (128, 128), 4, 3, None, None, "CASA", 1000, True
        )
        assert not cl._msmfs_pallas_ok(
            d, (128, 128), 4, 3, jnp.ones((256, 256)), None, "RASCIL",
            1000, True,
        )
        # VMEM blow-up (full-image canvases) must be rejected
        assert not cl._msmfs_pallas_ok(
            jnp.zeros((3, 1024, 1024)), (1024, 1024), 4, 3, None, None,
            "RASCIL", 1000, True,
        )


class TestBlockChainedCornerKernels:
    """niter beyond the VMEM component-list cap runs as chained kernel
    calls carrying the residual and the first block's absthreshold
    (round 5: lifts the niter<=16384 gate)."""

    @staticmethod
    def _clear():
        import jax

        jax.clear_caches()

    def test_msclean_blocks_match_single(self, rng, monkeypatch):
        from ska_sdp_func_python_tpu.ops import cleaners as cl

        d, p = TestPallasMscleanParity()._setup(rng, n=256, pn=128)
        kw = dict(gain=0.1, thresh=0.0, niter=33, scales=(0, 3),
                  fracthresh=0.01)
        c0, r0 = cl.msclean(d, p, None, None, use_pallas=True, **kw)
        monkeypatch.setattr(cl, "_CORNER_LIST_CAP", 8)
        kw["niter"] = 34  # distinct static arg -> fresh trace
        c1, r1 = cl.msclean(d, p, None, None, use_pallas=True, **kw)
        # one extra iteration at most separates the runs; residuals of
        # the common prefix agree (compare against a fresh 34-iter
        # single-block run instead)
        monkeypatch.setattr(cl, "_CORNER_LIST_CAP", 8192)
        self._clear()
        c2, r2 = cl.msclean(d, p, None, None, use_pallas=True, **kw)
        np.testing.assert_allclose(
            np.asarray(c1), np.asarray(c2), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(r1), np.asarray(r2), atol=1e-6
        )

    def test_msmfs_blocks_match_single(self, rng, monkeypatch):
        from ska_sdp_func_python_tpu.ops import cleaners as cl

        d, p = TestPallasMsmfsParity()._setup(rng)
        kw = dict(gain=0.1, niter=26, scales=[0, 4], fracthresh=0.01)
        monkeypatch.setattr(cl, "_MSMFS_LIST_CAP", 7)
        c1, r1 = cl.msmfsclean(d, p, use_pallas=True, **kw)
        monkeypatch.setattr(cl, "_MSMFS_LIST_CAP", 4096)
        self._clear()
        c2, r2 = cl.msmfsclean(d, p, use_pallas=True, **kw)
        np.testing.assert_allclose(
            np.asarray(c1), np.asarray(c2), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(r1), np.asarray(r2), atol=1e-6
        )
