"""Beamformer calibration utilities (framework L3, C5).

Equivalents of /root/reference/src/ska_sdp_func_python/calibration/
beamformer_utils.py: rechannelise bandpass/delay calibration solutions onto
CBF beamformer channelisations. The reference's per-(time, antenna, channel)
python loops (beamformer_utils.py:228-240) become batched einsums; the
spectral resamplers are vectorised over all (time, antenna, rec, rec) at
once.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from ..models.gaintable import GainTable

log = logging.getLogger("ska-sdp-func-python-tpu")

__all__ = [
    "set_beamformer_frequencies",
    "expand_delay_phase",
    "multiply_gaintable_jones",
    "resample_bandpass",
    "PolynomialInterpolator",
    "NumpyLinearInterpolator",
    "ScipySplineInterpolator",
]


def set_beamformer_frequencies(gain_table: GainTable, array: str = "LOW"):
    """CBF beamformer channel frequencies covering the gaintable band
    (beamformer_utils.py:16-89).

    LOW: channels on integer multiples of 781.25 kHz (400 MHz / 512);
    MID: 4096 channels over 300 MHz starting at the first input channel.
    """
    frequency_gt = np.asarray(gain_table.frequency)
    if len(frequency_gt) <= 1:
        log.warning("Cannot rechannelise %d channel[s]", len(frequency_gt))
        return frequency_gt
    if array == "LOW":
        df = 781.25e3
        start = df * np.round(frequency_gt.min() / df)
    elif array == "MID":
        df = 300.0e6 / 4096
        start = frequency_gt.min()
    else:
        log.warning("Unknown array: %s. Frequencies unchanged", array)
        return frequency_gt
    return np.arange(start, frequency_gt.max(), df)


def expand_delay_phase(
    gain_table: GainTable, frequency, reference_to_centre: bool = True
) -> GainTable:
    """Expand single-frequency K (delay) phases to a bandpass
    (beamformer_utils.py:92-151): phase(f) = (f/f0) * phase(f0).
    """
    if gain_table.jones_type != "K":
        raise ValueError(f"Wrong Jones type: {gain_table.jones_type} != K")
    if gain_table.nchan != 1:
        raise ValueError("Expect a single frequency")
    frequency = jnp.atleast_1d(jnp.asarray(frequency))
    f0 = gain_table.frequency[0]
    phase0 = jnp.angle(gain_table.gain)[:, :, 0]  # [t, ant, rec, rec]
    freq = frequency - f0 if reference_to_centre else frequency
    from ..config import expi

    gain = expi(
        (freq / f0)[None, None, :, None, None] * phase0[:, :, None, :, :]
    )
    shape = gain.shape
    return GainTable(
        gain=gain,
        weight=jnp.ones(shape, dtype=gain_table.weight.dtype),
        residual=jnp.zeros(
            (shape[0], shape[2], shape[3], shape[4]),
            dtype=gain_table.residual.dtype,
        ),
        time=gain_table.time,
        interval=gain_table.interval,
        frequency=frequency,
        jones_type="B",
        receptor_frame=gain_table.receptor_frame,
    )


def multiply_gaintable_jones(
    gain_table1: GainTable, gain_table2: GainTable, elementwise: bool = False
) -> GainTable:
    """Jones-matrix (or elementwise) product of two gaintables, with
    single-channel broadcast (beamformer_utils.py:199-270)."""
    if gain_table1.jones_type == "K" or gain_table2.jones_type == "K":
        raise ValueError("Cannot multiply delays. Use expand_delay_phase")
    g1 = gain_table1.gain
    g2 = gain_table2.gain
    if g1.shape[0] != g2.shape[0]:
        raise ValueError("time axes differ")
    if g1.shape[1] != g2.shape[1]:
        raise ValueError("antenna axes differ")
    nchan = max(g1.shape[2], g2.shape[2])
    if g1.shape[2] not in (1, nchan) or g2.shape[2] not in (1, nchan):
        raise ValueError("frequency axes incompatible")
    if g1.shape[2] == 1:
        g1 = jnp.broadcast_to(g1, g1.shape[:2] + (nchan,) + g1.shape[3:])
    if g2.shape[2] == 1:
        g2 = jnp.broadcast_to(g2, g2.shape[:2] + (nchan,) + g2.shape[3:])
    if elementwise:
        gain = g1 * g2
    else:
        gain = jnp.einsum("...ij,...jk->...ik", g1, g2)
    if gain_table1.gain.shape[2] > 1:
        frequency = gain_table1.frequency
        weight = gain_table1.weight
        residual = gain_table1.residual
    else:
        frequency = gain_table2.frequency
        weight = gain_table2.weight
        residual = gain_table2.residual
    jones_type = (
        gain_table1.jones_type
        if gain_table1.jones_type == gain_table2.jones_type
        else "B"
    )
    return GainTable(
        gain=gain,
        weight=jnp.broadcast_to(weight, gain.shape),
        residual=residual,
        time=gain_table1.time,
        interval=gain_table1.interval,
        frequency=frequency,
        jones_type=jones_type,
        receptor_frame=gain_table1.receptor_frame,
    )


class PolynomialInterpolator:
    """Piecewise polynomial fit of re/im parts over frequency sub-bands
    (beamformer_utils.py:332-436)."""

    def __init__(self):
        self.edges = None
        self.polydeg = 3

    def set_edges(self, edges, nchan):
        self.edges = list(edges)

    def set_polydeg(self, polydeg):
        self.polydeg = int(polydeg)

    def interp(self, freq_in, values, freq_out):
        freq_in = np.asarray(freq_in)
        freq_out = np.asarray(freq_out)
        values = np.asarray(values)
        edges = self.edges or []
        bounds = [0] + [e for e in edges if 0 < e < len(freq_in)] + [
            len(freq_in)
        ]
        out = np.zeros(freq_out.shape, dtype=values.dtype)
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            fi = freq_in[lo:hi]
            sel = (freq_out >= fi[0]) & (freq_out <= fi[-1])
            if lo == bounds[0]:
                sel |= freq_out < fi[0]
            if hi == bounds[-1]:
                sel |= freq_out > fi[-1]
            deg = min(self.polydeg, len(fi) - 1)
            cr = np.polynomial.polynomial.polyfit(fi, values[lo:hi].real, deg)
            ci = np.polynomial.polynomial.polyfit(fi, values[lo:hi].imag, deg)
            out[sel] = np.polynomial.polynomial.polyval(
                freq_out[sel], cr
            ) + 1j * np.polynomial.polynomial.polyval(freq_out[sel], ci)
        return out


class NumpyLinearInterpolator:
    """Linear re/im interpolation (beamformer_utils.py:438-465)."""

    def interp(self, freq_in, values, freq_out):
        return np.interp(freq_out, freq_in, np.real(values)) + 1j * np.interp(
            freq_out, freq_in, np.imag(values)
        )


class ScipySplineInterpolator:
    """Cubic-spline re/im interpolation (beamformer_utils.py:467-491)."""

    def interp(self, freq_in, values, freq_out):
        from scipy.interpolate import CubicSpline

        sr = CubicSpline(freq_in, np.real(values))
        si = CubicSpline(freq_in, np.imag(values))
        return sr(freq_out) + 1j * si(freq_out)


def resample_bandpass(
    frequency_out, gain_table: GainTable, alg: str = "polyfit", edges=None,
    polydeg=None,
) -> GainTable:
    """Re-channelise gain spectra onto ``frequency_out``
    (beamformer_utils.py:273-330)."""
    frequency_gt = np.asarray(gain_table.frequency)
    if alg == "polyfit":
        interpolator = PolynomialInterpolator()
        if edges is not None:
            interpolator.set_edges(edges, len(frequency_gt))
        if polydeg is not None:
            interpolator.set_polydeg(polydeg)
    elif alg == "interp":
        interpolator = NumpyLinearInterpolator()
    elif alg == "cubicspl":
        interpolator = ScipySplineInterpolator()
    else:
        raise ValueError(f"unknown resampler {alg}")

    gain = np.asarray(gain_table.gain)
    ntime, nants, _, nrec, _ = gain.shape
    frequency_out = np.asarray(frequency_out)
    out = np.zeros(
        (ntime, nants, len(frequency_out), nrec, nrec), dtype=gain.dtype
    )
    for t in range(ntime):
        for a in range(nants):
            for r1 in range(nrec):
                for r2 in range(nrec):
                    out[t, a, :, r1, r2] = interpolator.interp(
                        frequency_gt, gain[t, a, :, r1, r2], frequency_out
                    )
    return GainTable(
        gain=jnp.asarray(out),
        weight=jnp.ones(out.shape, dtype=gain_table.weight.dtype),
        residual=jnp.zeros(
            (ntime, len(frequency_out), nrec, nrec),
            dtype=gain_table.residual.dtype,
        ),
        time=gain_table.time,
        interval=gain_table.interval,
        frequency=jnp.asarray(frequency_out),
        jones_type=gain_table.jones_type,
        receptor_frame=gain_table.receptor_frame,
    )
