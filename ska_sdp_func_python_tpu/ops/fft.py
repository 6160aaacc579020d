"""Centred 2-D FFT helpers (framework L1).

Equivalents of /root/reference/src/ska_sdp_func_python/fourier_transforms/
fft_support.py. The reference dispatches to pyFFTW; on TPU the XLA FFT is the
fast path, so these are thin shift-sandwich wrappers that fuse under jit.

Convention (fft_support.py:31-141): ``fft`` = fftshift(fft2(ifftshift(.)))
over the last two axes; ``ifft`` is the inverse with 1/N normalisation.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["fft", "ifft", "pad_mid", "extract_mid", "extract_oversampled"]

_AXES = (-2, -1)


def fft(a):
    """Image (lm) -> grid (uv) space, centred, over the last two axes."""
    return jnp.fft.fftshift(
        jnp.fft.fft2(jnp.fft.ifftshift(a, axes=_AXES), axes=_AXES), axes=_AXES
    )


def ifft(a):
    """Grid (uv) -> image (lm) space, centred, over the last two axes."""
    return jnp.fft.fftshift(
        jnp.fft.ifft2(jnp.fft.ifftshift(a, axes=_AXES), axes=_AXES),
        axes=_AXES,
    )


def pad_mid(ff, npixel: int):
    """Zero-pad the last two axes to ``npixel`` keeping the centre pixel at
    ``npixel//2`` (fft_support.py:143-173)."""
    ny, nx = ff.shape[-2:]
    if npixel == nx and npixel == ny:
        return ff
    if npixel < nx or npixel < ny:
        raise ValueError(f"pad_mid: target {npixel} smaller than {ff.shape}")
    pw = [(0, 0)] * (ff.ndim - 2) + [
        (npixel // 2 - ny // 2, npixel - ny - (npixel // 2 - ny // 2)),
        (npixel // 2 - nx // 2, npixel - nx - (npixel // 2 - nx // 2)),
    ]
    return jnp.pad(ff, pw, mode="constant")


def extract_mid(a, npixel: int):
    """Extract the central ``npixel`` section of the last two axes
    (fft_support.py:176-198)."""
    ny, nx = a.shape[-2:]
    cy, cx = ny // 2, nx // 2
    s = npixel // 2
    if npixel % 2 != 0:
        return a[..., cy - s : cy + s + 1, cx - s : cx + s + 1]
    return a[..., cy - s : cy + s, cx - s : cx + s]


def extract_oversampled(a, xf: int, yf: int, kernel_oversampling: int, kernelwidth: int):
    """Extract the (xf, yf) sub-pixel-offset kernel from an oversampled
    parent grid (fft_support.py:201-234)."""
    npixela = a.shape[0]
    my = npixela // 2 - kernel_oversampling * (kernelwidth // 2) - yf
    mx = npixela // 2 - kernel_oversampling * (kernelwidth // 2) - xf
    mid = a[
        my : my + kernel_oversampling * kernelwidth : kernel_oversampling,
        mx : mx + kernel_oversampling * kernelwidth : kernel_oversampling,
    ]
    return kernel_oversampling * kernel_oversampling * mid
