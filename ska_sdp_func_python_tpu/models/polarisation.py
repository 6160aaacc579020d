"""Polarisation frames and frame conversions.

TPU-native replacement for the polarisation handling the reference delegates to
``ska_sdp_datamodels.science_data_model.polarisation_model`` and
``polarisation_functions`` (used throughout, e.g.
/root/reference/src/ska_sdp_func_python/visibility/operations.py:24-29 and
/root/reference/src/ska_sdp_func_python/image/operations.py:78-196).

Frames are plain strings (static pytree metadata); conversions are 4x4 (or 2x2)
complex matrices applied with einsum on a chosen axis, so they fuse into
surrounding XLA computations.

Conventions (Hamaker/RASCIL):
    linear   = [XX, XY, YX, YY],   XX = I+Q, XY = U+iV, YX = U-iV, YY = I-Q
    circular = [RR, RL, LR, LL],   RR = I+V, RL = Q+iU, LR = Q-iU, LL = I-V
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "PolarisationFrame",
    "pol_names",
    "npol",
    "convert_pol_frame",
    "convert_linear_to_stokes",
    "convert_stokes_to_linear",
    "convert_circular_to_stokes",
    "convert_stokes_to_circular",
    "convert_linear_to_stokesI",
    "convert_circular_to_stokesI",
    "convert_stokesI_to_polframe",
    "correlate_polarisation",
    "congruent_polarisation",
]

# Frame name -> ordered correlation/stokes labels
_FRAMES = {
    "circular": ["RR", "RL", "LR", "LL"],
    "circularnp": ["RR", "LL"],
    "linear": ["XX", "XY", "YX", "YY"],
    "linearnp": ["XX", "YY"],
    "stokesIQUV": ["I", "Q", "U", "V"],
    "stokesIV": ["I", "V"],
    "stokesIQ": ["I", "Q"],
    "stokesI": ["I"],
}


class PolarisationFrame:
    """Lightweight polarisation frame: a validated name + pol labels.

    Unlike the reference's xarray-based class this is hashable and usable as
    static metadata in jitted pytrees.
    """

    __slots__ = ("name",)

    def __init__(self, name: str):
        if name not in _FRAMES:
            raise ValueError(f"Unknown polarisation frame {name!r}")
        object.__setattr__(self, "name", name)

    def __setattr__(self, *_):  # immutable
        raise AttributeError("PolarisationFrame is immutable")

    @property
    def names(self):
        return list(_FRAMES[self.name])

    @property
    def npol(self) -> int:
        return len(_FRAMES[self.name])

    def __eq__(self, other):
        if isinstance(other, PolarisationFrame):
            return self.name == other.name
        return self.name == other

    def __hash__(self):
        return hash(self.name)

    def __repr__(self):
        return f"PolarisationFrame({self.name!r})"


def pol_names(frame: str):
    return list(_FRAMES[str(frame)])


def npol(frame: str) -> int:
    return len(_FRAMES[str(frame)])


def _name(frame) -> str:
    return frame.name if isinstance(frame, PolarisationFrame) else str(frame)


# --- conversion matrices (stokes [I,Q,U,V] basis) ------------------------

_STOKES_TO_LINEAR = np.array(
    [
        [1, 1, 0, 0],
        [0, 0, 1, 1j],
        [0, 0, 1, -1j],
        [1, -1, 0, 0],
    ],
    dtype=complex,
)
_LINEAR_TO_STOKES = np.linalg.inv(_STOKES_TO_LINEAR)

_STOKES_TO_CIRCULAR = np.array(
    [
        [1, 0, 0, 1],
        [0, 1, 1j, 0],
        [0, 1, -1j, 0],
        [1, 0, 0, -1],
    ],
    dtype=complex,
)
_CIRCULAR_TO_STOKES = np.linalg.inv(_STOKES_TO_CIRCULAR)

# index maps for the reduced ("np" / IQ / IV) frames into the 4-pol basis
_SUBSETS = {
    "linearnp": [0, 3],
    "circularnp": [0, 3],
    "stokesIQ": [0, 1],
    "stokesIV": [0, 3],
    "stokesI": [0],
}


def _apply_matrix(mat: np.ndarray, data, polaxis: int):
    """Contract conversion matrix against `polaxis` of `data`."""
    data = jnp.asarray(data)
    cdtype = jnp.result_type(data.dtype, jnp.complex64)
    mat = jnp.asarray(mat, dtype=cdtype)
    moved = jnp.moveaxis(data.astype(cdtype), polaxis, -1)
    out = jnp.einsum("pq,...q->...p", mat, moved)
    return jnp.moveaxis(out, -1, polaxis)


def convert_linear_to_stokes(data, polaxis: int = -1):
    return _apply_matrix(_LINEAR_TO_STOKES, data, polaxis)


def convert_stokes_to_linear(data, polaxis: int = -1):
    return _apply_matrix(_STOKES_TO_LINEAR, data, polaxis)


def convert_circular_to_stokes(data, polaxis: int = -1):
    return _apply_matrix(_CIRCULAR_TO_STOKES, data, polaxis)


def convert_stokes_to_circular(data, polaxis: int = -1):
    return _apply_matrix(_STOKES_TO_CIRCULAR, data, polaxis)


def convert_linear_to_stokesI(data):
    """[.., 4 or 2] linear correlations -> [.., 1] Stokes I."""
    data = jnp.asarray(data)
    if data.shape[-1] == 2:  # linearnp [XX, YY]
        return 0.5 * (data[..., 0] + data[..., 1])[..., None]
    return 0.5 * (data[..., 0] + data[..., 3])[..., None]


def convert_circular_to_stokesI(data):
    """[.., 4 or 2] circular correlations -> [.., 1] Stokes I."""
    data = jnp.asarray(data)
    if data.shape[-1] == 2:  # circularnp [RR, LL]
        return 0.5 * (data[..., 0] + data[..., 1])[..., None]
    return 0.5 * (data[..., 0] + data[..., 3])[..., None]


def convert_stokesI_to_polframe(data, frame):
    """Broadcast Stokes-I-only data to `frame`, zeroing cross terms.

    Mirrors convert_visibility_stokesI_to_polframe
    (/root/reference/src/ska_sdp_func_python/visibility/operations.py:423-471):
    parallel hands copy I, cross hands are zero.
    """
    frame = _name(frame)
    n = npol(frame)
    data = jnp.asarray(data)
    out = jnp.repeat(data[..., :1], n, axis=-1)
    if n == 4:
        out = out.at[..., 1].set(0.0).at[..., 2].set(0.0)
    return out


def _conversion_matrix(src: str, dst: str) -> np.ndarray | None:
    """Full conversion matrix [npol_dst, npol_src] or None if identity."""
    if src == dst:
        return None

    def full(frame):
        if frame in ("linear", "linearnp"):
            return _STOKES_TO_LINEAR, "linear"
        if frame in ("circular", "circularnp"):
            return _STOKES_TO_CIRCULAR, "circular"
        return np.eye(4, dtype=complex), "stokes"

    src_mat, src_fam = full(src)
    dst_mat, dst_fam = full(dst)
    if src_fam == dst_fam and src_fam != "stokes":
        if _SUBSETS.get(src) == _SUBSETS.get(dst) or (src == dst):
            return None
    # matrix mapping src-frame (possibly subset) -> stokes4 -> dst frame
    to_stokes = np.linalg.inv(src_mat)
    m = dst_mat @ to_stokes  # 4x4 full-frame map
    rows = _SUBSETS.get(dst, [0, 1, 2, 3])
    cols = _SUBSETS.get(src, [0, 1, 2, 3])
    if src in _SUBSETS and len(cols) < 4:
        # reduced source: embed into 4-pol assuming missing pols are zero
        m = m[:, cols]
    if dst in _SUBSETS and len(rows) < 4:
        m = m[rows, :]
    return m


def convert_pol_frame(data, src, dst, polaxis: int = -1):
    """Convert `data` from polarisation frame `src` to `dst` along polaxis.

    Equivalent of the reference's ``convert_pol_frame``
    (used at /root/reference/src/ska_sdp_func_python/imaging/ng.py:25-27).
    """
    src, dst = _name(src), _name(dst)
    if src == dst:
        return jnp.asarray(data)
    if dst == "stokesI":
        moved = jnp.moveaxis(jnp.asarray(data), polaxis, -1)
        if src in ("linear", "linearnp"):
            out = convert_linear_to_stokesI(moved)
        elif src in ("circular", "circularnp"):
            out = convert_circular_to_stokesI(moved)
        elif src == "stokesIQUV":
            out = moved[..., :1]
        else:
            raise ValueError(f"Cannot convert {src} -> stokesI")
        return jnp.moveaxis(out, -1, polaxis)
    if src == "stokesI":
        moved = jnp.moveaxis(jnp.asarray(data), polaxis, -1)
        out = convert_stokesI_to_polframe(moved, dst)
        return jnp.moveaxis(out, -1, polaxis)
    mat = _conversion_matrix(src, dst)
    if mat is None:
        return jnp.asarray(data)
    return _apply_matrix(mat, data, polaxis)


def correlate_polarisation(frame):
    """Stokes frame -> the correlation frame an interferometer measures."""
    frame = _name(frame)
    return {
        "stokesI": PolarisationFrame("stokesI"),
        "stokesIQUV": PolarisationFrame("linear"),
        "stokesIQ": PolarisationFrame("linearnp"),
        "stokesIV": PolarisationFrame("circularnp"),
    }[frame]


def congruent_polarisation(vis_frame, image_frame) -> bool:
    """True if vis frame pols map 1:1 onto image frame pols."""
    vis_frame, image_frame = _name(vis_frame), _name(image_frame)
    fam = {
        "linear": "linear",
        "linearnp": "linear",
        "circular": "circular",
        "circularnp": "circular",
    }
    return fam.get(vis_frame, vis_frame) == fam.get(image_frame, image_frame)
