"""Standalone gain-solution persistence (HDF5 / npz).

Serves the h5parm role of the reference's DP3 bridge — DP3 writes its
solutions to an HDF5 "h5parm" file that downstream tools consume
(/root/reference/src/ska_sdp_func_python/calibration/dp3_calibration.py:33-35
``create_parset_from_context`` wiring ``gaincal.parmdb``) — so gaintables
survive outside pickled ``SelfCalState`` blobs and can be exported,
inspected, and re-applied across runs.

Layout (HDF5): one group per table (default ``sol000`` to echo the h5parm
convention), datasets ``gain`` [ntime, nants, nchan, nrec, nrec] complex64,
``weight``, ``residual``, ``time``, ``interval``, ``frequency``, plus
``amplitude``/``phase`` convenience views, with ``jones_type`` and
``receptor_frame`` as attributes. ``.npz`` files hold the same arrays with
``<name>.<field>`` keys. A dict of tables (a calibration chain, e.g.
``{"T": gt_t, "G": gt_g}``) round-trips through one file.
"""

from __future__ import annotations

import os

import numpy as np

from ..models.gaintable import GainTable

__all__ = [
    "save_gaintable",
    "load_gaintable",
    "save_gaintables",
    "load_gaintables",
]

_FIELDS = ("gain", "weight", "residual", "time", "interval", "frequency")


def _is_hdf5(path: str) -> bool:
    return os.path.splitext(path)[1].lower() in (".h5", ".hdf5", ".h5parm")


def _host(gt: GainTable) -> dict:
    out = {f: np.asarray(getattr(gt, f)) for f in _FIELDS}
    out["gain"] = out["gain"].astype(np.complex64)
    return out


def save_gaintables(tables: dict, path: str) -> None:
    """Save a ``{name: GainTable}`` dict to ``path`` (.h5/.hdf5 HDF5,
    anything else npz)."""
    if _is_hdf5(path):
        import h5py

        with h5py.File(path, "w") as fh:
            fh.attrs["format"] = "ska-sdp-func-python-tpu gaintable v1"
            for name, gt in tables.items():
                grp = fh.create_group(name)
                arrs = _host(gt)
                for f in _FIELDS:
                    grp.create_dataset(f, data=arrs[f])
                grp.create_dataset(
                    "amplitude", data=np.abs(arrs["gain"])
                )
                grp.create_dataset("phase", data=np.angle(arrs["gain"]))
                grp.attrs["jones_type"] = gt.jones_type
                grp.attrs["receptor_frame"] = gt.receptor_frame
        return
    blob = {}
    for name, gt in tables.items():
        arrs = _host(gt)
        for f in _FIELDS:
            blob[f"{name}.{f}"] = arrs[f]
        blob[f"{name}.jones_type"] = np.str_(gt.jones_type)
        blob[f"{name}.receptor_frame"] = np.str_(gt.receptor_frame)
    np.savez(path, **blob)


def load_gaintables(path: str) -> dict:
    """Load a ``{name: GainTable}`` dict saved by :func:`save_gaintables`."""
    out = {}
    if _is_hdf5(path):
        import h5py

        with h5py.File(path, "r") as fh:
            for name in fh:
                grp = fh[name]
                out[name] = GainTable(
                    **{f: np.asarray(grp[f]) for f in _FIELDS},
                    jones_type=str(grp.attrs["jones_type"]),
                    receptor_frame=str(grp.attrs["receptor_frame"]),
                )
        return out
    data = np.load(path, allow_pickle=False)
    names = sorted({k.split(".", 1)[0] for k in data.files})
    for name in names:
        out[name] = GainTable(
            **{f: data[f"{name}.{f}"] for f in _FIELDS},
            jones_type=str(data[f"{name}.jones_type"]),
            receptor_frame=str(data[f"{name}.receptor_frame"]),
        )
    return out


def save_gaintable(gt: GainTable, path: str, name: str = "sol000") -> None:
    """Save one gaintable (h5parm-style single solset)."""
    save_gaintables({name: gt}, path)


def load_gaintable(path: str, name: str | None = None) -> GainTable:
    """Load one gaintable; ``name=None`` takes the only/first table."""
    tables = load_gaintables(path)
    if name is not None:
        return tables[name]
    if len(tables) != 1:
        raise ValueError(
            f"{path} holds {sorted(tables)}; pass name= to pick one"
        )
    return next(iter(tables.values()))
