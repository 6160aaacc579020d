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


# ------------------------------------------------------------------
# h5parm (losoto/DP3) interoperable export — the format the reference
# ecosystem's solutions travel in (dp3_calibration.py:33-35 wires
# ``gaincal.parmdb`` to an h5parm file; LOFAR/SKA tooling consumes it
# via losoto's H5parm class / schaapcommon's reader).
# Layout written here (losoto H5parm v1 conventions):
#   /<solset>/antenna           compound [(name S64, position f64[3])]
#   /<solset>/source            compound [(name S128, dir f64[2])]
#   /<solset>/phase000/val      f4, axes recorded in val.attrs['AXES']
#                    /weight    f4 (same axes)
#                    /time f8, /ant S64, /freq f8, /dir S128, /pol S8
#   /<solset>/amplitude000/...  same, TITLE='amplitude'
# ------------------------------------------------------------------

__all__ += ["export_h5parm", "import_h5parm"]

_H5PARM_AXES = b"time,ant,freq,dir,pol"


def _pol_labels(gt: GainTable, full_jones: bool | None):
    g = np.asarray(gt.gain)
    if full_jones is None:
        off = 0.0
        if g.shape[-1] == 2:
            off = float(np.max(np.abs(g[..., 0, 1]))) + float(
                np.max(np.abs(g[..., 1, 0]))
            )
        full_jones = off > 0.0
    if g.shape[-1] == 1:
        return [b"XX"], False
    if full_jones:
        return [b"XX", b"XY", b"YX", b"YY"], True
    return [b"XX", b"YY"], False


def export_h5parm(
    tables: dict | GainTable,
    path: str,
    solset: str = "sol000",
    antenna_names=None,
    antenna_positions=None,
    source_dir=(0.0, 0.0),
    full_jones: bool | None = None,
) -> None:
    """Write gaintables as a losoto/DP3-compatible h5parm file.

    :param tables: one GainTable or a ``{name: GainTable}`` chain — each
        chain term gets its own ``phase###``/``amplitude###`` soltab pair
        (h5parm numbers soltabs within one solset).
    :param antenna_names: [nants] strings; default ``ANT000..``
    :param antenna_positions: [nants, 3] ITRF metres; default zeros
    :param source_dir: (ra, dec) rad recorded in the source table
    :param full_jones: force 4-pol (XX, XY, YX, YY) export; ``None``
        auto-detects from off-diagonal energy.
    """
    import h5py

    if isinstance(tables, GainTable):
        tables = {"sol": tables}
    with h5py.File(path, "w") as fh:
        ss = fh.create_group(solset)
        gt0 = next(iter(tables.values()))
        nants = gt0.nants
        # no `or`: numpy-array antenna_names would raise on truthiness
        names = (
            [f"ANT{i:03d}" for i in range(nants)]
            if antenna_names is None
            else list(antenna_names)
        )
        pos = (
            np.zeros((nants, 3), np.float64)
            if antenna_positions is None
            else np.asarray(antenna_positions, np.float64)
        )
        ant_dt = np.dtype([("name", "S64"), ("position", "<f8", (3,))])
        ant_tab = np.zeros(nants, ant_dt)
        ant_tab["name"] = [str(n).encode() for n in names]
        ant_tab["position"] = pos
        ss.create_dataset("antenna", data=ant_tab)
        src_dt = np.dtype([("name", "S128"), ("dir", "<f8", (2,))])
        src_tab = np.zeros(1, src_dt)
        src_tab["name"] = [b"pointing"]
        src_tab["dir"] = [np.asarray(source_dir, np.float64)]
        ss.create_dataset("source", data=src_tab)

        for i, (term, gt) in enumerate(tables.items()):
            g = np.asarray(gt.gain).astype(np.complex64)
            w = np.asarray(gt.weight).astype(np.float32)
            pols, fj = _pol_labels(gt, full_jones)
            if g.shape[-1] == 1:
                vals = g[..., 0, 0][..., None]
                wv = w[..., 0, 0][..., None]
            elif fj:
                sh = g.shape[:-2] + (4,)
                vals = g.reshape(sh)
                wv = w.reshape(sh)
            else:
                vals = np.stack([g[..., 0, 0], g[..., 1, 1]], axis=-1)
                wv = np.stack([w[..., 0, 0], w[..., 1, 1]], axis=-1)
            # [time, ant, freq, pol] -> insert the dir axis
            vals = vals[:, :, :, None, :]
            wv = wv[:, :, :, None, :].astype(np.float32)
            for kind, data in (
                ("phase", np.angle(vals).astype(np.float32)),
                ("amplitude", np.abs(vals).astype(np.float32)),
            ):
                st = ss.create_group(f"{kind}{i:03d}")
                st.attrs.create("TITLE", np.bytes_(kind))
                st.attrs["jones_type"] = gt.jones_type
                st.attrs["term"] = term
                v = st.create_dataset("val", data=data)
                v.attrs.create("AXES", np.bytes_(_H5PARM_AXES))
                wd = st.create_dataset("weight", data=wv)
                wd.attrs.create("AXES", np.bytes_(_H5PARM_AXES))
                st.create_dataset(
                    "time", data=np.asarray(gt.time, np.float64)
                )
                st.create_dataset("ant", data=ant_tab["name"])
                st.create_dataset(
                    "freq", data=np.asarray(gt.frequency, np.float64)
                )
                st.create_dataset("dir", data=np.asarray([b"pointing"]))
                st.create_dataset(
                    "pol", data=np.asarray(pols, dtype="S8")
                )


def import_h5parm(path: str, solset: str = "sol000") -> dict:
    """Read an h5parm written by :func:`export_h5parm` (or any file
    following the same conventions) back into ``{term: GainTable}``.
    Amplitude and phase soltabs with matching numbers combine into
    complex gains; missing amplitudes default to 1."""
    import h5py

    out = {}
    with h5py.File(path, "r") as fh:
        ss = fh[solset]
        nums = sorted(
            {k[-3:] for k in ss if k.startswith(("phase", "amplitude"))}
        )
        for num in nums:
            ph = ss.get(f"phase{num}")
            am = ss.get(f"amplitude{num}")
            ref = ph if ph is not None else am
            if ref is None:
                continue
            phase = (
                np.asarray(ph["val"]) if ph is not None else 0.0
            )
            amp = np.asarray(am["val"]) if am is not None else 1.0
            vals = amp * np.exp(1j * phase)  # [t, ant, f, dir, pol]
            wv = np.asarray(ref["weight"])[:, :, :, 0, :]
            vals = vals[:, :, :, 0, :]
            npol = vals.shape[-1]
            nt, na, nf = vals.shape[:3]
            if npol == 4:
                gain = vals.reshape(nt, na, nf, 2, 2)
                weight = wv.reshape(nt, na, nf, 2, 2)
            elif npol == 2:
                gain = np.zeros((nt, na, nf, 2, 2), np.complex64)
                gain[..., 0, 0] = vals[..., 0]
                gain[..., 1, 1] = vals[..., 1]
                weight = np.zeros((nt, na, nf, 2, 2), np.float32)
                weight[..., 0, 0] = wv[..., 0]
                weight[..., 1, 1] = wv[..., 1]
            else:
                gain = vals[..., None]
                weight = wv[..., None]
            time = np.asarray(ref["time"], np.float64)
            dt = np.diff(time)
            interval = (
                np.concatenate([dt, dt[-1:]])
                if len(time) > 1
                else np.ones_like(time)
            )
            nrec = gain.shape[-1]
            term = ref.attrs.get("term", f"sol{num}")
            term = term if isinstance(term, str) else term.decode()
            out[term] = GainTable(
                gain=gain.astype(np.complex64),
                weight=weight.astype(np.float32),
                residual=np.zeros((nt, nf, nrec, nrec), np.float32),
                time=time,
                interval=interval,
                frequency=np.asarray(ref["freq"], np.float64),
                jones_type=str(ref.attrs.get("jones_type", "T")),
            )
    return out
