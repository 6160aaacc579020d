"""Python rim over the native C++ visibility store (native/visio.cpp).

Provides a Visibility writer/reader and a double-buffered chunk streamer:
while the device computes on chunk k, the C++ prefetch thread reads chunk
k+1 from disk — the data-loader pattern the reference leaves to external
C++ (DP3 DPBuffer streaming, dp3_calibration.py:157-196).

The shared library is built on demand with the repo's native/Makefile.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native")


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_HERE, "libvisio.so")
    if not os.path.exists(so):
        subprocess.run(
            ["make", "-C", _NATIVE, f"BUILD={_HERE}"],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(so)
    i64 = ctypes.c_int64
    p = ctypes.c_void_p
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.svis_create.restype = p
    lib.svis_create.argtypes = [ctypes.c_char_p, i64, i64, i64, i64]
    lib.svis_open.restype = p
    lib.svis_open.argtypes = [ctypes.c_char_p]
    lib.svis_dims.restype = None
    lib.svis_dims.argtypes = [p, ctypes.POINTER(i64)]
    lib.svis_meta_offsets.restype = None
    lib.svis_meta_offsets.argtypes = [p, ctypes.POINTER(i64)]
    lib.svis_write_meta.restype = ctypes.c_int
    lib.svis_write_meta.argtypes = [p, f64p, f64p, i32p, i32p, f64p]
    lib.svis_read_meta.restype = ctypes.c_int
    lib.svis_read_meta.argtypes = [p, f64p, f64p, i32p, i32p, f64p]
    lib.svis_write_chunk.restype = ctypes.c_int
    lib.svis_write_chunk.argtypes = [p, i64, i64, f32p, f32p, f32p, u8p]
    lib.svis_read_chunk.restype = ctypes.c_int
    lib.svis_read_chunk.argtypes = [p, i64, i64, f32p, f32p, f32p, u8p]
    lib.svis_prefetch.restype = ctypes.c_int
    lib.svis_prefetch.argtypes = [p, i64, i64]
    lib.svis_wait.restype = ctypes.c_int
    lib.svis_wait.argtypes = [p, f32p, f32p, f32p, u8p]
    lib.svis_close.restype = None
    lib.svis_close.argtypes = [p]
    _LIB = lib
    return lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def write_visibility_arrays(
    path: str,
    *,
    uvw,
    time,
    frequency,
    antenna1,
    antenna2,
    vis,
    weight=None,
    flags=None,
    chunk_times: int = 16,
):
    """Write raw numpy arrays to the native store (no device round
    trip — the axon tunnel cannot transfer complex arrays, and store
    generation at the 100M+ scale should never touch the device).

    ``vis`` is complex [ntime, nbl, nchan, npol]; ``weight``/``flags``
    default to ones/zeros.
    """
    ntime, nbl, nchan, npol = vis.shape
    if weight is None:
        weight = np.ones(vis.shape, np.float32)
    if flags is None:
        flags = np.zeros(vis.shape, np.uint8)

    class _V:
        pass

    v = _V()
    v.vis, v.weight, v.flags = vis, weight, flags
    v.frequency, v.time = frequency, time
    v.antenna1, v.antenna2, v.uvw = antenna1, antenna2, uvw
    return write_visibility(v, path, chunk_times=chunk_times)


def write_visibility(vis, path: str, chunk_times: int = 16):
    """Write a Visibility pytree (or any object with numpy-compatible
    vis/weight/flags/uvw/time/frequency/antenna1/antenna2) to the
    native store."""
    lib = _load_lib()
    ntime, nbl, nchan, npol = np.shape(vis.vis)
    handle = lib.svis_create(
        path.encode(), ntime, nbl, nchan, npol
    )
    if not handle:
        raise OSError(f"cannot create {path}")
    freq = np.ascontiguousarray(np.asarray(vis.frequency, dtype=np.float64))
    time = np.ascontiguousarray(np.asarray(vis.time, dtype=np.float64))
    a1 = np.ascontiguousarray(np.asarray(vis.antenna1, dtype=np.int32))
    a2 = np.ascontiguousarray(np.asarray(vis.antenna2, dtype=np.int32))
    uvw = np.ascontiguousarray(np.asarray(vis.uvw, dtype=np.float64))
    rc = lib.svis_write_meta(
        handle,
        _ptr(freq, ctypes.c_double),
        _ptr(time, ctypes.c_double),
        _ptr(a1, ctypes.c_int32),
        _ptr(a2, ctypes.c_int32),
        _ptr(uvw, ctypes.c_double),
    )
    if rc != 0:
        raise OSError("meta write failed")
    visdata = np.asarray(vis.vis)
    weight = np.asarray(vis.weight, dtype=np.float32)
    flags = np.asarray(vis.flags, dtype=np.uint8)
    for t0 in range(0, ntime, chunk_times):
        nt = min(chunk_times, ntime - t0)
        re = np.ascontiguousarray(
            np.real(visdata[t0 : t0 + nt]), dtype=np.float32
        )
        im = np.ascontiguousarray(
            np.imag(visdata[t0 : t0 + nt]), dtype=np.float32
        )
        wt = np.ascontiguousarray(weight[t0 : t0 + nt])
        fl = np.ascontiguousarray(flags[t0 : t0 + nt])
        rc = lib.svis_write_chunk(
            handle,
            t0,
            nt,
            _ptr(re, ctypes.c_float),
            _ptr(im, ctypes.c_float),
            _ptr(wt, ctypes.c_float),
            _ptr(fl, ctypes.c_uint8),
        )
        if rc != 0:
            raise OSError("chunk write failed")
    lib.svis_close(handle)


class VisStore:
    """Reader over the native store with async prefetch."""

    def __init__(self, path: str):
        self._lib = _load_lib()
        self._handle = self._lib.svis_open(path.encode())
        if not self._handle:
            raise OSError(f"cannot open {path}")
        dims = (ctypes.c_int64 * 4)()
        self._lib.svis_dims(self._handle, dims)
        self.ntime, self.nbl, self.nchan, self.npol = (
            int(dims[0]),
            int(dims[1]),
            int(dims[2]),
            int(dims[3]),
        )
        # meta section offsets come from the LIBRARY (svis_meta_offsets,
        # visio.cpp) so this reader can never drift from the writer's
        # layout. The uvw block is MEMORY-MAPPED, not loaded: at 1B
        # visibilities it is 24 GB of f64, and an eager read pins a
        # quarter of host RAM for the whole run (slab slices touch only
        # their own pages, and page cache is reclaimable).
        offs = (ctypes.c_int64 * 5)()
        self._lib.svis_meta_offsets(self._handle, offs)
        self.frequency = np.fromfile(
            path, dtype=np.float64, count=self.nchan, offset=offs[0]
        )
        self.time = np.fromfile(
            path, dtype=np.float64, count=self.ntime, offset=offs[1]
        )
        self.antenna1 = np.fromfile(
            path, dtype=np.int32, count=self.nbl, offset=offs[2]
        )
        self.antenna2 = np.fromfile(
            path, dtype=np.int32, count=self.nbl, offset=offs[3]
        )
        self.uvw = np.memmap(
            path,
            dtype=np.float64,
            mode="r",
            offset=int(offs[4]),
            shape=(self.ntime, self.nbl, 3),
        )

    def _alloc(self, nt):
        shape = (nt, self.nbl, self.nchan, self.npol)
        return (
            np.zeros(shape, dtype=np.float32),
            np.zeros(shape, dtype=np.float32),
            np.zeros(shape, dtype=np.float32),
            np.zeros(shape, dtype=np.uint8),
        )

    def read_chunk(self, t0: int, nt: int):
        """Synchronous read: returns (re, im, weight, flags)."""
        re, im, wt, fl = self._alloc(nt)
        self._lib.svis_read_chunk(
            self._handle,
            t0,
            nt,
            _ptr(re, ctypes.c_float),
            _ptr(im, ctypes.c_float),
            _ptr(wt, ctypes.c_float),
            _ptr(fl, ctypes.c_uint8),
        )
        return re, im, wt, fl

    def prefetch(self, t0: int, nt: int):
        self._lib.svis_prefetch(self._handle, t0, nt)

    def wait(self, nt: int):
        re, im, wt, fl = self._alloc(nt)
        self._lib.svis_wait(
            self._handle,
            _ptr(re, ctypes.c_float),
            _ptr(im, ctypes.c_float),
            _ptr(wt, ctypes.c_float),
            _ptr(fl, ctypes.c_uint8),
        )
        return re, im, wt, fl

    def close(self):
        if self._handle:
            self._lib.svis_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def stream_visibility_chunks(path: str, chunk_times: int = 16):
    """Double-buffered generator of visibility chunks.

    Yields dicts with numpy arrays (vis_re, vis_im, weight, flags, uvw,
    time) per time slab; the next slab is prefetched by the C++ thread
    while the caller computes.
    """
    with VisStore(path) as store:
        steps = [
            (t0, min(chunk_times, store.ntime - t0))
            for t0 in range(0, store.ntime, chunk_times)
        ]
        if not steps:
            return
        store.prefetch(*steps[0])
        for k, (t0, nt) in enumerate(steps):
            re, im, wt, fl = store.wait(nt)
            if k + 1 < len(steps):
                store.prefetch(*steps[k + 1])
            yield {
                "t0": t0,
                "vis_re": re,
                "vis_im": im,
                "weight": wt,
                "flags": fl,
                "uvw": store.uvw[t0 : t0 + nt],
                "time": store.time[t0 : t0 + nt],
                "frequency": store.frequency,
                "antenna1": store.antenna1,
                "antenna2": store.antenna2,
            }
