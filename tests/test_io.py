"""Native C++ visibility store tests: write/read round trip + prefetch
streaming."""

import numpy as np
import pytest

from ska_sdp_func_python_tpu.io import (
    VisStore,
    stream_visibility_chunks,
    write_visibility,
)

from simul import make_visibility


@pytest.fixture
def store_path(tmp_path, rng):
    vis = make_visibility(nants=6, ntimes=10, nchan=3)
    data = (
        rng.normal(size=vis.vis.shape) + 1j * rng.normal(size=vis.vis.shape)
    )
    vis = vis.replace(vis=vis.vis + data.astype(np.complex128))
    path = str(tmp_path / "test.svis")
    write_visibility(vis, path, chunk_times=4)
    return path, vis


class TestVisStore:
    def test_roundtrip_sync(self, store_path):
        path, vis = store_path
        with VisStore(path) as store:
            assert (store.ntime, store.nbl, store.nchan, store.npol) == (
                vis.ntimes,
                vis.nbaselines,
                vis.nchan,
                vis.npol,
            )
            np.testing.assert_allclose(
                store.frequency, np.asarray(vis.frequency)
            )
            np.testing.assert_allclose(
                store.uvw, np.asarray(vis.uvw), atol=1e-12
            )
            re, im, wt, fl = store.read_chunk(2, 3)
            np.testing.assert_allclose(
                re,
                np.real(np.asarray(vis.vis))[2:5].astype(np.float32),
            )
            np.testing.assert_allclose(
                im,
                np.imag(np.asarray(vis.vis))[2:5].astype(np.float32),
            )
            np.testing.assert_allclose(
                wt, np.asarray(vis.weight)[2:5].astype(np.float32)
            )

    def test_streaming_prefetch(self, store_path):
        path, vis = store_path
        chunks = list(stream_visibility_chunks(path, chunk_times=4))
        assert [c["t0"] for c in chunks] == [0, 4, 8]
        total = sum(c["vis_re"].shape[0] for c in chunks)
        assert total == vis.ntimes
        got = np.concatenate([c["vis_re"] for c in chunks])
        np.testing.assert_allclose(
            got, np.real(np.asarray(vis.vis)).astype(np.float32)
        )
