"""I/O edge cases: double-precision TRR, frames missing blocks,
negative indexing, uppercase dim_type."""

import struct

import numpy as np
import pytest
from numpy.testing import assert_allclose

import transport_analysis_tpu as ta
from transport_analysis_tpu import VelocityAutocorr
from transport_analysis_tpu.io.trr import (
    TRRReader,
    _MAGIC,
    _VERSION,
    _HEADER_INTS,
    _dimensions_to_box_matrix,
)


def write_double_trr(path, positions, velocities, dims, times):
    """Hand-rolled double-precision TRR frames (the writer emits single
    precision; real GROMACS double builds emit f8 payloads)."""
    n_frames, n_atoms, _ = positions.shape
    with open(path, "wb") as fh:
        for i in range(n_frames):
            n3 = n_atoms * 3
            box_size = 9 * 8
            x_size = n3 * 8
            v_size = n3 * 8
            fh.write(
                struct.pack(">iii", _MAGIC, len(_VERSION) + 1,
                            len(_VERSION))
                + _VERSION
            )
            fh.write(
                struct.pack(
                    f">{_HEADER_INTS}i",
                    0, 0, box_size, 0, 0, 0, 0, x_size, v_size, 0,
                )
            )
            fh.write(struct.pack(">iii", n_atoms, i, 0))
            fh.write(struct.pack(">dd", times[i], 0.0))
            m = _dimensions_to_box_matrix(dims) / 10.0
            fh.write(m.astype(">f8").tobytes())
            fh.write(
                (positions[i].astype(np.float64) / 10.0)
                .astype(">f8").tobytes()
            )
            fh.write(
                (velocities[i].astype(np.float64) / 10.0)
                .astype(">f8").tobytes()
            )


class TestDoubleTRR:
    def test_read(self, tmp_path):
        rng = np.random.RandomState(0)
        pos = rng.uniform(0, 20, (4, 7, 3)).astype(np.float32)
        vel = rng.normal(0, 10, (4, 7, 3)).astype(np.float32)
        dims = [20.0, 20.0, 20.0, 90.0, 90.0, 90.0]
        path = tmp_path / "d.trr"
        write_double_trr(path, pos, vel, dims, times=[0.0, 1.0, 2.0, 3.0])
        r = TRRReader(path)
        assert r.n_frames == 4
        ts = r[2]
        assert_allclose(ts.positions, pos[2], rtol=1e-6)
        assert_allclose(ts.velocities, vel[2], rtol=1e-6)
        assert_allclose(ts.time, 2.0)
        # both batch decode paths handle f8 payloads
        batch = r._read_frames_batch_py(np.array([0, 3]))
        assert_allclose(batch["velocities"][1], vel[3], rtol=1e-6)
        from transport_analysis_tpu.io import _native

        if _native.get_trr_decoder() is not None:
            nb = r.read_frames_batch([0, 3])
            assert_allclose(nb["velocities"], batch["velocities"],
                            rtol=1e-7)


class TestTrajectoryIndexing:
    def test_negative_index(self):
        pos = np.arange(5 * 2 * 3, dtype=np.float32).reshape(5, 2, 3)
        from transport_analysis_tpu.core.trajectory import MemoryReader

        r = MemoryReader(pos)
        assert r[-1].frame == 4
        with pytest.raises(IndexError):
            r[5]

    def test_list_indexing(self):
        from transport_analysis_tpu.core.trajectory import MemoryReader

        r = MemoryReader(np.zeros((6, 1, 3), np.float32))
        sel = r[[0, 2, 4]]
        assert [ts.frame for ts in sel] == [0, 2, 4]


class TestDimTypeCase:
    def test_uppercase_dim_type(self, u_random):
        v = VelocityAutocorr(u_random.atoms, dim_type="XYZ").run()
        w = VelocityAutocorr(u_random.atoms, dim_type="xyz").run()
        assert_allclose(v.results.timeseries, w.results.timeseries)


class TestNCDFNoVelocities:
    def test_positions_only(self, tmp_path):
        from transport_analysis_tpu.io.netcdf import NCDFReader, NCDFWriter
        from transport_analysis_tpu.utils.errors import NoDataError
        from transport_analysis_tpu.core.topology import Topology

        pos = np.random.RandomState(0).rand(3, 5, 3).astype(np.float32)
        path = tmp_path / "p.nc"
        with NCDFWriter(path, 5, velocities=False) as w:
            for i in range(3):
                w.write(pos[i], time=float(i))
        r = NCDFReader(path)
        assert not r.has_velocities
        u = ta.Universe(Topology(5), r)
        with pytest.raises(NoDataError):
            VelocityAutocorr(u.atoms).run()


class TestTruncatedFiles:
    """Truncated trajectories (crashed writer, partial copy): the
    trailing partial frame must be DROPPED (GROMACS tool behavior),
    never indexed as readable data; pure garbage must raise."""

    def _trr(self, tmp_path, n_frames=3, n_atoms=8):
        from transport_analysis_tpu.io.trr import TRRWriter

        rng = np.random.RandomState(0)
        p = tmp_path / "t.trr"
        with TRRWriter(p, n_atoms) as w:
            for i in range(n_frames):
                w.write(positions=rng.uniform(0, 9, (n_atoms, 3)),
                        velocities=rng.normal(0, 1, (n_atoms, 3)),
                        time=float(i))
        return p

    @pytest.mark.parametrize("frac", [0.45, 0.75, 0.95])
    def test_trr_truncated_drops_partial_frame(self, tmp_path, frac):
        from transport_analysis_tpu.io.trr import TRRReader

        p = self._trr(tmp_path)
        full = p.read_bytes()
        t = tmp_path / "trunc.trr"
        t.write_bytes(full[: int(len(full) * frac)])
        with pytest.warns(UserWarning, match="truncated"):
            r = TRRReader(t)
        assert 1 <= r.n_frames < 3
        # every indexed frame is fully decodable
        for i in range(r.n_frames):
            assert np.all(np.isfinite(r[i].positions))

    def test_trr_garbage_raises(self, tmp_path):
        from transport_analysis_tpu.io.trr import TRRReader

        g = tmp_path / "g.trr"
        g.write_bytes(b"\x00" * 200)
        with pytest.raises(IOError):
            TRRReader(g)

    def test_xtc_truncated_drops_partial_frame(self, tmp_path):
        from transport_analysis_tpu.io.xtc import XTCReader, XTCWriter

        rng = np.random.RandomState(1)
        pos = rng.uniform(0, 20, (3, 40, 3)).astype(np.float32)
        p = tmp_path / "t.xtc"
        with XTCWriter(p, 40) as w:
            for i in range(3):
                w.write(positions=pos[i],
                        dimensions=[20, 20, 20, 90, 90, 90])
        full = p.read_bytes()
        t = tmp_path / "trunc.xtc"
        t.write_bytes(full[: int(len(full) * 0.8)])
        r = XTCReader(t)
        assert 1 <= r.n_frames < 3
        for i in range(r.n_frames):
            assert_allclose(r[i].positions, pos[i], atol=0.011)
