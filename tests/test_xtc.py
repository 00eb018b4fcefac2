"""XTC codec round-trip tests (native C++ bitstream codec)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import transport_analysis_tpu as ta
from transport_analysis_tpu.io import _native


pytestmark = pytest.mark.skipif(
    _native.load_xtc_codec() is None,
    reason="native toolchain unavailable",
)


@pytest.fixture()
def xtc_file(tmp_path):
    from transport_analysis_tpu.io.xtc import XTCWriter

    rng = np.random.RandomState(3)
    n_frames, n_atoms = 5, 50
    pos = rng.uniform(0, 30, (n_frames, n_atoms, 3)).astype(np.float32)
    dims = [30.0, 31.0, 32.0, 90.0, 90.0, 90.0]
    path = tmp_path / "t.xtc"
    with XTCWriter(path, n_atoms) as w:
        for i in range(n_frames):
            w.write(pos[i], dimensions=dims, time=0.25 * i)
    return path, pos, dims


class TestXTC:
    def test_roundtrip(self, xtc_file):
        from transport_analysis_tpu.io.xtc import XTCReader

        path, pos, dims = xtc_file
        r = XTCReader(path)
        assert r.n_frames == 5
        assert r.n_atoms == 50
        assert not r.has_velocities
        ts = r[2]
        # precision 1000/nm = 100/Å → absolute error ≤ 0.005 Å
        assert_allclose(ts.positions, pos[2], atol=0.011)
        assert_allclose(ts.time, 0.5, atol=1e-6)
        assert_allclose(ts.dimensions, dims, rtol=1e-5)

    def test_small_system_plain_path(self, tmp_path):
        from transport_analysis_tpu.io.xtc import XTCReader, XTCWriter

        pos = np.random.RandomState(0).uniform(
            0, 5, (3, 4, 3)
        ).astype(np.float32)
        path = tmp_path / "small.xtc"
        with XTCWriter(path, 4) as w:
            for i in range(3):
                w.write(pos[i], time=float(i))
        r = XTCReader(path)
        # ≤9 atoms: uncompressed floats, exact to f32
        assert_allclose(r[1].positions, pos[1], rtol=1e-6)

    def test_high_precision(self, tmp_path):
        from transport_analysis_tpu.io.xtc import XTCReader, XTCWriter

        pos = np.random.RandomState(1).uniform(
            0, 10, (2, 100, 3)
        ).astype(np.float32)
        path = tmp_path / "hp.xtc"
        with XTCWriter(path, 100, precision=100000.0) as w:
            for i in range(2):
                w.write(pos[i])
        r = XTCReader(path)
        assert_allclose(r[0].positions, pos[0], atol=1.2e-4)

    def test_universe_dispatch_and_msd(self, xtc_file):
        from transport_analysis_tpu.core.topology import Topology
        from transport_analysis_tpu import EinsteinMSD, VelocityAutocorr
        from transport_analysis_tpu.utils.errors import NoDataError

        path, pos, dims = xtc_file
        u = ta.Universe(Topology(50), ta.io.open_trajectory(path))
        assert u.trajectory.format == "XTC"
        m = EinsteinMSD(u.atoms).run()
        assert m.results.timeseries.shape == (5,)
        # XTC has no velocities → reference error contract
        with pytest.raises(NoDataError, match="requires velocities"):
            VelocityAutocorr(u.atoms).run()

    def test_wide_coordinate_range(self, tmp_path):
        """Coordinates spanning >2^24 quantization counts exercise the
        per-component bitsizeint path."""
        from transport_analysis_tpu.io.xtc import XTCReader, XTCWriter

        rng = np.random.RandomState(5)
        pos = rng.uniform(0, 2.0e5, (2, 20, 3)).astype(np.float32)
        path = tmp_path / "wide.xtc"
        with XTCWriter(path, 20, precision=1000.0) as w:
            for i in range(2):
                w.write(pos[i])
        r = XTCReader(path)
        assert_allclose(r[0].positions, pos[0], atol=0.03)
