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


class TestRunLengthEncoder:
    """The xdr3dfcoord run-length scheme: delta runs, adaptive ladder,
    seed swap, and the flag=0 'run length unchanged' persistence the
    round-1 decoder got wrong (it reset run to 0 — only a symmetric
    literal-only encoder hid it)."""

    def _roundtrip(self, pos, prec=1000.0):
        import tempfile

        from transport_analysis_tpu.io.xtc import XTCReader, XTCWriter

        path = tempfile.mktemp(suffix=".xtc")
        with XTCWriter(path, n_atoms=pos.shape[1],
                       precision=prec) as w:
            for i in range(pos.shape[0]):
                w.write(positions=pos[i],
                        dimensions=[20, 20, 20, 90, 90, 90])
        r = XTCReader(path)
        # .positions views the reader's reusable Timestep buffer
        # (MDAnalysis parity) — copy per frame before advancing
        got = np.stack(
            [r[i].positions.copy() for i in range(pos.shape[0])]
        )
        import os

        os.unlink(path)
        return got

    def test_water_like_runs(self):
        """Molecule-clustered coordinates produce runs; values must
        round-trip at the quantization grid."""
        rng = np.random.RandomState(0)
        centers = rng.uniform(2, 18, (4, 50, 1, 3))
        offsets = rng.uniform(-0.4, 0.4, (4, 50, 3, 3))
        pos = (centers + offsets).reshape(4, 150, 3).astype(np.float32)
        got = self._roundtrip(pos)
        assert_allclose(got, pos, atol=0.011)

    def test_repeated_run_lengths_flag0(self):
        """Uniform molecules ⇒ identical run lengths back-to-back ⇒
        the encoder emits flag=0 ('unchanged') — the exact code path
        the old decoder broke on."""
        rng = np.random.RandomState(1)
        n_mol = 40
        centers = np.linspace(1, 19, n_mol)[None, :, None, None]
        centers = np.broadcast_to(centers, (2, n_mol, 1, 3)).copy()
        offsets = rng.uniform(-0.05, 0.05, (2, n_mol, 4, 3))
        pos = (centers + offsets).reshape(2, n_mol * 4, 3).astype(
            np.float32
        )
        got = self._roundtrip(pos)
        assert_allclose(got, pos, atol=0.011)

    def test_long_runs_capped_at_8_triples(self):
        """A tight blob of many atoms forces maximal runs (cap 8×3)."""
        rng = np.random.RandomState(2)
        pos = (10.0 + rng.uniform(-0.2, 0.2, (2, 200, 3))).astype(
            np.float32
        )
        got = self._roundtrip(pos)
        assert_allclose(got, pos, atol=0.011)

    def test_scattered_atoms_no_runs(self):
        """Far-apart atoms: mostly literal seeds, still valid."""
        rng = np.random.RandomState(3)
        pos = rng.uniform(0, 100, (3, 64, 3)).astype(np.float32)
        got = self._roundtrip(pos, prec=100.0)
        assert_allclose(got, pos, atol=0.11)

    def test_mixed_cluster_and_outliers(self):
        """Ladder grows and shrinks (is_smaller both signs)."""
        rng = np.random.RandomState(4)
        blobs = 5.0 + rng.uniform(-0.1, 0.1, (2, 30, 3))
        far = rng.uniform(0, 50, (2, 10, 3))
        inter = np.concatenate(
            [blobs[:, :15], far[:, :5], blobs[:, 15:], far[:, 5:]],
            axis=1,
        ).astype(np.float32)
        got = self._roundtrip(inter)
        assert_allclose(got, inter, atol=0.011)

    def test_compression_beats_literal(self):
        import tempfile, os

        from transport_analysis_tpu.io.xtc import XTCWriter

        rng = np.random.RandomState(5)
        centers = rng.uniform(2, 18, (1, 100, 1, 3))
        offsets = rng.uniform(-0.3, 0.3, (1, 100, 5, 3))
        pos = (centers + offsets).reshape(1, 500, 3).astype(np.float32)
        path = tempfile.mktemp(suffix=".xtc")
        with XTCWriter(path, n_atoms=500) as w:
            w.write(positions=pos[0], dimensions=[20, 20, 20, 90, 90, 90])
        size = os.path.getsize(path)
        os.unlink(path)
        literal_payload = 500 * 3 * 15 / 8  # ~15 bits/component range
        assert size < literal_payload * 0.75


def test_corrupt_run_field_rejected(tmp_path):
    """Review finding: a corrupt/truncated XTC whose persisted run
    would overrun the atom count must fail cleanly (return code),
    never write past the output buffer."""
    import struct

    from transport_analysis_tpu.io.xtc import XTCReader, XTCWriter

    rng = np.random.RandomState(7)
    # clustered data → real runs in the stream
    pos = (5.0 + rng.uniform(-0.2, 0.2, (1, 30, 3))).astype(np.float32)
    path = tmp_path / "c.xtc"
    with XTCWriter(path, 30) as w:
        w.write(positions=pos[0], dimensions=[20, 20, 20, 90, 90, 90])
    raw = bytearray(path.read_bytes())
    # lie about the atom count in both header fields: the stream's
    # runs now overrun the (smaller) output array unless bounded
    struct.pack_into(">i", raw, 4, 12)   # natoms (still > 9:
    struct.pack_into(">i", raw, 52, 12)  # compressed path, short buffer)
    bad = tmp_path / "bad.xtc"
    bad.write_bytes(bytes(raw))
    # the reader decodes frame 0 during construction
    with pytest.raises(IOError, match="corrupt"):
        XTCReader(bad)
