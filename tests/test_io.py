"""I/O tests: TRR round-trip (writer → reader, both decode paths),
PDB topology parsing, Universe(top, traj) construction."""

import os

import numpy as np
import pytest
from numpy.testing import assert_allclose

import transport_analysis_tpu as ta
from transport_analysis_tpu.io.trr import TRRReader, TRRWriter
from transport_analysis_tpu.io.pdb import parse_pdb_topology


@pytest.fixture()
def trr_file(tmp_path):
    rng = np.random.RandomState(0)
    n_frames, n_atoms = 7, 11
    pos = rng.uniform(0, 20, (n_frames, n_atoms, 3)).astype(np.float32)
    vel = rng.normal(0, 10, (n_frames, n_atoms, 3)).astype(np.float32)
    dims = [21.0, 22.0, 23.0, 90.0, 90.0, 90.0]
    path = tmp_path / "test.trr"
    with TRRWriter(path, n_atoms) as w:
        for i in range(n_frames):
            w.write(
                positions=pos[i],
                velocities=vel[i],
                dimensions=dims,
                time=0.5 * i,
            )
    return path, pos, vel, dims


class TestTRR:
    def test_roundtrip(self, trr_file):
        path, pos, vel, dims = trr_file
        r = TRRReader(path)
        assert r.n_frames == 7
        assert r.n_atoms == 11
        assert r.has_velocities
        ts = r[3]
        # single-precision nm storage: Å values good to ~1e-4 rel
        assert_allclose(ts.positions, pos[3], rtol=1e-5, atol=1e-3)
        assert_allclose(ts.velocities, vel[3], rtol=1e-5, atol=1e-3)
        assert_allclose(ts.time, 1.5, atol=1e-6)
        assert_allclose(ts.dimensions, dims, rtol=1e-5)
        assert_allclose(ts.volume, 21.0 * 22.0 * 23.0, rtol=1e-4)

    def test_batch_python_path(self, trr_file, monkeypatch):
        monkeypatch.setenv("TRANSPORT_ANALYSIS_TPU_NO_NATIVE", "1")
        from transport_analysis_tpu.io import _native

        monkeypatch.setattr(_native, "_lib", None)
        monkeypatch.setattr(_native, "_lib_failed", False)
        path, pos, vel, dims = trr_file
        r = TRRReader(path)
        batch = r.read_frames_batch([1, 3, 5])
        assert_allclose(batch["positions"], pos[[1, 3, 5]], rtol=1e-5,
                        atol=1e-3)
        assert_allclose(batch["velocities"], vel[[1, 3, 5]], rtol=1e-5,
                        atol=1e-3)
        assert_allclose(batch["times"], [0.5, 1.5, 2.5], atol=1e-6)
        assert_allclose(batch["volumes"], 21.0 * 22.0 * 23.0, rtol=1e-4)

    def test_batch_native_matches_python(self, trr_file):
        from transport_analysis_tpu.io import _native

        if _native.get_trr_decoder() is None:
            pytest.skip("native toolchain unavailable")
        path, pos, vel, dims = trr_file
        r = TRRReader(path)
        native = r.read_frames_batch([0, 2, 4, 6])
        py = r._read_frames_batch_py(np.array([0, 2, 4, 6]))
        assert_allclose(native["positions"], py["positions"], rtol=1e-6)
        assert_allclose(native["velocities"], py["velocities"], rtol=1e-6)
        assert_allclose(native["volumes"], py["volumes"], rtol=1e-10)

    def test_vacf_from_trr(self, trr_file):
        path, pos, vel, dims = trr_file
        # build a universe directly from the trajectory reader
        from transport_analysis_tpu.core.topology import Topology
        from transport_analysis_tpu import VelocityAutocorr

        u = ta.Universe(Topology(11), TRRReader(path))
        v = VelocityAutocorr(u.atoms).run()
        assert v.results.timeseries.shape == (7,)
        # lag-0 value equals mean |v|² over atoms/frames
        expected0 = np.mean(np.sum(vel.astype(np.float64) ** 2, axis=-1))
        assert_allclose(v.results.timeseries[0], expected0, rtol=1e-4)


EC_PDB = "/root/reference/transport_analysis/data/ethylene_carbonate/topology.pdb"


class TestPDB:
    @pytest.mark.skipif(
        not os.path.exists(EC_PDB), reason="EC topology unavailable"
    )
    def test_ec_topology(self):
        top = parse_pdb_topology(EC_PDB)
        assert top.n_atoms == 3680
        masses = top.get_atom_values("masses")
        assert (masses > 0).all()
        names = top.get_atom_values("names")
        assert len(set(names)) > 1

    @pytest.mark.skipif(
        not os.path.exists(EC_PDB), reason="EC topology unavailable"
    )
    def test_ec_universe(self):
        u = ta.Universe(EC_PDB)
        assert len(u.atoms) == 3680
        assert u.trajectory.n_frames == 1
        # CRYST1 box present → nonzero volume
        assert u.trajectory.ts.volume > 0

    def test_write_parse_roundtrip(self, tmp_path):
        pdb = tmp_path / "mini.pdb"
        pdb.write_text(
            "CRYST1   20.000   20.000   20.000  90.00  90.00  90.00 P 1\n"
            "ATOM      1  O   WAT A   1      1.000   2.000   3.000"
            "  1.00  0.00           O\n"
            "ATOM      2  H1  WAT A   1      1.500   2.000   3.000"
            "  1.00  0.00           H\n"
            "ATOM      3  C1  EC  A   2      5.000   5.000   5.000"
            "  1.00  0.00           C\n"
            "END\n"
        )
        u = ta.Universe(str(pdb))
        assert len(u.atoms) == 3
        assert_allclose(u.atoms.masses, [15.999, 1.008, 12.011])
        assert len(u.select_atoms("resname WAT")) == 2
        assert_allclose(
            u.trajectory.ts.positions[0], [1.0, 2.0, 3.0], atol=1e-5
        )
