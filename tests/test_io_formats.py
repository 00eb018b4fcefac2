"""DCD / Amber NetCDF / H5MD round-trip tests, plus the reference's
no-velocities error-path scenario on DCD (reference
test_viscosity.py:33-40)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import transport_analysis_tpu as ta
from transport_analysis_tpu import ViscosityHelfand, VelocityAutocorr
from transport_analysis_tpu.core.topology import Topology
from transport_analysis_tpu.io.dcd import DCDReader, DCDWriter
from transport_analysis_tpu.io.netcdf import NCDFReader, NCDFWriter
from transport_analysis_tpu.utils.errors import NoDataError


@pytest.fixture()
def frames():
    rng = np.random.RandomState(7)
    n_frames, n_atoms = 6, 9
    pos = rng.uniform(0, 25, (n_frames, n_atoms, 3)).astype(np.float32)
    vel = rng.normal(0, 8, (n_frames, n_atoms, 3)).astype(np.float32)
    dims = [25.0, 26.0, 27.0, 90.0, 90.0, 90.0]
    return pos, vel, dims


class TestDCD:
    def test_roundtrip(self, tmp_path, frames):
        pos, vel, dims = frames
        path = tmp_path / "t.dcd"
        with DCDWriter(path, pos.shape[1], dt=0.5) as w:
            for i in range(len(pos)):
                w.write(pos[i], dimensions=dims)
        r = DCDReader(path)
        assert r.n_frames == len(pos)
        assert r.n_atoms == pos.shape[1]
        assert not r.has_velocities
        ts = r[2]
        assert_allclose(ts.positions, pos[2], rtol=1e-6)
        assert_allclose(ts.dimensions, dims, atol=1e-10)

    def test_no_velocities_error_path(self, tmp_path, frames):
        """ViscosityHelfand on a DCD must raise NoDataError (reference
        error-path parity)."""
        pos, vel, dims = frames
        path = tmp_path / "t.dcd"
        with DCDWriter(path, pos.shape[1]) as w:
            for i in range(len(pos)):
                w.write(pos[i], dimensions=dims)
        top = Topology(pos.shape[1])
        top.add_attr("masses", np.ones(pos.shape[1]))
        u = ta.Universe(top, DCDReader(path))
        with pytest.raises(NoDataError, match="Helfand viscosity"):
            ViscosityHelfand(u.atoms).run()
        with pytest.raises(NoDataError, match="requires velocities"):
            VelocityAutocorr(u.atoms).run()

    def test_batch_read(self, tmp_path, frames):
        pos, vel, dims = frames
        path = tmp_path / "t.dcd"
        with DCDWriter(path, pos.shape[1]) as w:
            for i in range(len(pos)):
                w.write(pos[i], dimensions=dims)
        r = DCDReader(path)
        batch = r.read_frames_batch([0, 3, 5])
        assert_allclose(batch["positions"], pos[[0, 3, 5]], rtol=1e-6)
        assert_allclose(batch["volumes"], 25.0 * 26.0 * 27.0, rtol=1e-10)


class TestNCDF:
    def test_roundtrip_with_velocities(self, tmp_path, frames):
        pos, vel, dims = frames
        path = tmp_path / "t.nc"
        with NCDFWriter(path, pos.shape[1], velocities=True) as w:
            for i in range(len(pos)):
                w.write(pos[i], velocities=vel[i], dimensions=dims,
                        time=0.1 * i)
        r = NCDFReader(path)
        assert r.n_frames == len(pos)
        assert r.has_velocities
        ts = r[4]
        assert_allclose(ts.positions, pos[4], rtol=1e-6)
        # velocity round-trips through the 20.455 scale factor in f32
        assert_allclose(ts.velocities, vel[4], rtol=1e-5, atol=1e-4)
        assert_allclose(ts.time, 0.4, atol=1e-12)
        assert_allclose(ts.dimensions, dims, atol=1e-12)

    def test_vacf_from_ncdf(self, tmp_path, frames):
        """End-to-end: the reference's NCBOX-style scenario — VACF on a
        NetCDF box with velocities."""
        pos, vel, dims = frames
        path = tmp_path / "t.nc"
        with NCDFWriter(path, pos.shape[1], velocities=True) as w:
            for i in range(len(pos)):
                w.write(pos[i], velocities=vel[i], dimensions=dims,
                        time=0.1 * i)
        u = ta.Universe(Topology(pos.shape[1]), NCDFReader(path))
        v = VelocityAutocorr(u.atoms).run()
        expected0 = np.mean(np.sum(vel.astype(np.float64) ** 2, axis=-1))
        assert_allclose(v.results.timeseries[0], expected0, rtol=1e-4)

    def test_batch(self, tmp_path, frames):
        pos, vel, dims = frames
        path = tmp_path / "t.nc"
        with NCDFWriter(path, pos.shape[1], velocities=True) as w:
            for i in range(len(pos)):
                w.write(pos[i], velocities=vel[i], dimensions=dims,
                        time=0.1 * i)
        r = NCDFReader(path)
        batch = r.read_frames_batch([1, 4])
        assert_allclose(batch["positions"], pos[[1, 4]], rtol=1e-6)
        assert_allclose(batch["velocities"], vel[[1, 4]], rtol=1e-5,
                        atol=1e-4)
        assert_allclose(batch["times"], [0.1, 0.4], atol=1e-12)


class TestH5MD:
    def test_roundtrip(self, tmp_path, frames):
        h5py = pytest.importorskip("h5py")  # noqa: F841
        from transport_analysis_tpu.io.h5md import H5MDReader, H5MDWriter

        pos, vel, dims = frames
        path = tmp_path / "t.h5md"
        with H5MDWriter(path, pos.shape[1], velocities=True) as w:
            for i in range(len(pos)):
                w.write(pos[i], velocities=vel[i], dimensions=dims,
                        time=0.2 * i)
        r = H5MDReader(path)
        assert r.n_frames == len(pos)
        assert r.has_velocities
        ts = r[3]
        assert_allclose(ts.positions, pos[3], rtol=1e-6)
        assert_allclose(ts.velocities, vel[3], rtol=1e-6)
        assert_allclose(ts.time, 0.6, atol=1e-12)
        batch = r.read_frames_batch([0, 5])
        assert_allclose(batch["positions"], pos[[0, 5]], rtol=1e-6)
        assert_allclose(batch["volumes"], 25.0 * 26.0 * 27.0, rtol=1e-10)

    def test_universe_dispatch(self, tmp_path, frames):
        pytest.importorskip("h5py")
        from transport_analysis_tpu.io.h5md import H5MDWriter

        pos, vel, dims = frames
        path = tmp_path / "t.h5md"
        with H5MDWriter(path, pos.shape[1], velocities=True) as w:
            for i in range(len(pos)):
                w.write(pos[i], velocities=vel[i], dimensions=dims)
        u = ta.Universe(Topology(pos.shape[1]),
                        ta.io.open_trajectory(path))
        assert u.trajectory.format == "H5MD"


class TestWriterObjectCoercion:
    """Writers accept Universe / AtomGroup / Timestep as the first
    argument (MDAnalysis writer parity), not just arrays."""

    @pytest.fixture()
    def u(self):
        rng = np.random.RandomState(3)
        u = ta.Universe.empty(12, n_frames=4, velocities=True)
        from transport_analysis_tpu.core.transformations import (
            set_dimensions,
        )

        u.trajectory.add_transformations(
            set_dimensions([30, 30, 30, 90, 90, 90])
        )
        for i, ts in enumerate(u.trajectory):
            u.atoms.positions = rng.uniform(0, 25, (12, 3))
            u.atoms.velocities = rng.normal(0, 2, (12, 3))
        return u

    def test_trr_write_timestep_and_universe(self, u, tmp_path):
        from transport_analysis_tpu.io.trr import TRRReader, TRRWriter

        p1, p2 = tmp_path / "ts.trr", tmp_path / "uni.trr"
        with TRRWriter(p1, 12) as w:
            for ts in u.trajectory:
                w.write(ts)
        with TRRWriter(p2, 12) as w:
            for ts in u.trajectory:
                w.write(u)  # Universe → current frame of its atoms
        for p in (p1, p2):
            r = TRRReader(p)
            assert r.n_frames == 4
            assert_allclose(r[2].positions, u.trajectory[2].positions,
                            atol=1e-5)
            assert_allclose(r[2].velocities,
                            u.trajectory[2].velocities, atol=1e-5)
            assert_allclose(r[2].dimensions[:3], [30, 30, 30],
                            atol=1e-3)

    def test_xtc_write_atomgroup(self, u, tmp_path):
        from transport_analysis_tpu.io.xtc import XTCReader, XTCWriter

        p = tmp_path / "ag.xtc"
        with XTCWriter(p, 12) as w:
            for ts in u.trajectory:
                w.write(u.atoms)
        r = XTCReader(p)
        assert r.n_frames == 4
        assert_allclose(r[1].positions, u.trajectory[1].positions,
                        atol=0.011)

    def test_dcd_netcdf_h5md_write_timestep(self, u, tmp_path):
        from transport_analysis_tpu.io.dcd import DCDReader, DCDWriter
        from transport_analysis_tpu.io.netcdf import NCDFReader, NCDFWriter

        p = tmp_path / "t.dcd"
        with DCDWriter(p, 12) as w:
            for ts in u.trajectory:
                w.write(ts)
        assert_allclose(DCDReader(p)[3].positions,
                        u.trajectory[3].positions, atol=1e-5)

        p = tmp_path / "t.ncdf"
        with NCDFWriter(p, 12, velocities=True) as w:
            for ts in u.trajectory:
                w.write(ts)
        r = NCDFReader(p)
        assert_allclose(r[3].positions, u.trajectory[3].positions,
                        atol=1e-4)


class TestH5MDSpecFeatures:
    """H5MD units, time-dependent triclinic boxes, and distinct
    velocity sampling (ROADMAP round-2 capability)."""

    def test_units_written_and_honored(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        from transport_analysis_tpu.io.h5md import H5MDReader, H5MDWriter

        rng = np.random.RandomState(0)
        pos = rng.uniform(0, 30, (2, 5, 3)).astype(np.float32)
        p = tmp_path / "u.h5md"
        with H5MDWriter(p, 5, velocities=True) as w:
            for i in range(2):
                w.write(pos[i], velocities=pos[i] * 0.1,
                        dimensions=[30, 30, 30, 90, 90, 90],
                        time=0.5 * i)
        with h5py.File(p) as f:
            g = f["particles/trajectory"]
            assert g["position/value"].attrs["unit"] == "Angstrom"
            assert g["velocity/value"].attrs["unit"] == "Angstrom ps-1"
            assert g["position/time"].attrs["unit"] == "ps"
        r = H5MDReader(p)
        assert_allclose(r[1].positions, pos[1], atol=1e-5)

    def test_nm_units_converted_on_read(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        from transport_analysis_tpu.io.h5md import H5MDReader

        p = tmp_path / "nm.h5md"
        rng = np.random.RandomState(1)
        pos_nm = rng.uniform(0, 3, (2, 4, 3)).astype(np.float32)
        with h5py.File(p, "w") as f:
            g = f.create_group("particles/stuff")
            v = g.create_dataset("position/value", data=pos_nm)
            v.attrs["unit"] = "nm"
            t = g.create_dataset("position/time",
                                 data=np.array([0.0, 500.0]))
            t.attrs["unit"] = "fs"
        r = H5MDReader(p)
        assert_allclose(r[0].positions, pos_nm[0] * 10.0, rtol=1e-6)
        assert r[1].time == pytest.approx(0.5)  # 500 fs = 0.5 ps

    def test_triclinic_time_dependent_box(self, tmp_path):
        pytest.importorskip("h5py")
        from transport_analysis_tpu.io.h5md import H5MDReader, H5MDWriter

        rng = np.random.RandomState(2)
        pos = rng.uniform(0, 20, (3, 4, 3)).astype(np.float32)
        p = tmp_path / "tri.h5md"
        dims = [
            [20, 20, 20, 60, 60, 90],
            [21, 21, 21, 60, 60, 90],
            [22, 22, 22, 61, 59, 90],
        ]
        with H5MDWriter(p, 4, triclinic=True) as w:
            for i in range(3):
                w.write(pos[i], dimensions=dims[i], time=float(i))
        r = H5MDReader(p)
        for i in range(3):
            assert_allclose(r[i].dimensions, dims[i], atol=1e-6)

    def test_distinct_velocity_sampling(self, tmp_path):
        pytest.importorskip("h5py")
        from transport_analysis_tpu.io.h5md import H5MDReader, H5MDWriter

        rng = np.random.RandomState(3)
        pos = rng.uniform(0, 10, (6, 4, 3)).astype(np.float32)
        vel = rng.normal(0, 1, (6, 4, 3)).astype(np.float32)
        p = tmp_path / "sparse.h5md"
        with H5MDWriter(p, 4, velocities=True, velocity_every=2) as w:
            for i in range(6):
                w.write(pos[i], velocities=vel[i], time=float(i))
        r = H5MDReader(p)
        # velocities sampled every 2nd step: not exposable per frame
        assert r.n_frames == 6
        assert not r.ts.has_velocities
        steps, times, values = r.velocity_samples()
        assert list(steps) == [0, 2, 4]
        assert_allclose(values, vel[::2], atol=1e-6)
        assert_allclose(times, [0.0, 2.0, 4.0])
