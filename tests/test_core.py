"""Core data-model tests: Timestep, MemoryReader, Universe, AtomGroup,
selection language (capability parity with the MDAnalysis slice the
reference consumes, SURVEY.md §2b)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

import transport_analysis_tpu as ta
from transport_analysis_tpu.core.timestep import Timestep, box_volume
from transport_analysis_tpu.core.trajectory import MemoryReader
from transport_analysis_tpu.core.transformations import set_dimensions
from transport_analysis_tpu.utils.errors import NoDataError, SelectionError


class TestTimestep:
    def test_flags(self):
        ts = Timestep(5, positions=True, velocities=False)
        assert ts.has_positions and not ts.has_velocities
        with pytest.raises(NoDataError):
            ts.velocities

    def test_volume_orthorhombic(self):
        ts = Timestep(1)
        ts.dimensions = np.array([2.0, 2.0, 2.0, 90.0, 90.0, 90.0])
        assert_allclose(ts.volume, 8.0)

    def test_volume_triclinic(self):
        # the packaged EC topology box: 41.432³ with α=β=60, γ=90
        v = box_volume([41.432, 41.432, 41.432, 60.0, 60.0, 90.0])
        a = np.radians(60)
        g = np.radians(90)
        expected = 41.432 ** 3 * np.sqrt(
            1 - 2 * np.cos(a) ** 2 - np.cos(g) ** 2
            + 2 * np.cos(a) ** 2 * np.cos(g)
        )
        assert_allclose(v, expected)

    def test_volume_zero_without_box(self):
        ts = Timestep(1)
        assert ts.volume == 0.0


class TestMemoryReader:
    def test_iteration_and_views(self):
        pos = np.arange(2 * 3 * 3, dtype=np.float32).reshape(2, 3, 3)
        r = MemoryReader(pos.copy())
        frames = [ts.frame for ts in r]
        assert frames == [0, 1]
        assert_allclose(r[1].positions, pos[1])

    def test_write_through_views(self):
        r = MemoryReader.allocate(2, 4, velocities=True)
        for i, ts in enumerate(r):
            ts.velocities[:] = i + 1
        # re-read: writes must persist
        assert_allclose(r[2].velocities, 3.0)

    def test_slicing(self):
        r = MemoryReader.allocate(1, 10)
        sel = r[2:9:3]
        assert [ts.frame for ts in sel] == [2, 5, 8]
        assert len(sel) == 3

    def test_batch_read(self):
        pos = np.random.rand(6, 4, 3).astype(np.float32)
        vel = np.random.rand(6, 4, 3).astype(np.float32)
        r = MemoryReader(pos, velocities=vel, dt=2.0)
        batch = r.read_frames_batch([1, 3, 5])
        assert_allclose(batch["positions"], pos[[1, 3, 5]])
        assert_allclose(batch["velocities"], vel[[1, 3, 5]])
        assert_allclose(batch["times"], [2.0, 6.0, 10.0])

    def test_check_slice_indices(self):
        r = MemoryReader.allocate(1, 100)
        assert r.check_slice_indices(None, None, None) == (0, 100, 1)
        assert r.check_slice_indices(10, 1000, 10) == (10, 100, 10)
        with pytest.raises(ValueError):
            r.check_slice_indices(0, 10, 0)


class TestUniverse:
    def test_empty(self):
        u = ta.Universe.empty(7, n_frames=3, velocities=True)
        assert len(u.atoms) == 7
        assert u.trajectory.n_frames == 3
        assert u.trajectory.has_velocities

    def test_empty_no_velocities(self):
        u = ta.Universe.empty(10, n_frames=5, velocities=False)
        assert not u.trajectory.has_velocities

    def test_topology_instance_plus_trajectory_path(self, tmp_path):
        # Universe(Topology(n), "traj.trr"): the path is a TRAJECTORY,
        # not a topology file (regression: it was fed to load_topology)
        from transport_analysis_tpu.core.topology import Topology
        from transport_analysis_tpu.io.trr import TRRWriter

        path = str(tmp_path / "v.trr")
        rng = np.random.default_rng(3)
        with TRRWriter(path, n_atoms=5) as w:
            for i in range(4):
                w.write(
                    positions=rng.normal(0, 5, (5, 3)).astype(np.float32),
                    velocities=rng.normal(0, 2, (5, 3)).astype(np.float32),
                    dimensions=[20.0, 20.0, 20.0, 90.0, 90.0, 90.0],
                    time=0.002 * i,
                    step=i,
                )
        u = ta.Universe(Topology(5), path)
        assert u.trajectory.n_frames == 4
        assert u.trajectory[2].has_velocities

    def test_load_new(self):
        u = ta.Universe.empty(2)
        coords = np.random.rand(4, 2, 3).astype(np.float32)
        u.load_new(coords)
        assert u.trajectory.n_frames == 4
        assert_allclose(u.trajectory[3].positions, coords[3])

    def test_add_topology_attr(self):
        u = ta.Universe.empty(1)
        u.add_TopologyAttr("masses", [16.0])
        assert_allclose(u.atoms.masses, [16.0])

    def test_add_topology_attr_per_atom_reduce(self):
        # per-atom values constant within each residue reduce cleanly
        u = ta.Universe.empty(4, n_residues=2, atom_resindex=[0, 0, 1, 1])
        u.add_TopologyAttr("resids", [7, 7, 9, 9])
        assert list(u.atoms.resids) == [7, 7, 9, 9]

    def test_add_topology_attr_per_atom_conflict_raises(self):
        # distinct per-atom values on a residue-level attr must not be
        # silently collapsed (regression: resids 1..10 on a 1-residue
        # empty Universe used to become all-10)
        u = ta.Universe.empty(10)
        with pytest.raises(ValueError, match="not constant within"):
            u.add_TopologyAttr("resids", np.arange(1, 11))

    def test_set_dimensions_persists(self):
        u = ta.Universe.empty(1, n_frames=3)
        setter = set_dimensions([2, 2, 2, 90, 90, 90])
        for ts in u.trajectory:
            setter(ts)
        assert_allclose(u.trajectory[1].volume, 8.0)


class TestAtomGroupAndSelection:
    @pytest.fixture()
    def u(self):
        u = ta.Universe.empty(
            6, n_residues=3, n_segments=1,
            atom_resindex=[0, 0, 1, 1, 2, 2], n_frames=2,
            velocities=True,
        )
        u.add_TopologyAttr("names", ["O", "H", "O", "H", "CA", "N"])
        u.add_TopologyAttr("resnames", ["WAT", "WAT", "SOL"])
        u.add_TopologyAttr("resids", [1, 2, 3])
        u.add_TopologyAttr("masses", [16, 1, 16, 1, 12, 14])
        return u

    def test_name(self, u):
        assert_array_equal(u.select_atoms("name O").indices, [0, 2])

    def test_and_or_not(self, u):
        ag = u.select_atoms("name O and resname WAT")
        assert_array_equal(ag.indices, [0, 2])
        ag = u.select_atoms("name O or name N")
        assert_array_equal(ag.indices, [0, 2, 5])
        ag = u.select_atoms("not name H")
        assert_array_equal(ag.indices, [0, 2, 4, 5])

    def test_resid_range(self, u):
        assert_array_equal(
            u.select_atoms("resid 1-2").indices, [0, 1, 2, 3]
        )
        assert_array_equal(u.select_atoms("resid 1 3").indices, [0, 1, 4, 5])

    def test_parentheses(self, u):
        ag = u.select_atoms("(name O or name H) and resid 1")
        assert_array_equal(ag.indices, [0, 1])

    def test_combined_reference_style(self, u):
        # the selection style used throughout the reference tests
        ag = u.select_atoms("name O and resname WAT and resid 1-10")
        assert_array_equal(ag.indices, [0, 2])

    def test_mass_filter(self, u):
        assert_array_equal(u.select_atoms("mass 16").indices, [0, 2])

    def test_index(self, u):
        assert_array_equal(u.select_atoms("index 0-2").indices, [0, 1, 2])

    def test_all_none(self, u):
        assert len(u.select_atoms("all")) == 6
        assert len(u.select_atoms("none")) == 0

    def test_bad_selection(self, u):
        with pytest.raises(SelectionError):
            u.select_atoms("bogus keyword")

    def test_around_updating(self, u):
        u.atoms.positions = np.array(
            [[0, 0, 0], [1, 0, 0], [10, 0, 0], [11, 0, 0],
             [2, 0, 0], [20, 0, 0]],
            dtype=np.float32,
        )
        ag = u.select_atoms("around 3.5 resid 1", updating=True)
        assert isinstance(ag, ta.UpdatingAtomGroup)
        # atoms 4 (d=2) within 3.5 of resid 1 atoms {0,1}; excludes selves
        assert_array_equal(ag.indices, [4])

    def test_atomgroup_properties(self, u):
        ag = u.select_atoms("name O")
        assert len(ag) == 2
        assert ag.n_atoms == 2
        assert_allclose(ag.masses, [16, 16])
        vel = np.random.rand(2, 3).astype(np.float32)
        ag.velocities = vel
        assert_allclose(ag.velocities, vel)
        # write-through persists in the backing store
        assert_allclose(u.trajectory[0].velocities[[0, 2]], vel)


class TestPropSelection:
    @pytest.fixture()
    def u(self):
        u = ta.Universe.empty(4, n_frames=1)
        u.add_TopologyAttr("masses", [1.0, 12.0, 16.0, 32.0])
        u.atoms.positions = np.array(
            [[0, 0, -5], [1, 0, 2], [2, 0, 7], [3, 0, -1]], np.float32
        )
        return u

    def test_prop_mass(self, u):
        assert_array_equal(u.select_atoms("prop mass > 12").indices, [2, 3])
        assert_array_equal(
            u.select_atoms("prop mass <= 12").indices, [0, 1]
        )

    def test_prop_position(self, u):
        assert_array_equal(u.select_atoms("prop z > 0").indices, [1, 2])
        assert_array_equal(
            u.select_atoms("prop abs z < 3").indices, [1, 3]
        )

    def test_prop_combined(self, u):
        ag = u.select_atoms("prop mass > 10 and prop z < 0")
        assert_array_equal(ag.indices, [3])

    def test_prop_errors(self, u):
        from transport_analysis_tpu.utils.errors import SelectionError

        with pytest.raises(SelectionError, match="unknown property"):
            u.select_atoms("prop bogus > 1")
        with pytest.raises(SelectionError, match="unknown operator"):
            u.select_atoms("prop mass ~ 1")


def test_load_new_from_file_and_reader(tmp_path):
    """MDAnalysis parity: Universe.load_new accepts a trajectory path
    or an open reader, not only in-memory arrays."""
    import transport_analysis_tpu as ta
    from transport_analysis_tpu.io.trr import TRRReader, TRRWriter

    rng = np.random.RandomState(1)
    pos = rng.uniform(0, 9, (5, 4, 3)).astype(np.float32)
    path = tmp_path / "ln.trr"
    with TRRWriter(path, 4) as w:
        for i in range(5):
            w.write(positions=pos[i], time=float(i))

    u = ta.Universe.empty(4)
    u.load_new(str(path))
    assert u.trajectory.n_frames == 5
    assert_allclose(u.trajectory[3].positions, pos[3], atol=1e-5)

    u2 = ta.Universe.empty(4)
    u2.load_new(TRRReader(path))
    assert u2.trajectory.n_frames == 5


class TestGeometricSelections:
    """byres / sphzone / sphlayer / cyzone / cylayer / point and
    PBC-aware around (ROADMAP round-2 capability; MDAnalysis selection
    semantics: zones measure from the cog of the inner selection,
    around excludes the inner selection, minimum-image distances when
    an orthorhombic box is present)."""

    @pytest.fixture()
    def u(self):
        import transport_analysis_tpu as ta
        from transport_analysis_tpu.core.transformations import (
            set_dimensions,
        )

        u = ta.Universe.empty(8, n_residues=4)
        u.add_TopologyAttr("names",
                           ["A", "B", "A", "B", "A", "B", "A", "B"])
        u.trajectory.add_transformations(
            set_dimensions([10, 10, 10, 90, 90, 90])
        )
        pos = np.array([
            [1.0, 1.0, 1.0],   # res 0
            [1.5, 1.0, 1.0],   # res 0
            [5.0, 5.0, 5.0],   # res 1
            [5.0, 5.5, 5.0],   # res 1
            [9.6, 1.0, 1.0],   # res 2 — wraps near atom 0 across x
            [9.0, 9.0, 9.0],   # res 2
            [5.0, 5.0, 7.0],   # res 3 — above res-1 cluster in z
            [5.0, 5.0, 2.8],   # res 3 — below res-1 cluster in z
        ], dtype=np.float32)
        u.atoms.positions = pos
        return u

    def test_byres_expands_to_whole_residue(self, u):
        ag = u.select_atoms("byres index 0")
        assert list(ag.indices) == [0, 1]
        ag = u.select_atoms("byres (index 2 7)")
        assert list(ag.indices) == [2, 3, 6, 7]

    def test_sphzone_from_cog(self, u):
        # cog(index 2 3) = (5, 5.25, 5)
        ag = u.select_atoms("sphzone 1.0 (index 2 3)")
        assert list(ag.indices) == [2, 3]
        ag = u.select_atoms("sphzone 2.5 (index 2 3)")
        assert list(ag.indices) == [2, 3, 6, 7]

    def test_sphlayer_excludes_core(self, u):
        ag = u.select_atoms("sphlayer 1.5 2.5 (index 2 3)")
        assert list(ag.indices) == [6, 7]

    def test_cyzone_and_cylayer(self, u):
        # cylinder around cog(2,3): radial in xy, z in [-3, +3]
        ag = u.select_atoms("cyzone 1.0 3.0 -3.0 (index 2 3)")
        assert list(ag.indices) == [2, 3, 6, 7]
        # layer with inner radius excludes the on-axis atoms
        # all cluster atoms sit at xy radius 0.25 from the cog; an
        # inner radius of 0.5 excludes them all
        ag = u.select_atoms("cylayer 0.5 1.0 3.0 -3.0 (index 2 3)")
        assert list(ag.indices) == []

    def test_point_selection(self, u):
        ag = u.select_atoms("point 1.0 1.0 1.0 0.8")
        assert list(ag.indices) == [0, 1]
        # PBC: point near the box edge reaches the wrapped atom
        ag = u.select_atoms("point 0.1 1.0 1.0 0.6")
        assert list(ag.indices) == [4]

    def test_around_uses_minimum_image(self, u):
        # atom 4 at x=9.6 is 1.4 Å from atom 0 across the x boundary
        ag = u.select_atoms("around 1.5 index 0")
        assert 4 in ag.indices
        assert 1 in ag.indices
        assert 0 not in ag.indices  # inner excluded

    def test_zone_on_empty_inner(self, u):
        assert len(u.select_atoms("sphzone 5.0 name ZZZ")) == 0
        assert len(u.select_atoms("cyzone 5 5 -5 name ZZZ")) == 0


class TestAtomGroupDerived:
    """center_of_mass / center_of_geometry / totals / Rgyr (MDAnalysis
    convenience surface)."""

    @pytest.fixture()
    def ag(self):
        import transport_analysis_tpu as ta

        u = ta.Universe.empty(4)
        u.add_TopologyAttr("masses", [1.0, 1.0, 2.0, 4.0])
        u.add_TopologyAttr("charges", [0.5, -0.5, 1.0, 0.0])
        u.atoms.positions = np.array(
            [[0, 0, 0], [2, 0, 0], [0, 2, 0], [0, 0, 2]], np.float32
        )
        return u.atoms

    def test_totals(self, ag):
        assert ag.total_mass() == 8.0
        assert ag.total_charge() == pytest.approx(1.0)

    def test_centers(self, ag):
        assert_allclose(ag.center_of_geometry(), [0.5, 0.5, 0.5])
        assert_allclose(ag.centroid(), [0.5, 0.5, 0.5])
        # com = (1*[0,0,0] + 1*[2,0,0] + 2*[0,2,0] + 4*[0,0,2]) / 8
        assert_allclose(ag.center_of_mass(), [0.25, 0.5, 1.0])

    def test_radius_of_gyration(self, ag):
        m = np.array([1.0, 1.0, 2.0, 4.0])
        pos = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0], [0, 0, 2.0]])
        com = (pos * m[:, None]).sum(0) / m.sum()
        rg = np.sqrt((m * ((pos - com) ** 2).sum(1)).sum() / m.sum())
        assert ag.radius_of_gyration() == pytest.approx(rg)
