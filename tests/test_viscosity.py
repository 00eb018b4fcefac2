"""ViscosityHelfand tests — port of the reference's strategy
(reference tests/test_viscosity.py): analytic Helfand oracle on the full
step trajectory, all dims, start/stop/step, error paths. Additionally
cross-checks the FFT path (our extension) against the exact windowed
path."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import transport_analysis_tpu as ta
from transport_analysis_tpu import ViscosityHelfand as VH
from transport_analysis_tpu.utils.errors import NoDataError
from transport_analysis_tpu.utils.units import constants

ALL_DIMS = [
    ("xyz", 3),
    ("xy", 2),
    ("xz", 2),
    ("yz", 2),
    ("x", 1),
    ("y", 1),
    ("z", 1),
]


_HELFAND_CACHE = {}


def characteristic_poly_helfand(
    test_universe,
    stop,
    n_dim,
    temp_avg=300.0,
    mass=16.0,
    vol_avg=8.0,
    start=0,
    step=1,
):
    """Brute-force Einstein-Helfand oracle (independent double loop,
    mirroring reference test_viscosity.py:89-132; memoized)."""
    key = (id(test_universe), stop, n_dim, temp_avg, mass, vol_avg,
           start, step)
    if key in _HELFAND_CACHE:
        return _HELFAND_CACHE[key]
    boltzmann = constants["Boltzmann_constant"]
    keys = {1: [0], 2: [0, 1], 3: [0, 1, 2]}
    indices = list(range(start, stop, step))
    frames_used = len(indices)
    velocities = np.zeros((frames_used, 1, n_dim))
    positions = np.zeros((frames_used, 1, n_dim))
    for i, f in enumerate(indices):
        ts = test_universe.trajectory[f]
        velocities[i] = ts.velocities[:, keys[n_dim]]
        positions[i] = ts.positions[:, keys[n_dim]]
    result = np.zeros(frames_used)
    for lag in range(1, frames_used):
        diff = mass * (
            velocities[:-lag] * positions[:-lag]
            - velocities[lag:] * positions[lag:]
        )
        sq_diff = np.square(diff).mean(axis=-1)
        result[lag] = np.mean(sq_diff, axis=0)
    result = result / (2 * boltzmann * vol_avg * temp_avg)
    _HELFAND_CACHE[key] = result
    return result


@pytest.fixture(scope="module")
def visc_helfand(ag):
    vh = VH(ag)
    vh.run()
    return vh


class TestViscosityHelfand:
    def test_ag_accepted(self, ag):
        VH(ag)

    def test_no_velocities(self):
        u_no_vels = ta.Universe.empty(10, n_frames=5, velocities=False)
        u_no_vels.add_TopologyAttr("masses", np.ones(10))
        errmsg = "Helfand viscosity computation requires"
        with pytest.raises(NoDataError, match=errmsg):
            VH(u_no_vels.atoms).run()

    def test_no_volume(self):
        # velocities + positions but a zero box → still NoDataError
        u = ta.Universe.empty(3, n_frames=4, velocities=True)
        u.add_TopologyAttr("masses", np.ones(3))
        errmsg = "Helfand viscosity computation requires"
        with pytest.raises(NoDataError, match=errmsg):
            VH(u.atoms).run()

    def test_no_volume_frame_engine(self):
        u = ta.Universe.empty(3, n_frames=4, velocities=True)
        u.add_TopologyAttr("masses", np.ones(3))
        with pytest.raises(NoDataError, match="requires"):
            VH(u.atoms, engine="frame").run()

    def test_no_volume_frame_block(self):
        # the frame_block= streamed feed's _process_block has its own
        # volume==0 branch (models/viscosity.py); exercise it directly
        u = ta.Universe.empty(3, n_frames=6, velocities=True)
        u.add_TopologyAttr("masses", np.ones(3))
        with pytest.raises(NoDataError, match="requires"):
            VH(u.atoms, frame_block=2).run()

    def test_updating_ag_rejected(self, u_random):
        updating_ag = u_random.select_atoms(
            "around 3.5 resid 1", updating=True
        )
        errmsg = "UpdatingAtomGroups are not valid"
        with pytest.raises(TypeError, match=errmsg):
            VH(updating_ag)

    @pytest.mark.parametrize("dimtype", ["foo", "bar", "yx", "zyx"])
    def test_dimtype_error(self, ag, dimtype):
        errmsg = f"invalid dim_type: {dimtype}"
        with pytest.raises(ValueError, match=errmsg):
            VH(ag, dim_type=dimtype)

    def test_timeseries_exists(self, visc_helfand):
        assert visc_helfand.results.timeseries is not None
        assert (
            len(visc_helfand.results.timeseries) == visc_helfand.n_frames
        )

    def test_linear_fit_window(self, u_random):
        vh = VH(u_random.atoms, linear_fit_window=(2, 9)).run()
        # independent fit with numpy, mirroring the reference's
        # (viscosity.py:240-245) lagtimes = arange(1, n_frames) pairing
        lagtimes = np.arange(1, vh.n_frames)
        exp_slope = np.polyfit(
            lagtimes[2:9], vh.results.timeseries[2:9], 1
        )[0]
        # closed-form LSQ vs numpy's SVD-based polyfit: small numerical
        # spread is expected
        assert_allclose(vh.results.viscosity, exp_slope, rtol=1e-6)

    def test_fft_vs_windowed(self, u_random):
        a = VH(u_random.atoms, fft=True).run()
        b = VH(u_random.atoms, fft=False).run()
        assert_allclose(
            a.results.timeseries, b.results.timeseries, rtol=1e-6
        )
        assert_allclose(
            a.results.visc_by_particle,
            b.results.visc_by_particle,
            rtol=1e-6,
        )

    def test_engines_agree(self, u_random):
        a = VH(u_random.atoms, fft=False).run()
        b = VH(u_random.atoms, fft=False, engine="frame").run()
        assert_allclose(
            a.results.timeseries, b.results.timeseries, rtol=1e-12
        )

    def test_plot_viscosity_function(self, u_random):
        vh = VH(u_random.atoms, linear_fit_window=(2, 9)).run()
        vh.plot_viscosity_function()


@pytest.mark.parametrize("tdim, tdim_factor", ALL_DIMS)
@pytest.mark.parametrize("use_fft", [True, False])
class TestAllDims:
    def test_step_vtraj_all_dims(
        self, step_vtraj_full, NSTEP, tdim, tdim_factor, use_fft
    ):
        vis_h = VH(step_vtraj_full.atoms, dim_type=tdim, fft=use_fft)
        vis_h.run()
        poly = characteristic_poly_helfand(
            step_vtraj_full, NSTEP, tdim_factor
        )
        assert_allclose(vis_h.results.timeseries, poly, rtol=2e-7)

    def test_start_stop_step_all_dims(
        self, step_vtraj_full, tdim, tdim_factor, use_fft,
        tstart=10, tstop=1000, tstep=10,
    ):
        vis_h = VH(step_vtraj_full.atoms, dim_type=tdim, fft=use_fft)
        vis_h.run(start=tstart, stop=tstop, step=tstep)
        poly = characteristic_poly_helfand(
            step_vtraj_full, tstop, tdim_factor, start=tstart, step=tstep
        )
        assert_allclose(vis_h.results.timeseries, poly, rtol=2e-7)


def test_helfand_atom_chunk_parity(u_random):
    """atom_chunk streaming must reproduce the one-shot result."""
    a = VH(u_random.atoms, linear_fit_window=(2, 10)).run()
    b = VH(
        u_random.atoms, linear_fit_window=(2, 10), atom_chunk=3
    ).run()
    assert_allclose(b.results.timeseries, a.results.timeseries,
                    rtol=1e-12)
    assert b.results.viscosity == pytest.approx(
        a.results.viscosity, rel=1e-12
    )
    assert_allclose(b.results.visc_by_particle,
                    a.results.visc_by_particle, rtol=1e-12)
