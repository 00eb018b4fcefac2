"""VelocityAutocorr tests — port of the reference's test strategy
(reference tests/test_velocityautocorr.py): closed-form analytic oracles
on the unit-step velocity trajectory, cross-algorithm consistency,
error paths, and plot contracts."""

import numpy as np
import pytest
from numpy.testing import (
    assert_allclose,
    assert_almost_equal,
    assert_approx_equal,
)
from scipy import integrate

import transport_analysis_tpu as ta
from transport_analysis_tpu import VelocityAutocorr as VACF
from transport_analysis_tpu.utils.errors import NoDataError

ALL_DIMS = [
    ("xyz", 3),
    ("xy", 2),
    ("xz", 2),
    ("yz", 2),
    ("x", 1),
    ("y", 1),
    ("z", 1),
]


_POLY_CACHE = {}


def characteristic_poly(last, n_dim, first=0, step=1):
    """Brute-force VACF of the v(t) = (t,...,t) step trajectory:
    C(lag) = n_dim/(frames_used - lag_index) * Σ_x x·(x+lag)
    (independent per-lag oracle, mirroring the reference's
    test_velocityautocorr.py:79-93; inner sum vectorized and results
    memoized to keep the suite fast)."""
    key = (last, n_dim, first, step)
    if key in _POLY_CACHE:
        return _POLY_CACHE[key]
    frames_used = len(range(first, last, step))
    result = np.zeros(frames_used)
    for t in range(first, last, step):
        lagtime = t - first
        xs = np.arange(first, last - lagtime, step, dtype=np.float64)
        total = np.sum(xs * (xs + lagtime))
        idx = lagtime // step
        result[idx] = total * n_dim / (frames_used - idx)
    _POLY_CACHE[key] = result
    return result


@pytest.fixture(scope="module")
def vacf(ag):
    v = VACF(ag, fft=False)
    v.run()
    return v


@pytest.fixture(scope="module")
def vacf_fft(ag):
    v = VACF(ag, fft=True)
    v.run()
    return v


class TestVelocityAutocorr:
    def test_ag_accepted(self, ag):
        VACF(ag, fft=False)

    def test_no_velocities(self):
        u_no_vels = ta.Universe.empty(10, n_frames=5, velocities=False)
        errmsg = "VACF computation requires velocities"
        with pytest.raises(NoDataError, match=errmsg):
            VACF(u_no_vels.atoms, fft=False).run()

    def test_no_velocities_frame_engine(self):
        u_no_vels = ta.Universe.empty(10, n_frames=5, velocities=False)
        with pytest.raises(NoDataError, match="requires velocities"):
            VACF(u_no_vels.atoms, fft=False, engine="frame").run()

    def test_updating_ag_rejected(self, u_random):
        updating_ag = u_random.select_atoms(
            "around 3.5 resid 1", updating=True
        )
        errmsg = "UpdatingAtomGroups are not valid"
        with pytest.raises(TypeError, match=errmsg):
            VACF(updating_ag, fft=False)

    @pytest.mark.parametrize("dimtype", ["foo", "bar", "yx", "zyx"])
    def test_dimtype_error(self, ag, dimtype):
        errmsg = f"invalid dim_type: {dimtype}"
        with pytest.raises(ValueError, match=errmsg):
            VACF(ag, dim_type=dimtype)

    def test_plot_vacf(self, vacf):
        (line,) = vacf.plot_vacf()
        x_act, y_act = line.get_xydata().T
        assert_allclose(x_act, vacf.times)
        assert_allclose(y_act, vacf.results.timeseries)

    def test_plot_vacf_labels(self, vacf):
        (line,) = vacf.plot_vacf()
        assert line.axes.get_xlabel() == "Time (ps)"
        assert (
            line.axes.get_ylabel()
            == "Velocity Autocorrelation Function (Å^2 / ps^2)"
        )

    def test_plot_vacf_custom_labels(self, vacf):
        (line,) = vacf.plot_vacf(xlabel="Custom x", ylabel="Custom y")
        assert line.axes.get_xlabel() == "Custom x"
        assert line.axes.get_ylabel() == "Custom y"

    def test_plot_vacf_start_stop_step(self, vacf, start=1, stop=9, step=2):
        (line,) = vacf.plot_vacf(start=start, stop=stop, step=step)
        x_act, y_act = line.get_xydata().T
        assert_allclose(x_act, vacf.times[start:stop:step])
        assert_allclose(y_act, vacf.results.timeseries[start:stop:step])

    def test_plot_vacf_exception(self, step_vtraj):
        v = VACF(step_vtraj.atoms, fft=False)
        with pytest.raises(RuntimeError, match="Analysis must be run"):
            v.plot_vacf()

    def test_self_diffusivity_gk_exception(self, step_vtraj):
        v = VACF(step_vtraj.atoms, fft=False)
        with pytest.raises(RuntimeError, match="Analysis must be run"):
            v.self_diffusivity_gk()

    def test_self_diffusivity_gk_odd_exception(self, step_vtraj):
        v = VACF(step_vtraj.atoms, fft=False)
        with pytest.raises(RuntimeError, match="Analysis must be run"):
            v.self_diffusivity_gk_odd()

    def test_plot_running_integral(self, vacf):
        y_exp = np.zeros(vacf.n_frames)
        for i in range(1, vacf.n_frames):
            y_exp[i] = (
                integrate.trapezoid(
                    vacf.results.timeseries[: i + 1], vacf.times[: i + 1]
                )
                / vacf.dim_fac
            )
        (line,) = vacf.plot_running_integral()
        x_act, y_act = line.get_xydata().T
        assert_allclose(x_act, vacf.times)
        assert_allclose(y_act, y_exp, atol=1e-12)

    def test_plot_running_integral_labels(self, vacf):
        (line,) = vacf.plot_running_integral()
        assert line.axes.get_xlabel() == "Time (ps)"
        assert (
            line.axes.get_ylabel()
            == "Running Integral of the VACF (Å^2 / ps)"
        )

    def test_plot_running_integral_custom_labels(self, vacf):
        (line,) = vacf.plot_running_integral(
            xlabel="Custom x-label", ylabel="Custom Running Integral"
        )
        assert line.axes.get_xlabel() == "Custom x-label"
        assert line.axes.get_ylabel() == "Custom Running Integral"

    def test_plot_running_integral_start_stop_step(
        self, vacf, start=1, stop=9, step=2
    ):
        """Reference parity (test_velocityautocorr.py:265-287): the
        running integral under start/stop/step integrates the STRIDED
        series cumulatively from `start`."""
        t_range = range(start, stop, step)
        y_exp = np.zeros(len(t_range))
        for i, j in enumerate(t_range):
            if i > 0:
                y_exp[i] = (
                    integrate.trapezoid(
                        vacf.results.timeseries[start: j + 1: step],
                        vacf.times[start: j + 1: step],
                    )
                    / vacf.dim_fac
                )
        (line,) = vacf.plot_running_integral(
            start=start, stop=stop, step=step
        )
        x_act, y_act = line.get_xydata().T
        assert_allclose(x_act, vacf.times[start:stop:step])
        assert_allclose(y_act, y_exp, atol=1e-12)

    def test_plot_running_integral_exception(self, step_vtraj):
        v = VACF(step_vtraj.atoms, fft=False)
        with pytest.raises(RuntimeError, match="Analysis must be run"):
            v.plot_running_integral()


class TestVACFFFT:
    def test_fft_vs_simple_default(self, vacf, vacf_fft):
        assert_almost_equal(
            vacf.results.timeseries, vacf_fft.results.timeseries, decimal=4
        )

    def test_fft_vs_simple_per_particle(self, vacf, vacf_fft):
        assert_almost_equal(
            vacf.results.vacf_by_particle,
            vacf_fft.results.vacf_by_particle,
            decimal=4,
        )

    def test_engines_agree(self, u_random):
        a = VACF(u_random.atoms, fft=False).run()
        b = VACF(u_random.atoms, fft=False, engine="frame").run()
        assert_allclose(
            a.results.timeseries, b.results.timeseries, rtol=1e-12
        )


@pytest.mark.parametrize("tdim, tdim_factor", ALL_DIMS)
class TestAllDims:
    def test_simple_step_vtraj(self, step_vtraj, NSTEP, tdim, tdim_factor):
        v = VACF(step_vtraj.atoms, dim_type=tdim, fft=False).run()
        poly = characteristic_poly(NSTEP, tdim_factor)
        assert_almost_equal(v.results.timeseries, poly, decimal=4)

    def test_simple_start_stop_step(
        self, step_vtraj, tdim, tdim_factor, tstart=10, tstop=1000, tstep=10
    ):
        v = VACF(step_vtraj.atoms, dim_type=tdim, fft=False)
        v.run(start=tstart, stop=tstop, step=tstep)
        poly = characteristic_poly(
            tstop, tdim_factor, first=tstart, step=tstep
        )
        assert_almost_equal(v.results.timeseries, poly, decimal=4)

    def test_fft_step_vtraj(self, step_vtraj, NSTEP, tdim, tdim_factor):
        v = VACF(step_vtraj.atoms, dim_type=tdim, fft=True).run()
        poly = characteristic_poly(NSTEP, tdim_factor)
        assert_almost_equal(v.results.timeseries, poly, decimal=3)

    def test_fft_start_stop_step(
        self, step_vtraj, tdim, tdim_factor, tstart=10, tstop=1000, tstep=10
    ):
        v = VACF(step_vtraj.atoms, dim_type=tdim, fft=True)
        v.run(start=tstart, stop=tstop, step=tstep)
        poly = characteristic_poly(
            tstop, tdim_factor, first=tstart, step=tstep
        )
        assert_almost_equal(v.results.timeseries, poly, decimal=3)

    def test_self_diffusivity(self, step_vtraj, NSTEP, tdim, tdim_factor):
        # trapezoid GK result cross-checked against scipy Simpson
        v = VACF(step_vtraj.atoms, dim_type=tdim, fft=False).run()
        sd_actual = v.self_diffusivity_gk()
        sd_expected = (
            integrate.simpson(
                y=characteristic_poly(NSTEP, tdim_factor), x=range(NSTEP)
            )
            / tdim_factor
        )
        assert_approx_equal(sd_actual, sd_expected, significant=8)

    def test_self_diffusivity_start_stop_step(
        self, step_vtraj, NSTEP, tdim, tdim_factor,
        tstart=10, tstop=1000, tstep=10,
    ):
        v = VACF(step_vtraj.atoms, dim_type=tdim, fft=False).run()
        sd_actual = v.self_diffusivity_gk(
            start=tstart, stop=tstop, step=tstep
        )
        sd_expected = (
            integrate.simpson(
                y=characteristic_poly(NSTEP, tdim_factor)[
                    tstart:tstop:tstep
                ],
                x=range(NSTEP)[tstart:tstop:tstep],
            )
            / tdim_factor
        )
        assert_approx_equal(sd_actual, sd_expected, significant=6)

    def test_self_diffusivity_odd(
        self, step_vtraj, NSTEP, tdim, tdim_factor
    ):
        # Simpson GK result cross-checked against scipy trapezoid
        v = VACF(step_vtraj.atoms, dim_type=tdim, fft=True).run()
        sd_actual = v.self_diffusivity_gk_odd()
        sd_expected = (
            integrate.trapezoid(
                characteristic_poly(NSTEP, tdim_factor), range(NSTEP)
            )
            / tdim_factor
        )
        assert_approx_equal(sd_actual, sd_expected, significant=8)

    def test_self_diffusivity_odd_start_stop_step(
        self, step_vtraj, NSTEP, tdim, tdim_factor,
        tstart=10, tstop=1000, tstep=10,
    ):
        v = VACF(step_vtraj.atoms, dim_type=tdim, fft=True).run()
        sd_actual = v.self_diffusivity_gk_odd(
            start=tstart, stop=tstop, step=tstep
        )
        sd_expected = (
            integrate.trapezoid(
                characteristic_poly(NSTEP, tdim_factor)[tstart:tstop:tstep],
                range(NSTEP)[tstart:tstop:tstep],
            )
            / tdim_factor
        )
        assert_approx_equal(sd_actual, sd_expected, significant=6)


class TestMaxLag:
    def test_max_lag_fft(self, u_random):
        full = VACF(u_random.atoms, fft=True).run()
        capped = VACF(u_random.atoms, fft=True, max_lag=5).run()
        assert capped.results.timeseries.shape == (5,)
        assert_allclose(
            capped.results.timeseries,
            full.results.timeseries[:5],
            rtol=1e-12,
        )

    def test_max_lag_windowed(self, u_random):
        full = VACF(u_random.atoms, fft=False).run()
        capped = VACF(u_random.atoms, fft=False, max_lag=7).run()
        assert_allclose(
            capped.results.timeseries,
            full.results.timeseries[:7],
            rtol=1e-12,
        )

    def test_max_lag_diffusivity_and_plot(self, u_random):
        capped = VACF(u_random.atoms, max_lag=6).run()
        d = capped.self_diffusivity_gk()
        assert np.isfinite(d)
        (line,) = capped.plot_vacf()
        assert len(line.get_xydata()) == 6
