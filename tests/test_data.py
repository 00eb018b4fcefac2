"""Packaged-data regression tests (counterpart of the reference's
ethylene-carbonate regression, test_viscosity.py:157-164; the data here
is deterministically generated, see data/generate.py, so the regression
value is pinned)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import transport_analysis_tpu as ta
from transport_analysis_tpu import ViscosityHelfand, VelocityAutocorr


@pytest.fixture(scope="module")
def u_ec():
    from transport_analysis_tpu.data.files import ec_top, ec_traj_trr

    return ta.Universe(ec_top, ec_traj_trr)


def test_logo_file():
    from transport_analysis_tpu.data.files import LOGO, MDANALYSIS_LOGO

    with open(LOGO) as fh:
        assert "transport" in fh.read()
    assert MDANALYSIS_LOGO == LOGO


def test_ec_universe_shape(u_ec):
    assert len(u_ec.atoms) == 3680
    assert u_ec.trajectory.n_frames == 100
    assert u_ec.trajectory.has_velocities
    assert_allclose(u_ec.trajectory.ts.volume, 71122.607, rtol=1e-5)


def test_ec_viscosity_regression(u_ec):
    """Pinned Helfand viscosity of the generated EC-like system."""
    vh = ViscosityHelfand(u_ec.atoms, linear_fit_window=(10, 40))
    vh.run()
    assert np.allclose(0.00098984, vh.results.viscosity, atol=5e-5)
    assert vh.results.timeseries is not None


def test_ec_viscosity_fft_windowed_agree(u_ec):
    a = ViscosityHelfand(u_ec.atoms, linear_fit_window=(10, 40)).run()
    b = ViscosityHelfand(
        u_ec.atoms, linear_fit_window=(10, 40), fft=False
    ).run()
    assert_allclose(a.results.viscosity, b.results.viscosity, rtol=1e-8)


def test_ec_vacf_regression(u_ec):
    """VACF lag-0 = mean kinetic |v|² of the 300 K OU ensemble."""
    v = VelocityAutocorr(u_ec.atoms).run()
    assert_allclose(v.results.timeseries[0], 328.965, rtol=1e-4)
    # thermal expectation 3·(100·k_B·T)·<1/m> for the EC composition
    masses = u_ec.atoms.masses
    expected = 3 * 100 * 0.008314462159 * 300 * np.mean(1.0 / masses)
    # statistical agreement within a few percent
    assert abs(v.results.timeseries[0] - expected) / expected < 0.05
