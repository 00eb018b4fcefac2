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


REF_TOP = (
    "/root/reference/transport_analysis/data/ethylene_carbonate/"
    "topology.pdb"
)


@pytest.mark.skipif(
    not __import__("os").path.exists(REF_TOP),
    reason="reference snapshot not present",
)
class TestReferenceTopologyRegression:
    """Regression on the reference's ACTUAL EC topology file.

    The reference pins viscosity 0.0256 ± 0.005 on its packaged
    EC trajectory (reference test_viscosity.py:161-162) — that value
    is UNREACHABLE here because the TRR blob is absent from the
    snapshot (/root/reference/.MISSING_LARGE_BLOBS). This narrows the
    gap as far as the available data allows: parse the real
    topology.pdb (3680 atoms, triclinic 41.432³ α=β=60 γ=90),
    generate a deterministic physically-reasonable trajectory on it
    (OU thermal dynamics, data/generate.py), validate the full
    pipeline against an independent brute-force oracle, and pin the
    resulting value. The reference file is READ from the snapshot,
    never copied into this repo.
    """

    PINNED_VISCOSITY = 0.00016334003958125612

    @pytest.fixture(scope="class")
    def u_ref(self, tmp_path_factory):
        import os

        from transport_analysis_tpu.data import generate as gen

        trr = str(tmp_path_factory.mktemp("refec") / "ref_ec.trr")
        gen.generate_trajectory(REF_TOP, trr)
        assert os.path.getsize(trr) > 0
        return ta.Universe(REF_TOP, trr)

    def test_topology_parse(self, u_ref):
        from transport_analysis_tpu.core.timestep import box_volume

        assert len(u_ref.atoms) == 3680
        dims = u_ref.trajectory.ts.dimensions
        assert_allclose(dims, [41.432, 41.432, 41.432, 60, 60, 90],
                        atol=1e-3)
        # triclinic volume: a·b·c·sqrt(1 − Σcos² + 2·cosα·cosβ·cosγ)
        assert_allclose(box_volume(dims), 50291.28, rtol=1e-4)
        # element-derived masses: 368 × C3H4O3 (+ ring H) composition
        assert_allclose(u_ref.atoms.masses.sum(), 368 * 88.062, rtol=1e-3)

    def test_viscosity_pinned_and_oracle(self, u_ref):
        vh = ViscosityHelfand(
            u_ref.atoms, linear_fit_window=(10, 40)
        ).run()
        assert vh.results.viscosity == pytest.approx(
            self.PINNED_VISCOSITY, rel=1e-6
        )

        # independent brute-force oracle (reference viscosity.py
        # semantics: mean over d, lag-0 row 0, arange(1, N) fit x's)
        n = u_ref.trajectory.n_frames
        p = len(u_ref.atoms)
        mvx = np.empty((n, p, 3))
        vols = np.empty(n)
        masses = u_ref.atoms.masses[None, :, None]
        for i, ts in enumerate(u_ref.trajectory):
            mvx[i] = masses[0] * ts.positions * ts.velocities
            vols[i] = ts.volume
        visc = np.zeros((n, p))
        for lag in range(1, n):
            diff = mvx[:-lag] - mvx[lag:]
            visc[lag] = np.square(diff).mean(-1).mean(0)
        kb = 0.008314462159
        series = visc.mean(1) / (2 * kb * vols.mean() * 300.0)
        lagtimes = np.arange(1, n)
        slope = np.polyfit(lagtimes[10:40], series[10:40], 1)[0]
        assert vh.results.viscosity == pytest.approx(slope, rel=1e-8)
        assert_allclose(vh.results.timeseries, series,
                        rtol=1e-8, atol=1e-12)
