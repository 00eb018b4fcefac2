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


class TestOUAnalyticOracle:
    """Physics-analytic oracle for the generated EC data.

    data/generate.py synthesizes per-atom Ornstein-Uhlenbeck
    velocities (stationary Maxwell-Boltzmann, memory θ = exp(-Δt/τ))
    with positions integrated from them:

        v_n = θ v_{n-1} + σ √(1-θ²) ξ_n,   σ² = 100 k_B T / m
        x_n = x_0 + Δt Σ_{u=1..n} v_u

    Everything the analyses compute therefore has a CLOSED-FORM
    expectation (Gaussian process + Wick's theorem), independent of
    any code in transport_analysis_tpu — this replaces the self-pinned
    regression value as the primary correctness oracle (the pinned
    values remain as byte-level drift detectors).

    VACF:  E[C(k)] = 3 · 100 k_B T · ⟨1/m⟩ · θ^k.

    Helfand function: with A_i = m v_i x_i = m v_i (x_0 + y_i),
    y_i = Δt Σ_{u≤i} v_u, Wick gives

        E[(A_i − A_j)²] = m²[ x_0² · 2σ²(1−θ^k)
                              + E B_i² + E B_j² − 2 E B_i B_j ]
        E[B_i B_j] = E[v_i y_i] E[v_j y_j] + E[v_i v_j] E[y_i y_j]
                     + E[v_i y_j] E[y_i v_j]          (B_i = v_i y_i)

    with every covariance an explicit θ-geometric sum. Note m²σ² =
    100 k_B T · m and m²σ⁴ = (100 k_B T)², so atom sums reduce to
    ⟨m x_0²⟩ and a mass-independent term. The analytic expectation
    also shows E[slope over (10, 40)] ≈ 0: independent OU particles
    carry no collective momentum flux, so the pinned nonzero
    `results.viscosity` is sampling noise around a plateau — which is
    why the per-lag FUNCTION, not the slope, is the physical oracle.
    """

    KB = 0.008314462159
    TAU = 0.35  # generator's velocity correlation time (ps)

    @pytest.fixture(scope="class")
    def oracle(self, u_ec):
        from transport_analysis_tpu.data.generate import (
            DT, N_FRAMES, TEMP,
        )

        theta = np.exp(-DT / self.TAU)
        n = N_FRAMES
        masses = u_ec.atoms.masses.astype(np.float64)
        x0 = u_ec.trajectory[0].positions.astype(np.float64)
        vol = float(u_ec.trajectory.ts.volume)

        idx = np.arange(n)
        # R[i,j] = E[v_i v_j]/σ²;  S[i,j] = E[v_i y_j]/(σ² Δt);
        # Q[i,j] = E[y_i y_j]/(σ² Δt²)  (y_0 = 0)
        R = theta ** np.abs(idx[:, None] - idx[None, :])
        S = np.concatenate(
            [np.zeros((n, 1)), np.cumsum(R[:, 1:], axis=1)], axis=1
        )
        Q = np.concatenate(
            [np.zeros((1, n)), np.cumsum(S[1:, :], axis=0)], axis=0
        )

        kbt100 = 100.0 * self.KB * TEMP
        x_mom = np.mean(masses[:, None] * x0 ** 2)  # ⟨m x_0²⟩
        d = S.diagonal()
        ts_exp = np.zeros(n)
        for k in range(1, n):
            i = np.arange(n - k)
            j = i + k
            ebii = d[i] ** 2 + Q[i, i] + S[i, i] * S[i, i]
            ebjj = d[j] ** 2 + Q[j, j] + S[j, j] * S[j, j]
            ebij = d[i] * d[j] + R[i, j] * Q[i, j] + S[i, j] * S[j, i]
            term2 = kbt100 ** 2 * DT ** 2 * np.mean(
                ebii + ebjj - 2.0 * ebij
            )
            term1 = kbt100 * x_mom * 2.0 * (1.0 - theta ** k)
            ts_exp[k] = (term1 + term2) / (2.0 * self.KB * vol * TEMP)

        vacf_exp = (
            3.0 * kbt100 * np.mean(1.0 / masses)
            * theta ** np.arange(n)
        )
        return {"helfand": ts_exp, "vacf": vacf_exp, "theta": theta}

    def test_vacf_against_analytic(self, u_ec, oracle):
        v = VelocityAutocorr(u_ec.atoms).run()
        ts = v.results.timeseries
        want = oracle["vacf"]
        # lag 0: equipartition, tight (~1.1e6 samples → ~0.2% noise)
        assert ts[0] == pytest.approx(want[0], rel=0.01)
        # lag 1: resolves the θ decay
        assert ts[1] == pytest.approx(want[1], rel=0.05)
        # beyond ~2τ the expectation is below the sampling noise
        # floor; assert only that the tail has decayed there
        assert np.all(np.abs(ts[3:10]) < 0.02 * want[0])

    def test_helfand_function_against_analytic(self, u_ec, oracle):
        """Per-lag viscosity function vs the Wick expectation: a
        systematic error anywhere (k_B, volume, mass weighting,
        component mean, frame average, the (N-lag) normalization, or
        the 1/(2 k_B V T) prefactor) shifts every lag."""
        vh = ViscosityHelfand(u_ec.atoms).run()
        ts = np.asarray(vh.results.timeseries)
        want = oracle["helfand"]
        rel = np.abs(ts[1:] - want[1:]) / want[1:]
        # sampling noise grows as the frame-average window N-k shrinks
        # (measured profile: ~0.5% to k=60, ~3.5% at k=99)
        assert rel[:60].max() < 0.02, rel[:60].max()
        assert rel.max() < 0.08, rel.max()

    def test_viscosity_slope_is_plateau_noise(self, u_ec, oracle):
        """The analytic slope over the fit window is ~0 (independent
        OU particles transport no collective momentum); the measured
        slope must be small on the plateau scale — a wrong lag
        normalization or growth term would break this."""
        lagtimes = np.arange(1, len(oracle["helfand"]))
        win = slice(10, 40)
        slope_exp = np.polyfit(
            lagtimes[win], oracle["helfand"][1:][win], 1
        )[0]
        plateau = oracle["helfand"][50]
        assert abs(slope_exp) < 1e-4 * plateau
        vh = ViscosityHelfand(
            u_ec.atoms, linear_fit_window=(10, 40)
        ).run()
        assert abs(vh.results.viscosity) < 5e-3 * plateau
