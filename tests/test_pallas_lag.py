"""Pallas windowed-lag kernel vs the XLA reference kernels (runs in
interpret mode on CPU — the same kernel code the TPU compiles)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from transport_analysis_tpu import ops
from transport_analysis_tpu.ops.pallas_lag import windowed_lag_pallas


@pytest.fixture(scope="module")
def series():
    rng = np.random.RandomState(23)
    return rng.normal(size=(40, 3, 3))


def test_acf_full_lags(series):
    got = np.asarray(windowed_lag_pallas(series, mode="acf"))
    want = np.asarray(ops.acf_windowed(series))
    assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_acf_capped_lags(series):
    got = np.asarray(windowed_lag_pallas(series, max_lag=10, mode="acf"))
    want = np.asarray(ops.acf_windowed(series))[:10]
    assert got.shape == (10, 3)
    assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_einstein_mean(series):
    got = np.asarray(
        windowed_lag_pallas(series, mode="einstein", reduce_mode="mean")
    )
    want = np.asarray(
        ops.einstein_difference_windowed(series, reduce_mode="mean")
    )
    assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_einstein_sum_capped(series):
    got = np.asarray(
        windowed_lag_pallas(
            series, max_lag=17, mode="einstein", reduce_mode="sum"
        )
    )
    want = np.asarray(
        ops.einstein_difference_windowed(series, reduce_mode="sum")
    )[:17]
    assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_single_component():
    rng = np.random.RandomState(1)
    x = rng.normal(size=(33, 5))  # 2-D input → d=1
    got = np.asarray(windowed_lag_pallas(x, mode="acf"))
    want = np.asarray(ops.acf_windowed(x))
    assert_allclose(got, want, rtol=1e-10, atol=1e-12)


class TestPairProfile:
    """float64 double-float pair kernel (interpret mode on CPU)."""

    def test_f64_output_dtype(self, series):
        out = windowed_lag_pallas(series, mode="acf")
        assert out.dtype == np.float64

    def test_large_magnitude_offsets(self):
        # step-trajectory-like data: large, growing, strongly
        # correlated — the regime the decimal=4 windowed contract is
        # tested in (reference test_velocityautocorr.py:48-57)
        t = np.arange(400, dtype=np.float64)
        x = np.stack([t, t, t], axis=-1)[:, None, :]  # (N, 1, 3)
        got = np.asarray(windowed_lag_pallas(x, mode="acf"))
        n = 400
        want = np.zeros((n, 1))
        for lag in range(n):
            want[lag] = np.sum(t[: n - lag] * t[lag:]) * 3 / (n - lag)
        assert_allclose(got, want, rtol=1e-12)

    def test_mixed_row_scales(self):
        # rows of wildly different magnitude: per-row grids must not
        # let a large row destroy a small row's precision
        rng = np.random.RandomState(5)
        x = rng.normal(size=(64, 4, 1))
        x[:, 1] *= 1e6
        x[:, 2] *= 1e-6
        got = np.asarray(windowed_lag_pallas(x, mode="acf"))
        want = np.asarray(
            ops.acf_windowed(x, max_lag=None)
        )
        assert_allclose(got, want, rtol=1e-10)

    def test_einstein_cancellation(self):
        # nearly-equal neighbours: differences cancel ~6 orders below
        # the row scale; the pair diff must capture them
        t = np.linspace(0.0, 1.0, 200)
        x = (1000.0 + np.sin(t))[:, None, None]
        got = np.asarray(
            windowed_lag_pallas(x, mode="einstein", reduce_mode="sum")
        )
        n = 200
        want = np.zeros((n, 1))
        for lag in range(1, n):
            d = x[: n - lag, 0, 0] - x[lag:, 0, 0]
            want[lag] = np.sum(d * d) / (n - lag)
        assert_allclose(got, want, rtol=1e-9, atol=1e-20)

    def test_frame_cap_raises(self):
        import jax.numpy as jnp

        x = jnp.zeros(((1 << 17) + 1, 1, 1), jnp.float64)
        with pytest.raises(ValueError, match="pair lag kernel"):
            windowed_lag_pallas(x, max_lag=4, mode="acf")


class TestProductionDispatch:
    """ops.acf_windowed / einstein_difference_windowed route through
    the Pallas kernel when the backend gate opens (forced open here;
    interpret mode on CPU) — the exact production path TPUs take for
    fft=False / max_lag analyses."""

    @pytest.fixture
    def forced_gate(self, monkeypatch):
        from transport_analysis_tpu.ops import acf as acf_mod

        monkeypatch.setattr(
            acf_mod, "_windowed_pallas_ok",
            lambda dtype, n, n_lags=None: True,
        )

    @staticmethod
    def _step_universe(n_frames=60, box=None):
        import transport_analysis_tpu as ta
        from transport_analysis_tpu.core.transformations import (
            set_dimensions,
        )

        v = np.arange(n_frames)
        velocities = np.vstack([v, v, v]).T.reshape(n_frames, 1, 3)
        x = np.arange(n_frames).astype(np.float64)
        x *= x / 2
        positions = np.vstack([x, x, x]).T.reshape(n_frames, 1, 3)
        u = ta.Universe.empty(1, n_frames=n_frames, velocities=True)
        setter = set_dimensions(box) if box else None
        for i, ts in enumerate(u.trajectory):
            u.atoms.velocities = velocities[i]
            u.atoms.positions = positions[i]
            if setter:
                setter(ts)
        u.add_TopologyAttr("masses", [16.0])
        return u

    @pytest.mark.parametrize("dim_type", ["xyz", "xy", "z"])
    def test_vacf_model_windowed(self, forced_gate, dim_type):
        from transport_analysis_tpu.models import VelocityAutocorr

        u = self._step_universe()
        v = VelocityAutocorr(
            u.atoms, dim_type=dim_type, fft=False
        ).run()
        v_ref = VelocityAutocorr(
            u.atoms, dim_type=dim_type, fft=True
        ).run()
        assert_allclose(
            v.results.timeseries, v_ref.results.timeseries,
            rtol=1e-8, atol=1e-8,
        )

    def test_vacf_model_max_lag(self, forced_gate):
        from transport_analysis_tpu.models import VelocityAutocorr

        u = self._step_universe()
        v = VelocityAutocorr(u.atoms, fft=False, max_lag=20).run()
        full = VelocityAutocorr(u.atoms, fft=False).run()
        assert v.results.timeseries.shape == (20,)
        assert_allclose(
            v.results.timeseries, full.results.timeseries[:20],
            rtol=1e-10,
        )

    def test_viscosity_model_windowed(self, forced_gate):
        from transport_analysis_tpu.models import ViscosityHelfand

        u = self._step_universe(box=[2, 2, 2, 90, 90, 90])
        v = ViscosityHelfand(u.atoms, fft=False).run()
        v_ref = ViscosityHelfand(u.atoms, fft=True).run()
        assert_allclose(
            v.results.timeseries, v_ref.results.timeseries,
            rtol=1e-8, atol=1e-12,
        )
