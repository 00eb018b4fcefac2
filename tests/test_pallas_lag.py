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
