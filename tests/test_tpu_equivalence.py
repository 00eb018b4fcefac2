"""CPU-vs-TPU numerical equivalence (SURVEY.md §4).

These tests only execute on a TPU backend (the normal suite forces the
CPU backend via conftest, so they are skipped there). Run manually:

    JAX_PLATFORMS='' python -m pytest tests/test_tpu_equivalence.py \
        -q -p no:cacheprovider --override-ini=addopts=''

with conftest's platform forcing disabled (set
TRANSPORT_ANALYSIS_TPU_TEST_TPU=1 to opt in).
"""

import os

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax

pytestmark = pytest.mark.skipif(
    not os.environ.get("TRANSPORT_ANALYSIS_TPU_TEST_TPU")
    or jax.default_backend() == "cpu",
    reason="TPU backend not active",
)


def test_acf_fft_matches_host_f64():
    from transport_analysis_tpu import ops
    from transport_analysis_tpu.ops.acf import acf_fft_numpy

    rng = np.random.RandomState(0)
    x = rng.normal(size=(1024, 16, 3))
    got = np.asarray(ops.acf_fft(x))
    want = acf_fft_numpy(x)
    assert_allclose(got, want, rtol=1e-12, atol=1e-10)


def test_einstein_fft_matches_host_f64():
    from transport_analysis_tpu import ops

    rng = np.random.RandomState(1)
    a = rng.normal(size=(512, 8, 3))
    got = np.asarray(ops.einstein_difference_fft(a, "mean"))
    # brute-force host oracle
    n = a.shape[0]
    want = np.zeros((n, 8))
    for lag in range(1, n):
        diff = a[:-lag] - a[lag:]
        want[lag] = np.square(diff).sum(-1).mean(0) / 3.0
    assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_pallas_lag_kernel_f32_grade():
    from transport_analysis_tpu.ops.pallas_lag import windowed_lag_pallas

    rng = np.random.RandomState(2)
    x = rng.normal(size=(512, 16, 3)).astype(np.float32)
    got = np.asarray(windowed_lag_pallas(x, max_lag=64, mode="acf"))
    n = x.shape[0]
    x64 = x.astype(np.float64)
    want = np.zeros((64, 16))
    for lag in range(64):
        want[lag] = (
            np.sum(x64[: n - lag] * x64[lag:], axis=-1).mean(axis=0)
        )
    assert_allclose(got, want, rtol=1e-5, atol=1e-5)
