"""Ring-distributed windowed correlation vs the single-device kernels
(the frame-axis / sequence-parallel path, exact to the serial result)."""

import jax
import numpy as np
import pytest
from numpy.testing import assert_allclose

from transport_analysis_tpu import ops
from transport_analysis_tpu.parallel.ring import windowed_correlation_ring


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual multi-device backend")
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()[:4]), ("frames",))


@pytest.fixture(scope="module")
def series():
    rng = np.random.RandomState(17)
    # 4 blocks of 8 frames, 3 particles, 3 components
    return rng.normal(size=(32, 3, 3))


def test_ring_acf_matches_serial(series, mesh):
    got = np.asarray(
        windowed_correlation_ring(series, mesh, mode="acf", sum_d=True)
    )
    want = np.asarray(ops.acf_windowed(series))
    assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_ring_einstein_matches_serial(series, mesh):
    got = np.asarray(
        windowed_correlation_ring(
            series, mesh, mode="einstein", sum_d=False
        )
    )
    want = np.asarray(
        ops.einstein_difference_windowed(series, reduce_mode="mean")
    )
    assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_ring_einstein_sum_matches_serial(series, mesh):
    got = np.asarray(
        windowed_correlation_ring(
            series, mesh, mode="einstein", sum_d=True
        )
    )
    want = np.asarray(
        ops.einstein_difference_windowed(series, reduce_mode="sum")
    )
    assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_ring_rejects_uneven_split(series, mesh):
    with pytest.raises(ValueError, match="divisible"):
        windowed_correlation_ring(series[:30], mesh)


def test_ring_8_devices(series):
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh8 = Mesh(np.array(jax.devices()[:8]), ("frames",))
    got = np.asarray(windowed_correlation_ring(series, mesh8, mode="acf"))
    want = np.asarray(ops.acf_windowed(series))
    assert_allclose(got, want, rtol=1e-12, atol=1e-12)
