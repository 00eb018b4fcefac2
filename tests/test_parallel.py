"""Sharded-vs-unsharded equivalence on the 8-virtual-device CPU mesh
(SURVEY.md §4: 'add CPU-vs-TPU and sharded-vs-unsharded equivalence
tests; emulate multi-chip on CPU')."""

import jax
import numpy as np
import pytest
from numpy.testing import assert_allclose

import transport_analysis_tpu as ta
from transport_analysis_tpu import (
    EinsteinMSD,
    VelocityAutocorr,
    ViscosityHelfand,
    parallel,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("virtual multi-device CPU backend unavailable")
    return parallel.analysis_mesh()


def test_mesh_has_virtual_devices():
    assert len(jax.devices()) == 8


def test_vacf_sharded_matches(u_random, mesh):
    base = VelocityAutocorr(u_random.atoms).run()
    with parallel.use_mesh(mesh):
        sharded = VelocityAutocorr(u_random.atoms).run()
    assert_allclose(
        sharded.results.timeseries, base.results.timeseries, rtol=1e-12
    )
    assert_allclose(
        sharded.results.vacf_by_particle,
        base.results.vacf_by_particle,
        rtol=1e-12,
    )


def test_vacf_sharded_uneven_particles(mesh):
    # 10 particles over 8 devices forces particle-axis padding
    rng = np.random.RandomState(0)
    u = ta.Universe.empty(10, n_frames=16, velocities=True)
    for ts in u.trajectory:
        u.atoms.velocities = rng.normal(size=(10, 3))
    base = VelocityAutocorr(u.atoms).run()
    with parallel.use_mesh(mesh):
        sharded = VelocityAutocorr(u.atoms).run()
    assert sharded.results.vacf_by_particle.shape == (16, 10)
    assert_allclose(
        sharded.results.timeseries, base.results.timeseries, rtol=1e-12
    )


def test_viscosity_sharded_matches(u_random, mesh):
    base = ViscosityHelfand(u_random.atoms).run()
    with parallel.use_mesh(mesh):
        sharded = ViscosityHelfand(u_random.atoms).run()
    assert_allclose(
        sharded.results.timeseries, base.results.timeseries, rtol=1e-12
    )


def test_msd_sharded_matches(u_random, mesh):
    base = EinsteinMSD(u_random.atoms).run()
    with parallel.use_mesh(mesh):
        sharded = EinsteinMSD(u_random.atoms).run()
    assert_allclose(
        sharded.results.timeseries, base.results.timeseries, rtol=1e-12
    )


def test_windowed_sharded_matches(u_random, mesh):
    base = VelocityAutocorr(u_random.atoms, fft=False).run()
    with parallel.use_mesh(mesh):
        sharded = VelocityAutocorr(u_random.atoms, fft=False).run()
    assert_allclose(
        sharded.results.timeseries, base.results.timeseries, rtol=1e-12
    )


def test_multihost_feed_single_process(mesh):
    """distribute_atom_block on a single-process mesh reproduces
    device_put + sharding (the multi-host API degenerates cleanly)."""
    from transport_analysis_tpu.parallel.multihost import (
        atom_shard_for_process,
        distribute_atom_block,
    )
    from transport_analysis_tpu import ops

    rng = np.random.RandomState(2)
    block = rng.normal(size=(16, 16, 3))
    sl = atom_shard_for_process(16, mesh)
    assert (sl.start, sl.stop) == (0, 16)
    garr = distribute_atom_block(block[:, sl], 16, mesh)
    assert garr.shape == (16, 16, 3)
    got = np.asarray(ops.acf_fft(garr))
    want = np.asarray(ops.acf_fft(block))
    assert_allclose(got, want, rtol=1e-12)


def test_multihost_feed_uneven_rejected(mesh):
    from transport_analysis_tpu.parallel.multihost import (
        atom_shard_for_process,
    )

    with pytest.raises(ValueError, match="divide evenly"):
        atom_shard_for_process(10, mesh)
