"""Atom-chunked streaming + checkpoint/resume + timing observability."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import transport_analysis_tpu as ta
from transport_analysis_tpu import VelocityAutocorr, ops
from transport_analysis_tpu.parallel.streaming import chunked_per_particle


@pytest.fixture(scope="module")
def series():
    rng = np.random.RandomState(4)
    return rng.normal(size=(24, 13, 3))


def test_chunked_matches_full(series):
    full = np.asarray(ops.acf_fft(series))
    ts, bp = chunked_per_particle(ops.acf_fft, series, chunk_particles=4)
    assert_allclose(bp, full, rtol=1e-12)
    assert_allclose(ts, full.mean(axis=1), rtol=1e-12)


def test_checkpoint_resume(series, tmp_path):
    ckpt = str(tmp_path / "acc.npz")
    full = np.asarray(ops.acf_fft(series))

    calls = []

    def counting_kernel(x):
        calls.append(x.shape[1])
        return ops.acf_fft(x)

    # run the first 2 chunks then "crash"
    class Boom(Exception):
        pass

    def crashing_kernel(x):
        if len(calls) == 2:
            raise Boom()
        return counting_kernel(x)

    with pytest.raises(Boom):
        chunked_per_particle(
            crashing_kernel, series, 4, checkpoint=ckpt
        )
    assert len(calls) == 2

    # resume: only the remaining chunks run
    ts, bp = chunked_per_particle(
        counting_kernel, series, 4, checkpoint=ckpt
    )
    assert len(calls) == 4  # 13 particles / 4 = 4 chunks total
    assert_allclose(bp, full, rtol=1e-12)
    assert_allclose(ts, full.mean(axis=1), rtol=1e-12)


def test_vacf_atom_chunk_matches(u_random):
    base = VelocityAutocorr(u_random.atoms).run()
    chunked = VelocityAutocorr(u_random.atoms, atom_chunk=3).run()
    assert_allclose(
        chunked.results.timeseries, base.results.timeseries, rtol=1e-12
    )
    assert_allclose(
        chunked.results.vacf_by_particle,
        base.results.vacf_by_particle,
        rtol=1e-12,
    )


def test_timing_counters(u_random):
    v = VelocityAutocorr(u_random.atoms).run()
    t = v.timing.as_dict()
    assert "io" in t and "compute" in t and "total" in t
    assert t["frames_per_s"] > 0
    assert t["atom_frame_lags_per_s"] > 0
