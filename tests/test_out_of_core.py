"""Out-of-core spool pipeline: file → per-chunk spools → device →
timeseries, equal to the in-memory analysis."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import transport_analysis_tpu as ta
from transport_analysis_tpu import VelocityAutocorr
from transport_analysis_tpu.core.topology import Topology
from transport_analysis_tpu.io.trr import TRRReader, TRRWriter
from transport_analysis_tpu.parallel.out_of_core import (
    build_spools,
    vacf_out_of_core,
)


@pytest.fixture()
def trr_universe(tmp_path):
    rng = np.random.RandomState(9)
    n_frames, n_atoms = 24, 10
    vel = rng.normal(0, 8, (n_frames, n_atoms, 3)).astype(np.float32)
    pos = rng.uniform(0, 20, (n_frames, n_atoms, 3)).astype(np.float32)
    path = tmp_path / "t.trr"
    with TRRWriter(path, n_atoms) as w:
        for i in range(n_frames):
            w.write(positions=pos[i], velocities=vel[i],
                    dimensions=[20, 20, 20, 90, 90, 90], time=float(i))
    return ta.Universe(Topology(n_atoms), TRRReader(path))


def test_matches_in_memory(trr_universe, tmp_path):
    ooc = vacf_out_of_core(
        trr_universe, str(tmp_path / "spool"), atom_chunk=3
    )
    ref = VelocityAutocorr(trr_universe.atoms).run()
    assert_allclose(ooc, ref.results.timeseries, rtol=1e-6)


def test_strided_and_capped(trr_universe, tmp_path):
    ooc = vacf_out_of_core(
        trr_universe, str(tmp_path / "spool2"), atom_chunk=4,
        start=2, stop=20, step=2, max_lag=5,
    )
    ref = VelocityAutocorr(trr_universe.atoms, max_lag=5).run(
        start=2, stop=20, step=2
    )
    assert ooc.shape == (5,)
    assert_allclose(ooc, ref.results.timeseries, rtol=1e-6)


def test_spool_reuse(trr_universe, tmp_path):
    spool = str(tmp_path / "spool3")
    frames = np.arange(24)
    p1 = build_spools(
        trr_universe.trajectory, frames,
        trr_universe.atoms.indices, [0, 1, 2], spool, 4,
    )
    mtimes = [__import__("os").path.getmtime(p) for p in p1]
    p2 = build_spools(
        trr_universe.trajectory, frames,
        trr_universe.atoms.indices, [0, 1, 2], spool, 4,
    )
    assert p1 == p2
    mtimes2 = [__import__("os").path.getmtime(p) for p in p2]
    assert mtimes == mtimes2  # complete spools were not rebuilt


def test_checkpoint_resume(trr_universe, tmp_path):
    ckpt = str(tmp_path / "ooc.npz")
    ref = VelocityAutocorr(trr_universe.atoms).run()
    # seed a fake partial checkpoint by running fully once
    ooc = vacf_out_of_core(
        trr_universe, str(tmp_path / "spool4"), atom_chunk=3,
        checkpoint=ckpt,
    )
    assert_allclose(ooc, ref.results.timeseries, rtol=1e-6)
    # resume path with a completed checkpoint returns identical result
    ooc2 = vacf_out_of_core(
        trr_universe, str(tmp_path / "spool4"), atom_chunk=3,
        checkpoint=ckpt,
    )
    assert_allclose(ooc2, ooc, rtol=1e-12)
