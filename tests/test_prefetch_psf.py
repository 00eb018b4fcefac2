"""Prefetch pipeline and PSF topology tests."""

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

import transport_analysis_tpu as ta
from transport_analysis_tpu.core.trajectory import MemoryReader
from transport_analysis_tpu.io.prefetch import (
    BatchPrefetcher,
    iter_frame_blocks,
    prefetch_batches,
)
from transport_analysis_tpu.io.psf import parse_psf_topology


class TestPrefetch:
    def test_blocks(self):
        blocks = list(iter_frame_blocks(np.arange(10), 4))
        assert [len(b) for b in blocks] == [4, 4, 2]

    def test_batches_match_direct(self):
        rng = np.random.RandomState(0)
        pos = rng.rand(20, 5, 3).astype(np.float32)
        vel = rng.rand(20, 5, 3).astype(np.float32)
        r = MemoryReader(pos, velocities=vel)
        frames = np.arange(0, 20, 2)
        got = list(prefetch_batches(r, frames, block_size=3))
        assert len(got) == 4
        direct = r.read_frames_batch(frames)
        stitched = np.concatenate([b["positions"] for b in got], axis=0)
        assert_allclose(stitched, direct["positions"])
        stitched_t = np.concatenate([b["times"] for b in got])
        assert_allclose(stitched_t, direct["times"])

    def test_producer_error_propagates(self):
        r = MemoryReader(np.zeros((4, 1, 3), np.float32))

        class Boom(RuntimeError):
            pass

        def bad_batch(indices):
            raise Boom("decode failed")

        r.read_frames_batch = bad_batch
        pf = BatchPrefetcher(r, [np.arange(2)])
        with pytest.raises(Boom):
            list(pf)


PSF_TEXT = """PSF EXT

         2 !NTITLE
* test
*

         4 !NATOM
         1 WAT      1        WAT      OH2      OT       -0.834000       15.9994           0
         2 WAT      1        WAT      H1       HT        0.417000        1.0080           0
         3 WAT      2        WAT      OH2      OT       -0.834000       15.9994           0
         4 PRO      1        ALA      CA       CT        0.070000       12.0110           0

         0 !NBOND
"""


class TestPSF:
    def test_parse(self, tmp_path):
        p = tmp_path / "t.psf"
        p.write_text(PSF_TEXT)
        top = parse_psf_topology(str(p))
        assert top.n_atoms == 4
        assert top.n_residues == 3
        assert top.n_segments == 2
        assert_allclose(
            top.get_atom_values("masses"),
            [15.9994, 1.008, 15.9994, 12.011],
        )
        assert_array_equal(
            top.get_atom_values("names"), ["OH2", "H1", "OH2", "CA"]
        )
        assert_array_equal(
            top.get_atom_values("segids"), ["WAT", "WAT", "WAT", "PRO"]
        )

    def test_universe_with_psf(self, tmp_path):
        p = tmp_path / "t.psf"
        p.write_text(PSF_TEXT)
        u = ta.Universe(str(p), MemoryReader(
            np.zeros((3, 4, 3), np.float32)
        ))
        assert len(u.select_atoms("name OH2")) == 2
        assert len(u.select_atoms("segid PRO")) == 1
