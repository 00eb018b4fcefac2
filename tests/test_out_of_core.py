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


def test_helfand_out_of_core_matches_in_memory(trr_universe, tmp_path):
    from transport_analysis_tpu import ViscosityHelfand
    from transport_analysis_tpu.parallel.out_of_core import (
        helfand_out_of_core,
    )

    trr_universe.add_TopologyAttr(
        "masses", np.linspace(1.0, 16.0, 10)
    )
    ts, visc = helfand_out_of_core(
        trr_universe, str(tmp_path / "spool_h"), atom_chunk=3,
        linear_fit_window=(2, 10),
    )
    ref = ViscosityHelfand(
        trr_universe.atoms, linear_fit_window=(2, 10)
    ).run()
    # spools quantize the m·v·x accumulator to float32 (the in-memory
    # engine keeps float64 throughout) — 1e-5 relative is the f32 floor
    assert_allclose(ts, ref.results.timeseries, rtol=2e-5, atol=1e-12)
    # the fit differences small numbers — f32 spool noise amplifies
    assert visc == pytest.approx(ref.results.viscosity, rel=1e-3)


def test_helfand_out_of_core_strided_capped(trr_universe, tmp_path):
    from transport_analysis_tpu import ViscosityHelfand
    from transport_analysis_tpu.parallel.out_of_core import (
        helfand_out_of_core,
    )

    trr_universe.add_TopologyAttr("masses", np.full(10, 4.0))
    ts, visc = helfand_out_of_core(
        trr_universe, str(tmp_path / "spool_h2"), atom_chunk=4,
        start=2, stop=20, step=2, max_lag=6,
    )
    ref = ViscosityHelfand(trr_universe.atoms, max_lag=6).run(
        start=2, stop=20, step=2
    )
    assert ts.shape == (6,)
    assert visc is None
    assert_allclose(ts, ref.results.timeseries, rtol=2e-5, atol=1e-12)


def test_msd_out_of_core_matches_in_memory(trr_universe, tmp_path):
    from transport_analysis_tpu import EinsteinMSD
    from transport_analysis_tpu.parallel.out_of_core import (
        msd_out_of_core,
    )

    ooc = msd_out_of_core(
        trr_universe, str(tmp_path / "spool_m"), atom_chunk=3
    )
    ref = EinsteinMSD(trr_universe, select="all").run()
    assert_allclose(ooc, ref.results.timeseries, rtol=1e-5)


def test_helfand_checkpoint_resume(trr_universe, tmp_path):
    from transport_analysis_tpu.parallel.out_of_core import (
        helfand_out_of_core,
    )

    trr_universe.add_TopologyAttr("masses", np.full(10, 2.0))
    ckpt = str(tmp_path / "h.npz")
    ts1, _ = helfand_out_of_core(
        trr_universe, str(tmp_path / "spool_h3"), atom_chunk=3,
        checkpoint=ckpt,
    )
    ts2, _ = helfand_out_of_core(
        trr_universe, str(tmp_path / "spool_h3"), atom_chunk=3,
        checkpoint=ckpt,
    )
    assert_allclose(ts2, ts1, rtol=1e-12)


def test_vacf_out_of_core_sharded_matches_serial(trr_universe, tmp_path):
    """Spooled atoms × frame-sharded FFT == plain out-of-core VACF:
    the north-star composition on the 8-virtual-device mesh."""
    import jax
    from jax.sharding import Mesh

    from transport_analysis_tpu.parallel.out_of_core import (
        vacf_out_of_core_sharded,
    )

    mesh = Mesh(np.array(jax.devices()[:8]), ("frames",))
    got = vacf_out_of_core_sharded(
        trr_universe, str(tmp_path / "sp_sh"), mesh, atom_chunk=4
    )
    ref = vacf_out_of_core(
        trr_universe, str(tmp_path / "sp_plain"), atom_chunk=4
    )
    assert_allclose(got, ref, rtol=1e-10, atol=1e-12)


def test_helfand_out_of_core_sharded_matches_serial(
    trr_universe, tmp_path
):
    """Spooled m·v·x accumulator × frame-sharded Einstein FFT == plain
    out-of-core Helfand: the second half of the composed north star."""
    import jax
    from jax.sharding import Mesh

    from transport_analysis_tpu.parallel.out_of_core import (
        helfand_out_of_core, helfand_out_of_core_sharded,
    )

    try:
        trr_universe.atoms.masses
    except Exception:
        trr_universe.add_TopologyAttr("masses", np.full(10, 2.0))
    mesh = Mesh(np.array(jax.devices()[:8]), ("frames",))
    got_ts, got_visc = helfand_out_of_core_sharded(
        trr_universe, str(tmp_path / "hsp_sh"), mesh, atom_chunk=4,
        linear_fit_window=(2, 10),
    )
    ref_ts, ref_visc = helfand_out_of_core(
        trr_universe, str(tmp_path / "hsp_plain"), atom_chunk=4,
        linear_fit_window=(2, 10),
    )
    assert_allclose(got_ts, ref_ts, rtol=1e-9, atol=1e-12)
    assert got_visc == pytest.approx(ref_visc, rel=1e-8)


class TestAutoAtomChunk:
    def test_pad_filling_grid_deep(self):
        from transport_analysis_tpu.ops.acf import auto_atom_chunk

        # deep-path rungs under the HARDWARE-ANCHORED peak model
        # (46·M·w + (24+8)·N·chunk, see auto_atom_chunk docstring):
        # the theoretical two-spectra model (32·M·w) admitted
        # chunk=107 at N=2^20, whose one-jit chain compiles to an
        # 18.0 GB program (OOM on the 16 GB v5e — XLA carries extra
        # while-loop copies of the unpack outputs). The recalibrated
        # model lands exactly on the rungs with recorded hardware
        # runs: 85/170/341/682 (BENCH_NOTES round-5 ladder) — the
        # true-lane w (_deep_w) still ends the 128-pad grid for
        # small-P calls and odd d·chunk (w follows d·chunk/2, not
        # 128k), it just no longer inflates the admitted chunk.
        assert auto_atom_chunk(1048576, d=3) == 85
        assert auto_atom_chunk(524288, d=3) == 170
        assert auto_atom_chunk(131072, d=3) == 682
        assert auto_atom_chunk(262144, d=3) == 341
        # one rung past the north star (VERDICT item 7 prep)
        assert auto_atom_chunk(2097152, d=3) == 42

    def test_engine_path_unchanged(self):
        from transport_analysis_tpu.ops.acf import auto_atom_chunk

        # 2048 at N=32768 modeled 11.3 GB under the old 48 B/elem
        # engine coefficient but OOMed on hardware; 64 B/elem picks
        # the hardware-validated 1024 (66 s for the 100k-atom slice)
        assert auto_atom_chunk(32768, d=3) == 1024
        assert auto_atom_chunk(8192, d=3) == 4096

    def test_budget_scales(self):
        from transport_analysis_tpu.ops.acf import auto_atom_chunk

        big = auto_atom_chunk(1048576, d=3, hbm_budget_gb=90.0)
        # v5p-class HBM fits ~5.9x the v5e chunk under the anchored
        # 46-coefficient (504 at 90 GB vs 85 at 15.25 GB)
        assert big >= 5 * 85

    def test_budget_resolution_order(self, monkeypatch):
        """Pin the budget source priority: explicit argument > env var
        > live-device memory_stats > v5e constants (VERDICT r3 #5)."""
        from transport_analysis_tpu.ops import acf

        monkeypatch.delenv(
            "TRANSPORT_ANALYSIS_TPU_HBM_BUDGET_GB", raising=False
        )
        # default: device returns None on CPU -> v5e deep constant
        assert acf.auto_atom_chunk(1048576, d=3) == 85

        # simulated 95 GB chip: the device-derived budget grows the
        # chunk as modeled (~6x the v5e budget -> ~6x the chunk)
        monkeypatch.setattr(
            acf, "_device_hbm_budget_gb", lambda deep: 90.0
        )
        dev_chunk = acf.auto_atom_chunk(1048576, d=3)
        assert dev_chunk == acf.auto_atom_chunk(
            1048576, d=3, hbm_budget_gb=90.0
        )
        assert dev_chunk >= 5 * 85

        # env var overrides the device-derived budget
        monkeypatch.setenv(
            "TRANSPORT_ANALYSIS_TPU_HBM_BUDGET_GB", "15.25"
        )
        assert acf.auto_atom_chunk(1048576, d=3) == 85

        # explicit argument overrides everything
        assert (
            acf.auto_atom_chunk(1048576, d=3, hbm_budget_gb=90.0)
            == dev_chunk
        )

    def test_device_budget_scales_with_reported_capacity(
        self, monkeypatch
    ):
        from transport_analysis_tpu.ops import acf

        class _FakeDev:
            def memory_stats(self):
                return {"bytes_limit": int(95e9)}

        monkeypatch.setattr(
            acf.jax, "default_backend", lambda: "tpu"
        )
        monkeypatch.setattr(
            acf.jax, "local_devices", lambda: [_FakeDev()]
        )
        deep = acf._device_hbm_budget_gb(True)
        eng = acf._device_hbm_budget_gb(False)
        # v5e headroom fractions applied to the reported 95 GB
        assert deep == pytest.approx(95.0 * 15.25 / 15.75, rel=1e-12)
        assert eng == pytest.approx(95.0 * 12.0 / 15.75, rel=1e-12)

    def test_out_of_core_accepts_auto(self, tmp_path):
        # default atom_chunk="auto" resolves and matches explicit int
        from transport_analysis_tpu.parallel.out_of_core import (
            vacf_out_of_core,
        )

        rng = np.random.default_rng(5)
        na, nf = 6, 32
        path = str(tmp_path / "t.trr")
        with TRRWriter(path, n_atoms=na) as w:
            for i in range(nf):
                w.write(
                    positions=rng.normal(0, 5, (na, 3)).astype(np.float32),
                    velocities=rng.normal(0, 2, (na, 3)).astype(np.float32),
                    dimensions=[20.0, 20.0, 20.0, 90.0, 90.0, 90.0],
                    time=0.002 * i,
                    step=i,
                )
        u = ta.Universe(Topology(na), path)
        out_auto = vacf_out_of_core(u, str(tmp_path / "s1"))
        out_int = vacf_out_of_core(
            u, str(tmp_path / "s2"), atom_chunk=4
        )
        assert_allclose(out_auto, out_int, rtol=1e-12)
