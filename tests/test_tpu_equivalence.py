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


def test_pallas_lag_pair_kernel_f64_grade():
    """The double-float pair profile of the windowed lag kernel on
    hardware: ~2^-45-grade sums relative to row scale (the production
    fft=False / max_lag path for float64 analyses)."""
    from transport_analysis_tpu import ops

    rng = np.random.RandomState(11)
    x = rng.normal(3.0, 5.0, size=(1024, 32, 3))
    got = np.asarray(ops.acf_windowed(x, max_lag=256))
    n = x.shape[0]
    want = np.zeros((256, 32))
    for lag in range(256):
        want[lag] = (
            np.sum(x[: n - lag] * x[lag:], axis=-1).sum(axis=0)
            / (n - lag)
        )
    assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_pallas_lag_pair_einstein_f64_grade():
    from transport_analysis_tpu import ops

    rng = np.random.RandomState(12)
    a = rng.normal(0.0, 2.0, size=(512, 16, 3)) + 50.0
    got = np.asarray(
        ops.einstein_difference_windowed(a, reduce_mode="mean")
    )
    n = a.shape[0]
    want = np.zeros((n, 16))
    for lag in range(1, n):
        diff = a[:-lag] - a[lag:]
        want[lag] = np.square(diff).sum(-1).mean(0) / 3.0
    assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_ozaki_default_path_zero_rows_finite_on_tpu():
    """Round-1 regression: the default TPU f64 path (Ozaki banded bf16
    GEMMs) must stay finite for operands with all-zero rows/columns —
    the 1e-300 normalization floor underflowed to 0.0 in the TPU's
    float32-pair f64 emulation, so every DFT (sine row 0 ≡ 0) NaN'd."""
    from transport_analysis_tpu.ops.ozaki import matmul_f64_ozaki

    rng = np.random.RandomState(7)
    a = rng.normal(size=(64, 128))
    b = rng.normal(size=(128, 96))
    a[0] = 0.0
    b[:, 3] = 0.0
    got = np.asarray(matmul_f64_ozaki(a, b))
    assert np.all(np.isfinite(got))
    want = a @ b
    assert_allclose(got, want, rtol=1e-12,
                    atol=1e-13 * np.max(np.abs(want)))


def test_fft_default_f64_path_matches_numpy():
    """Full matmul-FFT through whatever path the live backend selects
    (Ozaki on TPU) — the exact program bench.py runs."""
    from transport_analysis_tpu.ops import fft as fft_mod

    rng = np.random.RandomState(8)
    x = rng.normal(size=(2048, 5)) + 1j * rng.normal(size=(2048, 5))
    import jax.numpy as jnp

    fr, fi = fft_mod.matmul_fft(jnp.asarray(x.real), jnp.asarray(x.imag))
    ref = np.fft.fft(x, axis=0)
    scale = np.max(np.abs(ref))
    fr, fi = np.asarray(fr), np.asarray(fi)
    assert np.all(np.isfinite(fr)) and np.all(np.isfinite(fi))
    assert_allclose(fr, ref.real, atol=1e-11 * scale)
    assert_allclose(fi, ref.imag, atol=1e-11 * scale)


def test_acf_fft_f32_fast_mode_grade():
    """float32 'fast mode' must deliver true-f32 accuracy on TPU:
    requires Precision.HIGHEST on the 3M matmuls (default matmul
    precision truncates f32 operands to bf16 → ~1e-3 relative).
    Genuine f32 FFT roundoff at N=2048 is ~1e-5 of scale (measured
    2.5e-5 worst-element on hardware); the bound below fails by ~100×
    if the matmuls silently drop to bf16."""
    from transport_analysis_tpu import ops
    from transport_analysis_tpu.ops.acf import acf_fft_numpy

    rng = np.random.RandomState(9)
    x = rng.normal(size=(1024, 8, 3)).astype(np.float32)
    got = np.asarray(ops.acf_fft(x))
    want = acf_fft_numpy(x.astype(np.float64))
    scale = np.max(np.abs(want))
    assert_allclose(got, want, atol=1e-4 * scale)


def test_pallas_fft_engine_matches_numpy_f64():
    """The fused Pallas banded-FFT engine (ops/pallas_fft.py) at a
    production-like shape, DC-offset data included (the offset
    exercises the per-GEMM-column dynamic-exponent path)."""
    import jax.numpy as jnp
    from transport_analysis_tpu.ops import pallas_fft as PF

    if not PF.supported(4096, 512):
        pytest.skip("pallas_fft unsupported on this backend")
    rng = np.random.RandomState(3)
    m, s, n = 4096, 512, 2048
    x = np.zeros((m, s))
    x[:n] = rng.normal(0, 5, (n, s)) + rng.uniform(-20, 20, (1, s))
    got = np.asarray(PF.raw_autocorr_pallas(jnp.asarray(x), n))
    f = np.fft.rfft(x, axis=0)
    want = np.fft.irfft(np.abs(f) ** 2, n=m, axis=0)[:n]
    rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert rel < 1e-11


def test_pallas_fft_dispatch_in_acf():
    """ops.acf_fft routes eligible float64 shapes through the Pallas
    engine; the result must match the host oracle regardless."""
    from transport_analysis_tpu import ops
    from transport_analysis_tpu.ops.acf import acf_fft_numpy

    rng = np.random.RandomState(4)
    x = rng.normal(size=(2048, 256, 3)) + rng.uniform(
        -10, 10, (1, 256, 3))
    got = np.asarray(ops.acf_fft(x))
    want = acf_fft_numpy(x)
    denom = np.max(np.abs(want))
    err = np.abs(got - want) / denom
    # Early/mid lags carry the raw engine's ~1e-12 grade. The deepest
    # lags divide the raw correlation by (N - lag) -> 1, which amplifies
    # the raw ABSOLUTE error floor by ~N relative to the acf maximum
    # (f64 itself shows the same effect at ~1e-12); keep a dedicated
    # tight bound on the first half and a physical bound on the tail.
    assert err[: len(err) // 2].max() < 1e-11
    assert err.max() < 2e-9


@pytest.mark.parametrize("n_exp", [17, 18])
def test_deep_acf_matches_host_f64(n_exp):
    """The deep composition (ops/deep_acf.py) — one extra four-step
    level around the Pallas engine — at frame counts beyond the
    engine's N = 32768 ceiling, against the host float64 oracle.
    Covers the >=2^17-frame leg of the north star (the reference's
    serial tidynamics loop, velocityautocorr.py:210-213)."""
    import jax.numpy as jnp
    from transport_analysis_tpu.ops import deep_acf
    from transport_analysis_tpu.ops.acf import acf_fft_numpy, next_pow_2

    n, s = 1 << n_exp, 16
    m = 2 * next_pow_2(n)
    if not deep_acf.supported(m, s):
        pytest.skip("deep_acf unsupported on this backend")
    rng = np.random.RandomState(6)
    x = rng.normal(0, 3, size=(n, s)) + rng.uniform(-10, 10, (1, s))
    xp = jnp.pad(jnp.asarray(x), ((0, m - n), (0, 0)))
    got = np.asarray(deep_acf.raw_autocorr_deep(xp, n))
    want = acf_fft_numpy(x[:, :, None]) * (n - np.arange(n))[:, None]
    rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert rel < 1e-11


def test_deep_acf_dispatch_in_acf_fft():
    """ops.acf_fft at N > 32768 routes through the deep composition
    end-to-end (dispatch wiring, normalization, component sum)."""
    from transport_analysis_tpu import ops
    from transport_analysis_tpu.ops.acf import acf_fft_numpy

    n, p, d = 1 << 16, 8, 3
    rng = np.random.RandomState(10)
    x = rng.normal(size=(n, p, d))
    got = np.asarray(ops.acf_fft(x))
    want = acf_fft_numpy(x)
    denom = np.max(np.abs(want))
    err = np.abs(got - want) / denom
    # same tail-amplification structure as the engine dispatch test
    assert err[: len(err) // 2].max() < 1e-11
    assert err.max() < 2e-9


def test_pallas_fft_float32_profile():
    """raw_autocorr_pallas accepts float32 (4-band profile). Not the
    default dispatch (the XLA f32 path is faster — BENCH_NOTES), but
    the public API must stay correct at its ~1e-6 grade."""
    import jax.numpy as jnp
    from transport_analysis_tpu.ops import pallas_fft as PF

    if not PF.supported(4096, 512):
        pytest.skip("pallas_fft unsupported on this backend")
    rng = np.random.RandomState(5)
    m, s, n = 4096, 512, 2048
    x = np.zeros((m, s), np.float32)
    x[:n] = (rng.normal(0, 5, (n, s))
             + rng.uniform(-20, 20, (1, s))).astype(np.float32)
    got = np.asarray(PF.raw_autocorr_pallas(jnp.asarray(x), n))
    assert got.dtype == np.float32
    f = np.fft.rfft(x.astype(np.float64), axis=0)
    want = np.fft.irfft(np.abs(f) ** 2, n=m, axis=0)[:n]
    rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert rel < 1e-5


def test_traceable_engine_sumlast_in_outer_jit():
    """raw_autocorr_sumlast_engine (constants as jit ARGUMENTS) inside
    an outer jit must match the eager engine dispatch bit-for-bit —
    the bench pipeline depends on this entry point (the eager
    dispatch correctly refuses engines under an active trace, which
    silently regressed bench.py 1.12e12 -> 3.2e11 until the
    traceable form was wired in)."""
    import jax.numpy as jnp
    from transport_analysis_tpu.ops import acf as ACF
    from transport_analysis_tpu.ops import pallas_fft as PF

    n, p, d = 4096, 256, 3  # s = 768 >= 2*_W_TILE
    m = 2 * ACF.next_pow_2(n)
    if not PF.supported(m, p * d):
        pytest.skip("engine does not support this shape here")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 3, (n, p, d)))

    eager = np.asarray(ACF.raw_autocorr_sumlast(x))

    consts, n_bands, max_group = ACF.engine_consts_for(n)

    @jax.jit
    def step(x, consts):
        return ACF.raw_autocorr_sumlast_engine(
            x, consts, n_bands, max_group)

    got = np.asarray(step(x, consts))
    np.testing.assert_array_equal(got, eager)


def test_float32_deep_acf_grade():
    """float32 series at deep sizes route through the deep composition
    on the lighter 4-band profile instead of the slow matmul-FFT
    fallback; ~1e-6 grade vs the host float64 oracle."""
    import jax.numpy as jnp
    from transport_analysis_tpu.ops import acf as ACF
    from transport_analysis_tpu.ops import deep_acf as DA
    from transport_analysis_tpu.ops.acf import acf_fft_numpy

    n, s = 1 << 17, 16
    m = 2 * ACF.next_pow_2(n)
    assert DA.supported(m, s)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((n, s)).astype(np.float32)
    out = np.asarray(ACF.raw_autocorr(jnp.asarray(x)))
    assert out.dtype == np.float32
    ref = acf_fft_numpy(
        x.astype(np.float64)[:, :, None]
    ) * (n - np.arange(n))[:, None]
    rel = np.max(np.abs(out - ref)) / np.abs(ref).max()
    assert rel < 1e-4, rel


def test_float32_engine_dispatch_grade():
    """float32 at engine sizes now dispatches through the fused Pallas
    engine (4-band profile) — ~1e-6 grade, f32 output dtype."""
    import jax.numpy as jnp
    from transport_analysis_tpu.ops import acf as ACF
    from transport_analysis_tpu.ops import pallas_fft as PF
    from transport_analysis_tpu.ops.acf import acf_fft_numpy

    n, p, d = 4096, 256, 3
    m = 2 * ACF.next_pow_2(n)
    assert PF.supported(m, p * d)
    rng = np.random.default_rng(9)
    x = rng.standard_normal((n, p, d)).astype(np.float32)
    out = np.asarray(ACF.raw_autocorr_sumlast(jnp.asarray(x)))
    assert out.dtype == np.float32
    # acf_fft_numpy returns the normalized component-summed acf;
    # undo the (n - lag) normalization to compare raw sums
    ref = acf_fft_numpy(
        x.astype(np.float64)) * (n - np.arange(n))[:, None]
    rel = np.max(np.abs(out - ref)) / np.abs(ref).max()
    assert rel < 1e-4, rel


def test_model_vacf_deep_shape_on_hardware():
    """The MODEL layer end-to-end on hardware at a deep frame count:
    Universe -> VelocityAutocorr.run() must route through the deep
    composition (N = 2^17 > the engine ceiling) and match the host
    f64 oracle — covers the batched frame feed + dispatch + deep
    chain as the user actually runs them."""
    import transport_analysis_tpu as ta
    from transport_analysis_tpu import VelocityAutocorr
    from transport_analysis_tpu.ops.acf import acf_fft_numpy

    n, p = 1 << 17, 16
    rng = np.random.default_rng(3)
    vel = rng.standard_normal((n, p, 3))
    u = ta.Universe.empty(
        p, trajectory=True, velocities=True, n_frames=1)
    u.load_new(np.zeros((n, p, 3), np.float32),
               velocities=vel.astype(np.float32))
    v = VelocityAutocorr(u.atoms).run()
    got = np.asarray(v.results.timeseries)
    # the reader stores f32 frames; the oracle sees the same values
    ref = acf_fft_numpy(vel.astype(np.float32).astype(np.float64))
    ref = ref.mean(axis=1)
    scale = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) / scale < 1e-10


def test_model_helfand_deep_shape_on_hardware():
    """ViscosityHelfand end-to-end on hardware at a deep frame count
    (N = 2^17): batched feed + centered Kneller/Calandrini assembly +
    the one-jit deep correlation, vs a host numpy-FFT oracle of the
    same identity."""
    import transport_analysis_tpu as ta
    from transport_analysis_tpu import ViscosityHelfand
    from transport_analysis_tpu.core import transformations

    n, p = 1 << 17, 16
    rng = np.random.default_rng(13)
    vel = rng.standard_normal((n, p, 3)).astype(np.float32)
    pos = rng.standard_normal((n, p, 3)).astype(np.float32)
    masses = rng.uniform(1, 16, p)

    u = ta.Universe.empty(
        p, trajectory=True, velocities=True, n_frames=1)
    u.add_TopologyAttr("masses", masses)
    u.load_new(pos, velocities=vel)
    u.trajectory.add_transformations(
        transformations.set_dimensions([10.0, 10.0, 10.0, 90, 90, 90]))

    vis = ViscosityHelfand(u.atoms, temp_avg=300.0).run()
    got = np.asarray(vis.results.timeseries)

    # host oracle: same Kneller/Calandrini identity in numpy f64
    a = (masses[None, :, None]
         * vel.astype(np.float64) * pos.astype(np.float64))
    a = a - a.mean(axis=0, keepdims=True)
    sq = np.sum(a * a, axis=-1)
    m = 2 * n
    f = np.fft.rfft(a, n=m, axis=0)
    corr = np.fft.irfft(
        (f * np.conj(f)).real.sum(axis=-1), n=m, axis=0)[:n]
    css = np.cumsum(sq, axis=0)
    lags = np.arange(n)
    s_head = css[n - 1 - lags]
    css_prev = np.concatenate(
        [np.zeros((1, p)), css[:-1]], axis=0)
    s_tail = css[-1][None, :] - css_prev
    raw = (s_head + s_tail - 2.0 * corr) / (n - lags)[:, None] / 3.0
    raw[0] = 0.0
    from transport_analysis_tpu.utils.units import constants

    kb = constants["Boltzmann_constant"]
    vol = 10.0 ** 3
    ref = raw.mean(axis=1) / (2.0 * kb * vol * 300.0)
    scale = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) / scale < 1e-9


def test_model_vacf_float32_fast_mode_on_hardware():
    """VelocityAutocorr(dtype=float32) through the model layer at an
    engine shape: the f32 fast mode must reach the Pallas engine's
    4-band profile end to end (not the matmul fallback) and deliver
    f32-appropriate accuracy."""
    import transport_analysis_tpu as ta
    from transport_analysis_tpu import VelocityAutocorr
    from transport_analysis_tpu.ops.acf import acf_fft_numpy

    n, p = 4096, 256
    rng = np.random.default_rng(17)
    vel = rng.standard_normal((n, p, 3)).astype(np.float32)
    u = ta.Universe.empty(
        p, trajectory=True, velocities=True, n_frames=1)
    u.load_new(np.zeros((n, p, 3), np.float32), velocities=vel)
    v = VelocityAutocorr(u.atoms, dtype=np.float32).run()
    got = np.asarray(v.results.timeseries)
    ref = acf_fft_numpy(vel.astype(np.float64)).mean(axis=1)
    scale = np.abs(ref).max()
    assert np.max(np.abs(got - ref)) / scale < 1e-4


def test_pallas_kneller_assembly_on_hardware():
    """The fused window-sum kernels (ops/pallas_kneller.py) against a
    host float64 oracle at a lane-padded shape (P=130 > 128)."""
    from transport_analysis_tpu.ops import pallas_kneller as pk

    rng = np.random.RandomState(9)
    n, p, d = 2048, 130, 3
    a = rng.normal(0, 1.5, (n, p, d))
    a -= a.mean(axis=0, keepdims=True)
    sq = np.sum(a * a, axis=-1)
    flat = a.reshape(n, p * d)
    f = np.fft.rfft(flat, n=4 * n, axis=0)
    corr = np.fft.irfft(f * np.conj(f), n=4 * n, axis=0)[:n]
    corr = corr.reshape(n, p, d).sum(axis=-1)

    import jax.numpy as jnp

    got = np.asarray(pk.einstein_assembly(
        jnp.asarray(sq), jnp.asarray(corr), "mean", d))
    css = np.cumsum(sq, axis=0)
    total = css[-1]
    prev = np.concatenate([np.zeros((1, p)), css[:-1]])
    lags = np.arange(n)
    raw = css[n - 1 - lags] + total[None] - prev - 2.0 * corr
    want = raw / (n - lags)[:, None] / d
    want[0] = 0.0
    rel = np.max(np.abs(got - want)) / np.abs(want).max()
    assert rel < 1e-11


def test_from_f32_entries_deep_shape_on_hardware():
    """The f64-GRADE f32-source entries at a deep shape: the results
    must match the f64 route at pair grade (~2^-48), NOT the 4-band
    f32 fast mode's ~1e-5 — i.e. the f32 source rode the full 7-band
    profile with synthesized zero tails."""
    import jax.numpy as jnp

    from transport_analysis_tpu import ops
    from transport_analysis_tpu.ops.acf import acf_fft_numpy

    n, p = 131072, 8
    rng = np.random.default_rng(23)
    x32 = (5.0 * rng.standard_normal((n, p, 3))).astype(np.float32)

    got = np.asarray(ops.acf_fft_from_f32(jnp.asarray(x32)))
    ref = acf_fft_numpy(x32.astype(np.float64))
    scale = np.abs(ref).max()
    err = np.abs(got - ref) / scale
    assert got.dtype == np.float64
    # head half carries the contract (tail lags amplify /(N-lag))
    assert err[: n // 2].max() < 1e-11

    a32 = (x32 + 10.0).astype(np.float32)
    got_h = np.asarray(
        ops.einstein_difference_fft_from_f32(jnp.asarray(a32), "mean"))
    want_h = np.asarray(ops.einstein_difference_fft(
        jnp.asarray(a32, jnp.float64), "mean"))
    scale = np.abs(want_h).max()
    assert np.abs(got_h - want_h).max() / scale < 1e-11
