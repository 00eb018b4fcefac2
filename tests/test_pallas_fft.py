"""Tests for the fused Pallas banded-FFT autocorrelation engine.

The engine itself (ops/pallas_fft.py) is TPU-only — on CPU the suite
exercises its host/trace-time components (exact pow2 ceiling, banded
constants, shape gating); the full-kernel equivalence runs in
tests/test_tpu_equivalence.py on hardware (see CONTRIBUTING's on-TPU
gate) plus bench.py's accuracy cross-check.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transport_analysis_tpu.ops import pallas_fft as PF


class TestPow2Ceil:
    def test_matches_numpy_over_wide_range(self):
        # includes the magnitudes where the backend's f32 exp2 is NOT
        # exact (exp2(31) != 2^31 — the bug this function exists for)
        vals = np.array(
            [1e-20, 0.3, 1.0, 1.5, 2.0, 3.9, 4.0, 2.0**30 - 1.0,
             2.0**30, 2.0**30 + 100.0, 1.4865e9, 2.2e9, 1e20],
            dtype=np.float32,
        )
        got = np.asarray(PF._pow2_ceil_f32(jnp.asarray(vals)))
        ref = np.exp2(np.ceil(np.log2(vals.astype(np.float64))))
        assert np.array_equal(got.astype(np.float64), ref)

    def test_exact_powers_of_two_are_fixed_points(self):
        vals = np.exp2(np.arange(-20, 31)).astype(np.float32)
        got = np.asarray(PF._pow2_ceil_f32(jnp.asarray(vals)))
        assert np.array_equal(got, vals)

    def test_zero_and_negative_map_to_one(self):
        got = np.asarray(
            PF._pow2_ceil_f32(jnp.asarray([0.0, -3.0], jnp.float32)))
        assert np.array_equal(got, [1.0, 1.0])

    def test_results_are_exact_powers_of_two(self):
        rng = np.random.default_rng(0)
        vals = jnp.asarray(
            np.exp(rng.uniform(-40, 60, 256)), jnp.float32)
        got = np.asarray(PF._pow2_ceil_f32(vals)).astype(np.float64)
        m, e = np.frexp(got)
        assert np.all(m == 0.5)


class TestConstants:
    @pytest.mark.parametrize("n2", [32, 128])
    def test_banded_lhs_reconstructs_twiddled_dft(self, n2):
        """De-banding the int8 stacks must reproduce the float64
        twiddle-folded DFT matrices to the 49-bit band budget."""
        j1_out = 16
        c = PF._device_constants(n2, j1_out)
        l1_re = np.asarray(c["l1_re"], np.float64)  # (n2, 128, 2*128*7)
        n1 = PF._N1
        nb = PF._N_BANDS

        # stack layout: reversed bands p=6..0, slab p = [C_p | -S_p]
        j2 = min(3, n2 - 1)
        stack = l1_re[j2].reshape(n1, nb, 2 * n1)
        cp = stack[:, ::-1, :n1]      # bands ascending
        sp = -stack[:, ::-1, n1:]
        grids = np.exp2(-(7.0 * np.arange(nb) + 6.0))
        cmat = np.einsum("kqj,q->kj", cp, grids)
        smat = np.einsum("kqj,q->kj", sp, grids)

        k1 = np.arange(n1)
        tw = np.exp(-2j * np.pi * k1 * j2 / (n1 * n2))
        ref = tw[:, None] * np.exp(
            -2j * np.pi * np.outer(k1, k1) / n1)
        assert np.max(np.abs(cmat - ref.real)) < 2.0 ** -48
        assert np.max(np.abs(smat - ref.imag)) < 2.0 ** -48

    def test_constants_cached(self):
        a = PF._device_constants(32, 16)
        b = PF._device_constants(32, 16)
        assert a is b


class TestSupported:
    def test_shape_gate(self):
        # backend-independent shape logic, incl. the n2 = 512 ceiling
        for m in (4096, 8192, 16384, 32768, 65536):
            assert PF.shape_supported(m, 1536), m
        assert not PF.shape_supported(16384 + 128, 1536)
        assert not PF.shape_supported(2048, 1536)
        assert not PF.shape_supported(131072, 1536)
        assert not PF.shape_supported(16384, 64)

    def test_backend_gate(self):
        # the normal suite forces the CPU backend (conftest), where the
        # engine must never dispatch; GPU backends are likewise gated
        # out (these are TPU Mosaic kernels). The TPU-positive case is
        # covered by the hardware equivalence suite.
        if jax.default_backend() in ("cpu", "gpu", "cuda", "rocm"):
            assert not PF.supported(16384, 1536)
        else:
            assert PF.supported(16384, 1536)


@pytest.mark.skipif(
    jax.default_backend() in ("cpu", "gpu", "cuda", "rocm"),
    reason="full-kernel equivalence needs the TPU (interpret mode "
    "takes minutes; covered by test_tpu_equivalence.py + bench)",
)
class TestEndToEnd:
    def test_raw_autocorr_pallas_vs_numpy(self):
        rng = np.random.default_rng(0)
        M, S, N = 4096, 512, 2048
        x = np.zeros((M, S))
        x[:N] = rng.normal(0, 5, (N, S)) + rng.uniform(-20, 20, (1, S))
        got = np.asarray(PF.raw_autocorr_pallas(jnp.asarray(x), N))
        f = np.fft.rfft(x, axis=0)
        ref = np.fft.irfft(np.abs(f) ** 2, n=M, axis=0)[:N]
        rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert rel < 1e-11
