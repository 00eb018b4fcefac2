"""Deep-composition autocorrelation (ops/deep_acf.py) on CPU.

The deep path wraps ONE extra four-step FFT level around the fused
Pallas banded engine to reach M > 65536 (reference analogue: the
tidynamics FFT path, velocityautocorr.py:210-213, which the engine
replaces at production sizes). The Pallas engine itself cannot run on
CPU at these sizes (interpret mode is orders of magnitude too slow),
so these tests validate the COMPOSITION algebra — twiddle level, outer
banded DFT, Hermitian two-for-one unpack, inverse-by-conjugation —
by substituting the inner engine stage with an exact host-FFT
stand-in honoring the same (hi, lo) double-float pair contract.
TPU end-to-end equivalence lives in tests/test_tpu_equivalence.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transport_analysis_tpu.ops import acf, deep_acf
from transport_analysis_tpu.ops import pallas_fft as PF


def exact_fft_banded_pair(pair, inverse=False, wt=None, l2_rows=None):
    """Host-exact stand-in for pallas_fft.fft_banded_pair: complex FFT
    along axis 0 of (M, B) double-float pairs, natural frequency
    order, same pair-packing contract. ``l2_rows`` is accepted but
    ignored — the DIF inverse leg's defensive row slice
    (deep_acf._deep_fft_inv_dif) trims the same rows after."""
    re = np.asarray(pair[0], np.float64) + np.asarray(pair[1], np.float64)
    im = np.asarray(pair[2], np.float64) + np.asarray(pair[3], np.float64)
    z = re + 1j * im
    if inverse:
        f = np.fft.ifft(z, axis=0)
    else:
        f = np.fft.fft(z, axis=0)
    out = []
    for comp in (f.real, f.imag):
        hi = comp.astype(np.float32)
        lo = (comp - hi.astype(np.float64)).astype(np.float32)
        out.extend([jnp.asarray(hi), jnp.asarray(lo)])
    return out[0], out[1], out[2], out[3]


class TestSupportGates:
    def test_not_supported_on_cpu(self):
        # backend gate: the deep path needs the TPU Pallas engine
        assert deep_acf.supported(1 << 18, 16) is False

    def test_split_m_table(self):
        # inner must be engine-eligible, outer in [2, 256];
        # BALANCED-first (16384 = 128*128) — the banded levels' MXU
        # flops scale with contraction depth, so the smallest
        # admissible inner wins (hardware: N=2^20 vacf leg
        # 0.90 -> 0.77 s vs the historical large-inner order)
        assert deep_acf._split_m(1 << 17) == (16384, 8)
        assert deep_acf._split_m(1 << 18) == (16384, 16)
        assert deep_acf._split_m(1 << 21) == (16384, 128)
        # past inner*256 the larger inners take over
        assert deep_acf._split_m(1 << 23) == (32768, 256)
        assert deep_acf._split_m(1 << 24) == (65536, 256)
        # beyond 2^24: no admissible cofactor
        assert deep_acf._split_m(1 << 25) == (None, None)
        # non-power-of-two M is rejected upstream by supported()
        # (dispatch only ever produces M = 2 * next_pow_2(N))
        assert not deep_acf.supported(3 * 65536, 600)

    def test_outer_tables_are_exact_dft(self):
        t = deep_acf._outer_tables(16384, 4)
        w = np.exp(-2j * np.pi * np.outer(np.arange(4), np.arange(4)) / 4)
        np.testing.assert_allclose(np.asarray(t["dc"]), w.real, atol=1e-15)
        np.testing.assert_allclose(np.asarray(t["ds"]), w.imag, atol=1e-15)


@pytest.fixture
def fake_engine(monkeypatch):
    monkeypatch.setattr(deep_acf._pf, "fft_banded_pair",
                        exact_fft_banded_pair)


class TestCompositionAlgebra:
    """raw_autocorr_deep vs the host float64 oracle, engine stage
    replaced by the exact host FFT (fake_engine)."""

    @pytest.mark.parametrize("n_series", [3, 16])
    def test_matches_host_oracle(self, fake_engine, n_series):
        rng = np.random.default_rng(7)
        n = 1 << 15  # M = 65536 -> inner 16384 x outer 4 (balanced)
        m = 2 * acf.next_pow_2(n)
        assert deep_acf._split_m(m) == (16384, 4)
        x = rng.standard_normal((n, n_series))
        xp = jnp.pad(jnp.asarray(x), ((0, m - n), (0, 0)))
        out = np.asarray(deep_acf.raw_autocorr_deep(xp, n))
        ref = acf.acf_fft_numpy(x[:, :, None]) * (n - np.arange(n))[:, None]
        scale = np.abs(ref).max()
        assert np.max(np.abs(out - ref)) / scale < 1e-11

    def test_non_pow2_series_length(self, fake_engine):
        # non-pow2 N: n_out < M/2, exercising the row-trimmed
        # (ceil(n_out/inner) rows) 1/M-prescaled inverse outer DFT
        rng = np.random.default_rng(23)
        n, s = 40000, 5
        m = 2 * acf.next_pow_2(n)  # 131072 -> inner 16384 x outer 8
        inner, outer = deep_acf._split_m(m)
        assert n > inner  # trim keeps ceil(n/inner) = 3 outer rows
        x = rng.standard_normal((n, s))
        xp = jnp.pad(jnp.asarray(x), ((0, m - n), (0, 0)))
        out = np.asarray(deep_acf.raw_autocorr_deep(xp, n))
        assert out.shape == (n, s)
        ref = acf.acf_fft_numpy(x[:, :, None]) * (n - np.arange(n))[:, None]
        assert np.max(np.abs(out - ref)) / np.abs(ref).max() < 1e-11

    @pytest.mark.parametrize("slab", [0, 1024])
    def test_unpadded_operand_and_fused_component_sum(
            self, fake_engine, monkeypatch, slab):
        # production dispatch form: UNPADDED (N, S) operand with an
        # explicit transform length m (rows pad inside the prepare
        # stage — slab=1024 forces the lax.map slab path with its
        # all-padding zero slabs) and the d-component sum fused into
        # the epilogue — must match the pre-padded separate-sum form
        rng = np.random.default_rng(31)
        n, p, d = 1 << 15, 4, 3
        m = 2 * acf.next_pow_2(n)
        x = rng.standard_normal((n, p * d))
        xp = jnp.pad(jnp.asarray(x), ((0, m - n), (0, 0)))
        want = np.asarray(deep_acf.raw_autocorr_deep(xp, n))
        want = want.reshape(n, p, d).sum(axis=-1)
        if slab:
            monkeypatch.setattr(deep_acf, "_UNPACK_SLAB", slab)
        got = np.asarray(deep_acf.raw_autocorr_deep(
            jnp.asarray(x), n, m=m, sum_d=d))
        assert got.shape == (n, p)
        np.testing.assert_allclose(
            got, want, rtol=0, atol=1e-13 * np.abs(want).max())

    def test_float32_input(self, fake_engine):
        # f32 series ride the same chain (zero-tail pairs, lighter
        # band profile on TPU); result comes back in float32
        rng = np.random.default_rng(41)
        n, s = 1 << 15, 4
        m = 2 * acf.next_pow_2(n)
        x = rng.standard_normal((n, s)).astype(np.float32)
        out = np.asarray(deep_acf.raw_autocorr_deep(
            jnp.asarray(x), n, m=m))
        assert out.dtype == np.float32
        ref = acf.acf_fft_numpy(
            x.astype(np.float64)[:, :, None]
        ) * (n - np.arange(n))[:, None]
        assert np.max(np.abs(out - ref)) / np.abs(ref).max() < 1e-5

    def test_outer_4(self, fake_engine):
        # exercise a >2 outer factor and the k-major row interleave
        rng = np.random.default_rng(11)
        n, s = 1 << 16, 4  # M = 131072 -> inner 65536? no: CPU stand-in
        m = 2 * acf.next_pow_2(n)
        inner, outer = deep_acf._split_m(m)
        assert outer >= 2
        x = rng.standard_normal((n, s))
        xp = jnp.pad(jnp.asarray(x), ((0, m - n), (0, 0)))
        out = np.asarray(deep_acf.raw_autocorr_deep(xp, n))
        ref = acf.acf_fft_numpy(x[:, :, None]) * (n - np.arange(n))[:, None]
        assert np.max(np.abs(out - ref)) / np.abs(ref).max() < 1e-11


class TestUnpackPowerSlabs:
    """The row-slab fused unpack (the M >= 2^18 HBM fix) is
    bit-identical to the straight-line formulation."""

    @pytest.mark.parametrize("m,slab", [(1024, 16), (4096, 64)])
    def test_slab_matches_straightline(self, monkeypatch, m, slab):
        rng = np.random.default_rng(5)
        w = 8
        inner, outer = m // 4, 4
        # kernel-layout operands: (inner, w*outer), lanes (wc, k2)
        zr = rng.standard_normal((inner, w * outer))
        zi = rng.standard_normal((inner, w * outer))

        def pairs(z):
            from transport_analysis_tpu.ops import pallas_fft as PF

            return PF._split_pair(jnp.asarray(z))

        zrh, zrl = pairs(zr)
        zih, zil = pairs(zi)
        # straight-line reference (slab gate off: big _UNPACK_SLAB)
        want = deep_acf._unpack_to_pair_dif(
            zrh, zrl, zih, zil, inner, outer, w)
        want = tuple(np.asarray(a) for a in want)
        monkeypatch.setattr(deep_acf, "_UNPACK_SLAB", slab)
        # pad one zero wc-group (outer extra lanes) so the jit cache
        # (keyed on shapes/statics) can't reuse the unslabbed trace;
        # wc-groups are independent in the unpack
        pad = np.zeros((inner, outer))
        zrh_p, zrl_p = pairs(np.concatenate([zr, pad], axis=1))
        zih_p, zil_p = pairs(np.concatenate([zi, pad], axis=1))
        got = deep_acf._unpack_to_pair_dif(
            zrh_p, zrl_p, zih_p, zil_p, inner, outer, w + 1)
        # drop the pad wc-group
        got = tuple(
            np.asarray(a).reshape(inner, w + 1, outer)[:, :w, :]
            for a in got
        )
        for a, b in zip(want, got):
            np.testing.assert_array_equal(
                np.asarray(a).reshape(inner, w, outer), b)


class TestDispatchWiring:
    """ops.acf dispatch consults deep_acf for engine-ineligible M."""

    def test_dispatch_calls_deep(self, monkeypatch):
        calls = {}

        def spy_supported(m, s):
            calls["checked"] = (m, s)
            return True

        def spy_deep(x, n_out, m=None, sum_d=0):
            calls["ran"] = (x.shape, n_out, m)
            return jnp.zeros((n_out, x.shape[1]), x.dtype)

        monkeypatch.setattr(acf, "_has_native_fft", lambda: False)
        monkeypatch.setattr(deep_acf, "supported", spy_supported)
        monkeypatch.setattr(deep_acf, "raw_autocorr_deep", spy_deep)
        monkeypatch.setattr(PF, "supported", lambda m, s: False)

        x = jnp.zeros((1 << 16, 4), jnp.float64)
        out = acf.raw_autocorr(x)
        assert calls["checked"] == (1 << 17, 4)
        # the operand goes in UNPADDED with the transform length m
        assert calls["ran"] == ((1 << 16, 4), 1 << 16, 1 << 17)
        assert out.shape == (1 << 16, 4)

    def test_dispatch_sumlast_calls_deep(self, monkeypatch):
        calls = {}

        def spy_deep(x, n_out, m=None, sum_d=0):
            calls["ran"] = (x.shape, n_out, m, sum_d)
            return jnp.full(
                (n_out, x.shape[1] // max(sum_d, 1)), float(sum_d),
                x.dtype)

        monkeypatch.setattr(acf, "_has_native_fft", lambda: False)
        monkeypatch.setattr(deep_acf, "supported", lambda m, s: True)
        monkeypatch.setattr(deep_acf, "raw_autocorr_deep", spy_deep)
        monkeypatch.setattr(PF, "supported", lambda m, s: False)

        x = jnp.zeros((1 << 16, 2, 3), jnp.float64)
        out = acf.raw_autocorr_sumlast(x)
        # unpadded operand, transform length m, fused component sum
        assert calls["ran"] == ((1 << 16, 6), 1 << 16, 1 << 17, 3)
        assert out.shape == (1 << 16, 2)
        assert np.allclose(np.asarray(out), 3.0)

    def test_no_deep_under_outer_jit(self, monkeypatch):
        """Under an active trace the eager engines must NOT run (their
        cached constants would become program literals)."""
        monkeypatch.setattr(acf, "_has_native_fft", lambda: False)
        monkeypatch.setattr(
            deep_acf, "raw_autocorr_deep",
            lambda *a, **k: pytest.fail("deep path ran under trace"))
        monkeypatch.setattr(deep_acf, "supported", lambda m, s: True)
        monkeypatch.setattr(
            PF, "raw_autocorr_pallas",
            lambda *a, **k: pytest.fail("pallas path ran under trace"))
        monkeypatch.setattr(PF, "supported", lambda m, s: True)

        rng = np.random.default_rng(3)
        x = rng.standard_normal((256, 4))

        out = jax.jit(acf.raw_autocorr)(jnp.asarray(x))
        ref = acf.acf_fft_numpy(x[:, :, None]) * (256 - np.arange(256))[:, None]
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-9)


class TestUnpackToPair:
    """The fused unpack+power+conjugate-split stage, CPU-checkable
    (pure XLA): compare against the straight-line Hermitian algebra in
    numpy float64."""

    @pytest.mark.parametrize("m,slabbed", [(256, False), (262144, True)])
    def test_matches_reference_algebra(self, m, slabbed, monkeypatch):
        from transport_analysis_tpu.ops import deep_acf as D

        w = 4
        inner, outer = m // 2, 2
        rng = np.random.default_rng(11)
        from transport_analysis_tpu.ops import pallas_fft as PF

        # raw m-indexed complex series, laid into KERNEL layout
        # (element (k1, wc*outer + k2) = Z[k1 + inner*k2, wc])
        zr_m = rng.normal(0, 3, (m, w))
        zi_m = rng.normal(0, 3, (m, w))

        def to_kernel(z):
            return z.reshape(outer, inner, w).transpose(
                1, 2, 0).reshape(inner, w * outer)

        zrh, zrl = PF._split_pair(jnp.asarray(to_kernel(zr_m)))
        zih, zil = PF._split_pair(jnp.asarray(to_kernel(zi_m)))
        if slabbed:
            # shrink the row budget so the big case takes the
            # fori_loop slab path against the same reference
            monkeypatch.setattr(D, "_UNPACK_SLAB", 1024)

        def unkernel(a):
            # kernel layout -> m-major (m, w)
            return np.asarray(a, np.float64).reshape(
                inner, w, outer).transpose(2, 0, 1).reshape(m, w)

        # reference algebra runs on exactly the f64 the stage
        # reconstructs in-slab (hi + lo) — read BEFORE the call, the
        # stage donates its inputs
        zr = unkernel(zrh) + unkernel(zrl)
        zi = unkernel(zih) + unkernel(zil)
        rh, rl, ih, il = D._unpack_to_pair_dif(
            zrh, zrl, zih, zil, inner, outer, w
        )

        got_re = unkernel(rh) + unkernel(rl)
        got_im = unkernel(ih) + unkernel(il)

        r_rev = np.roll(zr[::-1], 1, axis=0)
        i_rev = np.roll(zi[::-1], 1, axis=0)
        f1r = 0.5 * (zr + r_rev)
        f1i = 0.5 * (zi - i_rev)
        f2r = 0.5 * (zi + i_rev)
        f2i = 0.5 * (r_rev - zr)
        p1 = f1r * f1r + f1i * f1i
        p2 = f2r * f2r + f2i * f2i
        scale = max(p1.max(), p2.max())
        np.testing.assert_allclose(got_re, p1, atol=1e-8 * scale)
        np.testing.assert_allclose(got_im, -p2, atol=1e-8 * scale)
        # pair split must be much tighter than one f32 ulp of the value
        assert np.max(np.abs(got_re - p1)) <= 1e-12 * scale


class TestPallasUnpack:
    """The Pallas streaming unpack (interpret mode on CPU) against the
    slabbed XLA formulation — same inputs, same output contract."""

    def test_matches_xla_unpack(self):
        from transport_analysis_tpu.ops import deep_acf as D
        from transport_analysis_tpu.ops import pallas_fft as PF

        inner, outer, w = 1024, 2, 64
        rng = np.random.default_rng(5)
        cols = w * outer
        zrh, zrl = PF._split_pair(
            jnp.asarray(rng.normal(0, 3, (inner, cols))))
        zih, zil = PF._split_pair(
            jnp.asarray(rng.normal(0, 3, (inner, cols))))

        want = D._unpack_to_pair_dif(
            zrh + 0, zrl + 0, zih + 0, zil + 0, inner, outer, w)
        got = D._unpack_to_pair_dif_pallas(
            zrh, zrl, zih, zil, inner=inner, outer=outer, w=w)
        for g, t in zip(got, want):
            g64 = np.asarray(g, np.float64)
            t64 = np.asarray(t, np.float64)
            scale = max(np.abs(t64).max(), 1.0)
            assert np.max(np.abs(g64 - t64)) / scale < 1e-13

    def test_dispatch_gates(self, monkeypatch):
        from transport_analysis_tpu.ops import deep_acf as D

        calls = {}
        monkeypatch.setattr(
            D, "_unpack_to_pair_dif",
            lambda *a, **k: calls.setdefault("xla", True) or (None,))
        monkeypatch.setenv("TRANSPORT_ANALYSIS_TPU_NO_PALLAS_UNPACK",
                           "1")
        z = jnp.zeros((1024, 128), jnp.float32)
        D._unpack_dispatch(z, z, z, z, 1024, 2, 64)
        assert calls.get("xla")


class TestPallasEpilogue:
    """The Pallas transposing epilogue (+ pair-domain component sum)
    against the XLA formulation, at a lane-compatible shape
    (outer=128, w=128 — the production class; other shapes take the
    XLA branch by the dispatch gate)."""

    @pytest.mark.parametrize("sum_d", [0, 3])
    def test_matches_xla_epilogue(self, monkeypatch, sum_d):
        from transport_analysis_tpu.ops import deep_acf as D
        from transport_analysis_tpu.ops import pallas_fft as PF

        inner, outer, w = 1024, 128, 128
        rows = 256          # a trimmed (l2_rows) engine output
        n_out = rows * outer // 2
        s = 2 * w - 1 if not sum_d else 2 * w - 2  # s % sum_d == 0
        if sum_d:
            s = (s // sum_d) * sum_d
        rng = np.random.default_rng(11)
        # true double-float pairs (lo = the f32 split tail, NOT an
        # independent plane): the pair-domain component sum's error
        # bound assumes |lo| <= ulp(hi)
        rh, rl = PF._split_pair(
            jnp.asarray(rng.normal(0, 1, (rows, w * outer))))
        ih, il = PF._split_pair(
            jnp.asarray(rng.normal(0, 1, (rows, w * outer))))
        pair = (rh, rl, ih, il)

        monkeypatch.setenv(
            "TRANSPORT_ANALYSIS_TPU_NO_PALLAS_EPILOGUE", "1")
        (want,) = D._inv_from_kernel_dif(
            *(a + 0 for a in pair), inner=inner, outer=outer, w=w,
            n_out=n_out, s=s, sum_d=sum_d)
        monkeypatch.delenv(
            "TRANSPORT_ANALYSIS_TPU_NO_PALLAS_EPILOGUE")
        (got,) = D._inv_from_kernel_dif(
            *pair, inner=inner, outer=outer, w=w,
            n_out=n_out, s=s, sum_d=sum_d)
        want = np.asarray(want)
        got = np.asarray(got)
        assert got.shape == want.shape
        scale = np.abs(want).max()
        # sum_d=0 is bit-identical (same adds); the pair-domain
        # component sum is ~2^-48-grade vs the f64 reduce
        tol = 0.0 if not sum_d else 1e-13 * scale
        assert np.max(np.abs(got - want)) <= tol


class TestPreparePairVariants:
    """The pair-source and f32-source prepare stages against the f64
    one: same slab structure, same output contract."""

    @pytest.mark.parametrize("n_rows", [700, 2048])
    def test_hl_and_f32_match_f64(self, n_rows):
        from transport_analysis_tpu.ops import deep_acf as D
        from transport_analysis_tpu.ops import pallas_fft as PF

        inner, outer, w, s = 1024, 2, 64, 100
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(0, 3, (n_rows, s)))

        want = D._prepare_pair(x + 0, inner, outer, w, s)

        hi, lo = PF._split_pair(x)
        got_hl = D._prepare_pair_hl(hi + 0, lo + 0, inner, outer, w, s)
        for g, t in zip(got_hl, want):
            assert np.array_equal(np.asarray(g), np.asarray(t))

        x32 = jnp.asarray(np.asarray(x, np.float32))
        want32 = D._prepare_pair(
            x32.astype(jnp.float64), inner, outer, w, s)
        got32 = D._prepare_pair_f32(x32 + 0, inner, outer, w, s)
        for g, t in zip(got32, want32):
            assert np.array_equal(np.asarray(g), np.asarray(t))
