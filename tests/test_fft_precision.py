"""fft_precision: the trimmed-band precision ladder.

The profiles trade band pairs (GEMM flops) for truncation error in
the banded float64 engine (ops/pallas_fft.py) and the deep
composition's Ozaki outer DFT (ops/deep_acf.py, ops/ozaki.py). On the
CPU suite the Pallas engine never runs, but the Ozaki complex product
does — so the numeric ladder is validated there, and the context
manager's dispatch plumbing is validated via the profile hooks the
TPU paths read (tests/test_tpu_equivalence.py covers the on-hardware
end-to-end grades).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from transport_analysis_tpu import ops
from transport_analysis_tpu.ops import pallas_fft as PF
from transport_analysis_tpu.ops.ozaki import complex_dft_matmul


class TestContextManager:
    def test_named_profiles_set_and_restore(self):
        assert PF._profile(jnp.float64) == (PF._N_BANDS, PF._MAX_GROUP)
        with ops.fft_precision("medium"):
            assert PF._profile(jnp.float64) == (5, 4)
        assert PF._profile(jnp.float64) == (PF._N_BANDS, PF._MAX_GROUP)

    def test_exact_is_default(self):
        with ops.fft_precision("exact"):
            assert PF._profile(jnp.float64) == (
                PF._N_BANDS, PF._MAX_GROUP)

    def test_nesting_restores_inner(self):
        with ops.fft_precision("high"):
            with ops.fft_precision((4, 3)):
                assert PF._profile(jnp.float64) == (4, 3)
            assert PF._profile(jnp.float64) == (7, 5)
        assert PF._profile(jnp.float64) == (PF._N_BANDS, PF._MAX_GROUP)

    def test_restores_on_exception(self):
        with pytest.raises(RuntimeError):
            with ops.fft_precision("fast"):
                raise RuntimeError("boom")
        assert PF._profile(jnp.float64) == (PF._N_BANDS, PF._MAX_GROUP)

    def test_float32_profile_unaffected(self):
        with ops.fft_precision("high"):
            assert PF._profile(jnp.float32) == (4, 3)

    def test_unknown_name_rejected(self):
        with pytest.raises(ValueError, match="unknown fft_precision"):
            ops.fft_precision("ultra")

    @pytest.mark.parametrize("bad", [(0, 0), (8, 6), (4, 7), (4, -1)])
    def test_bad_tuple_rejected(self, bad):
        with pytest.raises(ValueError):
            ops.fft_precision(bad)


def _dft_case(n, cols, seed):
    rng = np.random.default_rng(seed)
    th = 2.0 * np.pi * np.outer(np.arange(n), np.arange(n)) / n
    c, s = np.cos(th), -np.sin(th)
    re = rng.standard_normal((n, cols))
    im = rng.standard_normal((n, cols))
    want = (c + 1j * s) @ (re + 1j * im)
    return c, s, re, im, want


class TestTrimmedComplexProduct:
    """The Ozaki complex DFT product under each profile's band budget,
    against a numpy float64 oracle. Tolerances are the profile grades
    with ~10x headroom (error is relative to the complex magnitude)."""

    GRADE = {(7, 6): 1e-13, (7, 5): 5e-12, (5, 4): 5e-10, (4, 3): 5e-6}

    @pytest.mark.parametrize("profile", sorted(GRADE))
    def test_grade(self, profile):
        n_slices, max_band = profile
        c, s, re, im, want = _dft_case(64, 96, seed=7)
        got_re, got_im = complex_dft_matmul(
            jnp.asarray(c), jnp.asarray(s), jnp.asarray(re),
            jnp.asarray(im), n_slices=n_slices, max_band=max_band)
        got = np.asarray(got_re) + 1j * np.asarray(got_im)
        scale = np.abs(want).max()
        err = np.abs(got - want).max() / scale
        assert err < self.GRADE[profile], (profile, err)

    def test_ladder_is_monotone(self):
        """More band budget never loses accuracy (same inputs)."""
        c, s, re, im, want = _dft_case(64, 96, seed=11)
        errs = []
        for n_slices, max_band in [(4, 3), (5, 4), (7, 5), (7, 6)]:
            got_re, got_im = complex_dft_matmul(
                jnp.asarray(c), jnp.asarray(s), jnp.asarray(re),
                jnp.asarray(im), n_slices=n_slices, max_band=max_band)
            got = np.asarray(got_re) + 1j * np.asarray(got_im)
            errs.append(np.abs(got - want).max())
        assert errs == sorted(errs, reverse=True) or errs[-1] < 1e-13


class TestDeepPlumbing:
    def test_outer_kernel_accepts_profile(self):
        """The fused outer kernel's static profile args (n_bands,
        max_group) thread through to the banded MXU product, and the
        full profile matches the host f64 twiddle+DFT algebra
        (interpret mode on CPU; hardware runs in
        tests/test_tpu_equivalence.py)."""
        from transport_analysis_tpu.ops import deep_acf as DA

        inner, outer, w = 512, 4, 32
        rng = np.random.default_rng(3)
        re = rng.standard_normal((inner, w * outer))
        im = rng.standard_normal((inner, w * outer))

        def pairs():
            # fresh device copies per call: the kernel donates the pair
            out = []
            for comp in (re, im):
                hi = comp.astype(np.float32)
                lo = (comp - hi.astype(np.float64)).astype(np.float32)
                out.extend([jnp.asarray(hi), jnp.asarray(lo)])
            return out

        def run(nb, mg):
            t = DA._outer_kernel_tables(inner, outer, nb)
            o = DA._outer_level_pallas(
                *pairs(), *t, inner=inner, outer=outer, w=w,
                n_bands=nb, max_group=mg)
            o = [np.asarray(a, np.float64) for a in o]
            return o[0] + o[1], o[2] + o[3]

        want_re, want_im = run(7, 6)
        got_re, got_im = run(5, 4)

        # full profile ≡ host algebra: Z = (T * W_M^{k1 j2}) DFT_outer
        mm = inner * outer
        k1 = np.arange(inner)[:, None]
        j2 = np.arange(outer)[None, :]
        tw = np.exp(-2j * np.pi * (k1 * j2 % mm) / mm)
        wout = np.exp(
            -2j * np.pi
            * np.outer(np.arange(outer), np.arange(outer)) / outer)
        z = (re + 1j * im).reshape(inner, w, outer)
        ref = (z * tw[:, None, :]) @ wout
        scale = np.abs(ref).max()
        assert np.abs(
            want_re - ref.real.reshape(inner, w * outer)
        ).max() / scale < 1e-12
        assert np.abs(
            want_im - ref.imag.reshape(inner, w * outer)
        ).max() / scale < 1e-12

        err = max(np.abs(want_re - got_re).max(),
                  np.abs(want_im - got_im).max())
        assert 1e-16 < err / scale < 1e-8  # trimmed, but in-grade


class TestDeepPrecisionWarning:
    """Trimmed profiles at deep shapes are OUT of the 1e-11 contract
    (hardware-measured 2.4e-10 for 'high', BENCH_NOTES precision
    ladder): the deep dispatch warns once per process."""

    def _call(self, monkeypatch):
        from transport_analysis_tpu.ops import deep_acf as DA

        # stop before any compute: the warning fires at dispatch,
        # ahead of the backend gates / engine calls
        seen = {}

        def grab(*a, **k):
            seen["hit"] = True
            raise _Stop()

        class _Stop(Exception):
            pass

        monkeypatch.setattr(DA, "_split_m", grab)
        x = jnp.zeros((16, 3), jnp.float64)
        with pytest.raises(_Stop):
            DA.raw_autocorr_deep(x, 16, m=1 << 17)
        assert seen["hit"]

    def test_warns_once_on_trimmed_profile(self, monkeypatch):
        from transport_analysis_tpu.ops import deep_acf as DA

        monkeypatch.setattr(DA, "_PRECISION_WARNED", [False])
        with ops.fft_precision("high"):
            with pytest.warns(UserWarning, match="above the f64 tail floor"):
                self._call(monkeypatch)
            # second dispatch: no duplicate warning
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("error")
                self._call(monkeypatch)

    def test_exact_profile_does_not_warn(self, monkeypatch):
        import warnings

        from transport_analysis_tpu.ops import deep_acf as DA

        monkeypatch.setattr(DA, "_PRECISION_WARNED", [False])
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            self._call(monkeypatch)

    def test_float32_does_not_warn(self, monkeypatch):
        import warnings

        from transport_analysis_tpu.ops import deep_acf as DA

        monkeypatch.setattr(DA, "_PRECISION_WARNED", [False])
        x = jnp.zeros((16, 3), jnp.float32)
        seen = {}

        class _Stop(Exception):
            pass

        def grab(*a, **k):
            seen["hit"] = True
            raise _Stop()

        monkeypatch.setattr(DA, "_split_m", grab)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            with pytest.raises(_Stop):
                DA.raw_autocorr_deep(x, 16, m=1 << 17)
