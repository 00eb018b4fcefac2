"""MXU permutation-matmul mirror (ops/pallas_mirror.py).

The kernel must match deep_acf's XLA two-axis rev BITWISE: a 0/1
permutation matmul at Precision.HIGHEST selects each source element
exactly (see the module docstring's split argument). These tests run
the kernel in interpret mode on the CPU backend; the hardware
equivalence lives in tests/test_tpu_equivalence.py (the deep chain's
output is unchanged bitwise by construction) and the measured win in
benchmarks/micro_mirror.py / BENCH_NOTES.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transport_analysis_tpu.ops import deep_acf as da
from transport_analysis_tpu.ops import pallas_mirror as pm


def _planes(inner, cols, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    return tuple(
        jax.random.uniform(k, (inner, cols), jnp.float32, -1, 1)
        for k in ks
    )


@pytest.mark.parametrize(
    "inner,outer,w",
    [
        (512, 128, 8),     # north-star lane geometry, small rows
        (1024, 128, 3),    # w not a multiple of 8
        (512, 256, 4),     # two-register lane groups
        (512, 64, 16),     # sub-register groups (kron block-diag)
        (512, 16, 64),     # smallest production outer
    ],
)
def test_bit_identical_to_xla_rev(inner, outer, w):
    need = inner // 2 + 128
    assert pm.supported(inner, outer, w, need)
    planes = _planes(inner, w * outer)
    ref = da._unpack_rev_planes_half_xla(
        *planes, inner=inner, outer=outer, w=w, need=need)
    got = pm.mirror_half_planes(*planes, inner, outer, w, need)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_need_equals_inner():
    inner, outer, w = 256, 128, 2
    need = inner
    planes = _planes(inner, w * outer, seed=3)
    ref = da._unpack_rev_planes_half_xla(
        *planes, inner=inner, outer=outer, w=w, need=need)
    got = pm.mirror_half_planes(*planes, inner, outer, w, need)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


class TestGate:
    def test_env_opt_out(self, monkeypatch):
        monkeypatch.setenv(
            "TRANSPORT_ANALYSIS_TPU_NO_PALLAS_MIRROR", "1")
        assert not pm.supported(512, 128, 8, 256)

    def test_row_grid_divisibility(self):
        assert not pm.supported(500, 128, 8, 256)   # inner % 128
        assert not pm.supported(512, 128, 8, 200)   # need % 128
        assert not pm.supported(512, 128, 8, 1024)  # need > inner

    def test_lane_representability(self):
        assert not pm.supported(512, 48, 16, 256)   # 48 ∤ 128
        assert not pm.supported(512, 512, 2, 256)   # outer > 256
        assert pm.supported(512, 32, 8, 256)

    def test_dispatcher_uses_xla_off_tpu(self):
        # on the CPU backend the dispatcher must take the XLA path
        # (interpret-mode Pallas is for tests, not production runs)
        inner, outer, w = 256, 128, 2
        planes = _planes(inner, w * outer, seed=5)
        ref = da._unpack_rev_planes_half_xla(
            *planes, inner=inner, outer=outer, w=w, need=128)
        got = da._unpack_rev_planes_half(
            *planes, inner=inner, outer=outer, w=w, need=128)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


class TestSynthTail:
    """In-place tail synthesis vs the unpack's XLA rev + DUS."""

    @staticmethod
    def _xla_synth(o, inner, outer, w):
        half = inner // 2
        tail = np.asarray(o)[1:half].reshape(half - 1, w, outer)
        tail = tail[::-1, :, ::-1].reshape(half - 1, -1)
        out = np.asarray(o).copy()
        out[half + 1:] = tail
        return out

    @pytest.mark.parametrize(
        "inner,outer,w",
        [(512, 128, 8), (1024, 128, 3), (512, 256, 4), (512, 64, 16)],
    )
    def test_tail_rows_match_xla(self, inner, outer, w):
        assert pm.synth_supported(inner, outer, w)
        half = inner // 2
        planes = _planes(inner, w * outer, seed=7)
        ref = [self._xla_synth(p, inner, outer, w) for p in planes]
        got = pm.synth_tail_planes(*planes, inner=inner, outer=outer,
                                   w=w)
        for r, g in zip(ref, got):
            g = np.asarray(g)
            # rows != half must match the XLA synth bitwise
            np.testing.assert_array_equal(r[:half], g[:half])
            np.testing.assert_array_equal(r[half + 1:], g[half + 1:])
            # row half is rewritten as its own lane mirror
            lm = r[half].reshape(w, outer)[:, ::-1].reshape(-1)
            np.testing.assert_array_equal(g[half], lm)

    def test_even_data_fixed_point(self):
        """On genuinely Hermitian-even planes (p = q + R_full(q)) the
        synthesis is the identity — including row half."""
        inner, outer, w = 512, 128, 4
        q = _planes(inner, w * outer, seed=9)
        r = da._unpack_rev_planes_half_xla(
            *q, inner=inner, outer=outer, w=w, need=inner)
        even = tuple(np.asarray(a) + np.asarray(b)
                     for a, b in zip(q, r))
        got = pm.synth_tail_planes(
            *[jnp.asarray(e) for e in even],
            inner=inner, outer=outer, w=w)
        for e, g in zip(even, got):
            np.testing.assert_array_equal(e, np.asarray(g))


def test_lane_perm_matrices():
    # mirror: within-group flip; roll: (outer - k2) mod outer
    p = pm._lane_perm(4, roll=False)
    assert p.shape == (128, 128)
    x = np.arange(128, dtype=np.float32)[None]
    out = x @ p
    np.testing.assert_array_equal(
        out.reshape(32, 4), x.reshape(32, 4)[:, ::-1])
    p0 = pm._lane_perm(4, roll=True)
    out0 = (x @ p0).reshape(32, 4)
    grp = x.reshape(32, 4)
    np.testing.assert_array_equal(
        out0, grp[:, (4 - np.arange(4)) % 4])
