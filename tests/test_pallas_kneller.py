"""Fused Pallas Kneller/Calandrini assembly (ops/pallas_kneller.py).

Runs on CPU in Pallas interpret mode (conftest forces the CPU backend;
`pallas_fft._interpret()` flips the kernels to interpreter execution).
Hardware equivalence is covered by tests/test_tpu_equivalence.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from transport_analysis_tpu.ops import einstein as ein
from transport_analysis_tpu.ops import pallas_kneller as pk


def _window_oracle(sq):
    """Direct numpy window sums: w[lag] = css[N-1-lag] + total -
    css[lag-1] (css inclusive prefix, css[-1] = 0)."""
    css = np.cumsum(sq, axis=0)
    n = sq.shape[0]
    total = css[-1]
    lags = np.arange(n)
    head = css[n - 1 - lags]
    prev = np.concatenate([np.zeros((1, sq.shape[1])), css[:-1]])
    return head + total[None] - prev


@pytest.mark.parametrize("n,p", [(1024, 5), (2048, 130), (1536, 85)])
def test_window_sums_vs_numpy(n, p):
    rng = np.random.RandomState(3)
    sq = np.abs(rng.normal(2.0, 1.0, (n, p))) ** 2
    wh, wl = pk.window_sums(jnp.asarray(sq), n, p)
    got = np.asarray(wh[:, :p], np.float64) + np.asarray(
        wl[:, :p], np.float64
    )
    ref = _window_oracle(sq)
    rel = np.max(np.abs(got - ref) / np.abs(ref).max())
    assert rel < 1e-12


def test_supported_gate():
    assert pk.supported(1024)
    assert pk.supported(1 << 20)
    assert not pk.supported(512)      # needs >= 2 blocks
    assert not pk.supported(1000)     # % 512 != 0


@pytest.mark.parametrize("reduce_mode,d", [("mean", 3), ("sum", 3)])
def test_assembly_matches_xla_impl(reduce_mode, d):
    n, p = 1024, 37
    rng = np.random.RandomState(11)
    a = rng.normal(0, 1.5, (n, p, d))
    a -= a.mean(axis=0, keepdims=True)
    sq = jnp.asarray(np.sum(a * a, axis=-1))
    flat = a.reshape(n, p * d)
    f = np.fft.rfft(flat, n=4 * n, axis=0)
    corr = np.fft.irfft(f * np.conj(f), n=4 * n, axis=0)[:n]
    corr = jnp.asarray(corr.reshape(n, p, d).sum(axis=-1))

    ref = np.asarray(ein._einstein_fft_impl(sq, reduce_mode, d, corr))
    got = np.asarray(pk.einstein_assembly(sq, corr, reduce_mode, d))
    assert got.shape == ref.shape
    rel = np.max(np.abs(got - ref) / np.abs(ref).max())
    assert rel < 1e-12
    assert got[0].max() == 0.0
