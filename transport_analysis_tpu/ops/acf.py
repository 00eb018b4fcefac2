"""Autocorrelation kernels (Wiener–Khinchin FFT + exact windowed).

The reference computes the VACF either through ``tidynamics.acf`` — an
FFT autocorrelation called *serially per particle* in a Python loop
(reference velocityautocorr.py:210-213) — or through a per-lag numpy
"windowed" loop (velocityautocorr.py:223-235). Both paths compute

    C(lag, p) = 1/(N-lag) * sum_{i<N-lag} sum_d x[i,p,d] * x[i+lag,p,d]

Here both are single fused XLA computations batched over every particle
and component at once:

* ``acf_fft``      — zero-pad to 2·next_pow2(N), batched rfft → |·|² →
                     irfft, truncate, normalize by (N-lag). O(P·d·N logN)
                     with the whole particle batch in one FFT call.
* ``acf_windowed`` — direct per-lag sum, exactly the reference's
                     summation order, as a lax.fori_loop (compiles to one
                     kernel; no Python-level lag loop).

Precision: transport properties need float64-grade results (reference
velocityautocorr.py:208). On CPU we run complex128 FFTs natively. TPUs
have no complex128 FFT, so there the FFT path falls back to complex64
with float64 pre/post arithmetic; the windowed path runs in genuine
(emulated) float64 on TPU and is the bit-accurate option there.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def next_pow_2(n: int) -> int:
    """Smallest power of two >= n."""
    m = 1
    while m < n:
        m *= 2
    return m


def _has_native_fft() -> bool:
    """Only the CPU backend provides an FFT primitive; TPU backends
    (reported as 'tpu' or a plugin name such as 'axon') provide none,
    so they take the MXU matmul-FFT path (ops/fft.py)."""
    return jax.default_backend() in ("cpu",)


@jax.jit
def _raw_autocorr_native(x: jax.Array) -> jax.Array:
    """Unnormalized linear autocorrelation per column via the backend's
    native FFT. x: (N, S) → (N, S) with out[lag] = Σ_i x[i]·x[i+lag]."""
    N = x.shape[0]
    M = 2 * next_pow_2(N)
    f = jnp.fft.rfft(x, n=M, axis=0)
    return jnp.fft.irfft(f * jnp.conj(f), n=M, axis=0)[:N].real.astype(
        x.dtype
    )


def raw_autocorr(x: jax.Array) -> jax.Array:
    """Backend-dispatched raw autocorrelation over axis 0 of (N, S).

    TPU float64 at production shapes goes through the fused Pallas
    banded-FFT engine (ops/pallas_fft.py: ~40 device ops, int8 MXU
    GEMMs, ~4x the XLA matmul-FFT path, ~1e-12 vs host float64);
    other shapes/dtypes use the XLA matmul-FFT (ops/fft.py).
    Disable with TRANSPORT_ANALYSIS_TPU_NO_PALLAS_FFT=1.
    """
    import os

    N = x.shape[0]
    if _has_native_fft():
        return _raw_autocorr_native(x)
    M = 2 * next_pow_2(N)
    if (
        x.dtype == jnp.float64
        and not os.environ.get("TRANSPORT_ANALYSIS_TPU_NO_PALLAS_FFT")
    ):
        from . import pallas_fft

        if pallas_fft.supported(M, x.shape[1]):
            x_pad = jnp.pad(x, ((0, M - N), (0, 0)))
            return pallas_fft.raw_autocorr_pallas(x_pad, N)
    from .fft import raw_autocorr_matmul

    x_pad = jnp.pad(x, ((0, M - N), (0, 0)))
    return raw_autocorr_matmul(x_pad, N)


@jax.jit
def _raw_autocorr_native_sumlast(x: jax.Array) -> jax.Array:
    """(N, P, d) → (N, P): per-particle autocorrelation summed over
    components, with the sum taken on the power spectra (|F|² adds) so
    the inverse transform carries 1 column per particle instead of d."""
    N = x.shape[0]
    M = 2 * next_pow_2(N)
    f = jnp.fft.rfft(x, n=M, axis=0)
    power = (f * jnp.conj(f)).real.sum(axis=-1)
    return jnp.fft.irfft(power, n=M, axis=0)[:N].astype(x.dtype)


def raw_autocorr_sumlast(x: jax.Array) -> jax.Array:
    """Backend-dispatched component-summed autocorrelation,
    (N, P, d) → (N, P).

    CPU sums the power spectra before the inverse transform (irfft
    width shrinks d×). The TPU matmul-FFT path does NOT: the
    frequency-domain sum was measured ~40% *slower* end-to-end there
    (82 ms vs 58 ms at N=8192, P=512 f64) — the per-particle lane-
    group reduction over emulated-f64 spectra and the lost
    fwd/power/inv fusion inside each column block cost more than the
    d× smaller inverse saves (BENCH_NOTES.md, round 2). The TPU path
    keeps the fused per-block pipeline and sums afterwards.
    """
    import os

    N, P, d = x.shape
    if _has_native_fft():
        return _raw_autocorr_native_sumlast(x)
    M = 2 * next_pow_2(N)
    S = P * d
    if (
        x.dtype == jnp.float64
        and not os.environ.get("TRANSPORT_ANALYSIS_TPU_NO_PALLAS_FFT")
    ):
        from . import pallas_fft

        if pallas_fft.supported(M, S):
            # Post-process in the double-float pair domain: emulated-
            # f64 reshapes/copies cost ~1 ms per 100 MB here (trace-
            # measured 13 ms of reshapes in this wrapper alone), so the
            # concat/slice/reshape/component-sum all run on f32 pairs
            # and only the final (N, P) result converts to float64.
            x_pad = jnp.pad(x.reshape(N, S), ((0, M - N), (0, 0)))
            gr_hi, gr_lo, gi_hi, gi_lo = (
                pallas_fft.raw_autocorr_pallas_pair(x_pad, N))
            hi = jnp.concatenate([gr_hi, gi_hi], axis=1)[:, :S]
            lo = jnp.concatenate([gr_lo, gi_lo], axis=1)[:, :S]
            hi = hi.reshape(N, P, d)
            lo = lo.reshape(N, P, d)
            sh, sl = hi[..., 0], lo[..., 0]
            for c in range(1, d):
                s2 = sh + hi[..., c]
                bv = s2 - sh
                e = (sh - (s2 - bv)) + (hi[..., c] - bv)  # TwoSum
                sh = s2
                sl = sl + e + lo[..., c]
            return sh.astype(jnp.float64) + sl.astype(jnp.float64)
    raw = raw_autocorr(x.reshape(N, P * d)).reshape(N, P, d)
    return jnp.sum(raw, axis=-1)


def acf_fft(x) -> jax.Array:
    """Batched FFT autocorrelation.

    Parameters
    ----------
    x : (N, P, d) array — N frames, P particles, d components.

    Returns
    -------
    (N, P) array: per-particle autocorrelation vs lag.
    """
    x = jnp.asarray(x)
    if x.ndim == 2:
        x = x[:, :, None]
    N, P, d = x.shape
    raw = raw_autocorr_sumlast(x)
    norm = (N - jnp.arange(N, dtype=x.dtype))[:, None]
    return raw / norm


@partial(jax.jit, static_argnames=("n_lags",))
def _acf_windowed_impl(x: jax.Array, n_lags: int) -> jax.Array:
    N, P, _ = x.shape
    frame_idx = jnp.arange(N)

    def body(lag, out):
        shifted = jnp.roll(x, -lag, axis=0)
        prod = jnp.sum(x * shifted, axis=-1)  # (N, P) dot over components
        mask = (frame_idx < N - lag)[:, None]
        s = jnp.sum(jnp.where(mask, prod, 0), axis=0)
        return out.at[lag].set(s / (N - lag))

    return jax.lax.fori_loop(
        0, n_lags, body, jnp.zeros((n_lags, P), x.dtype)
    )


def acf_windowed(x, max_lag=None) -> jax.Array:
    """Exact per-lag windowed autocorrelation, (N, P, d) → (n_lags, P).

    Same summation order as the reference's simple algorithm
    (velocityautocorr.py:223-235); O(N·L·P·d) for ``max_lag`` = L lags
    (all N by default), fully on-device.
    """
    x = jnp.asarray(x)
    if x.ndim == 2:
        x = x[:, :, None]
    n = x.shape[0]
    n_lags = n if max_lag is None else min(int(max_lag), n)
    return _acf_windowed_impl(x, n_lags)


def acf_fft_numpy(x: np.ndarray) -> np.ndarray:
    """Host float64 Wiener–Khinchin autocorrelation (tidynamics.acf
    parity, used as an independent oracle in tests and as the CPU
    baseline in bench.py)."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 2:
        x = x[:, :, None]
    N = x.shape[0]
    M = 2 * next_pow_2(N)
    f = np.fft.rfft(x, n=M, axis=0)
    raw = np.fft.irfft(f * np.conj(f), n=M, axis=0)[:N].real
    raw = raw.sum(axis=-1)
    return raw / (N - np.arange(N))[:, None]
