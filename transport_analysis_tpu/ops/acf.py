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


_V5E_USABLE_GB = 15.75  # usable HBM measured on the 16 GB v5e anchor
_V5E_ENGINE_BUDGET_GB = 12.0  # see auto_atom_chunk docstring
_V5E_DEEP_BUDGET_GB = 15.25


def _device_hbm_budget_gb(deep: bool) -> float | None:
    """HBM budget derived from the live device's ``memory_stats()``.

    The v5e constants in :func:`auto_atom_chunk` encode measured
    headroom (prepare-stage transients, engine constants, allocator
    fragmentation) as a FRACTION of usable HBM — a quantity that
    transfers across chips better than absolute GB. On a chip that
    reports its capacity (e.g. a 95 GB v5p) the budget scales with it;
    returns None when unavailable so the caller falls back to the
    v5e-anchored constants. The axon-tunneled v5e this repo develops
    on returns None from ``memory_stats()``, and the CPU backend is
    skipped deliberately: virtual-device test meshes must keep the
    deterministic v5e constants.
    """
    if jax.default_backend() in ("cpu",):
        return None
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:  # pragma: no cover - backend-dependent
        return None
    if not stats:
        return None
    limit = stats.get("bytes_limit") or stats.get(
        "bytes_reservable_limit"
    )
    if not limit:
        return None
    anchor = _V5E_DEEP_BUDGET_GB if deep else _V5E_ENGINE_BUDGET_GB
    return (limit / 1e9) * (anchor / _V5E_USABLE_GB)


def auto_atom_chunk(
    n_frames: int, d: int = 3, hbm_budget_gb: float | None = None,
    dtype=jnp.float64,
) -> int:
    """Largest atom chunk whose float64 FFT correlation pass fits in
    device memory, on the PAD-FILLING grid.

    The engine/deep paths pack the d·chunk series of a chunk into
    half as many complex columns, padded UP to 128-column lane tiles
    — so the useful grid is chunk = (256·k)//d (k = 1, 2, ...): at
    N = 2^20 frames, chunk=85 (k=1, d=3) costs exactly the HBM of
    chunk=16 while doing 5.3× the atoms (hardware-measured, BENCH_
    NOTES round 4). Memory model, recalibrated on a 16 GB v5e with
    the consume-discipline dispatch:

    * deep path (M = 2·next_pow2(N) > 65536): peak ≈ 46·M·w bytes of
      f32-pair stage arrays (w = true-lane packed columns, deep_acf.
      _deep_w) + the in-program f64 source 24·N·chunk + 8·N·chunk for
      the caller-held |a|² prefix operand of the Helfand/Einstein leg
      (outside the program, but inside the chip). The 46 coefficient
      is HARDWARE-ANCHORED, not two-spectra theory (which says 32):
      the one-jit chain at (M=2^21, w=161) compiled to an 18.00 GB
      program — 45.3·M·w + source — the extra ~0.85 spectra being
      XLA while-loop carry copies of the unpack outputs (remat2
      copies in the HBM dump). The 32-coefficient model admitted
      chunk=107 at N=2^20, which OOMed a 16 GB chip THEN. Round 8's
      half-symmetry unpack halved the mirror transient and chunk=107
      now RUNS (implied stage coefficient <= 36) — but per-atom
      walls degrade near the HBM edge on the v5e (BENCH_NOTES), so
      the coefficient deliberately stays at the conservative 46:
      on the v5e it keeps the fast, validated chunk=85; on
      bigger-HBM chips the budget scaling dominates chunk choice
      anyway. Recalibrate only with a perf-validated anchor.
    * engine path (M ≤ 65536): peak ≈ M·w'·64 with w' = d·chunk/2
      padded to 128, plus the (N, chunk, d) source (recalibrated:
      the 48-coefficient model admitted chunk=2048 at N=32768 —
      modeled 11.3 GB — which OOMs on hardware; chunk=1024 runs the
      100k-atom slice at 66 s).

    Budget resolution order: the ``hbm_budget_gb`` argument, then the
    TRANSPORT_ANALYSIS_TPU_HBM_BUDGET_GB env var, then the live
    device's reported capacity scaled by the v5e-anchored headroom
    fraction (:func:`_device_hbm_budget_gb` — so a 95 GB v5p gets a
    ~6x budget automatically), then the v5e constants: engine 12 GB
    (on a 16 GB v5e every configuration with a modeled peak
    <= 10.7 GB ran, and both 13.4 GB configs OOMed — prepare-stage
    transients + engine constants + allocator fragmentation eat the
    nominal headroom); deep 15.25 GB, chosen so the 46-coefficient
    model admits exactly the hardware-proven rungs (N=2^20 chunk=85
    at modeled 15.20, measured envelope ~15.0 of 15.75 usable;
    N=2^18 chunk=341 at modeled 15.21) and rejects the OOMing
    chunk=107 (modeled 18.1). The deep model is ~5% conservative for
    VACF-only callers (no held |a|² operand).
    """
    import os as _os

    if hbm_budget_gb is None:
        env = _os.environ.get("TRANSPORT_ANALYSIS_TPU_HBM_BUDGET_GB")
        deep = 2 * next_pow_2(n_frames) > 65536
        if env is not None:
            hbm_budget_gb = float(env)
        else:
            hbm_budget_gb = _device_hbm_budget_gb(deep)
        if hbm_budget_gb is None:
            hbm_budget_gb = (
                _V5E_DEEP_BUDGET_GB if deep else _V5E_ENGINE_BUDGET_GB
            )
    budget = hbm_budget_gb * 1e9
    # chain stages are f32 pairs regardless of input dtype; only the
    # held SOURCE scales with the input itemsize. (In practice the
    # stage term dominates at every deep rung, so f32 rarely unlocks
    # a bigger chunk — modeled for correctness, not a speedup.)
    isize = float(jnp.dtype(dtype).itemsize)
    m = 2 * next_pow_2(n_frames)
    if m <= 65536:
        best = 16
        for chunk in (16, 32, 64, 128, 256, 512, 1024, 2048, 4096):
            w = -(-d * chunk // 2 // 128) * 128
            peak = m * w * 64.0 + n_frames * chunk * isize * d
            if peak <= budget:
                best = chunk
        return best
    # deep path: w rounds to the TRUE lane granularity
    # max(1, 128/outer) (deep_acf._deep_w) — at outer >= 128 (every
    # M >= 2^21) the pad-filling 128-column grid is gone and chunks
    # are continuous. Peak model is hardware-anchored (docstring):
    # 46·M·w of f32-pair stages + the in-program source + the
    # caller-held (N, chunk) f64 Einstein prefix operand.
    from . import deep_acf as _da

    inner, outer = _da._split_m(m)
    best = 1
    for chunk in range(1, 4097):
        w = _da._deep_w(d * chunk, outer or 256)
        peak = (46.0 * m * w
                + (isize * d + 8.0) * n_frames * chunk)
        if peak <= budget:
            best = chunk
    return best


def _has_native_fft() -> bool:
    """Only the CPU backend provides an FFT primitive; TPU backends
    (reported as 'tpu' or a plugin name such as 'axon') provide none,
    so they take the MXU matmul-FFT path (ops/fft.py)."""
    return jax.default_backend() in ("cpu",)


def _eager_engines_ok() -> bool:
    """True when no outer jax trace is active.

    The Pallas banded-FFT engine and the deep composition stage their
    work as EAGER jit calls whose banded level matrices are cached
    device constants (~100-350 MB at large n2). Tracing them inside a
    user's outer ``jax.jit`` would embed those constants as program
    literals — per-shape recompiles everywhere, and outright rejection
    (HTTP 413) on tunneled remote-compile backends. Under an active
    trace the dispatch therefore falls back to the pure-XLA matmul-FFT
    path, which traces cleanly.
    """
    try:
        from jax._src.core import trace_state_clean

        return trace_state_clean()
    except Exception:  # pragma: no cover - very old/new jax
        return True


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
    GEMMs, ~4x the XLA matmul-FFT path, ~1e-12 vs host float64).
    Beyond the engine's M = 65536 ceiling (N > 32768 frames) the deep
    composition (ops/deep_acf.py) wraps one extra four-step level
    around it, reaching M = 2^24. Other shapes/dtypes use the XLA
    matmul-FFT (ops/fft.py).
    Disable with TRANSPORT_ANALYSIS_TPU_NO_PALLAS_FFT=1.

    .. note:: do NOT wrap this function in an outer ``jax.jit``: the
       engine paths stage eagerly and cache large banded constants
       which an outer trace would embed as program literals. Under an
       active trace the dispatch detects this and falls back to the
       (traceable) XLA matmul-FFT path.
    """
    import os

    N = x.shape[0]
    if _has_native_fft():
        return _raw_autocorr_native(x)
    M = 2 * next_pow_2(N)
    if (
        x.dtype in (jnp.float64, jnp.float32)
        and not os.environ.get("TRANSPORT_ANALYSIS_TPU_NO_PALLAS_FFT")
        and _eager_engines_ok()
    ):
        from . import deep_acf, pallas_fft

        if pallas_fft.supported(M, x.shape[1]):
            x_pad = jnp.pad(x, ((0, M - N), (0, 0)))
            return pallas_fft.raw_autocorr_pallas(x_pad, N)
        if deep_acf.supported(M, x.shape[1]):
            # UNPADDED operand handed over WITHOUT a local reference
            # (box.pop() leaves no binding in this frame): the deep
            # chain pads rows inside its slabbed prepare stage — no
            # (M, S) f64 pad pass — and any f64 source a caller frame
            # keeps alive adds straight onto the chain's HBM peak
            # (measured: a held padded source was the difference
            # between chunk=64 OOM and chunk=85 fitting at N=2^20,
            # BENCH_NOTES round 4)
            box = [x]
            del x
            return deep_acf.raw_autocorr_deep(box.pop(), N, m=M)
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

    .. note:: as with :func:`raw_autocorr`, do not wrap in an outer
       ``jax.jit`` — the engine paths stage eagerly; under an active
       trace the dispatch falls back to the XLA matmul-FFT.
    """
    N, P, d = x.shape
    box = [x.reshape(N, P * d)]
    del x
    return raw_autocorr_sumlast_flat(box.pop(), P, d)


def raw_autocorr_sumlast_flat(x: jax.Array, P: int, d: int) -> jax.Array:
    """Component-summed autocorrelation on a PRE-FLATTENED operand,
    (N, P·d) → (N, P): series of particle p live in columns
    p·d … p·d+d−1. Entry point for callers that already hold the flat
    layout (ops.einstein's fused centering emits it directly — the
    (N, P, d) → (N, S) relayout then happens exactly once per chunk).
    Same dispatch and consume discipline as raw_autocorr_sumlast.
    """
    import os

    N, S = x.shape
    if _has_native_fft():
        return _raw_autocorr_native_sumlast(x.reshape(N, P, d))
    M = 2 * next_pow_2(N)
    if (
        x.dtype in (jnp.float64, jnp.float32)
        and not os.environ.get("TRANSPORT_ANALYSIS_TPU_NO_PALLAS_FFT")
        and _eager_engines_ok()
    ):
        from . import deep_acf, pallas_fft

        if deep_acf.supported(M, S) and not pallas_fft.supported(M, S):
            # consume discipline: see raw_autocorr — no frame-local
            # reference survives the handoff. The operand goes in
            # UNPADDED (rows pad inside the slabbed prepare stage)
            # and the per-particle component sum rides the fused
            # epilogue — both full-array f64 passes disappear
            box = [x]
            del x
            return deep_acf.raw_autocorr_deep(
                box.pop(), N, m=M, sum_d=d)
        if pallas_fft.supported(M, S):
            # Post-process in the double-float pair domain: emulated-
            # f64 reshapes/copies cost ~1 ms per 100 MB here (trace-
            # measured 13 ms of reshapes in this wrapper alone), so the
            # concat/slice/reshape/component-sum all run on f32 pairs
            # and only the final (N, P) result converts to float64.
            dt = x.dtype
            x_pad = jnp.pad(x, ((0, M - N), (0, 0)))
            pair = pallas_fft.raw_autocorr_pallas_pair(x_pad, N)
            return _sumlast_pair_post(pair, N, P, d, dtype=dt)
    raw = raw_autocorr(x).reshape(N, P, d)
    return jnp.sum(raw, axis=-1)


def raw_autocorr_sumlast_flat_pair(hi, lo, P: int, d: int):
    """Component-summed autocorrelation from an exact double-float
    (hi, lo) f32-pair operand, (N, P·d) pair → (N, P) float64 — the
    pair-domain model feed. Dispatches to the deep chain's pair entry
    when eligible (where the win lives: no f64 materialization of the
    multi-GB operand); anywhere else the pair combines to f64 and
    the standard dispatch runs (one pass over a small-N operand)."""
    import os

    N, S = hi.shape
    M = 2 * next_pow_2(N)
    if (
        not os.environ.get("TRANSPORT_ANALYSIS_TPU_NO_PALLAS_FFT")
        and _eager_engines_ok()
    ):
        from . import deep_acf, pallas_fft

        if deep_acf.supported(M, S) and not pallas_fft.supported(M, S):
            box = [hi, lo]
            del hi, lo
            lo_ = box.pop()
            return deep_acf.raw_autocorr_deep_pair(
                box.pop(), lo_, N, m=M, sum_d=d)
    x = hi.astype(jnp.float64) + lo.astype(jnp.float64)
    del hi, lo
    box = [x]
    del x
    return raw_autocorr_sumlast_flat(box.pop(), P, d)


def _sumlast_pair_post(pair, N: int, P: int, d: int,
                       dtype=jnp.float64):
    """Component sum of the engine's pair-domain output, on f32 pairs
    (TwoSum over the d axis), converting only the final (N, P) to
    ``dtype``. Pure jnp — traceable."""
    gr_hi, gr_lo, gi_hi, gi_lo = pair
    S = P * d
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
    if dtype == jnp.float32:
        return sh + sl
    return sh.astype(jnp.float64) + sl.astype(jnp.float64)


def engine_consts_for(n_frames: int, dtype=jnp.float64):
    """Build (and cache) the banded engine's device constants for an
    ``n_frames`` analysis shape, for callers that trace the engine
    path inside their OWN jit (raw_autocorr_sumlast_engine below).

    Must be called EAGERLY; returns ``(consts, n_bands, max_group)``
    to pass through the outer jit as ARGUMENTS — constants that enter
    a trace as closures embed as program literals (~100-350 MB),
    which tunneled remote-compile backends reject (the reason the
    default dispatch refuses to run engines under an active trace)."""
    from . import pallas_fft

    M = 2 * next_pow_2(n_frames)
    n2 = M // 128
    j1_out = max(1, -(-n_frames // n2))
    n_bands, max_group = pallas_fft._profile(dtype)
    return (pallas_fft._device_constants(n2, j1_out, n_bands),
            n_bands, max_group)


def raw_autocorr_sumlast_engine(x, consts, n_bands: int,
                                max_group: int):
    """TRACEABLE component-summed autocorrelation on the fused Pallas
    engine: (N, P, d) float64 → (N, P). Unlike raw_autocorr_sumlast
    (whose dispatch refuses engines under an active trace), this form
    takes the banded constants as an argument — build them eagerly
    with :func:`engine_consts_for` and thread them through the outer
    jit — so whole analysis steps can compile as ONE program (used by
    bench.py's scanned pipeline). Shape must satisfy
    ``pallas_fft.supported(2*next_pow_2(N), P*d)``."""
    from . import pallas_fft

    N, P, d = x.shape
    S = P * d
    M = 2 * next_pow_2(N)
    x_pad = jnp.pad(x.reshape(N, S), ((0, M - N), (0, 0)))
    pair = pallas_fft._raw_autocorr_auto(
        x_pad, consts, N, n_bands, max_group)
    return _sumlast_pair_post(pair, N, P, d)


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
    dtype = x.dtype
    box = [x]
    del x  # consume discipline (see raw_autocorr): callers that hand
    # their only reference in get the deep path's full HBM headroom
    raw = raw_autocorr_sumlast(box.pop())
    # (N, 1) reciprocal + broadcast multiply: emulated-f64 division on
    # TPU is an iterative multi-op sequence per element — dividing the
    # full (N, P) array cost ~0.15 s/chunk at the N=2^20 rung
    inv = (1.0 / (N - jnp.arange(N, dtype=dtype)))[:, None]
    return raw * inv


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


def _windowed_pallas_ok(dtype, n: int, n_lags: int = None) -> bool:
    """Gate for routing the windowed kernels through the Pallas lag
    kernel (ops/pallas_lag.py): TPU backends only.

    float32: the tile kernel keeps each row block VMEM-resident per
    lag block where the XLA fori_loop kernels re-read the full series
    from HBM per lag — which pays off when the lag sweep is CAPPED
    (hardware, v5e: N=16384/max_lag=2048 pallas 5.4e10 vs XLA 4.8e10
    lags/s) but loses on full-lag sweeps, where the XLA loop's single
    fused kernel amortizes its reads over P and the tile kernel's
    per-(row-block, lag-block) grid revisits dominate (N=4096 full:
    XLA 3.9e10 vs pallas 1.8e10; N=8192 full: parity). Dispatch:
    pallas iff the cap is <= n/4 (BENCH_NOTES "windowed face-off").

    float64 (opt-in via TRANSPORT_ANALYSIS_TPU_PALLAS_LAG_F64=1): the
    double-float pair profile is exact-grade (~1e-14, N ≤ 2^17) but
    hardware-measured SLOWER than the XLA kernel at config-#1 shape
    (449 ms vs 157 ms, N=4096 P=128): exact 49-bit windowed sums cost
    ~60 VPU flops per element-lag, and at the v5e VPU's ~4 TF/s f32
    peak that can never beat the HBM-bound XLA loop by more than
    ~1.6x (BENCH_NOTES "windowed lag kernel"). The XLA kernel stays
    the float64 default. Disable the kernel entirely with
    TRANSPORT_ANALYSIS_TPU_NO_PALLAS_LAG=1.
    """
    import os

    from .pallas_fft import is_tpu_backend

    if not is_tpu_backend():
        return False
    if os.environ.get("TRANSPORT_ANALYSIS_TPU_NO_PALLAS_LAG"):
        return False
    if dtype == jnp.float64:
        from .pallas_lag import pair_supported

        return bool(
            os.environ.get("TRANSPORT_ANALYSIS_TPU_PALLAS_LAG_F64")
        ) and pair_supported(n)
    if dtype != jnp.float32:
        return False
    return n_lags is None or n_lags * 4 <= n


def acf_fft_from_f32(x32) -> jax.Array:
    """float64-GRADE batched FFT autocorrelation from float32 samples.

    Trajectory formats store coordinates/velocities as float32; those
    values are EXACTLY representable in float64, so f64-grade results
    do not require an 8-byte operand — the double-float pair image of
    the data is (x, 0). On the TPU deep path this entry feeds the
    f32 block straight into the chain at the FULL 7-band f64 profile
    (zero tails synthesized in-slab): the upcast pass disappears and
    the source HBM footprint/read halves — the production spool
    feed's term (parallel/out_of_core.py ships f32). Result contract
    identical to ``acf_fft(x32.astype(float64))`` up to the pair
    grade (~2^-48); output float64. Elsewhere it upcasts and runs
    the standard dispatch (bit-identical to the f64 route).
    """
    import os

    x32 = jnp.asarray(x32)
    if x32.dtype != jnp.float32:
        raise TypeError(
            f"acf_fft_from_f32 expects float32 samples, got "
            f"{x32.dtype} (use acf_fft for float64 operands)")
    if x32.ndim == 2:
        x32 = x32[:, :, None]
    N, P, d = x32.shape
    M = 2 * next_pow_2(N)
    inv = (1.0 / (N - jnp.arange(N, dtype=jnp.float64)))[:, None]
    if (
        not os.environ.get("TRANSPORT_ANALYSIS_TPU_NO_PALLAS_FFT")
        and _eager_engines_ok()
    ):
        from . import deep_acf, pallas_fft

        if deep_acf.supported(M, P * d) and not pallas_fft.supported(
            M, P * d
        ):
            box = [x32.reshape(N, P * d)]
            del x32
            raw = deep_acf.raw_autocorr_deep_f32(
                box.pop(), N, m=M, sum_d=d)
            return raw * inv
    box = [x32.astype(jnp.float64)]
    del x32
    raw = raw_autocorr_sumlast(box.pop())
    return raw * inv


def acf_windowed(x, max_lag=None) -> jax.Array:
    """Exact per-lag windowed autocorrelation, (N, P, d) → (n_lags, P).

    Same summation order as the reference's simple algorithm
    (velocityautocorr.py:223-235); O(N·L·P·d) for ``max_lag`` = L lags
    (all N by default), fully on-device. On TPU the per-lag sweep runs
    in the blocked Pallas lag kernel (see :func:`_windowed_pallas_ok`);
    elsewhere (and as fallback) a lax.fori_loop XLA kernel.
    """
    x = jnp.asarray(x)
    if x.ndim == 2:
        x = x[:, :, None]
    n = x.shape[0]
    n_lags = n if max_lag is None else min(int(max_lag), n)
    if _windowed_pallas_ok(x.dtype, n, n_lags):
        from .pallas_lag import windowed_lag_pallas

        return windowed_lag_pallas(
            x, max_lag=n_lags, mode="acf", reduce_mode="sum"
        )
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
