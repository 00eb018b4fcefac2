"""Benchmark: fused VACF + Einstein-Helfand viscosity throughput.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reported value is a COMPOSITE (geometric mean) of two rungs so it
moves when either production path does (VERDICT r3 #3: three rounds of
deep-chain wins — 5.8e10 -> 2.43e11 on the deep rung — were invisible
to a bench that only ran the N=8192 engine shape):

* engine rung — BASELINE.json configs #2/#3: per-particle VACF via
  FFT autocorrelation + Green-Kubo diffusivity, and the Helfand
  viscosity function + linear-fit slope, on an (N_FRAMES, N_ATOMS, 3)
  float64 velocity/position block resident on the accelerator
  (N=8192: M=2^14, the fused Pallas banded engine).
* deep rung — the full acf_fft dispatch at N=131072 frames, P=16, f64
  (M=2^18 > the engine's 65536 ceiling, so it takes the deep
  composition of ops/deep_acf.py — where every large-N result lives).

Metric: effective atom-frame-lags per second — each analysis produces
Sum_lag (N - lag) = N(N+1)/2 lag-window reductions per atom (the work
unit of the reference's windowed algorithm; the FFT engines produce
identical output in O(N log N), which is exactly the point).

Baseline: the reference's own algorithm structure on this host —
tidynamics-style FFT autocorrelation called serially per particle
(reference velocityautocorr.py:210-213) plus (engine rung only) the
O(N^2) windowed numpy Helfand lag loop (viscosity.py:210-226), the
only viscosity algorithm the reference has. The Helfand baseline is
timed on a lag subsample and extrapolated by measured per-element
throughput (full run would take hours). vs_baseline = geometric mean
of the per-rung speedups.

Env overrides: BENCH_FRAMES, BENCH_ATOMS, BENCH_DTYPE (float32|float64),
BENCH_SKIP_DEEP=1 (engine rung only, the pre-round-4 behavior).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache: repeated bench runs skip recompilation
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/transport_analysis_tpu_xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import transport_analysis_tpu  # noqa: F401  (x64 on)
from transport_analysis_tpu import ops
from transport_analysis_tpu.ops.acf import acf_fft_numpy
from transport_analysis_tpu.utils.units import constants

N_FRAMES = int(os.environ.get("BENCH_FRAMES", 8192))
N_ATOMS = int(os.environ.get("BENCH_ATOMS", 512))
DTYPE = np.dtype(os.environ.get("BENCH_DTYPE", "float64"))
KB = constants["Boltzmann_constant"]
TEMP = 300.0
VOL = 8000.0


def make_data(n_frames, n_atoms, dtype):
    rng = np.random.RandomState(0)
    vel = rng.normal(0, 5, (n_frames, n_atoms, 3)).astype(dtype)
    pos = np.cumsum(vel, axis=0) * 0.002 + rng.uniform(
        0, 20, (1, n_atoms, 3)
    ).astype(dtype)
    masses = rng.uniform(1, 16, n_atoms).astype(dtype)
    times = np.arange(n_frames, dtype=np.float64) * 0.002
    return vel, pos, masses, times


def _engine_args():
    """Banded-engine constants for the bench shape, or None off-TPU.

    The scanned pipeline below is ONE jit; the acf dispatch correctly
    refuses to run the eager Pallas engine under an active trace (its
    cached constants would embed as program literals), so the bench
    threads the constants through the jit as ARGUMENTS and calls the
    traceable engine entry points directly (ops.acf
    raw_autocorr_sumlast_engine) — same kernels, one program."""
    from transport_analysis_tpu.ops import pallas_fft as PF
    from transport_analysis_tpu.ops import acf as ACF

    m = 2 * ACF.next_pow_2(N_FRAMES)
    if DTYPE != np.dtype("float64") or not PF.supported(
            m, N_ATOMS * 3):
        return None
    consts, n_bands, max_group = ACF.engine_consts_for(N_FRAMES)
    return consts, n_bands, max_group


def _analysis_step(vel, pos, masses, times, engine=None):
    from transport_analysis_tpu.ops import acf as ACF
    from transport_analysis_tpu.ops import einstein as EIN

    n = vel.shape[0]
    if engine is not None:
        consts, n_bands, max_group = engine
        norm = (n - jnp.arange(n, dtype=vel.dtype))[:, None]
        vacf_bp = ACF.raw_autocorr_sumlast_engine(
            vel, consts, n_bands, max_group) / norm
        accum = masses[None, :, None] * vel * pos
        accum = EIN._center(accum)
        corr = ACF.raw_autocorr_sumlast_engine(
            accum, consts, n_bands, max_group)
        visc_bp = ops.einstein_difference_fft(accum, "mean",
                                              corr=corr)
    else:
        vacf_bp = ops.acf_fft(vel)
        accum = masses[None, :, None] * vel * pos
        visc_bp = ops.einstein_difference_fft(accum, "mean")
    vacf_ts = vacf_bp.mean(axis=1)
    diffusivity = ops.trapezoid(vacf_ts, times) / 3.0
    visc_ts = visc_bp.mean(axis=1) / (2.0 * KB * VOL * TEMP)
    lags = jnp.arange(1, n, dtype=visc_ts.dtype)
    w = slice(n // 8, n // 2)
    slope, _ = ops.polyfit_linear(lags[w], visc_ts[w])
    return vacf_ts, diffusivity, visc_ts, slope


def tpu_pipeline(vel, pos, masses, times):
    """Fused device pipeline: VACF + GK-D + Helfand function + slope.

    Timing methodology for this tunneled runtime (see BENCH_NOTES.md):
    per-launch RPC overhead is ~0.4 s and identical re-issued
    executions can be memoized, so the step runs ``reps`` times inside
    ONE executable via lax.scan — every iteration perturbs the
    velocities (on device) and every output feeds the returned scalar,
    so no iteration can be elided — and a single host readback fences
    the program. wall/reps is sustained on-device throughput, which is
    what chunked pipelines achieve (they cross the host boundary once
    per large chunk, not per step).
    """
    reps = 8
    engine = _engine_args()
    statics = () if engine is None else engine[1:]

    def loop(vel, pos, masses, times, consts):
        eng = None if consts is None else (consts,) + statics

        def body(carry, i):
            scale = 1.0 + 1e-9 * i.astype(vel.dtype)
            vacf_ts, d, visc_ts, slope = _analysis_step(
                vel * scale, pos, masses, times, eng
            )
            digest = d + slope + vacf_ts[0] + visc_ts[-1]
            return carry + digest, None

        total, _ = jax.lax.scan(
            body, jnp.zeros((), vel.dtype), jnp.arange(reps)
        )
        return total

    def single(vel, pos, masses, times, consts):
        eng = None if consts is None else (consts,) + statics
        return _analysis_step(vel, pos, masses, times, eng)

    consts = None if engine is None else engine[0]
    fn = jax.jit(loop)
    single = jax.jit(single)
    args = tuple(jax.device_put(a) for a in (vel, pos, masses, times))
    args = args + (consts,)
    float(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    total = float(fn(*args))  # readback fences the whole scan
    wall = (time.perf_counter() - t0) / reps
    assert np.isfinite(total)
    out = single(*args)
    np.asarray(out[0])
    return wall, out


def baseline_pipeline(vel, pos, masses, times):
    """Reference-structured host implementation, partially extrapolated."""
    n, p, d = vel.shape
    vel64 = vel.astype(np.float64)
    pos64 = pos.astype(np.float64)

    # VACF: FFT autocorrelation per particle, serial Python loop
    t0 = time.perf_counter()
    vacf_bp = np.zeros((n, p))
    for i in range(p):
        # tidynamics.acf semantics: components summed per particle
        vacf_bp[:, i] = acf_fft_numpy(vel64[:, i, :]).sum(axis=1)
    vacf_ts = vacf_bp.mean(axis=1)
    np.trapezoid(vacf_ts, times)
    vacf_time = time.perf_counter() - t0

    # Helfand: windowed numpy lag loop, timed on a subsample of lags
    accum = masses[None, :, None].astype(np.float64) * vel64 * pos64
    k = min(64, n - 1)
    t0 = time.perf_counter()
    visc = np.zeros((n, p))
    for lag in range(1, k + 1):
        diff = accum[:-lag] - accum[lag:]
        visc[lag] = np.square(diff).mean(axis=-1).mean(axis=0)
    sub_time = time.perf_counter() - t0
    sub_elements = sum((n - lag) * p * d for lag in range(1, k + 1))
    total_elements = (n * (n - 1) // 2) * p * d
    helfand_time = sub_time * total_elements / sub_elements

    return vacf_time + helfand_time, vacf_ts


DEEP_FRAMES, DEEP_ATOMS = 131072, 16


def deep_rung():
    """One acf_fft dispatch at a deep shape (M=2^18 > engine ceiling)
    vs the reference-structured serial per-particle host FFT loop.
    Returns (lags_per_s, baseline_lags_per_s, rel_err_head)."""
    n, p = DEEP_FRAMES, DEEP_ATOMS
    rng = np.random.RandomState(7)
    x = rng.normal(0, 5, (n, p, 3))

    xd = jnp.asarray(x)
    got = np.asarray(ops.acf_fft(xd))  # warm (compile) + accuracy copy
    del xd
    # distinct buffers (memoization defence) via EXACT pow2 scales:
    # acf(2^k x) = 4^k acf(x) bit-for-bit in the input. The timed
    # region reads back the on-device particle SUM ((N,) ~ 1 MB) —
    # the production out-of-core contract. Wall = MIN over reps: the
    # ~75 ms rung rides a tunneled runtime whose per-call fence RTT
    # jitters 27-52 ms (BENCH_NOTES), which swung single-shot rung
    # values +-40% between otherwise identical runs.
    wall = float("inf")
    base_sum = got.sum(axis=1)
    denom = np.abs(base_sum).max()
    for k in (1, 2, 3):
        xd = jnp.asarray(x * float(2.0 ** k))
        np.asarray(jnp.sum(xd))  # fence the feed out of timed region
        t0 = time.perf_counter()
        timed_sum = np.asarray(ops.acf_fft(xd).sum(axis=1))
        wall = min(wall, time.perf_counter() - t0)
        del xd
        # correctness witness for the TIMED run (round-4 advisor)
        scale_err = np.abs(
            timed_sum - 4.0 ** k * base_sum).max() / denom
        assert scale_err < 1e-11 * 4.0 ** k, (
            f"timed deep-rung output diverged from the warm run: "
            f"{scale_err:.3e}")

    # reference structure: tidynamics-style FFT acf, serial per
    # particle (velocityautocorr.py:210-213), on the host in f64
    t0 = time.perf_counter()
    ref_bp = np.empty((n, p))
    for i in range(p):
        ref_bp[:, i] = acf_fft_numpy(x[:, i, :]).sum(axis=1)
    ref_bp.sum(axis=1)
    base_wall = time.perf_counter() - t0

    err = np.abs(got - ref_bp) / np.abs(ref_bp).max()
    # head half carries the contract; the deepest lags divide the raw
    # correlation by (N-lag) -> 1, amplifying the absolute error floor
    # ~N x even in pure f64 (see scripts/deep_gate.py)
    rel_err = float(err[: n // 2].max())

    lag_work = (n * (n + 1) // 2) * p
    return lag_work / wall, lag_work / base_wall, rel_err


def main():
    vel, pos, masses, times = make_data(N_FRAMES, N_ATOMS, DTYPE)
    wall, out = tpu_pipeline(vel, pos, masses, times)
    base_wall, base_vacf = baseline_pipeline(vel, pos, masses, times)

    # accuracy cross-check against the host float64 reference
    ours = np.asarray(out[0])
    denom = np.max(np.abs(base_vacf))
    rel_err = float(np.max(np.abs(ours - base_vacf)) / denom)

    lag_work = 2 * (N_FRAMES * (N_FRAMES + 1) // 2) * N_ATOMS
    engine_rate = lag_work / wall
    engine_base = lag_work / base_wall

    if os.environ.get("BENCH_SKIP_DEEP"):
        value, baseline_value = engine_rate, engine_base
        deep_note = "deep rung skipped"
    else:
        deep_rate, deep_base, deep_err = deep_rung()
        rel_err = max(rel_err, deep_err)
        value = float(np.sqrt(engine_rate * deep_rate))
        baseline_value = float(np.sqrt(engine_base * deep_base))
        deep_note = (
            f"deep N={DEEP_FRAMES} P={DEEP_ATOMS}: {deep_rate:.3e}"
        )

    print(
        json.dumps(
            {
                "metric": (
                    f"VACF+Helfand composite atom-frame-lags/s, geomean"
                    f" of engine rung (N={N_FRAMES}, P={N_ATOMS}, d=3,"
                    f" {DTYPE.name}: {engine_rate:.3e}) and deep rung"
                    f" ({deep_note}), "
                    f"backend={jax.default_backend()}, "
                    f"max_rel_err_vs_f64_host={rel_err:.2e}"
                ),
                "value": value,
                "unit": "atom-frame-lags/s",
                "vs_baseline": value / baseline_value,
            }
        )
    )


if __name__ == "__main__":
    main()
