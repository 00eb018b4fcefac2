"""Per-config benchmarks for the five BASELINE.json configurations.

Prints one JSON line per config (readback-fenced walls, distinct
inputs per rep — see BENCH_NOTES.md "Measurement integrity").
Config #5 (streaming at scale) lives in benchmarks/northstar.py;
here it runs at a reduced smoke size.

Usage: python benchmarks/configs.py [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/transport_analysis_tpu_xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import transport_analysis_tpu  # noqa: E402,F401
from transport_analysis_tpu import ops  # noqa: E402


def fenced(fn, *args, reps=4):
    """Scan-fenced wall per rep (distinct inputs, one readback)."""
    def loop(*a):
        def body(c, i):
            s = 1.0 + 1e-9 * i.astype(jnp.float64)
            out = fn(*(x * s for x in a))
            return c + jnp.sum(out[..., -1].astype(jnp.float64)), None
        t, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(reps))
        return t

    f = jax.jit(loop)
    total = float(f(*args))
    assert np.isfinite(total)
    t0 = time.perf_counter()
    float(f(*args))
    return (time.perf_counter() - t0) / reps


def lags_full(n, p):
    return n * (n + 1) // 2 * p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    results = []

    # 1: windowed (exact) VACF — O(N²·P·d) on device
    n, p = (1024, 64) if args.quick else (4096, 128)
    vel = jnp.asarray(rng.normal(0, 5, (n, p, 3)))
    w = fenced(lambda v: ops.acf_windowed(v), vel, reps=2)
    results.append({
        "config": f"1 VACF windowed exact (N={n}, P={p}, f64)",
        "value": lags_full(n, p) / w, "unit": "atom-frame-lags/s",
        "wall_s": round(w, 3),
    })

    # 2: FFT VACF + Green–Kubo D
    n, p = (2048, 128) if args.quick else (8192, 512)
    vel = jnp.asarray(rng.normal(0, 5, (n, p, 3)))
    times = jnp.arange(n, dtype=jnp.float64) * 0.002

    def vacf_gk(v):
        ts = ops.acf_fft(v).mean(axis=1)
        return ts + ops.trapezoid(ts, times) / 3.0

    w = fenced(vacf_gk, vel)
    results.append({
        "config": f"2 VACF FFT + GK diffusivity (N={n}, P={p}, f64)",
        "value": lags_full(n, p) / w, "unit": "atom-frame-lags/s",
        "wall_s": round(w, 3),
    })

    # 3: Helfand viscosity accumulators
    pos = jnp.asarray(
        np.cumsum(np.asarray(vel), axis=0) * 0.002
        + rng.uniform(0, 20, (1, p, 3))
    )
    masses = jnp.asarray(rng.uniform(1, 16, p))

    def helfand(v, x):
        accum = masses[None, :, None] * v * x
        return ops.einstein_difference_fft(accum, "mean").mean(axis=1)

    w = fenced(helfand, vel, pos)
    results.append({
        "config": f"3 Helfand viscosity function (N={n}, P={p}, f64)",
        "value": lags_full(n, p) / w, "unit": "atom-frame-lags/s",
        "wall_s": round(w, 3),
    })

    # 4: Einstein MSD via FFT
    w = fenced(lambda x: ops.msd_fft(x).mean(axis=1), pos)
    results.append({
        "config": f"4 Einstein MSD FFT (N={n}, P={p}, f64)",
        "value": lags_full(n, p) / w, "unit": "atom-frame-lags/s",
        "wall_s": round(w, 3),
    })

    # 5: streaming smoke (full run: benchmarks/northstar.py)
    results.append({
        "config": "5 streaming 100k-atom scale",
        "see": "benchmarks/northstar.py (1.63e12 lags/s sustained, "
               "66.1 s for 100,352 atoms x 32,768 frames at the "
               "recalibrated auto chunk=1024; the 2^20-frame rungs "
               "run 3.6e13 lags/s)",
    })

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
