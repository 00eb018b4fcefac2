"""Windowed-lag kernel face-off at a production shape (VERDICT r4
#8): the Pallas tile kernel vs the XLA fori_loop, float32 (the dtype
the dispatch routes to Pallas) and float64 (stays XLA by default).

Usage: python benchmarks/micro_lag.py [--frames 8192] [--atoms 512]
       [--max-lag 0 (=full)]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/transport_analysis_tpu_xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import transport_analysis_tpu  # noqa: E402,F401
from transport_analysis_tpu.ops import acf as ACF  # noqa: E402


def bench(tag, fn, x, n_lags, reps=5):
    out = fn(x)
    np.asarray(jnp.sum(out[:1, :1]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(x)
    np.asarray(jnp.sum(out[:1, :1]))
    wall = (time.perf_counter() - t0) / reps
    n, p, d = x.shape
    lags = sum(n - k for k in range(n_lags)) * p
    print(f"{tag:28s} {wall * 1e3:9.2f} ms  {lags / wall:.3e} lags/s",
          flush=True)
    return np.asarray(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8192)
    ap.add_argument("--atoms", type=int, default=512)
    ap.add_argument("--max-lag", type=int, default=0)
    args = ap.parse_args()
    n, p = args.frames, args.atoms
    n_lags = args.max_lag or n

    rng = np.random.RandomState(0)
    x64 = rng.normal(0, 5, (n, p, 3))

    from transport_analysis_tpu.ops.pallas_lag import (
        windowed_lag_pallas,
    )

    for dtype in (np.float32, np.float64):
        x = jnp.asarray(x64.astype(dtype))
        name = np.dtype(dtype).name
        a = bench(f"xla fori_loop   {name}",
                  lambda v: ACF._acf_windowed_impl(v, n_lags),
                  x, n_lags)
        if dtype == np.float64 and not os.environ.get(
            "TRANSPORT_ANALYSIS_TPU_PALLAS_LAG_F64"
        ):
            continue
        b = bench(f"pallas tile     {name}",
                  lambda v: windowed_lag_pallas(
                      v, max_lag=n_lags, mode="acf",
                      reduce_mode="sum"),
                  x, n_lags)
        rel = np.abs(a - b).max() / np.abs(a).max()
        print(f"   agreement: {rel:.2e}")


if __name__ == "__main__":
    main()
