"""Deep-chain regression gate: one N=2^17 rung on the live TPU.

Round 2's silent trace-gate regression (1.14e12 -> 3.2e11, CHANGELOG
0.6.0) was caught by hand because tpu_gate.sh only exercised the
N=8192 engine shape; ALL of the deep composition (ops/deep_acf.py) —
where every large-N result and most of the round's performance lives —
was un-gated. This script runs the full acf_fft dispatch at a deep
shape (N=131072 frames, P=16, f64: M=2^18 > the engine ceiling, so it
MUST take the deep path) and prints one JSON line with:

  * lags/s   — effective atom-frame-lags/s (N(N+1)/2 * P / wall)
  * rel_err  — vs the host float64 oracle
  * deep     — True iff the deep path actually dispatched (a dispatch
               regression to the matmul-FFT fails the gate even if it
               is numerically fine)

tpu_gate.sh asserts floors on all three.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/transport_analysis_tpu_xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import transport_analysis_tpu  # noqa: E402,F401
from transport_analysis_tpu import ops  # noqa: E402
from transport_analysis_tpu.ops import deep_acf  # noqa: E402
from transport_analysis_tpu.ops.acf import acf_fft_numpy  # noqa: E402

N, P = 131072, 16


def main():
    rng = np.random.default_rng(5)
    x = rng.normal(0, 5, (N, P, 3))

    # spy on the deep dispatch (the regression mode this gate exists
    # to catch is acf_fft silently routing elsewhere)
    hits = []
    real = deep_acf.raw_autocorr_deep

    def spy(*a, **k):
        hits.append(1)
        return real(*a, **k)

    deep_acf.raw_autocorr_deep = spy

    import jax.numpy as jnp

    xd = jnp.asarray(x)
    got = np.asarray(ops.acf_fft(xd))  # warm (compile)
    del xd
    # distinct buffers (memoization defence) via an EXACT pow2 scale:
    # acf(2x) = 4*acf(x) bit-for-bit in the input, so the comparison
    # measures the pipeline, not input rounding
    xd = jnp.asarray(x * 2.0)
    np.asarray(jnp.sum(xd))  # fence the feed out of the timed region
    t0 = time.perf_counter()
    got = np.asarray(ops.acf_fft(xd))  # readback fences
    wall = time.perf_counter() - t0

    ref = acf_fft_numpy(x)
    err = np.abs(got / 4.0 - ref) / np.abs(ref).max()
    # same metric split as tests/test_tpu_equivalence.py: the deepest
    # lags divide the raw correlation by (N - lag) -> 1, amplifying the
    # raw absolute error floor by ~N relative to the acf maximum (pure
    # f64 shows the same effect); head carries the 1e-11 contract
    rel_head = float(err[: len(err) // 2].max())
    rel_tail = float(err.max())

    lags = N * (N + 1) // 2 * P
    print(json.dumps({
        "metric": f"deep-chain gate rung (N={N}, P={P}, f64)",
        "lags_per_s": lags / wall,
        "wall_s": round(wall, 2),
        "rel_err": rel_head,
        "rel_err_tail": rel_tail,
        "deep": bool(hits),
    }))


if __name__ == "__main__":
    main()
