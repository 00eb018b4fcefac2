"""Fenced breakdown of the Kneller/Calandrini Einstein assembly at a
north-star shape: where do _einstein_fft_impl's ~0.2 s/chunk go —
the MXU blocked prefix sum (and inside it, the band extraction /
relayouts) or the combine algebra (flip/concat/subtract/divide)?

Usage: python benchmarks/micro_kneller.py [--frames 1048576] [--p 85]
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
from transport_analysis_tpu.ops import einstein as ein  # noqa: E402


def fence(x):
    np.asarray(jnp.ravel(x)[-1:])


@jax.jit
def _prefix_only(sq):
    return ein._prefix_sum_blocked(sq)


@jax.jit
def _combine_only(css, corr, d=3):
    N, P = css.shape
    total = css[-1]
    lags = jnp.arange(N)
    s_head = jnp.flip(css, axis=0)
    css_prev = jnp.concatenate(
        [jnp.zeros((1, P), css.dtype), css[:-1]], axis=0
    )
    s_tail = total[None, :] - css_prev
    raw = s_head + s_tail - 2.0 * corr
    denom = (N - lags).astype(css.dtype)[:, None]
    out = raw / denom / d
    return out.at[0].set(0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1048576)
    ap.add_argument("--p", type=int, default=85)
    args = ap.parse_args()
    N, P = args.frames, args.p

    key = jax.random.PRNGKey(0)
    sq = jax.random.uniform(key, (N, P), jnp.float64, 0.0, 30.0)
    corr = jax.random.uniform(key, (N, P), jnp.float64, -5.0, 5.0)
    fence(sq)
    fence(corr)

    walls = {}
    # warm
    fence(_prefix_only(sq))
    fence(_combine_only(sq, corr))
    fence(ein._einstein_fft_impl(sq, "mean", 3, corr))

    t0 = time.perf_counter()
    css = _prefix_only(sq)
    fence(css)
    walls["prefix_sum_blocked"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = _combine_only(css, corr)
    fence(out)
    walls["combine"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    full = ein._einstein_fft_impl(sq, "mean", 3, corr)
    fence(full)
    walls["full_impl"] = time.perf_counter() - t0

    print(json.dumps({
        "metric": f"kneller assembly breakdown (N={N}, P={P}, f64)",
        "stages_s": {k: round(v, 4) for k, v in walls.items()},
    }))


if __name__ == "__main__":
    main()
