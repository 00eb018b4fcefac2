"""Fenced internals of ops/einstein._prefix_sum_blocked at the
north-star shape (N=2^20, P=85): moveaxis relayouts vs the ozaki
band extraction (prepare_rhs) vs the banded GEMMs vs the recursion.

Usage: python benchmarks/micro_prefix.py [--frames 1048576] [--p 85]
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
from transport_analysis_tpu.ops.ozaki import prepare_rhs  # noqa: E402
from transport_analysis_tpu.ops.einstein import (  # noqa: E402
    _tri_matmul_banded, _PREFIX_BLOCK,
)


def fence(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jnp.ravel(leaves[0])[-1:])


def timeit(label, fn, *args, n=3):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        fence(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1048576)
    ap.add_argument("--p", type=int, default=85)
    args = ap.parse_args()
    N, P = args.frames, args.p
    b = _PREFIX_BLOCK
    n_blocks = N // b

    key = jax.random.PRNGKey(0)
    sq = jax.random.uniform(key, (N, P), jnp.float64, 0.0, 30.0)
    fence(sq)

    @jax.jit
    def mk_blocks(x):
        return x.reshape(n_blocks, b, P)

    @jax.jit
    def mv(blocks):
        return jnp.moveaxis(blocks, 0, 1).reshape(b, n_blocks * P)

    @jax.jit
    def bands_of(wide):
        return prepare_rhs(wide)

    tri64 = jnp.tril(jnp.ones((b, b), jnp.float64))

    @jax.jit
    def tri_banded(wide):
        return _tri_matmul_banded(tri64, wide)

    @jax.jit
    def mv_back(flat):
        return jnp.moveaxis(flat.reshape(b, n_blocks, P), 1, 0)

    blocks = mk_blocks(sq)
    fence(blocks)
    wide = mv(blocks)
    fence(wide)
    intra_flat = tri_banded(wide)
    fence(intra_flat)

    walls = {}
    walls["moveaxis_fwd"] = timeit("mv", mv, blocks)
    walls["prepare_rhs_bands"] = timeit("bands", bands_of, wide)
    walls["tri_banded_total"] = timeit("tri", tri_banded, wide)
    walls["moveaxis_back"] = timeit("mvb", mv_back, intra_flat)
    walls["full_prefix"] = timeit(
        "full", jax.jit(ein._prefix_sum_blocked), sq)

    print(json.dumps({
        "metric": f"prefix-sum internals (N={N}, P={P}, f64)",
        "stages_s": {k: round(v, 4) for k, v in walls.items()},
    }))


if __name__ == "__main__":
    main()
