"""Deep-chain wall vs packed width w: decompose the per-acf wall into
a fixed (per-chain) part F and a per-lane part c·w.

wall(N, w) = F(N) + c(N)·w   (fit over several chunk sizes)

Why it matters: the v5p-8 north-star projection divides 100k atoms
into auto_atom_chunk-sized chunks. A v5p chip has 95 GB HBM (vs 16 GB
on this v5e), so its chunks are ~6x wider — if F is a significant
fraction of the measured chunk wall, the projection must amortize F
over 6x more atoms per chunk, which the flat "1177 chunk-walls"
arithmetic misses.

Usage: python benchmarks/micro_deepw.py [--frames 1048576]
       [--chunks 5,21,42,85] [--reps 3]
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
from transport_analysis_tpu.ops import deep_acf as _da  # noqa: E402
from transport_analysis_tpu.ops.acf import next_pow_2  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1048576)
    ap.add_argument("--chunks", default="5,21,42,85")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    N = args.frames
    chunks = [int(c) for c in args.chunks.split(",")]
    m = 2 * next_pow_2(N)
    inner, outer = _da._split_m(m)

    key = jax.random.PRNGKey(0)
    rows = []
    for chunk in chunks:
        w = _da._deep_w(3 * chunk, outer)

        def synth(k):
            return 5.0 * jax.random.normal(
                k, (N, chunk, 3), jnp.float32
            ).astype(jnp.float64)

        synth = jax.jit(synth)

        def one(k):
            box = [synth(k)]
            np.asarray(jnp.sum(box[0]))  # fence synth out of the wall
            t0 = time.perf_counter()
            out = ops.acf.raw_autocorr_sumlast(box.pop())
            np.asarray(out[-1, -1])  # fence
            return time.perf_counter() - t0

        one(jax.random.fold_in(key, 10**6))  # warm/compile
        walls = [one(jax.random.fold_in(key, r))
                 for r in range(args.reps)]
        rows.append({"chunk": chunk, "w": w,
                     "wall_s": round(min(walls), 3),
                     "walls": [round(x, 3) for x in walls]})
        print(json.dumps(rows[-1]), flush=True)

    # least-squares F + c*w over the min walls
    ws = np.array([r["w"] for r in rows], float)
    ys = np.array([r["wall_s"] for r in rows], float)
    A = np.stack([np.ones_like(ws), ws], axis=1)
    (F, c), *_ = np.linalg.lstsq(A, ys, rcond=None)
    print(json.dumps({
        "metric": f"deep acf wall vs w (N={N}, M={m}, inner={inner}, "
                  f"outer={outer}, f64 exact)",
        "rows": rows,
        "fit": {"F_s": round(float(F), 3),
                "c_s_per_lane": round(float(c), 6),
                "c128_s": round(float(c) * 128, 3)},
    }))


if __name__ == "__main__":
    main()
