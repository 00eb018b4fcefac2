"""Per-stage roofline of the deep autocorrelation chain at the
north-star chunk shape (VERDICT r3 #2: replace the two-global-ratio
v5p projection with a per-stage classification).

For each stage of the deep chain (prepare / engine fwd / outer fwd /
unpack / outer dif / engine inv / epilogue) plus the Helfand extras
(center+sq, Kneller assembly):

* measured wall (min over reps, fence RTT subtracted — the tunneled
  runtime needs a 1-element readback to fence, ~70 ms RTT),
* analytic HBM traffic from the stage's array shapes,
* achieved GB/s vs the chip's peak -> traffic-bound or not.

Band-profile sensitivity (--profiles): re-run at fft_precision
exact/high/medium. Stage flops scale with the band count while
traffic stays constant, so the wall's slope against n_bands measures
each stage's compute-bound fraction directly — no trusting a flop
model. Tile-width sensitivity (--wt): vary the engine grid tile to
expose per-grid-step overheads.

Usage:
  python benchmarks/roofline.py [--frames 1048576] [--chunk 85]
      [--reps 3] [--profiles] [--wt 128,256]
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
from transport_analysis_tpu.ops import deep_acf as da  # noqa: E402
from transport_analysis_tpu.ops import einstein as ein  # noqa: E402
from transport_analysis_tpu.ops import pallas_fft as pf  # noqa: E402

V5E_HBM_GBS = 819.0
V5P_HBM_GBS = 2765.0
V5E_BF16_TFLOPS = 197.0
V5P_BF16_TFLOPS = 459.0


def fence(arrs):
    # reduction fence: ravel[-1:] compiles a device copy of the whole
    # array (OOMs next to the 4-plane stage sets); a sum reads it once
    if not isinstance(arrs, (tuple, list)):
        arrs = (arrs,)
    np.asarray(jnp.sum(arrs[0]))


def fence_rtt():
    z = jnp.zeros((8, 128), jnp.float32)
    fence(z)
    t0 = time.perf_counter()
    for _ in range(5):
        fence(z)
    return (time.perf_counter() - t0) / 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1048576)
    ap.add_argument("--chunk", type=int, default=85)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--profiles", action="store_true")
    ap.add_argument("--wt", default="128")
    args = ap.parse_args()

    n = args.frames
    s = 3 * args.chunk
    m = 2 * n
    inner, outer = da._split_m(m)
    w = da._deep_w(s, outer)
    b = w * outer
    rtt = fence_rtt()

    plane = inner * b * 4.0  # one f32 stage plane, bytes
    src = n * s * 8.0
    sq_b = n * args.chunk * 8.0

    # analytic HBM traffic per stage (bytes: reads + writes)
    rows_inv = da._dif_rows(inner, outer, n)
    traffic = {
        "prepare": src + 4 * plane,
        "engine_fwd": 2 * (4 * plane + 4 * plane),  # 2 levels, r+w
        "outer_fwd": 4 * plane + 4 * plane,
        "unpack": 4 * plane + 4 * plane,
        "outer_dif": 4 * plane + 4 * plane,
        "engine_inv": (4 * plane + 4 * plane)
        + (4 * plane + 4 * plane * rows_inv / inner),
        "epilogue": 4 * plane * rows_inv / inner + n * s / 3 * 8.0,
        "center_sq": 2 * src + src + sq_b,
        "assembly": 5 * sq_b,  # pallas kneller: split+2 passes+finish
    }

    def chain_once(xbox, wt, prof):
        x = xbox.pop()
        fence(x)
        n_bands, max_group = prof
        walls = {}
        tables = da._outer_kernel_tables(inner, outer, n_bands)

        def stage(name, fn):
            t0 = time.perf_counter()
            out = fn()
            fence(out)
            walls[name] = time.perf_counter() - t0 - rtt
            return out

        # consume discipline: the f64 source must not survive the
        # prepare stage (a held 2.1 GB source OOMs engine_inv)
        box = [x]
        del x
        pair = stage("prepare", lambda: da._prepare_pair(
            box.pop(), inner, outer, w, s))
        pair = stage("engine_fwd",
                     lambda: pf.fft_banded_pair(pair, wt=wt))
        pair = stage("outer_fwd", lambda: da._outer_level_pallas(
            *pair, *tables, inner=inner, outer=outer, w=w,
            n_bands=n_bands, max_group=max_group))
        pair = stage("unpack", lambda: da._unpack_dispatch(
            *pair, inner, outer, w))
        pair = stage("outer_dif", lambda: da._outer_level_pallas(
            *pair, *tables, inner=inner, outer=outer, w=w,
            n_bands=n_bands, max_group=max_group, dif=True))
        pair = stage("engine_inv", lambda: pf.fft_banded_pair(
            pair, wt=wt, l2_rows=rows_inv // 128))
        pair = tuple(a[:rows_inv] for a in pair)
        out = stage("epilogue", lambda: da._inv_from_kernel_dif(
            *pair, inner=inner, outer=outer, w=w, n_out=n,
            s=s, sum_d=3))
        return walls, out

    def synth(seed):
        key = jax.random.PRNGKey(seed)
        v = 5.0 * jax.random.normal(key, (n, s), jnp.float32)
        return v.astype(jnp.float64)

    results = {}
    wts = [int(x) for x in args.wt.split(",")]
    profiles = [("exact", None)]
    if args.profiles:
        profiles += [("high", "high"), ("medium", "medium")]

    for pname, pgrade in profiles:
        ctx = ops.fft_precision(pgrade) if pgrade else None
        if ctx:
            ctx.__enter__()
        prof = pf._profile(jnp.float64)
        for wt in wts:
            tag = f"{pname}/wt={wt}"
            best = {}
            for r in range(args.reps):
                walls, _ = chain_once([synth(r)], wt, prof)
                for k, v in walls.items():
                    best[k] = min(best.get(k, 1e9), v)
            # helfand extras (profile-independent; min over reps with
            # a warm-up call — the first call at a shape compiles,
            # which inflated these walls ~10-40x in early runs)
            for r in range(args.reps + 1):
                accv = synth(100)
                acc = accv.reshape(n, args.chunk, 3)
                fence(acc)
                t0 = time.perf_counter()
                flat, sq = ein._center_and_sq_flat(acc, 3)
                fence(sq)
                wall = time.perf_counter() - t0 - rtt
                if r:
                    best["center_sq"] = min(
                        best.get("center_sq", 1e9), wall)
                del flat, acc, accv
                corr = jax.random.uniform(
                    jax.random.PRNGKey(5), (n, args.chunk),
                    jnp.float64)
                fence(corr)
                t0 = time.perf_counter()
                out = ein._assembly(sq, "mean", 3, corr)
                fence(out)
                wall = time.perf_counter() - t0 - rtt
                if r:
                    best["assembly"] = min(
                        best.get("assembly", 1e9), wall)
                del out, sq, corr
            results[tag] = {k: round(v, 4) for k, v in best.items()}
        if ctx:
            ctx.__exit__(None, None, None)

    # classification table for the exact/wt=wts[0] reference column
    ref = results[f"exact/wt={wts[0]}"]
    table = {}
    for k, wall in ref.items():
        # min-over-reps walls carry the fence RTT subtracted, so a
        # stage faster than the RTT jitter can come out <= 0: clamp to
        # a small positive floor so achieved GB/s stays meaningful
        # (round-4 advisor finding)
        wall = max(wall, 1e-6)
        gb = traffic.get(k, 0) / 1e9
        gbs = gb / wall
        frac = min(1.0, gbs / V5E_HBM_GBS)
        table[k] = {
            "wall_s": wall,
            "traffic_gb": round(gb, 2),
            "achieved_gbs": round(gbs, 1),
            "hbm_frac": round(frac, 2),
        }

    print(json.dumps({
        "metric": (
            f"deep-chain per-stage roofline (N={n}, chunk={args.chunk}"
            f", inner={inner}, outer={outer}, w={w})"),
        "fence_rtt_s": round(rtt, 4),
        "walls": results,
        "classify": table,
    }, indent=1))


if __name__ == "__main__":
    main()
