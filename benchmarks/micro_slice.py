"""VPU microbench: band-slicing strategies for the banded engine.

The round-7 engine-level attribution (BENCH_NOTES) pinned the
profile-flat 0.125 s/call base of `fft_banded_pair` on the serial
band-slicing loops: ~28 f32->int8 convert passes per level at ~1 ms
each. This probe times one full pass over a north-star-level plane
((K, W_TILE) grid tiles, same shape as a level kernel) for each
slicing strategy:

  copy       pure streaming copy (the HBM-rate floor)
  serial     the historical 7-step rint-peel + 7 f32->int8 converts
  superband  3 f32->int32 roundings + integer shift/mask splits
             (the round-4 verdict's proposed kernel)

Usage: python benchmarks/micro_slice.py [--rows 16384] [--cols 21504]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/transport_analysis_tpu_xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import transport_analysis_tpu  # noqa: E402,F401
from transport_analysis_tpu.ops import pallas_fft as pf  # noqa: E402

_DELTA = 7
_HI = 3
_NB = 7


def _kernel_copy(h_ref, l_ref, o_ref, scratch):
    o_ref[:] = h_ref[:] + l_ref[:]


def _slice_serial(ref, base, step, hi, lo, n_bands):
    k = hi.shape[0]
    r = hi
    for q in range(n_bands):
        if q == _HI:
            r = r + lo
        s = np.float32(2.0 ** (_DELTA * (q + 1) - 1))
        g = np.float32(2.0 ** -(_DELTA * (q + 1) - 1))
        mq = jnp.rint(r * s)
        ref[base + q * step: base + q * step + k] = mq.astype(jnp.int8)
        r = r - mq * g


def _slice_superband(ref, base, step, hi, lo, n_bands):
    k = hi.shape[0]
    r = hi
    q = 0
    while q < n_bands:
        if q == _HI:
            r = r + lo
        nb = min(3, n_bands - q)
        if q < _HI:
            nb = min(nb, _HI - q)
        s = np.float32(2.0 ** (_DELTA * (q + nb) - 1))
        g = np.float32(2.0 ** -(_DELTA * (q + nb) - 1))
        v = jnp.rint(r * s)
        if q + nb < n_bands:
            r = r - v * g
        vi = v.astype(jnp.int32)
        for j in range(nb):
            sh = _DELTA * (nb - 1 - j)
            if sh:
                m = (vi + np.int32(1 << (sh - 1))) >> np.int32(sh)
                vi = vi - (m << np.int32(sh))
            else:
                m = vi
            ref[base + (q + j) * step: base + (q + j) * step + k] = (
                m.astype(jnp.int8))
        q += nb


def _kernel_slice(slicer, h_ref, l_ref, o_ref, scratch):
    k = h_ref.shape[0]
    slicer(scratch, 0, k, h_ref[:], l_ref[:], _NB)
    # touch the scratch so the slicing cannot be DCE'd; output one row
    o_ref[:] = h_ref[:] + scratch[:k].astype(jnp.float32) * 1e-30


def run(name, body, rows, cols, wt, reps, block_rows=None):
    br = block_rows or rows
    spec = pl.BlockSpec((br, wt), lambda r, t: (r, t),
                        memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        body,
        grid=(rows // br, cols // wt),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((br * _NB, wt), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=pf._interpret(),
    )
    fn = jax.jit(fn)
    key = jax.random.PRNGKey(0)
    h = jax.random.uniform(key, (rows, cols), jnp.float32, -1, 1)
    lo = h * np.float32(2.0 ** -25)
    out = fn(h, lo)
    np.asarray(jnp.sum(out))  # warm + fence
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(h, lo)
    np.asarray(jnp.sum(out))
    wall = (time.perf_counter() - t0) / reps
    gb = rows * cols * 4 * 2 / 1e9
    print(f"{name:10s} {wall * 1e3:8.2f} ms   {gb / wall:7.1f} GB/s")
    return wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16384)
    ap.add_argument("--cols", type=int, default=128 * 168)
    ap.add_argument("--wt", type=int, default=128)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    print(f"plane ({args.rows}, {args.cols}), wt={args.wt}, "
          f"{args.rows * args.cols * 4 / 1e9:.2f} GB/plane")
    for br in (args.rows, 512, 128):
        print(f"-- block rows {br} "
              f"({args.rows // br * (args.cols // args.wt)} grid steps)")
        run("copy", _kernel_copy, args.rows, args.cols, args.wt,
            args.reps, br)
        run("serial", functools.partial(_kernel_slice, _slice_serial),
            args.rows, args.cols, args.wt, args.reps, br)
        run("superband",
            functools.partial(_kernel_slice, _slice_superband),
            args.rows, args.cols, args.wt, args.reps, br)

    # correctness: decomposition must reconstruct the pair to the
    # band-truncation budget
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (256, 256)).astype(np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)

    def host_superband(hi, lo):
        bands = []
        r = hi.astype(np.float64)  # host check in f64 (exact ops)
        q = 0
        while q < _NB:
            if q == _HI:
                r = r + lo
            nb = min(3, _NB - q)
            if q < _HI:
                nb = min(nb, _HI - q)
            s = 2.0 ** (_DELTA * (q + nb) - 1)
            v = np.rint(r * s)
            r = r - v / s
            vi = v.astype(np.int64)
            for j in range(nb):
                sh = _DELTA * (nb - 1 - j)
                if sh:
                    m = (vi + (1 << (sh - 1))) >> sh
                    vi = vi - (m << sh)
                else:
                    m = vi
                bands.append(m)
            q += nb
        return bands

    bands = host_superband(hi, lo)
    rec = sum(
        b.astype(np.float64) * 2.0 ** -(_DELTA * (q + 1) - 1)
        for q, b in enumerate(bands)
    )
    err = np.abs(rec - (hi.astype(np.float64) + lo)).max()
    mx = max(np.abs(b).max() for b in bands)
    print(f"reconstruction err {err:.3e} (budget ~2^-45={2.0**-45:.1e})"
          f", max |band| {mx} (int8 budget 68)")


if __name__ == "__main__":
    main()
