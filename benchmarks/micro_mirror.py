"""Hermitian-mirror materialization: XLA two-axis rev vs an MXU
permutation-matmul Pallas kernel.

The unpack's mirror operand R[k] = Z[(inner-k) mod inner] with the j2
lane map k2 -> outer-1-k2 (row 0: (outer-k2) mod outer) is the #1
remaining stage cost (~0.08 s/chunk, 2 calls x 4 planes at the XLA
rev's ~107 GB/s — BENCH_NOTES round-8 speed-of-light table). The
recorded in-kernel alternatives (sublane shuffles 21 GB/s, slice+
concat) predate this probe, which tries the one scheme not yet
measured: permutation MATMULS on the MXU —

  * block-order row reversal rides the BlockSpec index_map (free),
  * the within-block row flip is J_ll @ X (ll x ll anti-identity),
  * the lane-group mirror is X @ J_outer per 128-lane register,
  * the off-by-one (inner-k, not inner-1-k) comes from a second
    8-row input spec offset one block, whose row 0 is prepended,
  * row 0's roll map is a second lane matrix J0, selected at o == 0.

A 0/1 permutation matmul is BIT-EXACT in f32 (each output element is
0·a + ... + 1·x + ... = x), so the kernel must match the XLA rev
bitwise — asserted here.

Usage: python benchmarks/micro_mirror.py [--inner 16384]
           [--outer 128] [--w 128] [--ll 128] [--reps 10]
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
from transport_analysis_tpu.ops import deep_acf as da  # noqa: E402


# --- reference: the production XLA rev (_unpack_rev_planes_half) ----
@functools.partial(
    jax.jit, static_argnames=("inner", "outer", "w", "need"))
def xla_rev(z, inner, outer, w, need):
    tail = z[inner - need + 1:].reshape(need - 1, w, outer)
    tail = jnp.flip(tail, axis=(0, 2)).reshape(need - 1, -1)
    r0 = da._mirror_lanes_row0(z[:1], w, outer)
    return jnp.concatenate([r0, tail], axis=0)


# --- MXU permutation-matmul kernel ---------------------------------
def _mirror_kernel(a_ref, b_ref, jll_ref, jout_ref, j0_ref, o_ref):
    o = pl.program_id(0)
    ll, cols = a_ref.shape
    outer = jout_ref.shape[0]
    w = cols // outer
    a = a_ref[:]
    # within-block row flip on the MXU: flipped[r] = a[ll-1-r]
    flipped = jnp.dot(jll_ref[:], a,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    # prepend the one-row block offset: out[r] = Z[inner - o*ll - r]
    shifted = jnp.concatenate([b_ref[0:1], flipped[:-1]], axis=0)
    # lane-group mirror per 128-lane register: X @ J_outer
    lanes = shifted.reshape(ll * w, outer)
    m = jnp.dot(lanes, jout_ref[:],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    m = m.reshape(ll, cols)
    # row 0 of block 0 is k1 = 0: its lane map is the roll matrix J0
    r0 = jnp.dot(b_ref[0:1].reshape(w, outer), j0_ref[:],
                 preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST).reshape(1, cols)
    row0 = jnp.where(o == 0, r0, m[0:1])
    o_ref[:] = jnp.concatenate([row0, m[1:]], axis=0)


@functools.partial(
    jax.jit, static_argnames=("inner", "outer", "w", "need", "ll"))
def pallas_mirror(z, inner, outer, w, need, ll):
    cols = w * outer
    g_in = inner // ll
    g8 = inner // 8
    jll = jnp.asarray(np.eye(ll)[::-1].copy(), jnp.float32)
    jout = jnp.asarray(np.eye(outer)[::-1].copy(), jnp.float32)
    j0 = jnp.asarray(np.eye(outer)[
        (outer - np.arange(outer)) % outer].T.copy(), jnp.float32)
    a_spec = pl.BlockSpec((ll, cols), lambda o: (jnp.int32(g_in - 1) - o, jnp.int32(0)),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec(
        (8, cols),
        # (g8 - o·ll/8) mod g8, written without a tracer `%` and in
        # strict int32 (an i64 literal under x64 sends Mosaic's
        # convert_element_type scalar lowering into recursion)
        lambda o: (
            jnp.where(
                o == 0,
                jnp.int32(0),
                jnp.int32(g8) - o * jnp.int32(ll // 8),
            ),
            jnp.int32(0),
        ),
        memory_space=pltpu.VMEM,
    )
    const = lambda o: (jnp.int32(0), jnp.int32(0))  # noqa: E731
    return pl.pallas_call(
        _mirror_kernel,
        grid=(need // ll,),
        in_specs=[
            a_spec, b_spec,
            pl.BlockSpec((ll, ll), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((outer, outer), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((outer, outer), const,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ll, cols), lambda o: (o, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((need, cols), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=pf._interpret(),
    )(z, z, jll, jout, j0)


def bench(name, fn, z, reps, gb):
    out = fn(z)
    np.asarray(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(z)
    np.asarray(jnp.sum(out))
    wall = (time.perf_counter() - t0) / reps
    print(f"{name:16s} {wall * 1e3:8.2f} ms   {gb / wall:7.1f} GB/s")
    return wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=int, default=16384)
    ap.add_argument("--outer", type=int, default=128)
    ap.add_argument("--w", type=int, default=128)
    ap.add_argument("--ll", type=int, default=128)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    inner, outer, w = args.inner, args.outer, args.w
    need = inner // 2
    cols = w * outer
    print(f"plane ({inner}, {cols}) f32, need={need}, ll={args.ll}, "
          f"backend={jax.default_backend()}")

    key = jax.random.PRNGKey(0)
    z = jax.random.uniform(key, (inner, cols), jnp.float32, -1, 1)

    ref = np.asarray(xla_rev(z, inner, outer, w, need))
    got = np.asarray(pallas_mirror(z, inner, outer, w, need, args.ll))
    if np.array_equal(ref, got):
        print("bit-exact: OK")
    else:
        bad = np.argwhere(ref != got)
        print(f"MISMATCH at {len(bad)} positions, first {bad[:4]}")
        return

    # effective traffic: read the mirrored half + write it
    gb = 2 * need * cols * 4 / 1e9
    bench("xla_rev", lambda x: xla_rev(x, inner, outer, w, need),
          z, args.reps, gb)
    for ll in (64, 128, 256):
        if need % ll == 0 and inner % ll == 0:
            bench(f"pallas_jdot ll={ll}",
                  lambda x, ll=ll: pallas_mirror(
                      x, inner, outer, w, need, ll),
                  z, args.reps, gb)


if __name__ == "__main__":
    main()
