"""Bisect _twiddle_and_outer at the deep north-star shape.

Times, on the real chip, each sub-piece of the dominant deep stage
(inner=65536, outer=32, w=128 — the N=2^20 rung):
  a. full _twiddle_and_outer (pair in, f64 k-major out)
  b. complex_dft_matmul alone at the per-slab shape
  c. twiddle multiply + per-slab transpose alone (f64)
  d. the stacked-output moveaxis alone
  e. engine fft_banded_pair alone (reference point)
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from transport_analysis_tpu.ops import deep_acf as DA
from transport_analysis_tpu.ops import pallas_fft as PF
from transport_analysis_tpu.ops.ozaki import complex_dft_matmul

INNER, OUTER, W = 65536, 32, 128
B = OUTER * W
K1S = DA._K1_SLAB
NSLAB = INNER // K1S


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][:1, :1])


def timeit(label, fn, *args, n=3):
    fn(*args)  # compile
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:36s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def fresh_pair():
    k = jax.random.PRNGKey(0)
    return tuple(
        jax.random.normal(jax.random.fold_in(k, i), (INNER, B), jnp.float32)
        for i in range(4)
    )


t = DA._outer_tables(INNER, OUTER)

# a. full stage
timeit(
    "a. _twiddle_and_outer (full)",
    lambda: DA._twiddle_and_outer(
        *fresh_pair(), t["twc"], t["tws"], t["dc"], t["ds"],
        INNER, OUTER, W),
)

# b. complex_dft_matmul at the per-slab shape (32, 32) @ (32, K1S*W)
kk = jax.random.PRNGKey(1)
tr = jax.random.normal(kk, (OUTER, K1S * W), jnp.float64)
ti = jax.random.normal(jax.random.fold_in(kk, 1), (OUTER, K1S * W),
                       jnp.float64)
dft = jax.jit(lambda a, b: complex_dft_matmul(t["dc"], t["ds"], a, b))
dt_b = timeit("b. complex_dft_matmul (one slab)", dft, tr, ti)
print(f"   x{NSLAB} slabs -> {dt_b*NSLAB*1e3:.1f} ms/stage-equiv")

# c. twiddle + per-slab transpose only (f64 in, same map structure)
@jax.jit
def twiddle_only(re, im, twc, tws):
    re = re.reshape(NSLAB, K1S, OUTER, W)
    im = im.reshape(NSLAB, K1S, OUTER, W)
    twc = twc.reshape(NSLAB, K1S, OUTER, 1)
    tws = tws.reshape(NSLAB, K1S, OUTER, 1)

    def slab(args):
        r, i, tc, ts = args
        tr = r * tc - i * ts
        ti = r * ts + i * tc
        tr = jnp.moveaxis(tr, 1, 0).reshape(OUTER, K1S * W)
        ti = jnp.moveaxis(ti, 1, 0).reshape(OUTER, K1S * W)
        return tr.sum(), ti.sum()  # consume without GEMM

    return jax.lax.map(slab, (re, im, twc, tws))


re64 = jax.random.normal(kk, (INNER, B), jnp.float64)
im64 = jax.random.normal(jax.random.fold_in(kk, 2), (INNER, B),
                         jnp.float64)
timeit("c. twiddle+transpose (no GEMM)", twiddle_only, re64, im64,
       t["twc"], t["tws"])

# d. stacked-output moveaxis alone
zst = jax.random.normal(kk, (NSLAB, OUTER, K1S * W), jnp.float64)
mv = jax.jit(lambda z: jnp.moveaxis(z, 0, 1).reshape(OUTER * INNER, W))
timeit("d. output moveaxis (one array)", mv, zst)

# e. engine alone
def eng():
    return PF.fft_banded_pair(fresh_pair(), wt=DA._DEEP_WT)

timeit("e. fft_banded_pair (engine)", eng)
