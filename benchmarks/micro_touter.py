"""Time the deep-chain stages at the north-star shape, on the chip.

Stages (inner=16384, outer=128, w=128 — the N=2^20 rung's balanced
split):
  a. _outer_level_pallas (fused twiddle + outer DFT, pair -> pair)
  b. _fwd_from_kernel_pair (corner turn to k-major — no longer in the
     production chain; kept as the DIT-vs-DIF comparison point)
  c. engine fft_banded_pair alone (reference point)

Historical note: the predecessor of stage (a) was an XLA f64 twiddle
pass + Ozaki banded GEMMs (`_twiddle_and_outer`), measured here at
~540 ms — ~40x its HBM-traffic model (band extraction passes, 56
small GEMMs, f32 partial round-trips). That measurement drove the
fused-kernel rewrite; see BENCH_NOTES "deep outer kernel".
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/transport_analysis_tpu_xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transport_analysis_tpu.ops import deep_acf as DA
from transport_analysis_tpu.ops import pallas_fft as PF

INNER, OUTER, W = 16384, 128, 128
B = OUTER * W


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][:1, :1])


@jax.jit
def _gen_pair(seed):
    k = jax.random.PRNGKey(seed)
    return tuple(
        jax.random.normal(jax.random.fold_in(k, i), (INNER, B), jnp.float32)
        for i in range(4)
    )


def timeit_big(label, fn, n=2, gen=_gen_pair):
    """Stage consumes (donates) fresh 4-GB inputs: fence + free per
    rep (queueing reps OOMs the chip), subtract the measured input
    generation cost, use a distinct seed per rep (memoization)."""
    out = fn(gen(jnp.int32(999)))  # compile
    fence(out)
    del out
    fence(gen(jnp.int32(998)))  # compile gen
    t0 = time.perf_counter()
    for r in range(n):
        fence(gen(jnp.int32(100 + r)))
    t_gen = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    for r in range(n):
        out = fn(gen(jnp.int32(r)))
        fence(out)
        del out
    dt = (time.perf_counter() - t0) / n - t_gen
    print(f"{label:36s} {dt*1e3:9.1f} ms  (gen {t_gen*1e3:.0f} ms)",
          flush=True)
    return dt


M, S = INNER * OUTER, 255  # chunk=85 x d=3 at the N=2^20 rung

n_bands, max_group = PF._profile(jnp.float64)
tables = DA._outer_kernel_tables(INNER, OUTER, n_bands)

# a. fused twiddle + outer DFT kernel
timeit_big(
    "a. _outer_level_pallas (fused)",
    lambda p: DA._outer_level_pallas(
        *p, *tables, inner=INNER, outer=OUTER, w=W,
        n_bands=n_bands, max_group=max_group),
)

# b. the corner turn (kernel layout -> k-major f32 pairs)
timeit_big(
    "b. _fwd_from_kernel_pair (corner turn)",
    lambda p: DA._fwd_from_kernel_pair(
        *p, inner=INNER, outer=OUTER, w=W),
)

# c. engine alone (donates its pair input)
timeit_big("c. fft_banded_pair (engine)",
           lambda p: PF.fft_banded_pair(p, wt=DA._deep_wt()))


# d. _prepare_pair ((M, s) f64 -> engine-layout pair)
# (sin-of-iota fill, not random.normal: the erf_inv chain's f32 temps
# at (M, 255) OOM the chip on top of the stage's own working set)
@jax.jit
def _gen_x(seed):
    r = jnp.arange(M, dtype=jnp.float64)[:, None]
    c = jnp.arange(S, dtype=jnp.float64)[None, :]
    return (jnp.sin(r * 1e-3 + c * (1.0 + seed * 1e-3)),)


timeit_big(
    "d. _prepare_pair",
    lambda p: DA._prepare_pair(*p, inner=INNER, outer=OUTER, w=W, s=S),
    gen=_gen_x,
)


# e. _unpack_to_pair_dif (kernel-layout spectra -> kernel-layout
# (p1 - i p2) pair, the DIF leg-2 operand — no corner turn)
@jax.jit
def _gen_z(seed):
    r = jnp.arange(INNER, dtype=jnp.float32)[:, None]
    c = jnp.arange(B, dtype=jnp.float32)[None, :]
    return (jnp.sin(r * 1e-3 + c * (1.0 + seed * 1e-3)),
            jnp.sin(r * 1.1e-3 + c) * 1e-9,
            jnp.cos(r * 2e-3 + c * (1.0 + seed * 1e-3)),
            jnp.cos(r * 2.1e-3 + c) * 1e-9)


timeit_big(
    "e. _unpack_to_pair_dif",
    lambda p: DA._unpack_to_pair_dif(
        *p, inner=INNER, outer=OUTER, w=W),
    gen=_gen_z,
)


# f. trimmed leg-2 engine + _inv_from_kernel_dif (DIF epilogue)
@jax.jit
def _gen_half(seed):
    rows = DA._dif_rows(INNER, OUTER, M // 2)
    k = jax.random.PRNGKey(seed)
    return tuple(
        jax.random.normal(
            jax.random.fold_in(k, i), (rows, B), jnp.float32)
        for i in range(4))


timeit_big(
    "f. _inv_from_kernel_dif",
    lambda p: DA._inv_from_kernel_dif(
        *p, inner=INNER, outer=OUTER, w=W, n_out=M // 2, s=S),
    gen=_gen_half,
)

# g. engine tile-width sweep: wt=128 means 16384 + 4096 grid steps of
# (128|512, 128) blocks at this shape — step overhead suspect
# (measured: 212/221 ms at wt=256/512 vs 218 at 128 — NEGATIVE, the
# engine is in-kernel compute-bound)
for wt in ():
    timeit_big(f"g. fft_banded_pair wt={wt}",
               lambda p, wt=wt: PF.fft_banded_pair(p, wt=wt))

# h. engine internals at the deep shape: the two banded levels and
# the two full-array scale reduces between them
N2 = INNER // 128
n_bands_e, max_group_e = PF._profile(jnp.float64)
consts_e = PF._device_constants(N2, 1, n_bands_e)


@jax.jit
def _gen_l1(seed):
    k = jax.random.PRNGKey(seed)
    return tuple(
        jax.random.normal(
            jax.random.fold_in(k, i), (128, N2 * B), jnp.float32)
        for i in range(4))


import functools

_nw = B // DA._deep_wt()


@jax.jit
def _scale_of(p0, p2):
    return PF._pow2_ceil_f32(jnp.maximum(
        jnp.max(jnp.abs(p0), axis=0, keepdims=True),
        jnp.max(jnp.abs(p2), axis=0, keepdims=True)))


timeit_big(
    "h. scale reduce (s_in)",
    lambda p: _scale_of(p[0], p[2]), gen=_gen_l1)


@functools.partial(jax.jit, donate_argnums=(2, 3, 4, 5))
def _l1(lre, lim, rh, rl, ih, il, s):
    return PF._banded_level(
        lre, lim, (rh, rl, ih, il), s, 128,
        True, _nw, transposed_out=True, n_bands=n_bands_e,
        max_group=max_group_e, wt=DA._deep_wt())[0]


@jax.jit
def _gen_l1s(seed):
    p = _gen_l1(seed)
    return p + (_scale_of(p[0], p[2]),)


timeit_big(
    "h. level 1 (per-step lhs, transposed out)",
    lambda p: _l1(consts_e["l1_re"], consts_e["l1_im"], *p),
    gen=_gen_l1s)


@functools.partial(jax.jit, donate_argnums=(2, 3, 4, 5))
def _l2(lre, lim, rh, rl, ih, il, s):
    return PF._banded_level(
        lre, lim, (rh, rl, ih, il), s, N2, False, _nw,
        n_bands=n_bands_e, max_group=max_group_e,
        wt=DA._deep_wt())[0]


@jax.jit
def _gen_l2s(seed):
    k = jax.random.PRNGKey(seed)
    p = tuple(
        jax.random.normal(
            jax.random.fold_in(k, i), (N2, 128 * B), jnp.float32)
        for i in range(4))
    return p + (_scale_of(p[0], p[2]),)


timeit_big(
    "h. level 2 (shared lhs)",
    lambda p: _l2(consts_e["l2_re"], consts_e["l2_im"], *p),
    gen=_gen_l2s)
