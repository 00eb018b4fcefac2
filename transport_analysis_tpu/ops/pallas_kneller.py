"""Fused Pallas Kneller/Calandrini window-sum assembly.

The Einstein-difference assembly (ops/einstein.py `_einstein_fft_impl`)
combines prefix sums of the per-frame squares with the raw
autocorrelation:

    out[lag] = (css[N-1-lag] + total - css[lag-1] - 2*corr[lag]) / denom

The XLA formulation materializes the full inclusive prefix array css,
flips it, shifts it, and runs the combine as separate emulated-float64
passes — hardware-measured 154-185 ms per north-star chunk (N=2^20,
P=85; `benchmarks/micro_kneller.py`, `northstar.py --substages`)
against an HBM speed of light of ~15 ms: TPU emulated-f64 elementwise
chains don't fuse across the reverse / concatenate relayouts, so css
makes several HBM round trips.

This module computes the window sums with the flip-free identity

    w[lag] = css[N-1-lag] + total - css[lag-1]
           = 2*total - cssR[lag-1] - css[lag-1]

(cssR = prefix sums of the row-REVERSED squares: cssR[lag-1] =
total - css[N-1-lag]), which turns both legs into the SAME forward
exclusive prefix — one over sq, one over a pre-reversed copy — so the
kernel needs no reversal at all (Mosaic has no `rev` lowering, and an
MXU permutation-matmul flip costs O(block²) — hardware-measured far
too slow). All arithmetic runs in compensated float32 (hi, lo) pairs,
the grade of ops/einstein's `_prefix_sum_pairscan` (every f32 TwoSum
error-free; only lo-plane folds round, ~2^-48 relative per level):

* prologue (XLA, one fused pass each): split sq to lane-padded f32
  pairs; materialize the row-reversed copy.
* pass A (Pallas): per 512-row block of sq, a pairwise-tree
  compensated sum -> block totals (nb, L). A tiny XLA pass builds
  base[i] = 2*total - offs[i] - offsR[i] per block (f64, nb*L
  elements; offsR derives from the flipped totals).
* pass B (Pallas): output block i reads sq block i and reversed
  block i, rebuilds both local exclusive prefixes with log2(512)
  Hillis–Steele compensated shifts in VMEM, and emits
  base[i] - e_fwd - e_rev as the window-sum pair. css never
  materializes in HBM.

The caller-side epilogue `_finish` is one fused XLA f64 pass:
out = (w - 2*corr) * inv, pinned at lag 0 — reading each operand once.

Total traffic ~7 passes over (N, P)-sized arrays vs the XLA path's
effective ~20+ (hardware numbers in BENCH_NOTES round 7).

Shape contract: N % 512 == 0 and N >= 1024 (production deep shapes are
powers of two >= 2^17; everything else keeps the XLA path). Lanes pad
to 128 inside the pair-split prologue.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ozaki import _two_sum_f32
from .pallas_fft import _interpret, _split_pair

_Z0 = np.int32(0)
_BS = 512  # rows per block (pow2; 9 Hillis-Steele steps)


def supported(n: int) -> bool:
    """Shape gate for the fused assembly (backend gate is the caller's:
    ops/einstein dispatches here only on TPU backends)."""
    return n >= 2 * _BS and n % _BS == 0


def _hs_prefix(hi, lo):
    """In-VMEM inclusive prefix sum down axis 0 of a (bs, L) pair via
    Hillis–Steele compensated shifts (log2(bs) steps)."""
    bs = hi.shape[0]
    k = 1
    while k < bs:
        sh = jnp.pad(hi[:-k], ((k, 0), (0, 0)))
        sl = jnp.pad(lo[:-k], ((k, 0), (0, 0)))
        s, e = _two_sum_f32(hi, sh)
        hi, lo = s, lo + sl + e
        k *= 2
    return hi, lo


def _totals_kernel(sq_h_ref, sq_l_ref, th_ref, tl_ref):
    """Pass A: compensated pairwise (tree) sum of a (bs, L) block's
    rows -> one row of the (nb, L) totals arrays (VMEM-resident
    outputs, dynamic row store)."""
    i = pl.program_id(0)
    hi = sq_h_ref[:]
    lo = sq_l_ref[:]
    bs = hi.shape[0]
    while bs > 1:
        half = bs // 2
        s, e = _two_sum_f32(hi[:half], hi[half:])
        hi = s
        lo = lo[:half] + lo[half:] + e
        bs = half
    th_ref[pl.ds(i, 1), :] = hi
    tl_ref[pl.ds(i, 1), :] = lo


def _windows_kernel(sq_h_ref, sq_l_ref, rv_h_ref, rv_l_ref,
                    base_h_ref, base_l_ref, wh_ref, wl_ref):
    """Pass B: w[lag] = base[i] - e_fwd[lag] - e_rev[lag] for one
    output block, in compensated f32 pairs. e_fwd/e_rev are the local
    EXCLUSIVE prefixes of sq block i and reversed-sq block i; base is
    the FULL (nb, L) per-block array 2*total - offs - offsR
    (VMEM-resident; row i picked with a dynamic slice)."""
    i = pl.program_id(0)
    bh = base_h_ref[pl.ds(i, 1), :]
    bl = base_l_ref[pl.ds(i, 1), :]

    fh, fl = _hs_prefix(sq_h_ref[:], sq_l_ref[:])
    eh = jnp.pad(fh[:-1], ((1, 0), (0, 0)))
    el = jnp.pad(fl[:-1], ((1, 0), (0, 0)))
    rh, rl = _hs_prefix(rv_h_ref[:], rv_l_ref[:])
    reh = jnp.pad(rh[:-1], ((1, 0), (0, 0)))
    rel = jnp.pad(rl[:-1], ((1, 0), (0, 0)))

    s, e = _two_sum_f32(bh, -eh)
    c_l = bl - el + e
    s, e2 = _two_sum_f32(s, -reh)
    wh_ref[:] = s
    wl_ref[:] = c_l - rel + e2


@functools.partial(jax.jit, static_argnames=("n", "p"))
def _split_pad(sq, n: int, p: int):
    """(N, P) f64 -> lane-padded (N, L) f32 pair plus its row-reversed
    copy (the flip-free reverse leg's operand)."""
    ll = -(-p // 128) * 128
    hi, lo = _split_pair(sq)
    if ll != p:
        hi = jnp.pad(hi, ((0, 0), (0, ll - p)))
        lo = jnp.pad(lo, ((0, 0), (0, ll - p)))
    return hi, lo, jnp.flip(hi, axis=0), jnp.flip(lo, axis=0)


@functools.partial(jax.jit, static_argnames=("nb",))
def _base_rows(th, tl, nb: int):
    """Block totals pair (nb, L) -> per-block combine base
    base[i] = 2*total - offs[i] - offsR[i], as f32 pairs. Tiny
    (nb*L elements): runs through the f64 blocked prefix sum."""
    from .einstein import _prefix_sum_blocked

    t64 = th.astype(jnp.float64) + tl.astype(jnp.float64)
    csum = _prefix_sum_blocked(t64)
    offs = csum - t64  # exclusive, forward blocks
    total = csum[-1]
    # reversed-array block j holds sq rows of block nb-1-j: its
    # exclusive offset is the forward SUFFIX sum past that block
    offs_r = total[None, :] - jnp.flip(csum, axis=0)
    base = 2.0 * total[None, :] - offs - offs_r
    return _split_pair(base)


@functools.partial(jax.jit, static_argnames=("n", "p"))
def window_sums(sq, n: int, p: int):
    """(N, P) float64 squares -> (N, L) float32 pair of window sums
    w[lag] = css[N-1-lag] + total - css[lag-1] (the Kneller assembly
    minus the correlation term and normalization).

    ONE jit program: the pallas_call objects (and their index-map
    closures) are rebuilt per call, so an eager composition re-traces
    and re-serializes both kernels every invocation — measured 1.9 s
    per call against ~0.1 s of actual device work on the tunneled
    runtime. Under jit the trace happens once per (n, p) and the
    XLA prologue (split/pad/flip) fuses."""
    hi, lo, rhi, rlo = _split_pad(sq, n, p)
    ll = hi.shape[1]
    nb = n // _BS

    blk = pl.BlockSpec((_BS, ll), lambda i: (i, _Z0),
                       memory_space=pltpu.VMEM)
    full_nb = pl.BlockSpec((nb, ll), lambda i: (_Z0, _Z0),
                           memory_space=pltpu.VMEM)
    f32 = jnp.float32

    th, tl = pl.pallas_call(
        _totals_kernel,
        grid=(nb,),
        in_specs=[blk, blk],
        out_specs=(full_nb, full_nb),
        out_shape=(jax.ShapeDtypeStruct((nb, ll), f32),) * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(hi, lo)

    bh, bl = _base_rows(th, tl, nb)

    wh, wl = pl.pallas_call(
        _windows_kernel,
        grid=(nb,),
        in_specs=[blk, blk, blk, blk, full_nb, full_nb],
        out_specs=(blk, blk),
        out_shape=(jax.ShapeDtypeStruct((n, ll), f32),) * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(hi, lo, rhi, rlo, bh, bl)
    return wh, wl


@functools.partial(jax.jit, static_argnames=("reduce_mode", "d", "p"))
def _finish(wh, wl, corr, reduce_mode: str, d: int, p: int):
    """One fused f64 pass: (w - 2*corr) * inv, lag-0 row pinned."""
    n = wh.shape[0]
    w64 = wh[:, :p].astype(jnp.float64) + wl[:, :p].astype(jnp.float64)
    denom = (n - jnp.arange(n)).astype(jnp.float64)
    if reduce_mode == "mean":
        denom = denom * d
    inv = (1.0 / denom)[:, None]
    out = (w64 - 2.0 * corr) * inv
    return out.at[0].set(0.0)


def einstein_assembly(sq, corr, reduce_mode: str, d: int):
    """Drop-in fused replacement for ops/einstein._einstein_fft_impl
    on TPU backends at supported() shapes. Same arguments and output
    contract; see module docstring for the kernel structure."""
    n, p = sq.shape
    wh, wl = window_sums(sq, n, p)
    return _finish(wh, wl, corr, reduce_mode, d, p)
