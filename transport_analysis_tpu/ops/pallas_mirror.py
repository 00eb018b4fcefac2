"""MXU permutation-matmul Hermitian mirror.

Materializes the unpack's mirror operand R[k] = Z[(inner−k) mod inner]
with the j2 lane map k2 → outer−1−k2 (row 0: k2 → (outer−k2) mod
outer) — the deep chain's #1 remaining stage cost after round 8: the
XLA two-axis ``lax.rev`` runs at ~70-107 GB/s and Mosaic has no ``rev``
lowering (in-kernel sublane shuffles measured 21 GB/s — BENCH_NOTES
"Mosaic reverse/transpose facts"). This kernel reaches ~236 GB/s
(hardware, north-star plane) by expressing every reversal as a 0/1
permutation MATMUL, which the MXU executes at near-copy rates:

* block-order row reversal rides the BlockSpec ``index_map`` (free);
* the within-block row flip is ``J_ll @ X`` (ll×ll anti-identity);
* the lane-group mirror is ``X @ P`` per L-lane register group, with
  ``P = kron(I_{L/outer}, J_outer)`` and ``L = max(outer, 128)`` — any
  within-register lane permutation is an L×L 0/1 matrix, so the scheme
  covers every ``outer`` dividing or divided by 128;
* the mirror's off-by-one (inner−k, not inner−1−k) comes from a second
  8-row input spec one block over, whose row 0 is prepended in-kernel;
* row 0's roll map rides a second lane matrix ``P0``, selected at
  grid step 0.

A 0/1 permutation matmul at ``Precision.HIGHEST`` is BIT-exact in f32:
the matrix's bf16 splits are exactly {0, 1}, and the operand's split
terms x_hi + x_mid + x_lo reconstruct all 24 mantissa bits in the f32
accumulator, so each output element is literally its source element.
(The default single-pass bf16 dot is NOT exact — measured.) Exactness
vs the XLA rev is asserted bitwise in tests/test_pallas_mirror.py and
benchmarks/micro_mirror.py.

Reference context: the reference has no analogue (its FFT path is
tidynamics.acf on the host); this serves the TPU deep composition's
Hermitian unpack (ops/deep_acf.py:650-717).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_fft as _pf

_LL = 128  # row-block height: VMEM-safe at north-star cols (16384)


def supported(inner: int, outer: int, w: int, need: int) -> bool:
    """Gate for the Pallas mirror: lane-permutation representability
    (outer | 128 or 128 | outer, capped at 256 — the largest
    _split_m cofactor) and row-grid divisibility."""
    if os.environ.get("TRANSPORT_ANALYSIS_TPU_NO_PALLAS_MIRROR"):
        return False
    if outer > 256:
        return False
    if not (128 % outer == 0 or outer % 128 == 0):
        return False
    cols = w * outer
    el = max(outer, 128)
    if cols % el:
        return False
    return inner % _LL == 0 and need % _LL == 0 and need <= inner


def _lane_perm(outer: int, roll: bool) -> np.ndarray:
    """L×L 0/1 matrix for the within-group lane map: k2 → outer−1−k2
    (mirror) or k2 → (outer−k2) mod outer (row-0 roll), applied
    per contiguous ``outer``-group inside an L-lane register set."""
    el = max(outer, 128)
    if roll:
        block = np.eye(outer)[(outer - np.arange(outer)) % outer].T
    else:
        block = np.eye(outer)[::-1]
    return np.kron(np.eye(el // outer), block).astype(np.float32)


def _mirror_kernel(a_ref, b_ref, jll_ref, jp_ref, jp0_ref, o_ref):
    o = pl.program_id(0)
    ll, cols = a_ref.shape
    el = jp_ref.shape[0]
    hi = jax.lax.Precision.HIGHEST
    f32 = jnp.float32
    # within-block row flip on the MXU: flipped[r] = a[ll-1-r]
    flipped = jnp.dot(jll_ref[:], a_ref[:],
                      preferred_element_type=f32, precision=hi)
    # prepend the one-row block offset: row r holds Z[inner - o·ll - r]
    shifted = jnp.concatenate([b_ref[0:1], flipped[:-1]], axis=0)
    # lane-group mirror per L-lane register set: X @ P
    m = jnp.dot(shifted.reshape(ll * cols // el, el), jp_ref[:],
                preferred_element_type=f32, precision=hi)
    m = m.reshape(ll, cols)
    # grid step 0's first row is k1 = 0: its lane map is the roll P0
    r0 = jnp.dot(b_ref[0:1].reshape(cols // el, el), jp0_ref[:],
                 preferred_element_type=f32, precision=hi)
    row0 = jnp.where(o == 0, r0.reshape(1, cols), m[0:1])
    o_ref[:] = jnp.concatenate([row0, m[1:]], axis=0)


@functools.partial(
    jax.jit, static_argnames=("inner", "outer", "w", "need"))
def mirror_half_planes(zrh, zrl, zih, zil, inner: int, outer: int,
                       w: int, need: int):
    """First ``need`` rows of the Hermitian-mirror operand of each
    plane — drop-in for deep_acf._unpack_rev_planes_half's XLA rev,
    bit-identical (asserted in tests)."""
    cols = w * outer
    el = max(outer, 128)
    ll = _LL
    g_in = inner // ll
    g8 = inner // 8
    jll = jnp.asarray(np.eye(ll, dtype=np.float32)[::-1].copy())
    jp = jnp.asarray(_lane_perm(outer, roll=False))
    jp0 = jnp.asarray(_lane_perm(outer, roll=True))

    # all index-map components strictly int32: an i64 literal under
    # x64 sends Mosaic's scalar convert lowering into recursion
    a_spec = pl.BlockSpec(
        (ll, cols),
        lambda o: (jnp.int32(g_in - 1) - o, jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    b_spec = pl.BlockSpec(
        (8, cols),
        # (g8 - o·ll/8) mod g8, without a tracer `%`
        lambda o: (
            jnp.where(o == 0, jnp.int32(0),
                      jnp.int32(g8) - o * jnp.int32(ll // 8)),
            jnp.int32(0),
        ),
        memory_space=pltpu.VMEM,
    )

    def const(o):
        return (jnp.int32(0), jnp.int32(0))

    call = pl.pallas_call(
        _mirror_kernel,
        grid=(need // ll,),
        in_specs=[
            a_spec, b_spec,
            pl.BlockSpec((ll, ll), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((el, el), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((el, el), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ll, cols), lambda o: (o, jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((need, cols), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_pf._interpret(),
    )
    return tuple(call(z, z, jll, jp, jp0)
                 for z in (zrh, zrl, zih, zil))


def synth_supported(inner: int, outer: int, w: int) -> bool:
    """Gate for the in-place tail synthesis: same lane conditions as
    :func:`supported`, plus a pow2 half that the row grid divides."""
    if os.environ.get("TRANSPORT_ANALYSIS_TPU_NO_PALLAS_MIRROR"):
        return False
    if outer > 256 or not (128 % outer == 0 or outer % 128 == 0):
        return False
    cols = w * outer
    if cols % max(outer, 128):
        return False
    half = inner // 2
    return inner % 2 == 0 and half % _LL == 0


def _synth_kernel(a_ref, jll_ref, jp_ref, o_ref, prev_ref):
    """One grid step of the in-place tail synthesis (see
    synth_tail_planes): a prologue step (o=0) only primes the scratch
    carry with row ``half``; steps o >= 1 emit output rows
    [half+(o-1)·ll, half+o·ll) as the lane-mirrored, row-flipped
    image of input rows (half-o·ll, half-(o-1)·ll]."""
    o = pl.program_id(0)
    ll, cols = a_ref.shape
    el = jp_ref.shape[0]
    hi = jax.lax.Precision.HIGHEST
    f32 = jnp.float32
    prev = prev_ref[:]
    flipped = jnp.dot(jll_ref[:], a_ref[:],
                      preferred_element_type=f32, precision=hi)
    shifted = jnp.concatenate([prev, flipped[:-1]], axis=0)
    m = jnp.dot(shifted.reshape(ll * cols // el, el), jp_ref[:],
                preferred_element_type=f32, precision=hi)
    o_ref[:] = m.reshape(ll, cols)
    prev_ref[:] = a_ref[0:1]


@functools.partial(
    jax.jit, static_argnames=("inner", "outer", "w"),
    donate_argnums=(0, 1, 2, 3))
def synth_tail_planes(p0, p1, p2, p3, inner: int, outer: int,
                      w: int):
    """In-place Hermitian tail synthesis: fills rows [half, inner) of
    each plane with p[m] = lane_mirror(p[(inner−m) mod inner]),
    given correct rows [0, half]. Replaces the unpack's XLA two-axis
    rev + dynamic_update_slice (deep_acf synth; ~5-10 ms/plane) with
    ONE aliased Pallas pass at MXU mirror rates.

    Row ``half`` is rewritten as its own lane mirror — bit-identical
    to itself for genuine power spectra, whose evenness p[M−m] = p[m]
    is exact (the same summands commute/negate and squaring kills the
    sign; the half-symmetry unpack already relies on this — see
    _unpack_to_pair_dif_pallas).

    Mechanics: the output aliases the input; the read blocks all sit
    in rows [0, half) and the written blocks in [half, inner), so the
    sequential grid never reads a written block. The mirror's
    off-by-one (inner−m, not inner−1−m) rides a one-row VMEM scratch
    carried between grid steps: step o's input-block row 0 is exactly
    the row step o+1 needs prepended. Step 0 is a prologue that
    primes the carry with row ``half`` itself (its output block is
    fully rewritten by step 1 before ever leaving VMEM)."""
    cols = w * outer
    el = max(outer, 128)
    ll = _LL
    half = inner // 2
    g = half // ll
    jll = jnp.asarray(np.eye(ll, dtype=np.float32)[::-1].copy())
    jp = jnp.asarray(_lane_perm(outer, roll=False))

    a_spec = pl.BlockSpec(
        (ll, cols),
        lambda o: (jnp.int32(g) - o, jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (ll, cols),
        lambda o: (
            jnp.where(o == 0, jnp.int32(g),
                      jnp.int32(g - 1) + o),
            jnp.int32(0),
        ),
        memory_space=pltpu.VMEM,
    )

    def const(o):
        return (jnp.int32(0), jnp.int32(0))

    call = pl.pallas_call(
        _synth_kernel,
        grid=(g + 1,),
        in_specs=[
            a_spec,
            pl.BlockSpec((ll, ll), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((el, el), const, memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((inner, cols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, cols), jnp.float32)],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_pf._interpret(),
    )
    return tuple(call(p, jll, jp) for p in (p0, p1, p2, p3))
