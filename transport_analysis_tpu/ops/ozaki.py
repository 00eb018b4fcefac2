"""Ozaki-scheme float64 matmul on the MXU (exact bf16 slice products).

XLA's emulated float64 GEMM on TPU runs at ~134 Gf/s (profiler-
verified, BENCH_NOTES.md) while native bf16 MXU matmuls run ~3 orders
faster. The Ozaki splitting (Ozaki et al., Numer. Algorithms 2012)
recovers high-precision products from low-precision hardware GEMMs:

1. normalize each operand along the contraction axis by a power of two
   (exact), so entries sit in [-2, 2);
2. slice every value into δ=7-bit mantissa bands on an *absolutely
   aligned* grid — each band is exactly representable in bfloat16;
3. multiply band pairs with native bf16→f32 MXU GEMMs. With δ=7 and
   K ≤ 512, every partial product set shares a grid ulp, and the
   accumulated sum — an integer in grid units of magnitude at most
   2^7·2^7·4·K = 2^25 in the worst sign-inclusive count, in practice
   ≤ 2^24 for |x| ≤ 1 operands — stays at or below float32's exact-
   integer boundary 2^24, so the f32 accumulation is EXACT;
4. band-sum the partial products with compensated f32 adds (TwoSum),
   convert the (hi, lo) pair to float64 once at the end.

With 7 slices per operand and bands p+q ≤ 6, the result carries ~49
significant bits (rel. error ~1e-14) — float64-grade for every
numerics contract in this package — at a small multiple of bf16 GEMM
cost. Disable with TRANSPORT_ANALYSIS_TPU_NO_OZAKI=1 (falls back to
XLA's emulated float64 dot).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_DELTA = 7          # mantissa bits per slice
_N_SLICES = 7       # 7·7 = 49 bits of the 53-bit f64 mantissa
_MAX_BAND = 6       # keep products with p+q ≤ 6 (28 GEMMs)
_K_LIMIT = 512      # keeps grid-unit partial sums ≤ 2^24 (f32-exact)


def enabled() -> bool:
    return not os.environ.get("TRANSPORT_ANALYSIS_TPU_NO_OZAKI")


def _two_sum_f32(a, b):
    """Error-free float32 addition (Knuth): a + b = s + e exactly."""
    s = a + b
    bv = s - a
    e = (a - (s - bv)) + (b - bv)
    return s, e


def _slice_operand(x64, n_slices: int):
    """Split a float64 array with |x| ≤ 1 into δ-bit absolutely-aligned
    bands, each exactly representable in bfloat16.

    Exact float32-pair formulation. A plain float32 cast only carries
    24 bits, so the value is first split losslessly into hi + lo f32s
    (Dekker: hi = f32(x), lo = f32(x − hi) — the subtraction in f64 is
    exact). Each band is then the nearest grid multiple of the f32
    residual head (products by powers of two and f32 round are exact;
    subtracting the nearest grid multiple is exact by the Sterbenz
    argument), with the tail folded back via an f32 TwoSum. Every step
    is error-free, so the bands sum to x exactly down to the last grid
    (borderline roundings may shift one grid ulp between adjacent
    bands relative to the f64 formulation — the decomposition is
    equally exact, not bit-identical) — but the per-element work is
    ~10 fast f32 ops instead of ~4 emulated f64 ops (f64 elementwise
    on TPU runs as software pair arithmetic; this slicing is the
    dominant non-GEMM cost of the FFT pipeline, BENCH_NOTES.md
    round 2).

    Band magnitude ≤ (2^(δ−1) + 1) grid units — within bfloat16's
    8-bit significand and unchanged from the f64 formulation, so the
    2^24 exact-accumulation bound (and _K_LIMIT) is unaffected.
    """
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    bands = []
    r_hi, r_lo = hi, lo
    for q in range(n_slices):
        scale = jnp.float32(2.0 ** (_DELTA * (q + 1) - 1))
        inv_scale = jnp.float32(2.0 ** -(_DELTA * (q + 1) - 1))
        band = jnp.round(r_hi * scale) * inv_scale
        bands.append(band.astype(jnp.bfloat16))
        head = r_hi - band  # exact: nearest-grid-multiple subtraction
        r_hi, r_lo = _two_sum_f32(head, r_lo)
    return bands


def _two_sum(a, b):
    """Error-free f32 addition (Knuth): a + b = s + e exactly."""
    s = a + b
    bv = s - a
    e = (a - (s - bv)) + (b - bv)
    return s, e


def _pow2_ceil(mx):
    """Smallest power of two ≥ mx per entry, with zero entries mapped
    to 1.0 (so all-zero rows/columns normalize to exact zeros instead
    of 0/0 = NaN).

    TPU "float64" is a float32-pair emulation with float32 *exponent
    range*: tiny literal floors like 1e-300 underflow to 0.0 on device
    (and ``jnp.exp2(-996.)`` is 0.0), so a ``maximum(mx, tiny)`` guard
    silently degenerates back to 0/0. The zero case must be handled by
    selection, not by a floor. DFT sine tables always contain an
    all-zero row (θ = 0), so this path is exercised by every Ozaki DFT.
    """
    safe = jnp.where(mx == 0, 1.0, mx)
    return jnp.where(mx == 0, 1.0, jnp.exp2(jnp.ceil(jnp.log2(safe))))


def prepare_lhs(a):
    """Normalize (per row, exact powers of two) and band-slice the LHS.
    Returns (bands, exp) for reuse across several products."""
    if a.shape[1] > _K_LIMIT:
        raise ValueError(f"contraction dim {a.shape[1]} exceeds {_K_LIMIT}")
    amax = jnp.max(jnp.abs(a), axis=1, keepdims=True)
    a_exp = _pow2_ceil(amax)
    return _slice_operand(a / a_exp, _N_SLICES), a_exp


def prepare_rhs(b):
    """Normalize (per column) and band-slice the RHS."""
    bmax = jnp.max(jnp.abs(b), axis=0, keepdims=True)
    b_exp = _pow2_ceil(bmax)
    return _slice_operand(b / b_exp, _N_SLICES), b_exp


def _group_products(a_bands, b_bands, max_band=None):
    """Per-significance-group sums Σ_{p+q=g} A_p @ B_q as ONE bf16 GEMM
    per group via contraction-axis concatenation.

    All (p, q) pairs in group g share the product grid 2^-(7g+12) (the
    absolutely-aligned-band property), so their partial products are
    integers in a COMMON unit and the MXU's f32 accumulation across the
    concatenated contraction axis is exact while |Σ| ≤ 2^24 grid units:
    band magnitudes are ≤ 2^(δ−1)+1 = 65 units, so the bound holds for
    K·(g+1) ≤ 2^24/65² ≈ 3970 — satisfied by _K_LIMIT with margin.
    This replaces up to 28 GEMMs + 21 f32 adds with 7 GEMMs whose
    intra-group sums ride the MXU accumulator for free (measured 2.6×
    on the GEMM stage of the FFT pipeline, BENCH_NOTES round 3).

    The RHS bands are stacked ONCE as [B_0; B_1; …] and each group
    reads a prefix slice (no per-group copy); the tiny LHS concats are
    ordered reversed ([A_g | … | A_0]) so prefix q-order pairs with
    descending p.
    """
    if max_band is None:
        max_band = _MAX_BAND
    n_bands = len(a_bands)
    rhs_full = jnp.concatenate(b_bands, axis=0)
    k = b_bands[0].shape[0]
    group_sums = []
    for g in range(min(max_band + 1, 2 * n_bands - 1)):
        lo_q = max(0, g - n_bands + 1)
        hi_q = min(g, n_bands - 1)
        n_pairs = hi_q - lo_q + 1
        # q ascending pairs with p = g - q descending
        lhs = jnp.concatenate(
            [a_bands[g - q] for q in range(lo_q, hi_q + 1)], axis=1
        )
        rhs = jax.lax.slice_in_dim(
            rhs_full, lo_q * k, (lo_q + n_pairs) * k, axis=0
        )
        group_sums.append(
            jax.lax.dot(
                lhs,
                rhs,
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )
        )
    return group_sums


def _merge_groups(group_sums, scale):
    """Compensated f32 summation across groups (descending magnitude),
    then one f64 pass combining the (hi, lo) pair and undoing the
    power-of-two normalization."""
    hi = group_sums[0]
    lo = jnp.zeros_like(hi)
    for g in group_sums[1:]:
        hi, e = _two_sum(hi, g)
        lo = lo + e
    out = hi.astype(jnp.float64) + lo.astype(jnp.float64)
    return out * scale


def banded_matmul(lhs_prep, rhs_prep):
    """float64 product from prepared operands (exact bf16 GEMMs +
    compensated f32 band merge)."""
    a_bands, a_exp = lhs_prep
    b_bands, b_exp = rhs_prep
    return _merge_groups(
        _group_products(a_bands, b_bands), a_exp * b_exp
    )


@jax.jit
def matmul_f64_ozaki(a, b):
    """C = a @ b for float64 operands via exact bf16 MXU GEMMs.

    a: (M, K), b: (K, N), K ≤ 512. Accuracy ~1e-14 relative.
    """
    return banded_matmul(prepare_lhs(a), prepare_rhs(b))


# exact-accumulation ceiling for the complex-stacked path: contraction
# length per group is 2·K·(g+1) ≤ 2·K·7, and exactness needs
# 65²·2·K·7 ≤ 2^24  ⟺  K ≤ 283 (see _group_products). 256 keeps a
# power-of-two margin; larger K falls back to four banded products.
_K_LIMIT_COMPLEX = 256


def complex_dft_matmul(c, s, re, im, n_slices=None, max_band=None):
    """(c + i·s) @ (re + i·im) as TWO grouped banded products.

    The real/imaginary contractions are folded into the bf16 GEMMs
    themselves: with a row exponent SHARED between c and s and a column
    exponent SHARED between re and im (exact powers of two, so the
    bands of all four operands live on one absolute grid), each band
    slab stacks [RE_q; IM_q] along the contraction axis and the two
    outputs use lhs band pairs [C_p | −S_p] (real part: C@RE − S@IM)
    and [S_p | C_p] (imag part: S@RE + C@IM). Every product that the
    four-banded formulation computed separately now rides the MXU f32
    accumulator — still exactly, since all pairs in a significance
    group share the grid ulp 2^-(7g+12) and |Σ| stays ≤ 2^24 grid units
    for 2·K·(g+1) ≤ 3970. Halves the number of band-merge chains and
    f64 conversions on top of the grouped-GEMM savings.

    Sharing the column exponent costs nothing when |re| and |im|
    columns are comparable (the FFT's case) and otherwise bounds the
    smaller component's error relative to the COMPLEX magnitude — the
    natural accuracy contract for a complex product.

    ``n_slices``/``max_band`` trim the band budget for reduced-
    precision profiles (ops.fft_precision); defaults are the exact
    float64 grade.
    """
    if n_slices is None:
        n_slices = _N_SLICES
    if max_band is None:
        max_band = _MAX_BAND
    if c.shape[1] > _K_LIMIT_COMPLEX:
        c_p = prepare_lhs(c)
        s_p = prepare_lhs(s)
        re_p = prepare_rhs(re)
        im_p = prepare_rhs(im)
        out_re = banded_matmul(c_p, re_p) - banded_matmul(s_p, im_p)
        out_im = banded_matmul(c_p, im_p) + banded_matmul(s_p, re_p)
        return out_re, out_im

    amax = jnp.maximum(
        jnp.max(jnp.abs(c), axis=1, keepdims=True),
        jnp.max(jnp.abs(s), axis=1, keepdims=True),
    )
    a_exp = _pow2_ceil(amax)
    bmax = jnp.maximum(
        jnp.max(jnp.abs(re), axis=0, keepdims=True),
        jnp.max(jnp.abs(im), axis=0, keepdims=True),
    )
    b_exp = _pow2_ceil(bmax)

    c_b = _slice_operand(c / a_exp, n_slices)
    s_b = _slice_operand(s / a_exp, n_slices)
    re_b = _slice_operand(re / b_exp, n_slices)
    im_b = _slice_operand(im / b_exp, n_slices)

    rhs_slabs = [
        jnp.concatenate([re_b[q], im_b[q]], axis=0)
        for q in range(n_slices)
    ]
    lhs_re = [
        jnp.concatenate([c_b[p], -s_b[p]], axis=1)
        for p in range(n_slices)
    ]
    lhs_im = [
        jnp.concatenate([s_b[p], c_b[p]], axis=1)
        for p in range(n_slices)
    ]
    scale = a_exp * b_exp
    out_re = _merge_groups(
        _group_products(lhs_re, rhs_slabs, max_band), scale)
    out_im = _merge_groups(
        _group_products(lhs_im, rhs_slabs, max_band), scale)
    return out_re, out_im
