"""Pallas TPU kernel: blockwise windowed lag correlation.

The reference's windowed algorithms materialize a full shifted product
array per lag in numpy (velocityautocorr.py:223-235, viscosity.py:
210-226) — O(N²·P·d) with N² HBM-equivalent traffic. This kernel keeps
a (row-block × padded-frame-axis) tile resident in VMEM and sweeps a
whole block of lags against it, so each trajectory row is read from
HBM once per lag *block* instead of once per lag.

Layout: series are transposed to (S, N) — S = particles·components on
the sublane axis, frames on the lane axis — the natural TPU tiling for
lane-wise windowed reductions. The frame axis is zero-padded by
max_lag so every shifted window is a static-length dynamic slice.

Supports lag capping (``max_lag``): physically, correlation functions
are only meaningful for lags ≪ N, and capping turns the O(N²) windowed
cost into O(N·L) — an option the reference does not have at all.

Modes: 'acf' (Σ x_i·x_{i+lag}) and 'einstein' (Σ (x_i − x_{i+lag})²),
covering VACF, Helfand viscosity, and MSD accumulators.

Two precision profiles:

* float32 — plain f32 products and a native lane-sum (~1e-6 grade).
* float64 — Mosaic has no f64, so values ride (hi, lo) float32 pairs:
  Veltkamp/Dekker two-products recover each product's low word, and
  the frame-axis reduction is made EXACT by slicing the product pairs
  into 7-bit significance bands on a per-row power-of-two grid —
  integer-valued f32 bands whose tree sums stay below 2^24 for
  N ≤ 2^17 frames — then compensated-merging the 7 band sums
  (the same exactness argument as ops/pallas_fft.py's banded GEMMs).
  Result: ~2^-45-grade windowed sums relative to each row's scale,
  far inside the reference's decimal=4 windowed contract.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per program (sublane tile) and lags per program
_ROW_BLOCK = 8
_LAG_BLOCK = 128
# pair profile: the output BlockSpec's lane dimension must be a
# multiple of 128 on TPU, so the lag block is 128 there too (the lag
# sweep is an in-kernel fori_loop, so block size costs no program size)
_LAG_BLOCK_PAIR = 128
# band-sum exactness bound: band values <= ~68 grid units, so f32 tree
# sums stay integer-exact for 68 * N < 2^24
_PAIR_MAX_FRAMES = 1 << 17


def _lag_kernel(x_ref, out_ref, *, n_frames, lag_block, mode):
    """One (row-block, lag-block) program: the row block stays
    VMEM-resident while a fori_loop sweeps lag_block consecutive lags,
    so each trajectory row is fetched from HBM once per lag *block*
    rather than once per lag. (A static unroll produces multi-thousand
    -op Mosaic programs at 128-lag blocks that the remote compiler
    chokes on — same finding as the pair kernel; per-lag results land
    in the carry via a lane-iota select.)"""
    lag_base = pl.multiple_of(pl.program_id(1) * lag_block, lag_block)
    n = n_frames
    x = x_ref[:, :n]  # (RB, N) unshifted window
    span_len = n + lag_block
    span = x_ref[:, pl.ds(lag_base, span_len)]
    frame_idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    out_lanes = jax.lax.broadcasted_iota(
        jnp.int32, (x.shape[0], lag_block), 1)

    def body(l, out):
        lag = lag_base + l
        # lane-rotate the span left by l (expressed as a non-negative
        # right-rotate), so the first N lanes are x[i+lag]
        shifted = pltpu.roll(span, span_len - l, axis=1)[:, :n]
        if mode == "acf":
            prod = x * shifted
        else:
            diff = x - shifted
            prod = diff * diff
        # only i < N - lag contribute (shifted zeros are wrong for
        # 'einstein', and we want exact sums for both modes)
        prod = jnp.where(frame_idx < (n - lag), prod, 0.0)
        s = jnp.sum(prod, axis=1)
        return jnp.where(out_lanes == l, s[:, None], out)

    out_ref[...] = jax.lax.fori_loop(
        0, lag_block, body,
        jnp.zeros((x.shape[0], lag_block), x.dtype),
    )


@partial(
    jax.jit, static_argnames=("n_lags", "mode", "interpret")
)
def _lag_sums_transposed(xt, n_lags, mode, interpret=False):
    """xt: (S, N) rows → (S, n_lags) windowed lag sums."""
    s, n = xt.shape
    lag_block = 8 if interpret else _LAG_BLOCK
    lags_padded = -(-n_lags // lag_block) * lag_block
    rows_padded = -(-s // _ROW_BLOCK) * _ROW_BLOCK
    # pad: rows to the sublane tile, frames by the max shift we index
    x_padded = jnp.pad(
        xt, ((0, rows_padded - s), (0, lags_padded))
    )

    out = pl.pallas_call(
        partial(
            _lag_kernel, n_frames=n, lag_block=lag_block, mode=mode
        ),
        grid=(rows_padded // _ROW_BLOCK, lags_padded // lag_block),
        in_specs=[
            pl.BlockSpec(
                (_ROW_BLOCK, n + lags_padded),
                lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (_ROW_BLOCK, lag_block),
            lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (rows_padded, lags_padded), xt.dtype
        ),
        interpret=interpret,
    )(x_padded)
    return out[:s, :n_lags]


def _two_sum(a, b):
    s = a + b
    bv = s - a
    return s, (a - (s - bv)) + (b - bv)


_N_BANDS = 7      # 7 x 7-bit bands: 49-bit coverage below the row max
_HI_BANDS = 4     # bands taken from the product hi before folding lo
_DELTA = 7


def _lag_kernel_pair(xh_ref, xl_ref, oh_ref, ol_ref, *, n_frames,
                     lag_block, mode):
    """Double-float (hi, lo) variant of :func:`_lag_kernel`.

    Per lag: Dekker two-products (acf) / two-sum differences + exact
    squares (einstein) give each product as an f32 pair accurate to
    ~2^-48; the frame reduction slices the pair into 7-bit bands on a
    power-of-two product grid (integer f32 values whose native lane
    sums are EXACT below 2^24) and merges the per-band sums with a
    compensated two-sum cascade into an output pair.

    The lag sweep is a lax.fori_loop, NOT a static unroll: at ~60 ops
    per lag a 128-lag unroll produces a multi-thousand-op Mosaic
    program that the remote compiler chokes on. Per-lag results land
    in the (rows, lag_block) carry via a lane-iota select (dynamic
    single-lane stores are not expressible on the lane axis)."""
    lag_base = pl.multiple_of(pl.program_id(1) * lag_block, lag_block)
    n = n_frames
    xh = xh_ref[:, :n]
    xl = xl_ref[:, :n]
    span_len = n + lag_block
    span_h = xh_ref[:, pl.ds(lag_base, span_len)]
    span_l = xl_ref[:, pl.ds(lag_base, span_len)]

    # loop-invariant Veltkamp splits of both hi operands
    c = xh * np.float32(4097.0)
    xa = c - (c - xh)
    xb = xh - xa
    cs = span_h * np.float32(4097.0)
    spa = cs - (cs - span_h)
    spb = span_h - spa

    # acf: per-row power-of-two bound on |product|, g = pow2ceil(
    # max|x|)^2, loop-invariant (products sit at the data's scale).
    # einstein recomputes g per lag from the actual masked differences
    # below — small-lag diffs cancel orders below the row scale, and a
    # row-scale grid would waste most of the 49-bit band ladder on
    # leading zeros. Exact either way: g is a power of two.
    from .pallas_fft import _pow2_ceil_f32

    if mode == "acf":
        rowmax = _pow2_ceil_f32(jnp.max(jnp.abs(xh_ref[...]), axis=1,
                                        keepdims=True))
        g_acf = rowmax * rowmax
        inv_g_acf = np.float32(1.0) / g_acf

    frame_idx = jax.lax.broadcasted_iota(jnp.int32, xh.shape, 1)
    rows = xh.shape[0]
    out_lanes = jax.lax.broadcasted_iota(
        jnp.int32, (rows, lag_block), 1)

    def body(l, carry):
        out_h, out_l = carry
        lag = lag_base + l
        shift = span_len - l  # dynamic rotate; shift==span_len ≡ 0
        sl = pltpu.roll(span_l, shift, axis=1)[:, :n]
        sa = pltpu.roll(spa, shift, axis=1)[:, :n]
        sb = pltpu.roll(spb, shift, axis=1)[:, :n]
        sh = sa + sb  # Veltkamp halves reassemble exactly
        if mode == "acf":
            # zero padding voids out-of-window products — no mask
            ph = xh * sh
            err = ((xa * sa - ph) + (xa * sb + xb * sa)) + xb * sb
            plo = err + (xh * sl + xl * sh)
            g, inv_g = g_acf, inv_g_acf
        else:
            dh, e = _two_sum(xh, -sh)
            dl = e + (xl - sl)
            s2 = dh + dl  # renormalize the pair
            dl = dl - (s2 - dh)
            dh = s2
            # mask BEFORE the grid max: beyond the window the "diff"
            # is x_i - 0 = x_i, which would both poison the sum and
            # inflate the per-lag grid back to the row scale
            keep = frame_idx < (n - lag)
            dh = jnp.where(keep, dh, 0.0)
            dl = jnp.where(keep, dl, 0.0)
            # per-lag grid at the diffs' actual magnitude
            dmax = _pow2_ceil_f32(
                jnp.max(jnp.abs(dh), axis=1, keepdims=True))
            g = dmax * dmax
            inv_g = np.float32(1.0) / g
            # exact square of the pair head + first-order cross term
            c2 = dh * np.float32(4097.0)
            da = c2 - (c2 - dh)
            db = dh - da
            ph = dh * dh
            err = ((da * da - ph) + 2.0 * (da * db)) + db * db
            plo = err + 2.0 * (dh * dl)

        # band-sliced exact reduction on the [-1, 1] grid
        r = ph * inv_g
        rl = plo * inv_g
        hi_acc = jnp.zeros((rows,), jnp.float32)
        lo_acc = jnp.zeros_like(hi_acc)
        for q in range(_N_BANDS):
            if q == _HI_BANDS:
                r = r + rl  # one ~2^-45 rounding, below band q's grid
            s = np.float32(2.0 ** (_DELTA * (q + 1) - 1))
            gq = np.float32(2.0 ** -(_DELTA * (q + 1) - 1))
            mq = jnp.rint(r * s)
            r = r - mq * gq
            bs = jnp.sum(mq, axis=1) * gq  # exact: |Σmq| < 2^24
            hi_acc, e2 = _two_sum(hi_acc, bs)
            lo_acc = lo_acc + e2
        sel = out_lanes == l
        out_h = jnp.where(sel, (hi_acc * g[:, 0])[:, None], out_h)
        out_l = jnp.where(sel, (lo_acc * g[:, 0])[:, None], out_l)
        return out_h, out_l

    zeros = jnp.zeros((rows, lag_block), jnp.float32)
    out_h, out_l = jax.lax.fori_loop(
        0, lag_block, body, (zeros, zeros))
    oh_ref[...] = out_h
    ol_ref[...] = out_l


@partial(jax.jit, static_argnames=("n_lags", "mode", "interpret"))
def _lag_sums_transposed_pair(xh, xl, n_lags, mode, interpret=False):
    """(hi, lo) f32 pair rows (S, N) → pair of (S, n_lags) lag sums."""
    s, n = xh.shape
    # interpret mode (CPU tests) executes the statically-unrolled lag
    # sweep through XLA op-by-op: a small block keeps compile time sane
    lb = 8 if interpret else _LAG_BLOCK_PAIR
    lags_padded = -(-n_lags // lb) * lb
    rows_padded = -(-s // _ROW_BLOCK) * _ROW_BLOCK
    pad = ((0, rows_padded - s), (0, lags_padded))
    xh_p = jnp.pad(xh, pad)
    xl_p = jnp.pad(xl, pad)

    in_spec = pl.BlockSpec(
        (_ROW_BLOCK, n + lags_padded),
        lambda i, j: (i, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (_ROW_BLOCK, lb),
        lambda i, j: (i, j),
        memory_space=pltpu.VMEM,
    )
    out_sds = jax.ShapeDtypeStruct(
        (rows_padded, lags_padded), jnp.float32
    )
    oh, ol = pl.pallas_call(
        partial(_lag_kernel_pair, n_frames=n, lag_block=lb, mode=mode),
        grid=(rows_padded // _ROW_BLOCK, lags_padded // lb),
        in_specs=[in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[out_sds, out_sds],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(xh_p, xl_p)
    return oh[:s, :n_lags], ol[:s, :n_lags]


def _supports_pallas() -> bool:
    """Hardware Mosaic lowering only on TPU backends (allowlist);
    anything else runs the kernels in interpret mode."""
    from .pallas_fft import is_tpu_backend

    return is_tpu_backend()


def pair_supported(n_frames: int) -> bool:
    """Band-sum exactness gate for the float64 pair profile."""
    return n_frames <= _PAIR_MAX_FRAMES


def windowed_lag_pallas(
    x,
    max_lag: int | None = None,
    mode: str = "acf",
    reduce_mode: str = "sum",
):
    """Windowed lag correlation via the Pallas tile kernel.

    Parameters
    ----------
    x : (N, P, d) series.
    max_lag : compute lags [0, max_lag) only (default: all N lags).
    mode : 'acf' or 'einstein'.
    reduce_mode : 'sum' or 'mean' over the component axis.

    Returns
    -------
    (n_lags, P) per-lag means: sums / (N - lag), matching
    ops.acf_windowed / ops.einstein_difference_windowed restricted to
    the first n_lags rows. float64 input → float64 output through the
    double-float pair kernel (~2^-45 of row scale, N ≤ 2^17); float32
    input → float32 (plain kernel, ~1e-6).

    On CPU backends the kernels run in Pallas interpret mode (slow but
    bit-matching) — tests exercise the code path the TPU compiles.
    """
    x = jnp.asarray(x)
    if x.ndim == 2:
        x = x[:, :, None]
    n, p, d = x.shape
    n_lags = n if max_lag is None else min(max_lag, n)

    on_tpu = _supports_pallas()
    interpret = not on_tpu
    if x.dtype == jnp.float64:
        if not pair_supported(n):
            raise ValueError(
                f"float64 pair lag kernel supports N <= "
                f"{_PAIR_MAX_FRAMES} frames (got {n}); use the XLA "
                f"windowed kernels beyond that"
            )
        from .pallas_fft import _split_pair

        # (N, P, d) → (P·d, N) rows, split into exact (hi, lo) pairs
        xt = jnp.moveaxis(x, 0, -1).reshape(p * d, n)
        xh, xl = _split_pair(xt)
        if on_tpu:
            # Mosaic lowering requires 32-bit index/iota types; trace
            # the kernel with x64 disabled (values are f32 pairs)
            with jax.enable_x64(False):
                sh, sl = _lag_sums_transposed_pair(xh, xl, n_lags, mode)
        else:
            sh, sl = _lag_sums_transposed_pair(
                xh, xl, n_lags, mode, interpret=True
            )
        sums = sh.astype(jnp.float64) + sl.astype(jnp.float64)
    else:
        xt = jnp.moveaxis(x, 0, -1).reshape(p * d, n)
        if on_tpu:
            with jax.enable_x64(False):
                sums = _lag_sums_transposed(xt, n_lags, mode)
        else:
            sums = _lag_sums_transposed(xt, n_lags, mode, interpret=True)
    sums = sums.reshape(p, d, n_lags).sum(axis=1)  # (P, n_lags)
    if reduce_mode == "mean":
        sums = sums / d
    out = sums.T / (n - jnp.arange(n_lags, dtype=sums.dtype))[:, None]
    if mode == "einstein":
        out = out.at[0].set(0.0)
    return out
