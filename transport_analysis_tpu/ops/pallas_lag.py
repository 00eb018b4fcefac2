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


def _lag_kernel(x_ref, out_ref, *, n_frames, lag_block, mode):
    """One (row-block, lag-block) program: the row block stays
    VMEM-resident while a statically-unrolled sweep computes lag_block
    consecutive lags, so each trajectory row is fetched from HBM once
    per lag *block* rather than once per lag."""
    lag_base = pl.multiple_of(pl.program_id(1) * lag_block, lag_block)
    x = x_ref[:, :n_frames]  # (RB, N) unshifted window
    # one aligned dynamic slice per program; per-lag shifts below are
    # static offsets into this register block (lane-dim dynamic slices
    # must be 128-aligned on TPU)
    span = x_ref[:, pl.ds(lag_base, n_frames + lag_block)]
    frame_idx = jax.lax.broadcasted_iota(
        jnp.int32, x.shape, 1
    )
    for l in range(lag_block):  # static unroll: stores use static cols
        lag = lag_base + l
        # lane-rotate the span left by l (expressed as a non-negative
        # right-rotate), so the first N lanes are x[i+lag]
        span_len = n_frames + lag_block
        shift = jnp.int32((span_len - l) % span_len)
        shifted = pltpu.roll(span, shift, axis=1)[:, :n_frames]
        if mode == "acf":
            prod = x * shifted
        else:
            diff = x - shifted
            prod = diff * diff
        # only i < N - lag contribute (shifted zeros are wrong for
        # 'einstein', and we want exact sums for both modes)
        prod = jnp.where(frame_idx < (n_frames - lag), prod, 0.0)
        out_ref[:, l] = jnp.sum(prod, axis=1)


@partial(
    jax.jit, static_argnames=("n_lags", "mode", "interpret")
)
def _lag_sums_transposed(xt, n_lags, mode, interpret=False):
    """xt: (S, N) rows → (S, n_lags) windowed lag sums."""
    s, n = xt.shape
    lags_padded = -(-n_lags // _LAG_BLOCK) * _LAG_BLOCK
    rows_padded = -(-s // _ROW_BLOCK) * _ROW_BLOCK
    # pad: rows to the sublane tile, frames by the max shift we index
    x_padded = jnp.pad(
        xt, ((0, rows_padded - s), (0, lags_padded))
    )

    out = pl.pallas_call(
        partial(
            _lag_kernel, n_frames=n, lag_block=_LAG_BLOCK, mode=mode
        ),
        grid=(rows_padded // _ROW_BLOCK, lags_padded // _LAG_BLOCK),
        in_specs=[
            pl.BlockSpec(
                (_ROW_BLOCK, n + lags_padded),
                lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (_ROW_BLOCK, _LAG_BLOCK),
            lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (rows_padded, lags_padded), xt.dtype
        ),
        interpret=interpret,
    )(x_padded)
    return out[:s, :n_lags]


def _supports_pallas() -> bool:
    return jax.default_backend() not in ("cpu",)


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
    the first n_lags rows.

    On CPU backends the kernel runs in Pallas interpret mode (slow but
    exact) — tests exercise the same code path the TPU compiles.
    """
    x = jnp.asarray(x)
    if x.ndim == 2:
        x = x[:, :, None]
    n, p, d = x.shape
    n_lags = n if max_lag is None else min(max_lag, n)

    on_tpu = _supports_pallas()
    if on_tpu and x.dtype == jnp.float64:
        # Mosaic kernels are float32; exact float64 windowed sums on
        # TPU go through the XLA kernels instead (ops.acf_windowed)
        x = x.astype(jnp.float32)

    # (N, P, d) → (P·d, N) rows
    xt = jnp.moveaxis(x, 0, -1).reshape(p * d, n)
    if on_tpu:
        # Mosaic lowering requires 32-bit index/iota types; trace the
        # kernel with x64 disabled (values are float32 throughout)
        with jax.enable_x64(False):
            sums = _lag_sums_transposed(xt, n_lags, mode)
    else:
        sums = _lag_sums_transposed(xt, n_lags, mode, interpret=True)
    sums = sums.reshape(p, d, n_lags).sum(axis=1)  # (P, n_lags)
    if reduce_mode == "mean":
        sums = sums / d
    out = sums.T / (n - jnp.arange(n_lags, dtype=x.dtype))[:, None]
    if mode == "einstein":
        out = out.at[0].set(0.0)
    return out
