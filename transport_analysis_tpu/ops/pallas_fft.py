"""Fused Pallas autocorrelation FFT: float64-grade, int8 MXU, few ops.

Why this exists. The matmul-decomposition FFT (ops/fft.py) is CORRECT
on TPU but executes as ~1,800 XLA ops at the benchmark shape, and this
backend's per-op floor (~30-100 us, trace-verified, BENCH_NOTES round
3) makes the float64 path op-count-bound: ~46 ms where the arithmetic
is worth ~5. This module computes the same Wiener-Khinchin raw
autocorrelation as FOUR fused Pallas kernels — forward levels 1-2 and
inverse levels A-B, with the Hermitian unpack + power spectrum fused
into inverse A — so the whole pipeline is a few dozen device ops.

Numerical scheme (Ozaki-style exact banded arithmetic, as in
ops/ozaki.py, re-cut for in-kernel use):

- float64 values travel between levels as DOUBLE-FLOAT PAIRS (hi, lo
  float32). This TPU's "f64" is a float32 pair anyway; carrying it
  explicitly lets Mosaic (f32-only) handle every step.
- Each level slices its input into seven 7-bit mantissa bands on
  absolutely aligned power-of-two grids. Band values are INTEGERS of
  magnitude <= 68 in grid units: exact in int8, and the MXU's
  int8 x int8 -> int32 dot is exact (68^2 * K_eff << 2^31; group sums
  also stay < 2^24, keeping their f32 conversion exact). int8 matmuls
  run 2x bf16 on the MXU.
- Slicing needs no TwoSum: bands 0-2 come off `hi` by exact
  nearest-grid-multiple subtraction (Sterbenz); then t = residual + lo
  (ONE rounding at ~2^-45, below the 49-bit budget) yields bands 3-6.
  The junction band magnitude is <= 68 grid units (slightly above the
  65 of the sequential-f64 slicing; still int8-exact).
- All band pairs with p+q = g share the grid ulp 2^-(7g+12), so group
  sums are ONE int8 GEMM each via contraction-axis concatenation: the
  lhs band stack is ordered [B_6 | ... | B_0] and group g multiplies
  its SUFFIX against the rhs stack's PREFIX (ascending q). Complex
  products fold in as well: rhs slabs stack [RE_q; IM_q] and the two
  outputs use lhs band pairs [C_p | -S_p] and [S_p | C_p] (same
  algebra as ops/ozaki.complex_dft_matmul).
- Groups merge with a compensated (TwoSum) f32 chain into the output
  pair, identical to ops/ozaki._merge_groups.

Twiddle folding. The four-step factorization's twiddles are folded
into the LEVEL MATRICES, which become per-grid-step constants: forward
level 1 at batch column j2 applies diag(W_M^(k1 j2)) . DFT_128, and
inverse level B at j2 applies IDFT_128-rows . diag(W_M^(-k1 j2)). The
matrices are expanded ON DEVICE from tiny exact host trig tables and
sliced to int8 bands in float64-pair arithmetic at first use, so the
twiddle multiply costs zero per-call device work and no accuracy (it
rides the same 49-bit band budget as the DFT matrix). Apart from the
fused unpack's double-float squares, the kernels contain NO
transcendentals — only rint/pow2 slicing, int8 dots, and f32 adds.

Dynamic range. Every level normalizes PER GEMM COLUMN with an exact
power-of-two scale (divided out before slicing, multiplied back after
the merge), so band coverage tracks each spectral column's own
magnitude: per-series scales or worst-case growth bounds lose 10-17
bits on DC-heavy data (measured 1e-8/1e-11 vs 1e-12). Scales come
from the input, from kernels' per-column colmax side outputs, or from
cheap f32 XLA reduces over an intermediate — and are built by
exponent-field BIT MANIPULATION: this backend's f32 jnp.exp2 is a
polynomial approximation that is inexact for large arguments, and a
non-pow2 "scale" silently breaks the exactness of pair arithmetic.

Layout. Intermediates are (rows, flat (step, w) columns) float32
pairs; data blocks are plain 2D (K, W_TILE) tiles, and the four-step's
inter-level relayout rides transposed 3D OUTPUT BlockSpecs
((1, rows, W_TILE) blocks of a (steps, rows, w) array) instead of XLA
transposes. Wrapper post-processing (packing, component sums) also
stays in the pair domain: emulated-float64 relayouts cost ~1-3 ms per
100 MB here (see raw_autocorr_pallas_pair).

Supported: M = 128 * n2 for n2 in {32 .. 512} (int8 sublane tiling
needs n2 >= 32; dense DFT_n2 flops and VMEM cap n2 at 512 with the
96 MB vmem limit the kernels request), series count >= 2*W_TILE.
Other shapes fall back to ops/fft.py. Reference contract:
tidynamics.acf float64 semantics (reference velocityautocorr.py:208;
tests pin 1e-11-grade agreement; bench measures ~1e-12).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DELTA = 7
_N_BANDS = 7            # 49-bit coverage below each stage's column max
_N1 = 128               # level-1 / inverse-level-B DFT size (MXU tile)
_W_TILE = int(os.environ.get('TRANSPORT_ANALYSIS_TPU_FFT_W_TILE', 256))  # batch columns per grid step
if _W_TILE <= 0 or _W_TILE % 128:
    raise ValueError(
        "TRANSPORT_ANALYSIS_TPU_FFT_W_TILE must be a positive multiple "
        f"of 128 (lane-tile width); got {_W_TILE}. Unaligned tiles "
        "break kernel tiling and the shape_supported gate."
    )
_HI_BANDS = 3           # bands taken from `hi` before folding in `lo`

_Z0 = np.int32(0)       # index-map constant (python ints trace as i64
                        # under x64 and fail Mosaic legalization)


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (tests on CPU)."""
    return jax.default_backend() in ("cpu",)


@functools.lru_cache(maxsize=1)
def is_tpu_backend() -> bool:
    """ALLOWLIST gate for the Mosaic/Pallas production paths.

    The hardware kernels only lower on TPU backends — ``tpu`` proper
    or a TPU plugin whose devices still report a TPU ``device_kind``
    (e.g. the tunneled ``axon`` runtime's "TPU v5 lite"). The
    historical denylist (``backend not in cpu/gpu/...``) sent every
    OTHER backend name (METAL, future plugins) into Mosaic lowering
    crashes (round-4 advisor finding); unknown backends now fall back
    to the backend-agnostic XLA paths instead. Cached per process —
    the default backend cannot change under a running JAX program.
    """
    backend = jax.default_backend()
    if backend in ("cpu", "gpu", "cuda", "rocm", "metal"):
        return False
    if backend == "tpu":
        return True
    try:
        return any(
            "tpu" in d.device_kind.lower() for d in jax.devices()
        )
    except Exception:  # pragma: no cover - exotic plugin backends
        return False


# ---------------------------------------------------------------------
# constant preparation (device expansion of exact host trig tables)
# ---------------------------------------------------------------------

def _slice_bands_dev(x, n_bands=_N_BANDS):
    """Band-slice float64 data (|x| <= 1) into ``n_bands`` int8 arrays
    on the aligned grids 2^-(7q+6). Mirrors ops/ozaki._slice_operand;
    every step is exact in the device's float64 pair arithmetic."""
    bands = []
    r = x
    for q in range(n_bands):
        scale = 2.0 ** (_DELTA * (q + 1) - 1)
        m = jnp.rint(r * scale)
        bands.append(m.astype(jnp.int8))
        r = r - m / scale
    return bands


def _complex_lhs_stacks_dev(c, s, n_bands=_N_BANDS):
    """lhs band stacks for complex matrices (c + i s) acting on rhs
    slabs [RE_q; IM_q]: re-output uses [C_p | -S_p], im-output uses
    [S_p | C_p]; both stacked REVERSED ([highest p | ... | p=0]) so
    group g takes the suffix of length 2K(g+1). Last-axis concat;
    leading batch dims pass through."""
    cb = _slice_bands_dev(c, n_bands)
    sb = _slice_bands_dev(s, n_bands)
    re_slabs = [jnp.concatenate([cb[p], -sb[p]], axis=-1)
                for p in range(n_bands)]
    im_slabs = [jnp.concatenate([sb[p], cb[p]], axis=-1)
                for p in range(n_bands)]
    return (jnp.concatenate(list(reversed(re_slabs)), axis=-1),
            jnp.concatenate(list(reversed(im_slabs)), axis=-1))


@functools.partial(jax.jit,
                   static_argnames=("n2", "j1_out", "n_bands"))
def _build_constants(d1c, d1s, d2c, d2s, twc, tws, e1c, e1s,
                     n2: int, j1_out: int, n_bands: int):
    """Expand tiny exact host trig tables into the banded int8 level
    matrices ON DEVICE (the expanded stacks are ~120 MB at n2=128;
    embedding them as HLO literals or shipping them through the host
    tunnel is far worse than a one-time device build)."""
    out = {}
    out["l2_re"], out["l2_im"] = (
        x[None] for x in _complex_lhs_stacks_dev(d2c, d2s, n_bands))
    out["ia_re"], out["ia_im"] = (
        x[None] for x in _complex_lhs_stacks_dev(d2c, -d2s, n_bands))

    # fwd L1 per j2: diag(tw_j2) @ DFT_128, tw = e^{-2 pi i k1 j2 / M}
    lc = twc[:, :, None] * d1c[None] - tws[:, :, None] * d1s[None]
    ls = twc[:, :, None] * d1s[None] + tws[:, :, None] * d1c[None]
    out["l1_re"], out["l1_im"] = _complex_lhs_stacks_dev(lc, ls, n_bands)

    # inv B per j2: IDFT_128 rows (no 1/M) times conj twiddle:
    # e^{+i(e1 + ang)} with ang = 2 pi k1 j2 / M
    # cos(a+b) = ca cb - sa sb ; sin(a+b) = sa cb + ca sb
    angc, angs = twc, -tws   # cos(ang), sin(ang)
    bc = (e1c[None] * angc[:, None, :] - e1s[None] * angs[:, None, :])
    bs = (e1s[None] * angc[:, None, :] + e1c[None] * angs[:, None, :])
    out["ib_re"], out["ib_im"] = _complex_lhs_stacks_dev(bc, bs, n_bands)
    return out


@functools.lru_cache(maxsize=8)
def _device_constants(n2: int, j1_out: int,
                      n_bands: int = _N_BANDS):
    """Banded int8 level matrices for M = 128*n2, twiddles folded,
    cached on device.

    l1_re/l1_im: (n2, 128, 2*128*7)    fwd L1, per j2
    l2_re/l2_im: (1, n2, 2*n2*7)       fwd L2, shared (DFT_n2)
    ia_re/ia_im: (1, n2, 2*n2*7)       inv A, shared (conj DFT_n2)
    ib_re/ib_im: (n2, j1_out, 2*128*7) inv B, per j2 (IDFT_128 rows;
                 the 1/M lives in the caller's epilogue scale —
                 dividing the matrix would waste log2(M) band bits)
    """
    k1 = np.arange(_N1)
    theta1 = 2.0 * np.pi * np.outer(k1, k1) / _N1
    jj = np.arange(n2)
    theta2 = 2.0 * np.pi * np.outer(jj, jj) / n2
    mm = _N1 * n2
    ang = 2.0 * np.pi * np.outer(jj, k1) / mm
    e1 = 2.0 * np.pi * np.outer(np.arange(j1_out), k1) / _N1
    f64 = jnp.float64
    # ensure_compile_time_eval: this cache is often first populated
    # while TRACING a caller's jit — without it the lru_cache would
    # capture (and leak) tracers instead of concrete device arrays
    with jax.ensure_compile_time_eval():
        consts = _build_constants(
            jnp.asarray(np.cos(theta1), f64),
            jnp.asarray(-np.sin(theta1), f64),
            jnp.asarray(np.cos(theta2), f64),
            jnp.asarray(-np.sin(theta2), f64),
            jnp.asarray(np.cos(ang), f64), jnp.asarray(-np.sin(ang), f64),
            jnp.asarray(np.cos(e1), f64), jnp.asarray(np.sin(e1), f64),
            n2=n2, j1_out=j1_out, n_bands=n_bands,
        )
    return jax.tree_util.tree_map(jax.block_until_ready, consts)


# ---------------------------------------------------------------------
# in-kernel building blocks
# ---------------------------------------------------------------------

def _slice_pair_into(ref, base, step, hi, lo, n_bands=_N_BANDS):
    """Write ``n_bands`` int8 band rows of the pair (hi, lo),
    |hi+lo| <= 1, at ref[base + q*step : base + q*step + K]."""
    k = hi.shape[0]
    r = hi
    for q in range(n_bands):
        if q == _HI_BANDS:
            r = r + lo   # one rounding ~2^-45, below the band budget
        s = np.float32(2.0 ** (_DELTA * (q + 1) - 1))
        g = np.float32(2.0 ** -(_DELTA * (q + 1) - 1))
        mq = jnp.rint(r * s)
        ref[base + q * step: base + q * step + k] = mq.astype(jnp.int8)
        r = r - mq * g


def _two_sum(a, b):
    s = a + b
    bv = s - a
    return s, (a - (s - bv)) + (b - bv)


def _merge(groups):
    """Compensated f32 sum of int32 group GEMMs (descending magnitude;
    group g carries grid ulp 2^-(7g+12)) into a double-float pair."""
    hi = groups[0].astype(jnp.float32) * np.float32(2.0 ** -12)
    lo = jnp.zeros_like(hi)
    for g in range(1, len(groups)):
        v = groups[g].astype(jnp.float32) * np.float32(
            2.0 ** -(_DELTA * g + 12))
        hi, e = _two_sum(hi, v)
        lo = lo + e
    return hi, lo


# highest significance group (pair budget p+q <= max_group). The f64
# profile's 6 gives 49-bit coverage (1e-12-grade end to end); 5 trades
# ~1.5e-12 of truncation per level for ~14% fewer GEMM flops —
# overridable for experiments via TRANSPORT_ANALYSIS_TPU_FFT_MAX_GROUP.
_MAX_GROUP = int(os.environ.get(
    "TRANSPORT_ANALYSIS_TPU_FFT_MAX_GROUP", _N_BANDS - 1))

# precision profiles: dtype -> (n_bands, max_group). float64 carries
# 7x7-bit bands (49 bits below each column max); float32 needs only
# its own 24-bit grade, so 4 bands with pairs p+q <= 3 (10 of the 28
# f64 band products) land at the advertised ~1e-6 while keeping every
# exactness argument (band values <= 68 in int8, group sums < 2^24).
#
# _F64_OVERRIDE, set via ops.fft_precision(...), trades band budget
# for GEMM throughput on float64 inputs (the engine dispatchers read
# it EAGERLY and pass it down as jit statics, so switching profiles
# retraces instead of silently reusing stale kernels).
_F64_OVERRIDE = None


def _profile(dtype):
    if dtype == jnp.float64:
        if _F64_OVERRIDE is not None:
            return _F64_OVERRIDE
        return _N_BANDS, _MAX_GROUP
    return 4, 3


# Named grades for fft_precision. Truncation per banded product is
# ~2^-(7*(max_group+1)) relative to the column max; end-to-end grades
# below are hardware-measured vs the exact profile (BENCH_NOTES
# "precision ladder").
_PRECISION_PROFILES = {
    "exact": None,       # (7, 6): every band pair, ~1e-13 end to end
    "high": (7, 5),      # 21/28 pairs, ~1e-12
    "medium": (5, 4),    # 15 pairs over 5 bands, ~1e-10
    "fast": (4, 3),      # the float32 grade (10 pairs), ~1e-6
}


class fft_precision:
    """Context manager trading float64-FFT band budget for speed.

    The banded engine reconstructs float64-grade products from int8/
    bf16 MXU GEMMs over mantissa bands (module docstring); the GEMM
    cost is proportional to the number of band PAIRS kept. Analyses
    with a tolerance looser than 1e-13 can trim the budget::

        with ops.fft_precision("medium"):      # ~1e-10 grade
            VelocityAutocorr(ag).run()

    Accepts a profile name (%s) or an explicit ``(n_bands,
    max_group)`` tuple — ``n_bands`` mantissa bands per operand
    (1..7, 7 bits each below the column max), keeping products with
    band indices ``p + q <= max_group``. Affects float64 inputs on
    the TPU engine paths only (the fused Pallas engine, its deep
    >65536-frame composition, and the Ozaki outer DFT); float32
    inputs already run the "fast" grade, and non-TPU backends use
    native FFTs. Dispatchers read the profile eagerly at call time,
    so entering a profile retraces kernels instead of reusing stale
    ones; nesting restores the previous profile on exit.
    """ % ", ".join(sorted(_PRECISION_PROFILES))

    def __init__(self, profile):
        if isinstance(profile, str):
            try:
                self._target = _PRECISION_PROFILES[profile]
            except KeyError:
                raise ValueError(
                    f"unknown fft_precision profile {profile!r}; "
                    f"expected one of {sorted(_PRECISION_PROFILES)} "
                    "or an (n_bands, max_group) tuple"
                ) from None
        elif profile is None:
            self._target = None
        else:
            n_bands, max_group = profile
            if not (1 <= int(n_bands) <= _N_BANDS):
                raise ValueError(
                    f"n_bands must be in 1..{_N_BANDS}, got {n_bands}")
            if not (0 <= int(max_group) <= 2 * int(n_bands) - 2):
                raise ValueError(
                    f"max_group must be in 0..{2 * int(n_bands) - 2} "
                    f"for n_bands={n_bands}, got {max_group}")
            self._target = (int(n_bands), int(max_group))
        self._prev = None

    def __enter__(self):
        global _F64_OVERRIDE
        self._prev = _F64_OVERRIDE
        _F64_OVERRIDE = self._target
        return self

    def __exit__(self, *exc):
        global _F64_OVERRIDE
        _F64_OVERRIDE = self._prev
        return False


def _grouped_dots(lhs_stack, rhs_ref, k_slab, n_bands=_N_BANDS,
                  max_group=None):
    """One exact int8 GEMM per significance group: lhs suffix
    (length k_slab*(g+1)) x rhs prefix."""
    if max_group is None:
        max_group = _MAX_GROUP
    k_total = k_slab * n_bands
    return [
        jax.lax.dot(
            lhs_stack[:, k_total - k_slab * (g + 1):],
            rhs_ref[: k_slab * (g + 1)],
            preferred_element_type=jnp.int32,
        )
        for g in range(max_group + 1)
    ]


def _level_kernel_body(transposed_out: bool, n_bands: int,
                       max_group: int, lre_ref, lim_ref, rh_ref,
                       rl_ref, ih_ref, il_ref, s_ref, orh_ref, orl_ref,
                       oih_ref, oil_ref, omax_ref, rhs_scratch):
    """One banded level on a (K, W_TILE) block of flat (step, w)
    columns. Data travels in TRUE units between levels: the kernel
    divides by the per-GEMM-COLUMN power-of-two scale, slices into int8
    slabs, runs the grouped exact GEMMs for both complex outputs,
    merges, and multiplies the scale back in before storing (all scale
    ops exact). Per-column — not per-series — normalization matters: a
    spectrum with a DC spike otherwise costs every other spectral
    column ~17 bits of band coverage (measured 1e-11 vs 1e-13).
    With transposed_out the (rows, W) result lands as a (1, rows, W)
    block of a (n_steps, rows, w) array — the four-step's inter-level
    relayout rides the output BlockSpec instead of an XLA transpose."""
    s = s_ref[:]
    inv = 1.0 / s
    rh, rl = rh_ref[:] * inv, rl_ref[:] * inv
    ih, il = ih_ref[:] * inv, il_ref[:] * inv
    k = rh.shape[0]

    # rhs band stack: slab q = [RE_q; IM_q] at rows [2Kq, 2K(q+1))
    _slice_pair_into(rhs_scratch, 0, 2 * k, rh, rl, n_bands)
    _slice_pair_into(rhs_scratch, k, 2 * k, ih, il, n_bands)

    re_hi, re_lo = _merge(_grouped_dots(
        lre_ref[0], rhs_scratch, 2 * k, n_bands, max_group))
    im_hi, im_lo = _merge(_grouped_dots(
        lim_ref[0], rhs_scratch, 2 * k, n_bands, max_group))
    re_hi, re_lo, im_hi, im_lo = (
        re_hi * s, re_lo * s, im_hi * s, im_lo * s)

    if transposed_out:
        orh_ref[0] = re_hi
        orl_ref[0] = re_lo
        oih_ref[0] = im_hi
        oil_ref[0] = im_lo
    else:
        orh_ref[:] = re_hi
        orl_ref[:] = re_lo
        oih_ref[:] = im_hi
        oil_ref[:] = im_lo
    omax_ref[:] = jnp.max(
        jnp.maximum(jnp.abs(re_hi), jnp.abs(im_hi)),
        axis=0, keepdims=True)


def _banded_level(lre, lim, pair, scale, out_rows: int,
                  per_step_lhs: bool, n_w: int,
                  transposed_out: bool = False,
                  n_bands: int = _N_BANDS, max_group: int = None,
                  wt: int = None):
    """Run one banded level over a (K, n_steps*W) double-float complex
    intermediate (columns flat (step, w), W = n_w * wt per step).

    ``pair`` = (re_hi, re_lo, im_hi, im_lo); ``scale`` = (1, n_steps*W)
    power-of-two scale per flat GEMM column, divided out before slicing
    and multiplied back after the merge. Returns (out pair, colmax
    (1, n_steps*W) of the true outputs). The out pair is
    (out_rows, n_steps*W) — or, with transposed_out, the relayouted
    (n_steps, out_rows, w) form the NEXT level consumes as a plain
    reshape view, eliminating XLA transposes.
    """
    if wt is None:
        wt = _W_TILE
    rh, rl, ih, il = pair
    k, cols = rh.shape
    n_tiles = cols // wt
    n_steps = n_tiles // n_w

    if per_step_lhs:
        lhs_idx = lambda t: (                        # noqa: E731
            jax.lax.div(t, np.int32(n_w)), _Z0, _Z0)
    else:
        lhs_idx = lambda t: (_Z0, _Z0, _Z0)          # noqa: E731
    lhs_spec = pl.BlockSpec(
        (1,) + lre.shape[1:], lhs_idx, memory_space=pltpu.VMEM)
    data_spec = pl.BlockSpec((k, wt), lambda t: (_Z0, t),
                             memory_space=pltpu.VMEM)
    if transposed_out:
        out_shape = (n_steps, out_rows, n_w * wt)
        out_spec = pl.BlockSpec(
            (1, out_rows, wt),
            lambda t: (jax.lax.div(t, np.int32(n_w)), _Z0,
                       jax.lax.rem(t, np.int32(n_w))),
            memory_space=pltpu.VMEM)
    else:
        out_shape = (out_rows, cols)
        out_spec = pl.BlockSpec((out_rows, wt), lambda t: (_Z0, t),
                                memory_space=pltpu.VMEM)
    max_spec = pl.BlockSpec((1, wt), lambda t: (_Z0, t),
                            memory_space=pltpu.VMEM)
    scale_spec = max_spec

    if max_group is None:
        max_group = _MAX_GROUP
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_level_kernel_body, transposed_out, n_bands,
                          max_group),
        grid=(n_tiles,),
        in_specs=[lhs_spec, lhs_spec, data_spec, data_spec, data_spec,
                  data_spec, scale_spec],
        out_specs=(out_spec,) * 4 + (max_spec,),
        out_shape=(
            (jax.ShapeDtypeStruct(out_shape, f32),) * 4
            + (jax.ShapeDtypeStruct((1, cols), f32),)
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * k * n_bands, wt), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(lre, lim, rh, rl, ih, il, scale)
    return outs[:4], outs[4]


# ---------------------------------------------------------------------
# relayout-free levels: 3D leading-split views + sub-blocked kernels
# ---------------------------------------------------------------------
#
# The 2D levels above require the (128, n2*B) engine layout; producing
# it from a chain-boundary (M, B) array is a PHYSICAL tiled-layout
# relayout on TPU (the linear-memory reshape regroups the (8, 128)
# tiles), and the k-major exit reshape is another. Hardware-measured
# (benchmarks/micro_level.py): entry+exit relayouts cost ~37 ms per
# 4-plane pair at B=8192 — ~0.15 s per acf at the north-star chunk,
# the single largest "profile-flat" cost in the deep chain (the
# round-7 attribution blamed in-kernel band slicing; the slicing
# measures ~9 ms/level — the relayouts were the real base).
#
# The v3 levels below avoid BOTH relayouts: the (M, B) operand enters
# as the (128, n2, B) LEADING-SPLIT view — free, the tiling lives on
# the last two dims and n2 % 8 == 0 keeps the byte layout identical —
# and each kernel block carries a middle-dim slab of ``_CG`` = 8
# columns-groups (Pallas requires the 2nd-minor block dim be a
# multiple of 8), processed by an in-kernel loop of ``_CG``
# independent slicing+GEMM pipelines. Level 2 likewise reads level
# 1's 3D output directly and writes (l2_rows, 128, B), whose k-major
# 2D form is a free leading merge.

_CG = 8  # middle-dim sub-blocks per grid step (min legal: 8)


def _level3_kernel_body(cg: int, n_bands: int, max_group: int,
                        per_sub_lhs: bool, out_sub0: bool,
                        lre_ref, lim_ref, rh_ref, rl_ref, ih_ref,
                        il_ref, s_ref, orh_ref, orl_ref, oih_ref,
                        oil_ref, omax_ref, rhs_scratch):
    """One banded level on a (K, cg, wt) block of the 3D view: ``cg``
    independent sub-columns-groups, each running the same
    divide-by-scale -> band-slice -> grouped int8 GEMMs -> merge ->
    rescale pipeline as _level_kernel_body. ``per_sub_lhs`` indexes
    the twiddle-folded lhs per sub-group (level 1); ``out_sub0``
    selects the output sub-axis: leading (level 1 writes (cg, 128,
    wt) blocks of the (n2, 128, B) transposed form) vs middle (level
    2 writes (rows, cg, wt) blocks of the k-major (l2_rows, 128, B)
    form)."""
    # ONE contiguous load per operand + ONE sub-axis transpose (a
    # single vector shuffle, vs cg strided loads per operand);
    # sub-group slicing is then free leading indexing
    vrh = jnp.swapaxes(rh_ref[:], 0, 1)
    vrl = jnp.swapaxes(rl_ref[:], 0, 1)
    vih = jnp.swapaxes(ih_ref[:], 0, 1)
    vil = jnp.swapaxes(il_ref[:], 0, 1)
    svals = s_ref[:]
    acc = ([], [], [], [], [])
    for i in range(cg):
        s = svals[i: i + 1, :]
        inv = 1.0 / s
        rh, rl = vrh[i] * inv, vrl[i] * inv
        ih, il = vih[i] * inv, vil[i] * inv
        k = rh.shape[0]
        _slice_pair_into(rhs_scratch, 0, 2 * k, rh, rl, n_bands)
        _slice_pair_into(rhs_scratch, k, 2 * k, ih, il, n_bands)
        lre = lre_ref[i] if per_sub_lhs else lre_ref[0]
        lim = lim_ref[i] if per_sub_lhs else lim_ref[0]
        re_hi, re_lo = _merge(_grouped_dots(
            lre, rhs_scratch, 2 * k, n_bands, max_group))
        im_hi, im_lo = _merge(_grouped_dots(
            lim, rhs_scratch, 2 * k, n_bands, max_group))
        acc[0].append(re_hi * s)
        acc[1].append(re_lo * s)
        acc[2].append(im_hi * s)
        acc[3].append(im_lo * s)
        acc[4].append(jnp.max(
            jnp.maximum(jnp.abs(acc[0][-1]), jnp.abs(acc[2][-1])),
            axis=0, keepdims=True))
    def emit(vals):
        out = jnp.stack(vals, axis=0)          # (cg, rows, wt)
        return out if out_sub0 else jnp.swapaxes(out, 0, 1)

    orh_ref[:] = emit(acc[0])
    orl_ref[:] = emit(acc[1])
    oih_ref[:] = emit(acc[2])
    oil_ref[:] = emit(acc[3])
    omax_ref[:] = jnp.concatenate(acc[4], axis=0)


def _banded_level3(lre, lim, pair3, scale, out_rows: int,
                   per_sub_lhs: bool, out_sub0: bool,
                   n_bands: int = _N_BANDS, max_group: int = None,
                   wt: int = _W_TILE, cg: int = _CG):
    """Run one banded level over a 3D (K, G, B) double-float complex
    view (contraction axis 0, G sub-columns-groups, B lanes).

    ``scale``/colmax are (G, B) per (sub-group, lane) GEMM column.
    Output: ``out_sub0`` selects the sub-group axis position —
    leading, (G, out_rows, B) (level 1's transposed form, consumed
    as-is by the next level), or middle, (out_rows, G, B) (whose 2D
    leading merge is the free k-major / lag-major exit).
    """
    if max_group is None:
        max_group = _MAX_GROUP
    rh = pair3[0]
    k, g, b = rh.shape
    n_g = g // cg
    n_b = b // wt

    if per_sub_lhs:
        lhs_spec = pl.BlockSpec(
            (cg,) + lre.shape[1:], lambda gg, t: (gg, _Z0, _Z0),
            memory_space=pltpu.VMEM)
    else:
        lhs_spec = pl.BlockSpec(
            (1,) + lre.shape[1:], lambda gg, t: (_Z0, _Z0, _Z0),
            memory_space=pltpu.VMEM)
    data_spec = pl.BlockSpec((k, cg, wt), lambda gg, t: (_Z0, gg, t),
                             memory_space=pltpu.VMEM)
    if out_sub0:
        out_shape = (g, out_rows, b)
        out_spec = pl.BlockSpec((cg, out_rows, wt),
                                lambda gg, t: (gg, _Z0, t),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = (out_rows, g, b)
        out_spec = pl.BlockSpec((out_rows, cg, wt),
                                lambda gg, t: (_Z0, gg, t),
                                memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((cg, wt), lambda gg, t: (gg, t),
                           memory_space=pltpu.VMEM)

    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_level3_kernel_body, cg, n_bands, max_group,
                          per_sub_lhs, out_sub0),
        grid=(n_g, n_b),
        in_specs=[lhs_spec, lhs_spec] + [data_spec] * 4 + [sc_spec],
        out_specs=(out_spec,) * 4 + (sc_spec,),
        out_shape=(
            (jax.ShapeDtypeStruct(out_shape, f32),) * 4
            + (jax.ShapeDtypeStruct((g, b), f32),)
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * k * n_bands, wt), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(lre, lim, *pair3, scale)
    return outs[:4], outs[4]


@functools.partial(
    jax.jit, static_argnames=("n_bands", "max_group", "wt", "l2_rows"),
    donate_argnums=(0,))
def _fft_fwd_impl_v3(pair, consts, n_bands: int = _N_BANDS,
                     max_group: int = None, wt: int = _W_TILE,
                     l2_rows: int = None):
    """Relayout-free forward banded FFT along axis 0 of complex (M, B)
    double-float pairs: identical contract to _fft_fwd_impl (natural
    frequency order k = k2*128 + k1 out), but every inter-stage
    reshape is a free leading split/merge — the (128, n2, B) entry
    view, level 1's (n2, 128, B) transposed output consumed as-is by
    level 2, and the (l2_rows, 128, B) -> (l2_rows*128, B) k-major
    exit merge. Hardware: both levels run at the standalone-probe
    walls; the 2D impl paid ~4 extra relayout passes per call
    (micro_level.py, BENCH_NOTES round 8)."""
    if max_group is None:
        max_group = _MAX_GROUP
    rh = pair[0]
    m, b = rh.shape
    n2 = m // _N1
    if l2_rows is None:
        l2_rows = n2
    pair3 = tuple(a.reshape(_N1, n2, b) for a in pair)  # free view
    s_in = _pow2_ceil_f32(jnp.maximum(
        jnp.max(jnp.abs(pair3[0]), axis=0),
        jnp.max(jnp.abs(pair3[2]), axis=0)))
    # level 1: contract j1 per (j2, b), twiddle-folded per-j2 lhs,
    # output in the (j2, k1, b) transposed form
    pair3, _ = _banded_level3(consts["l1_re"], consts["l1_im"], pair3,
                              s_in, _N1, True, True,
                              n_bands=n_bands, max_group=max_group,
                              wt=wt)
    s1 = _pow2_ceil_f32(jnp.max(
        jnp.maximum(jnp.abs(pair3[0]), jnp.abs(pair3[2])),
        axis=0))
    l2_re, l2_im = consts["l2_re"], consts["l2_im"]
    if l2_rows < n2:
        l2_re = l2_re[:, :l2_rows, :]
        l2_im = l2_im[:, :l2_rows, :]
    # level 2: contract j2 per (k1, b), shared lhs, output k-major
    # as the free (l2_rows, 128, b) -> (l2_rows*128, b) merge
    pair3, _ = _banded_level3(l2_re, l2_im, pair3, s1, l2_rows,
                              False, False,
                              n_bands=n_bands, max_group=max_group,
                              wt=wt)
    return tuple(a.reshape(l2_rows * _N1, b) for a in pair3)


def _fwd_v3_ok(m: int, b: int, wt: int) -> bool:
    """Shape gate for the relayout-free forward impl."""
    import os

    if os.environ.get("TRANSPORT_ANALYSIS_TPU_NO_FFT3"):
        return False
    n2 = m // _N1
    return n2 % _CG == 0 and _N1 % _CG == 0 and b % wt == 0


def _fft_fwd_auto(pair, consts, n_bands: int = _N_BANDS,
                  max_group: int = None, wt: int = _W_TILE,
                  l2_rows: int = None):
    """Forward banded FFT, dispatching to the relayout-free v3 impl
    when the shape allows (callers that compose the engine inside
    their own jit — the deep chain — use this so the choice is made
    per trace)."""
    m, b = pair[0].shape
    impl = (_fft_fwd_impl_v3 if _fwd_v3_ok(m, b, wt)
            else _fft_fwd_impl)
    return impl(pair, consts, n_bands=n_bands, max_group=max_group,
                wt=wt, l2_rows=l2_rows)


# ---------------------------------------------------------------------
# fused Hermitian unpack + power spectrum + inverse level A
# ---------------------------------------------------------------------

def _df_add(ah, al, bh, bl):
    """Double-float addition: TwoSum on heads, tails folded."""
    s, e = _two_sum(ah, bh)
    return s, e + al + bl


def _df_sq(h, l):
    """(h + l)^2 to ~2^-45 relative: exact h*h via a Dekker/Veltkamp
    split (no FMA on the VPU) plus the first-order 2hl cross term."""
    c = h * np.float32(4097.0)
    hh = c - (c - h)
    ht = h - hh
    p = h * h
    e = ((hh * hh - p) + 2.0 * (hh * ht)) + ht * ht
    return p, e + 2.0 * (h * l)


def _half(h, l):
    return h * np.float32(0.5), l * np.float32(0.5)


def _inva_kernel_body(n_w: int, n_bands: int, max_group: int,
                      lre_ref, lim_ref,
                      zrh_ref, zrl_ref, zih_ref, zil_ref,
                      frh_ref, frl_ref, fih_ref, fil_ref,
                      r0rh_ref, r0rl_ref, r0ih_ref, r0il_ref,
                      s_ref, orh_ref, orl_ref, oih_ref, oil_ref,
                      omax_ref, rhs_scratch):
    """Inverse level A with the Hermitian unpack and power spectrum
    fused in. Inputs per (k1, w) tile: the straight Z block, the
    k2-FLIPPED Z block of the MIRRORED k1 column (flip done by one XLA
    rev; the k1-mirror rides the index_map), and the roll-flipped
    k1 = 0 plane (the (M-k) pairing is (n2-1-k2, 128-k1) for k1 > 0
    but ((n2-k2) mod n2, 0) on the k1 = 0 plane). Computes
    F1/F2 and their power spectra in double-float arithmetic, then
    slices (P1 + i P2)/s — s a per-column power-of-two bound on the
    power maximum — into the banded GEMMs of conj(DFT_n2), and
    multiplies s back into the merged result (true units out)."""
    zrh, zrl = zrh_ref[:], zrl_ref[:]
    zih, zil = zih_ref[:], zil_ref[:]

    k1 = jax.lax.div(pl.program_id(0), np.int32(n_w))
    is0 = k1 == 0
    mrh = jnp.where(is0, r0rh_ref[:], frh_ref[:])
    mrl = jnp.where(is0, r0rl_ref[:], frl_ref[:])
    mih = jnp.where(is0, r0ih_ref[:], fih_ref[:])
    mil = jnp.where(is0, r0il_ref[:], fil_ref[:])

    # F1 = (Z + conj(Zr))/2, F2 = (Z - conj(Zr))/(2i)
    f1r = _half(*_df_add(zrh, zrl, mrh, mrl))
    f1i = _half(*_df_add(zih, zil, -mih, -mil))
    f2r = _half(*_df_add(zih, zil, mih, mil))
    f2i = _half(*_df_add(mrh, mrl, -zrh, -zrl))

    s = s_ref[:]
    inv = 1.0 / s
    p1 = _df_add(*_df_sq(*f1r), *_df_sq(*f1i))
    p2 = _df_add(*_df_sq(*f2r), *_df_sq(*f2i))
    p1 = (p1[0] * inv, p1[1] * inv)
    p2 = (p2[0] * inv, p2[1] * inv)

    # The P slicing gets an EIGHTH band: the slicing scale bounds
    # colmax(P) only to within 2 bits, and with 7 bands that slack
    # would surface as ~4x the band-truncation error (measured
    # 1.04e-11 at the bench shape — over the 1e-11 contract). Band 7
    # pushes the truncation to 2^-56 * bound; it pairs only with the
    # lhs's leading band (one extra small GEMM, group ulp 2^-(7*7+12)).
    k = zrh.shape[0]
    _slice_pair_into(rhs_scratch, 0, 2 * k, *p1, n_bands=n_bands + 1)
    _slice_pair_into(rhs_scratch, k, 2 * k, *p2, n_bands=n_bands + 1)

    def dots_extra(lhs_stack):
        groups = _grouped_dots(lhs_stack, rhs_scratch, 2 * k, n_bands,
                               max_group)
        # _merge scales by LIST POSITION; the extra (p=0, q=n_bands)
        # product carries grid ulp 2^-(7*n_bands+12), so it must sit at
        # position n_bands (zero-filled gap when max_group + 1 < n_bands,
        # e.g. under the TRANSPORT_ANALYSIS_TPU_FFT_MAX_GROUP override)
        for _ in range(max_group + 1, n_bands):
            groups.append(jnp.zeros_like(groups[0]))
        groups.append(jax.lax.dot(
            lhs_stack[:, -2 * k:],
            rhs_scratch[n_bands * 2 * k: (n_bands + 1) * 2 * k],
            preferred_element_type=jnp.int32,
        ))
        return groups

    re_hi, re_lo = _merge(dots_extra(lre_ref[0]))
    im_hi, im_lo = _merge(dots_extra(lim_ref[0]))
    re_hi, re_lo, im_hi, im_lo = (
        re_hi * s, re_lo * s, im_hi * s, im_lo * s)

    orh_ref[0] = re_hi
    orl_ref[0] = re_lo
    oih_ref[0] = im_hi
    oil_ref[0] = im_lo
    omax_ref[:] = jnp.max(
        jnp.maximum(jnp.abs(re_hi), jnp.abs(im_hi)),
        axis=0, keepdims=True)


def _inva_fused(lre, lim, pair, scale, n2: int, n_w: int,
                n_bands: int = _N_BANDS, max_group: int = None):
    """Fused unpack + inverse level A over the Z pair laid out
    (k2, (k1, w)). Emits the relayouted (k1, j2, w) form + colmax."""
    zrh, zrl, zih, zil = pair
    cols = zrh.shape[1]
    w = n_w * _W_TILE
    n_tiles = cols // _W_TILE

    # k2-flip (XLA rev: Mosaic has no in-kernel reverse) and the
    # roll-flipped k1 = 0 plane
    flipped = tuple(jnp.flip(a, axis=0) for a in pair)
    r0 = tuple(
        jnp.roll(jnp.flip(a.reshape(n2, _N1, w)[:, 0, :], axis=0),
                 1, axis=0)
        for a in pair
    )

    lhs_spec = pl.BlockSpec(
        (1,) + lre.shape[1:], lambda t: (_Z0, _Z0, _Z0),
        memory_space=pltpu.VMEM)
    data_spec = pl.BlockSpec((n2, _W_TILE), lambda t: (_Z0, t),
                             memory_space=pltpu.VMEM)

    def mirror_idx(t):
        k1 = jax.lax.div(t, np.int32(n_w))
        wj = jax.lax.rem(t, np.int32(n_w))
        mk1 = jax.lax.rem(np.int32(_N1) - k1, np.int32(_N1))
        return (_Z0, mk1 * np.int32(n_w) + wj)

    mirror_spec = pl.BlockSpec((n2, _W_TILE), mirror_idx,
                               memory_space=pltpu.VMEM)
    r0_spec = pl.BlockSpec(
        (n2, _W_TILE),
        lambda t: (_Z0, jax.lax.rem(t, np.int32(n_w))),
        memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((1, _W_TILE), lambda t: (_Z0, t),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, n2, _W_TILE),
        lambda t: (jax.lax.div(t, np.int32(n_w)), _Z0,
                   jax.lax.rem(t, np.int32(n_w))),
        memory_space=pltpu.VMEM)
    max_spec = pl.BlockSpec((1, _W_TILE), lambda t: (_Z0, t),
                            memory_space=pltpu.VMEM)

    if max_group is None:
        max_group = _MAX_GROUP
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_inva_kernel_body, n_w, n_bands, max_group),
        grid=(n_tiles,),
        in_specs=[lhs_spec, lhs_spec] + [data_spec] * 4
        + [mirror_spec] * 4 + [r0_spec] * 4 + [scale_spec],
        out_specs=(out_spec,) * 4 + (max_spec,),
        out_shape=(
            (jax.ShapeDtypeStruct((_N1, n2, w), f32),) * 4
            + (jax.ShapeDtypeStruct((1, cols), f32),)
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * n2 * (n_bands + 1), _W_TILE), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(lre, lim, *pair, *flipped, *r0, scale)
    return outs[:4], outs[4]


# ---------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------

def _pow2_ceil_f32(m):
    """Power-of-two >= m as float32, zeros -> 1, via exponent-field bit
    manipulation. NOT jnp.exp2: this backend's f32 exp2 is a polynomial
    approximation that is INEXACT for large arguments (measured:
    exp2(31) = 2147476900 != 2^31), and a scale that is not exactly a
    power of two silently breaks every "exact" pair-arithmetic
    division in the kernels (~1e-7 end-to-end, the hard way)."""
    m32 = m.astype(jnp.float32)
    u = jax.lax.bitcast_convert_type(m32, jnp.uint32)
    exp = (u >> np.uint32(23)) & np.uint32(0xFF)
    frac = u & np.uint32(0x7FFFFF)
    exp_out = exp + (frac != 0).astype(jnp.uint32)
    out = jax.lax.bitcast_convert_type(
        exp_out << np.uint32(23), jnp.float32)
    return jnp.where(m32 <= 0, jnp.float32(1.0), out)


def _split_pair(x):
    """Exact double-float split; float32 inputs get a zero tail (the
    pair machinery then runs unchanged at the lighter band profile)."""
    hi = x.astype(jnp.float32)
    if x.dtype == jnp.float64:
        lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    else:
        lo = jnp.zeros_like(hi)
    return hi, lo


def shape_supported(m: int, s: int) -> bool:
    """Pure shape gate (backend-independent; see ``supported``).

    n2 = 512 note: level-2 group sums there can reach 68*65*2*512*7
    ~ 3.2e7 > 2^24, so their int32 -> f32 conversion in _merge rounds
    (groups g >= 3 only, whose K_eff*(g+1) crosses 2^24). That
    rounding is <= 2^-24 RELATIVE TO THE GROUP, i.e. <= ~2^-45 of the
    result — below the band-truncation budget; group 0 (the accuracy-
    critical one, K_eff = 1024) stays exact. Hardware-measured
    1.7e-12 vs host f64 at M = 65536.
    """
    n2, rem = divmod(m, _N1)
    return rem == 0 and n2 in (32, 64, 128, 256, 512) and s >= 2 * _W_TILE


def supported(m: int, s: int) -> bool:
    """Shapes this engine handles on this backend; others use
    ops/fft.py (CPU/GPU have native or faster paths)."""
    if not is_tpu_backend():
        return False
    return shape_supported(m, s)


def _padded_w(s: int) -> int:
    half = (s + 1) // 2
    return -(-half // _W_TILE) * _W_TILE


def raw_autocorr_pallas(x, n_out: int):
    """Raw linear autocorrelation per column via the fused banded FFT.

    Contract identical to ops.fft.raw_autocorr_matmul: ``x`` (M, S)
    float64 or float32, zero-padded to M >= 2*series_length,
    M = 128*n2; returns (n_out, S) in x's dtype with
    out[lag, s] = sum_i x[i,s] x[i+lag,s]. float32 inputs run the
    4-band profile (~1e-6 grade, ~36% of the f64 GEMM flops).
    """
    s = x.shape[1]
    gr_hi, gr_lo, gi_hi, gi_lo = raw_autocorr_pallas_pair(x, n_out)
    if x.dtype == jnp.float64:
        gr = gr_hi.astype(jnp.float64) + gr_lo.astype(jnp.float64)
        gi = gi_hi.astype(jnp.float64) + gi_lo.astype(jnp.float64)
    else:
        gr = gr_hi + gr_lo
        gi = gi_hi + gi_lo
    return jnp.concatenate([gr, gi], axis=1)[:, :s]


def raw_autocorr_pallas_pair(x, n_out: int):
    """Like :func:`raw_autocorr_pallas` but returns the result BEFORE
    any float64 materialization: the two packed halves (gr = padded
    columns [0, w), gi = columns [w, 2w); w = ``_padded_w(s)``) as
    double-float (hi, lo) float32 arrays of shape (n_out, w) each.

    Emulated-float64 arrays on this TPU cost ~1 ms per 100 MB of
    physical reshape/copy (trace-measured); callers that post-process
    (component sums, lag normalization) should do so on the pairs and
    convert only the small final result to float64.
    """
    m = x.shape[0]
    n2 = m // _N1
    j1_out = max(1, -(-n_out // n2))
    n_bands, max_group = _profile(x.dtype)
    consts = _device_constants(n2, j1_out, n_bands)
    return _raw_autocorr_auto(x, consts, n_out, n_bands, max_group)


def _raw_autocorr_auto(x, consts, n_out: int, n_bands: int,
                       max_group: int):
    """Dispatch the autocorrelation chain to the relayout-free v3
    impl when the shape allows (traceable; also the entry point for
    callers that thread constants through their own jit, e.g.
    acf.raw_autocorr_sumlast_engine)."""
    m = x.shape[0]
    if _fwd_v3_ok(m, _padded_w(x.shape[1]), 128):
        return _raw_autocorr_impl_v3(x, consts, n_out, n_bands,
                                     max_group)
    return _raw_autocorr_impl(x, consts, n_out, n_bands, max_group)


@functools.partial(
    jax.jit, static_argnames=("n_out", "n_bands", "max_group"))
def _raw_autocorr_impl(x, consts, n_out: int,
                       n_bands: int = _N_BANDS,
                       max_group: int = None):
    m, s = x.shape
    n2 = m // _N1
    j1_out = max(1, -(-n_out // n2))

    # split to the f32 pair FIRST: every pad/reshape after this point
    # moves float32, not emulated float64 (whose physical relayouts
    # cost ~1 ms per 100 MB on this backend)
    hi_s, lo_s = _split_pair(x)

    # pack two real series per complex column; pad W to the tile width
    w = _padded_w(s)
    n_w = w // _W_TILE

    def pack(arr):
        arr = jnp.pad(arr, ((0, 0), (0, 2 * w - s)))
        return arr[:, :w], arr[:, w:]

    rh, ih = pack(hi_s)
    rl, il = pack(lo_s)
    # x[j], j = j1*n2 + j2  ->  rows j1, flat columns (j2, w)
    pair = tuple(a.reshape(_N1, n2 * w) for a in (rh, rl, ih, il))

    # Every level normalizes per flat GEMM COLUMN (and un-scales on the
    # way out), so band coverage tracks each spectral column's own
    # magnitude — a DC-heavy series must not cost the other columns'
    # precision. K1's scale comes from the input; later scales come
    # from the previous kernel's colmax side output or (for the levels
    # whose step axis is the reduction the next level needs) a cheap
    # XLA reduce over the 3D intermediate.
    s_in = _pow2_ceil_f32(jnp.maximum(jnp.max(jnp.abs(pair[0]), axis=0,
                                              keepdims=True),
                                      jnp.max(jnp.abs(pair[2]), axis=0,
                                              keepdims=True)))

    # forward level 1 (contract j1 per j2, twiddle folded), writing the
    # relayouted (j2, k1, w) form directly: (j1, (j2, w)) -> (j2, k1, w)
    pair, _ = _banded_level(consts["l1_re"], consts["l1_im"], pair,
                            s_in, _N1, True, n_w, transposed_out=True,
                            n_bands=n_bands, max_group=max_group)
    # K2 needs max over j2 per (k1, w): reduce the 3D intermediate
    s1 = _pow2_ceil_f32(jnp.max(
        jnp.maximum(jnp.abs(pair[0]), jnp.abs(pair[2])),
        axis=0).reshape(1, _N1 * w))
    # forward level 2 (contract j2 per k1): (j2, (k1, w)) -> (k2, (k1, w))
    pair = tuple(a.reshape(n2, _N1 * w) for a in pair)
    pair, cm2 = _banded_level(consts["l2_re"], consts["l2_im"], pair,
                              s1, n2, False, n_w,
                              n_bands=n_bands, max_group=max_group)

    # inverse level A with the Hermitian unpack + power spectrum fused
    # in-kernel (the only XLA prep left is the k2-flip). The per-column
    # slicing scale bounds colmax(P) by 2 max(|Z|, |Z_mirror|)^2 —
    # within ~2 bits of the true power maximum; the 8th P band absorbs
    # the slack. Emits the relayouted (k1, j2, w) form.
    cm2m = cm2.reshape(_N1, w)
    cm2m = jnp.maximum(
        cm2m, jnp.roll(jnp.flip(cm2m, axis=0), 1, axis=0))
    sz2 = 2.0 * _pow2_ceil_f32(cm2m.reshape(1, _N1 * w)) ** 2
    pair, _ = _inva_fused(consts["ia_re"], consts["ia_im"], pair,
                          sz2, n2, n_w,
                          n_bands=n_bands, max_group=max_group)
    # invB needs max over k1 per (j2, w): reduce the 3D intermediate
    s3 = _pow2_ceil_f32(jnp.max(
        jnp.maximum(jnp.abs(pair[0]), jnp.abs(pair[2])),
        axis=0).reshape(1, n2 * w))
    # inverse level B (contract k1 per j2, conj twiddle folded):
    #   (k1, (j2, w)) -> (j1, (j2, w))
    pair = tuple(a.reshape(_N1, n2 * w) for a in pair)
    pair, _ = _banded_level(consts["ib_re"], consts["ib_im"], pair,
                            s3, j1_out, True, n_w,
                            n_bands=n_bands, max_group=max_group)

    # epilogue: values are in true units; the inverse transform's 1/M
    # is an exact power-of-two scale applied to the f32 pair. Output
    # stays in pair form — float64 conversion is the caller's last step.
    inv_m = np.float32(1.0 / m)
    return tuple(
        a.reshape(j1_out * n2, w)[:n_out] * inv_m for a in pair)


@functools.partial(
    jax.jit, static_argnames=("n_out", "n_bands", "max_group"))
def _raw_autocorr_impl_v3(x, consts, n_out: int,
                          n_bands: int = _N_BANDS,
                          max_group: int = None):
    """Relayout-free autocorrelation chain: the v3 levels (free 3D
    leading-split views, see _fft_fwd_impl_v3) for L1/L2/inverse-B.
    Only ONE paid relayout remains — the trailing merge feeding the
    2D fused unpack/inverse-A kernel (whose mirror-pairing index maps
    stay in the flat (k1, w) column space); the entry relayout, the
    inverse-B input reshape (it consumes inverse-A's 3D output
    directly), and the k-major exit reshape are all free views.
    Bit-identical math to _raw_autocorr_impl (same kernels' algebra,
    same scale plumbing)."""
    if max_group is None:
        max_group = _MAX_GROUP
    m, s = x.shape
    n2 = m // _N1
    j1_out = max(1, -(-n_out // n2))
    wt = 128

    hi_s, lo_s = _split_pair(x)
    w = _padded_w(s)
    n_w = w // _W_TILE

    def pack(arr):
        arr = jnp.pad(arr, ((0, 0), (0, 2 * w - s)))
        return arr[:, :w], arr[:, w:]

    rh, ih = pack(hi_s)
    rl, il = pack(lo_s)
    pair3 = tuple(
        a.reshape(_N1, n2, w) for a in (rh, rl, ih, il))  # free view

    s_in = _pow2_ceil_f32(jnp.maximum(
        jnp.max(jnp.abs(pair3[0]), axis=0),
        jnp.max(jnp.abs(pair3[2]), axis=0)))              # (n2, w)
    pair3, _ = _banded_level3(consts["l1_re"], consts["l1_im"],
                              pair3, s_in, _N1, True, True,
                              n_bands=n_bands, max_group=max_group,
                              wt=wt)
    s1 = _pow2_ceil_f32(jnp.max(
        jnp.maximum(jnp.abs(pair3[0]), jnp.abs(pair3[2])),
        axis=0))                                          # (128, w)
    pair3, cm2 = _banded_level3(consts["l2_re"], consts["l2_im"],
                                pair3, s1, n2, False, False,
                                n_bands=n_bands, max_group=max_group,
                                wt=wt)
    # cm2 is (128, w) per (k1, w) column — already the layout the
    # mirror max below wants (the 2D impl reshaped its flat colmax)
    pair = tuple(a.reshape(n2, _N1 * w) for a in pair3)  # paid merge
    cm2m = jnp.maximum(
        cm2, jnp.roll(jnp.flip(cm2, axis=0), 1, axis=0))
    sz2 = 2.0 * _pow2_ceil_f32(cm2m.reshape(1, _N1 * w)) ** 2
    pair3, _ = _inva_fused(consts["ia_re"], consts["ia_im"], pair,
                           sz2, n2, n_w,
                           n_bands=n_bands, max_group=max_group)
    # inverse-A emits the (k1, j2, w) 3D form — inverse-B's v3 level
    # consumes it directly (contract k1 per (j2, w), per-j2 lhs)
    s3 = _pow2_ceil_f32(jnp.max(
        jnp.maximum(jnp.abs(pair3[0]), jnp.abs(pair3[2])),
        axis=0))                                          # (n2, w)
    pair3, _ = _banded_level3(consts["ib_re"], consts["ib_im"],
                              pair3, s3, j1_out, True, False,
                              n_bands=n_bands, max_group=max_group,
                              wt=wt)
    # (j1_out, n2, w) -> lag-major: free leading merge
    inv_m = np.float32(1.0 / m)
    return tuple(
        a.reshape(j1_out * n2, w)[:n_out] * inv_m for a in pair3)


# ---------------------------------------------------------------------
# generic forward transform (building block for deeper compositions)
# ---------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("n_bands", "max_group", "wt", "l2_rows"),
    donate_argnums=(0,))
def _fft_fwd_impl(pair, consts, n_bands: int = _N_BANDS,
                  max_group: int = None, wt: int = _W_TILE,
                  l2_rows: int = None):
    """Forward banded FFT along axis 0 of complex (M, B) double-float
    pairs, NATURAL frequency order out. B must be a multiple of
    _W_TILE. Same two fused kernels as the autocorrelation path.

    ``l2_rows`` trims level 2 to its first ``l2_rows`` output rows
    (frequencies k < l2_rows*128): callers that discard the upper half
    of the spectrum — the deep composition's final (DIF) transform
    keeps only lags < M/2 — skip half the level's int8 flops and write
    traffic instead of slicing afterwards."""
    rh = pair[0]
    m, w = rh.shape
    n2 = m // _N1
    n_w = w // wt
    if l2_rows is None:
        l2_rows = n2
    pair = tuple(a.reshape(_N1, n2 * w) for a in pair)
    s_in = _pow2_ceil_f32(jnp.maximum(
        jnp.max(jnp.abs(pair[0]), axis=0, keepdims=True),
        jnp.max(jnp.abs(pair[2]), axis=0, keepdims=True)))
    pair, _ = _banded_level(consts["l1_re"], consts["l1_im"], pair,
                            s_in, _N1, True, n_w, transposed_out=True,
                            n_bands=n_bands, max_group=max_group, wt=wt)
    s1 = _pow2_ceil_f32(jnp.max(
        jnp.maximum(jnp.abs(pair[0]), jnp.abs(pair[2])),
        axis=0).reshape(1, _N1 * w))
    pair = tuple(a.reshape(n2, _N1 * w) for a in pair)
    l2_re, l2_im = consts["l2_re"], consts["l2_im"]
    if l2_rows < n2:
        l2_re = l2_re[:, :l2_rows, :]
        l2_im = l2_im[:, :l2_rows, :]
    pair, _ = _banded_level(l2_re, l2_im, pair,
                            s1, l2_rows, False, n_w,
                            n_bands=n_bands, max_group=max_group, wt=wt)
    # rows k2, cols (k1, w): frequency k = k2*128 + k1 — merging
    # (k2, k1) after the trailing split is exactly k-major
    return tuple(
        a.reshape(l2_rows, _N1, w).reshape(l2_rows * _N1, w)
        for a in pair)


def fft_banded_pair(pair, inverse: bool = False, wt: int = _W_TILE,
                    l2_rows: int = None):
    """Complex FFT along axis 0 of (M, B) double-float pairs
    (re_hi, re_lo, im_hi, im_lo), M = 128*n2 with shape_supported-range
    n2, B % wt == 0 (wt a multiple of 128; smaller tiles trade grid
    steps for HBM headroom — the input pair is DONATED). Natural
    frequency order; the inverse includes the 1/M scale (conjugation
    trick — forward kernels only). ``l2_rows`` (forward only) keeps
    only frequencies k < l2_rows*128 — see _fft_fwd_impl."""
    rh = pair[0]
    m, b = rh.shape
    n2 = m // _N1
    # pairs carry float64 payloads: ride the (overridable) f64 profile
    n_bands, max_group = _profile(jnp.float64)
    consts = _device_constants(n2, 1, n_bands)
    if inverse:
        pair = (pair[0], pair[1], -pair[2], -pair[3])
    impl = (_fft_fwd_impl_v3 if _fwd_v3_ok(m, b, wt)
            else _fft_fwd_impl)
    out = impl(pair, consts, n_bands=n_bands,
               max_group=max_group, wt=wt, l2_rows=l2_rows)
    if inverse:
        inv_m = np.float32(1.0 / m)
        out = (out[0] * inv_m, out[1] * inv_m,
               -out[2] * inv_m, -out[3] * inv_m)
    return out
