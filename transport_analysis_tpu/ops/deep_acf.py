"""Deep autocorrelation: the banded Pallas engine beyond M = 65536.

The fused engine (ops/pallas_fft.py) covers transforms M = 128*n2 up
to n2 = 512 — the twiddle-folding that makes its kernels cheap stores
one constant matrix per inner batch column, which cannot scale to a
third level (128^3 would need gigabytes of folded constants). This
module composes ONE extra four-step level around the engine instead:

    M = M_inner * n_outer,   M_inner in-engine, n_outer <= 256 (pow2)

    x[j],  j = j1*n_outer + j2         (j1 < M_inner, j2 < n_outer)
    T[k1, j2]  = FFT_{M_inner} over j1          (fused engine, batched)
    Z[k2, k1] = DFT_{n_outer}(T * W_M^{k1 j2})  (fused Pallas kernel)
    k = k2*M_inner + k1                         (rows land k-major)

which reaches M = 65536*256 = 2^24 (8.4M frames). The twiddle + outer
DFT is ONE Pallas kernel (`_outer_level_pallas`): the twiddle multiply
runs in double-float f32 pair arithmetic on the VPU, the data is
band-sliced in VMEM, and the tiny DFT_n_outer contracts as a
block-diagonal int8 MXU product — series columns are laid out
(w, j2) so each 128-lane tile holds whole j2 groups. (The previous
XLA formulation — f64 twiddle pass + Ozaki banded GEMMs through HBM —
measured ~40x its traffic model: band extraction passes, 56 small
GEMMs, and f32 partial round-trips; see BENCH_NOTES "deep outer
kernel".) The Hermitian unpack + power spectrum runs in XLA float64,
and the inverse reuses the forward machinery via conjugation.

On TPU the whole chain runs as ONE jit (_deep_chain_onejit): every
banded constant is passed as an ARGUMENT, so nothing embeds as a
program literal (the ~350 MB closure problem that originally forced
eager staging — see ops/pallas_fft.py), and XLA buffer liveness holds
the peak at in-stage in+out. A stage-by-stage eager fallback remains
for CPU composition tests, HBM debugging, and tighter-memory
backends (raw_autocorr_deep docstring).

Dispatched from ops/acf.py (raw_autocorr / raw_autocorr_sumlast) for
float64 AND float32 series with M > the engine ceiling (f32 rides the
lighter 4-band profile — zero-tail pairs, ~1e-5 grade, measured
7.6e13 lags/s at N=2^20; output dtype preserved); measured numbers
live in BENCH_NOTES.md ("deep composition").
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_fft as _pf

_Z0 = np.int32(0)   # index-map constant (see pallas_fft)

_MAX_OUTER = 256
# 128-column tiles keep the single-shot inner transform at M = 65536,
# B = outer*w inside HBM (wt = 256 peaks ~16.3 GB at the 1M-frame
# demo shape — 0.5 GB over this chip). Overridable for grid-overhead
# probes (benchmarks/roofline.py): wider tiles cut the engine levels'
# grid-step count 1/wt at ~wt*4 KB/plane more VMEM per step.
import os as _os_wt


@functools.lru_cache(maxsize=1)
def _deep_wt() -> int:
    """Engine tile width for the deep chain, parsed LAZILY: a
    malformed env value must fail the deep-chain call that consumes
    it, not make the whole package unimportable (round-4 advisor
    finding)."""
    raw = _os_wt.environ.get("TRANSPORT_ANALYSIS_TPU_DEEP_WT", "128")
    try:
        wt = int(raw)
    except ValueError:
        raise ValueError(
            "TRANSPORT_ANALYSIS_TPU_DEEP_WT must be an integer "
            f"multiple of 128, got {raw!r}") from None
    if wt <= 0 or wt % 128:
        raise ValueError(
            "TRANSPORT_ANALYSIS_TPU_DEEP_WT must be a positive "
            f"multiple of 128, got {wt}")
    return wt


def supported(m: int, s: int) -> bool:
    """Deep-composition eligibility (engine-ineligible M only)."""
    if not _pf.is_tpu_backend():
        return False
    if s < 2 or m & (m - 1):
        return False
    inner, outer = _split_m(m)
    return inner is not None


def _split_m(m: int):
    """Smallest in-engine inner length whose cofactor is <= _MAX_OUTER.

    Preference order is BALANCED-first (16384 = 128*128 before the
    larger inners): the banded levels' MXU flops scale with their
    contraction depth (128 + n2 + outer per element), so at M = 2^21
    the 128*128*128 split runs level 2 at 1/4 the int8 flops of the
    historical 128*512*32 split. The large-inner order predates the
    fused Pallas outer kernel, when the outer level was the expensive
    stage (BENCH_NOTES round-5 lever 1)."""
    for inner in (16384, 32768, 65536):
        if m % inner == 0 and _pf.shape_supported(inner, 2 * _pf._W_TILE):
            outer = m // inner
            if 2 <= outer <= _MAX_OUTER:
                return inner, outer
    return None, None


def _deep_w(s: int, outer: int) -> int:
    """Packed-column width for ``s`` real series at the given outer
    factor: the two-for-one complex packing needs ceil(s/2) columns,
    rounded up to the chain's true lane granularity.

    The constraint is on B = w·outer (the stage arrays' lane count):
    B must divide into the engine's _DEEP_WT(=128)-lane tiles and the
    outer kernel's max(128, outer)-lane blocks, both powers of two —
    so w need only be a multiple of max(1, 128 // outer), NOT of 128.
    The historical w = 128·k rule padded a P=16 deep call (outer=8)
    to 8× its real width and made M = 2^22 x any-chunk exceed a 16 GB
    chip; at outer >= 128 the padding waste is zero."""
    half = (s + 1) // 2
    w_align = max(1, 128 // outer)
    return -(-half // w_align) * w_align


@functools.lru_cache(maxsize=4)
def _outer_tables(inner: int, outer: int):
    """Host-exact f64 twiddle tables W_M^(k1 j2) and the outer DFT /
    conjugate-DFT matrices (tiny: outer <= 256)."""
    mm = inner * outer
    k1 = np.arange(inner)[:, None]
    j2 = np.arange(outer)[None, :]
    ang = 2.0 * np.pi * (k1 * j2 % mm) / mm
    jj = np.arange(outer)
    th = 2.0 * np.pi * np.outer(jj, jj) / outer
    return {
        "twc": jnp.asarray(np.cos(ang)),
        "tws": jnp.asarray(-np.sin(ang)),
        "dc": jnp.asarray(np.cos(th)),
        "ds": jnp.asarray(-np.sin(th)),
    }


# rows per kernel block of the fused outer-level kernel
_OUTER_ROWS = 512


def _outer_lane(outer: int):
    """Kernel lane width L (>= one lane tile) and w's per block."""
    lane = max(128, outer)
    return lane, lane // outer


@functools.lru_cache(maxsize=4)
def _outer_kernel_tables(inner: int, outer: int, n_bands: int):
    """Device constants for the fused outer-level kernel.

    Twiddle tables W_M^(k1 j2) as double-float (hi, lo) f32 pairs of
    shape (inner, L) — lane i covers (w_local, j2) = (i // outer,
    i % outer), the same factor tiled over the block's w's — plus the
    banded int8 rhs stacks of the BLOCK-DIAGONAL outer DFT: L/outer
    copies of DFT_outer^T on the diagonal, so a (rows, L) data block
    contracts every w-group's j2 axis in ONE MXU product with zero
    cross-group mixing. Angles are combined on device from two tiny
    host-exact factor tables (k1 = a*256 + b) via the angle-addition
    identity — shipping the full (inner, outer) f64 table through the
    host tunnel costs seconds, the combine is one small fused kernel
    (same trick as pallas_fft._build_constants)."""
    lane, wg = _outer_lane(outer)
    mm = inner * outer
    sb = min(256, inner)
    na = inner // sb
    a_idx = (np.arange(na)[:, None] * sb) * np.arange(outer)[None, :]
    b_idx = np.arange(sb)[:, None] * np.arange(outer)[None, :]
    ang_a = 2.0 * np.pi * (a_idx % mm) / mm
    ang_b = 2.0 * np.pi * (b_idx % mm) / mm

    jj = np.arange(outer)
    th = 2.0 * np.pi * np.outer(jj, jj) / outer
    bd_c = np.kron(np.eye(wg), np.cos(th).T)
    bd_s = np.kron(np.eye(wg), (-np.sin(th)).T)

    @functools.partial(jax.jit, static_argnames=("nb",))
    def build(ca, sa, cb, sbn, bdc, bds, nb):
        # cos/sin(ang_a + ang_b) per (a, b, j2), minus sign folded into
        # the host tables' convention: twc = cos, tws = -sin
        c = ca[:, None, :] * cb[None] - sa[:, None, :] * sbn[None]
        s = sa[:, None, :] * cb[None] + ca[:, None, :] * sbn[None]
        twc = c.reshape(inner, outer)
        tws = (-s).reshape(inner, outer)
        tw = tuple(
            jnp.tile(t, (1, wg)) for t in (twc, tws)
        )
        tch, tcl = _pf._split_pair(tw[0])
        tsh, tsl = _pf._split_pair(tw[1])
        cbands = _pf._slice_bands_dev(bdc, nb)
        sbands = _pf._slice_bands_dev(bds, nb)
        rhs_re = jnp.concatenate(
            [jnp.concatenate([cbands[q], -sbands[q]], axis=0)
             for q in range(nb)], axis=0)
        rhs_im = jnp.concatenate(
            [jnp.concatenate([sbands[q], cbands[q]], axis=0)
             for q in range(nb)], axis=0)
        return tch, tcl, tsh, tsl, rhs_re, rhs_im

    f64 = jnp.float64
    with jax.ensure_compile_time_eval():
        out = build(
            jnp.asarray(np.cos(ang_a), f64), jnp.asarray(np.sin(ang_a), f64),
            jnp.asarray(np.cos(ang_b), f64), jnp.asarray(np.sin(ang_b), f64),
            jnp.asarray(bd_c, f64), jnp.asarray(bd_s, f64), nb=n_bands)
    return jax.tree_util.tree_map(jax.block_until_ready, out)


@functools.partial(
    jax.jit, static_argnames=("inner", "outer", "w", "s"),
    donate_argnums=(0,),
)
def _prepare_pair(x, inner: int, outer: int, w: int, s: int):
    """(n_rows ≤ M, s) f64 → engine-layout f32 pairs, lanes (w, j2):
    column w_c*outer + j2 carries series w_c's decimation residue j2,
    so the outer kernel's 128-lane tiles contract whole j2 groups in
    place. Rows beyond ``x`` are the transform's zero padding and are
    synthesized here — callers hand the UNPADDED series in, which
    skips a full (M, s) f64 pad pass (~6.4 GB of traffic at the
    N=2^20 rung) and halves the f64 source held across this stage.

    Large transforms run as a lax.map over row slabs: XLA does not
    reliably fuse the pad → double-float split → column slices, and
    the materialized full-width hi/lo f32 intermediates (~2·8·M·w
    bytes on top of input + outputs) made this stage's peak ~13 GB at
    M=2^21 — the nondeterministic OOM at the N=2^20 north-star rung.
    Slabs bound the intermediates (the (outer, w) corner turn happens
    per slab); all-padding slabs emit constants without touching the
    input. Small transforms keep the straight-line single program
    (donated input, fused chain)."""
    m = inner * outer
    n_rows = x.shape[0]

    def turn(a, rows):
        # rows consecutive j = j1*outer + j2 -> lanes (w, j2)
        return a.reshape(rows // outer, outer, w).swapaxes(
            1, 2).reshape(rows // outer, w * outer)

    ll = max(1, _UNPACK_SLAB * 128 // max(2 * w, 1))
    ll = 1 << (ll.bit_length() - 1)
    ll = max(ll, outer)
    if m % ll or m <= ll:
        x = jnp.pad(x, ((0, m - n_rows), (0, 2 * w - s)))
        hi, lo = _pf._split_pair(x)
        return tuple(
            turn(src[:, cols], m).reshape(inner, w * outer)
            for src, cols in (
                (hi, slice(0, w)), (lo, slice(0, w)),
                (hi, slice(w, None)), (lo, slice(w, None)),
            )
        )

    # data slabs cover the real rows (rounded up to whole slabs);
    # the remaining rows are the zero padding of the transform
    nz = -(-n_rows // ll)
    if n_rows % ll:
        x = jnp.pad(x, ((0, nz * ll - n_rows), (0, 0)))

    def slab(a0):
        def data(a0):
            xs = jax.lax.dynamic_slice(x, (a0 * ll, 0), (ll, s))
            xs = jnp.pad(xs, ((0, 0), (0, 2 * w - s)))
            hi, lo = _pf._split_pair(xs)
            return tuple(
                turn(a, ll)
                for a in (hi[:, :w], lo[:, :w], hi[:, w:], lo[:, w:]))

        def zero(a0):
            z = jnp.zeros((ll // outer, w * outer), jnp.float32)
            return (z, z, z, z)

        return jax.lax.cond(a0 < nz, data, zero, a0)

    parts = jax.lax.map(slab, jnp.arange(m // ll))
    return tuple(a.reshape(inner, w * outer) for a in parts)


@functools.partial(
    jax.jit, static_argnames=("inner", "outer", "w", "s"),
    donate_argnums=(0, 1),
)
def _prepare_pair_hl(hi, lo, inner: int, outer: int, w: int, s: int):
    """_prepare_pair from an EXACT (hi, lo) f32-pair source — the
    pair-domain model feed (ROADMAP round-8 lever 1): callers whose
    operand already lives as a double-float pair (the pair-centered
    Helfand accumulator; f32 spool data with a zero tail) skip the
    f64 materialization and its emulated-f64 read here. Same slab
    structure and output contract as _prepare_pair; no split pass."""
    m = inner * outer
    n_rows = hi.shape[0]

    def turn(a, rows):
        return a.reshape(rows // outer, outer, w).swapaxes(
            1, 2).reshape(rows // outer, w * outer)

    ll = max(1, _UNPACK_SLAB * 128 // max(2 * w, 1))
    ll = 1 << (ll.bit_length() - 1)
    ll = max(ll, outer)
    if m % ll or m <= ll:
        hi = jnp.pad(hi, ((0, m - n_rows), (0, 2 * w - s)))
        lo = jnp.pad(lo, ((0, m - n_rows), (0, 2 * w - s)))
        return tuple(
            turn(src[:, cols], m).reshape(inner, w * outer)
            for src, cols in (
                (hi, slice(0, w)), (lo, slice(0, w)),
                (hi, slice(w, None)), (lo, slice(w, None)),
            )
        )

    nz = -(-n_rows // ll)
    if n_rows % ll:
        hi = jnp.pad(hi, ((0, nz * ll - n_rows), (0, 0)))
        lo = jnp.pad(lo, ((0, nz * ll - n_rows), (0, 0)))

    def slab(a0):
        def data(a0):
            hs = jax.lax.dynamic_slice(hi, (a0 * ll, 0), (ll, s))
            ls = jax.lax.dynamic_slice(lo, (a0 * ll, 0), (ll, s))
            hs = jnp.pad(hs, ((0, 0), (0, 2 * w - s)))
            ls = jnp.pad(ls, ((0, 0), (0, 2 * w - s)))
            return tuple(
                turn(a, ll)
                for a in (hs[:, :w], ls[:, :w], hs[:, w:], ls[:, w:]))

        def zero(a0):
            z = jnp.zeros((ll // outer, w * outer), jnp.float32)
            return (z, z, z, z)

        return jax.lax.cond(a0 < nz, data, zero, a0)

    parts = jax.lax.map(slab, jnp.arange(m // ll))
    return tuple(a.reshape(inner, w * outer) for a in parts)


@functools.partial(
    jax.jit, static_argnames=("inner", "outer", "w", "s"),
    donate_argnums=(0,),
)
def _prepare_pair_f32(x32, inner: int, outer: int, w: int, s: int):
    """_prepare_pair from an exactly-representable f32 source: the
    pair is (x, 0) with the zero tails SYNTHESIZED (never read) —
    half the source traffic of the f64 route, no split ops."""
    m = inner * outer
    n_rows = x32.shape[0]

    def turn(a, rows):
        return a.reshape(rows // outer, outer, w).swapaxes(
            1, 2).reshape(rows // outer, w * outer)

    ll = max(1, _UNPACK_SLAB * 128 // max(2 * w, 1))
    ll = 1 << (ll.bit_length() - 1)
    ll = max(ll, outer)
    if m % ll or m <= ll:
        hi = jnp.pad(x32, ((0, m - n_rows), (0, 2 * w - s)))
        z = jnp.zeros((inner, w * outer), jnp.float32)
        return (
            turn(hi[:, :w], m).reshape(inner, w * outer), z,
            turn(hi[:, w:], m).reshape(inner, w * outer), z,
        )

    nz = -(-n_rows // ll)
    if n_rows % ll:
        x32 = jnp.pad(x32, ((0, nz * ll - n_rows), (0, 0)))

    def slab(a0):
        def data(a0):
            hs = jax.lax.dynamic_slice(x32, (a0 * ll, 0), (ll, s))
            hs = jnp.pad(hs, ((0, 0), (0, 2 * w - s)))
            z = jnp.zeros((ll // outer, w * outer), jnp.float32)
            return (turn(hs[:, :w], ll), z, turn(hs[:, w:], ll), z)

        def zero(a0):
            z = jnp.zeros((ll // outer, w * outer), jnp.float32)
            return (z, z, z, z)

        return jax.lax.cond(a0 < nz, data, zero, a0)

    parts = jax.lax.map(slab, jnp.arange(m // ll))
    return tuple(a.reshape(inner, w * outer) for a in parts)


# rows per slab of the fused unpack stage (128 MB of f64 at w = 128).
# Above ~2^19 rows a straight-line unpack's HLO temps (hi/lo splits +
# reversals of every operand, ~6 full-array f32 copies live at once)
# exceed the chip: hardware-measured 12 GB of temps at M = 2^21.
_UNPACK_SLAB = 131072


def _mirror_lanes(a, w: int, outer: int):
    """Reverse the j2 lane groups: lane (wc, k2) -> (wc, outer-1-k2).
    A static flip of the minor axis — no gathers."""
    r = a.shape[0]
    return a.reshape(r, w, outer)[:, :, ::-1].reshape(r, w * outer)


def _mirror_lanes_row0(a, w: int, outer: int):
    """The k1 = 0 mirror lane map k2 -> (outer - k2) % outer
    (flip + roll of the minor axis)."""
    r = a.shape[0]
    a = a.reshape(r, w, outer)[:, :, ::-1]
    return jnp.roll(a, 1, axis=2).reshape(r, w * outer)


@functools.partial(
    jax.jit, static_argnames=("inner", "outer", "w"),
    donate_argnums=(0, 1, 2, 3),
)
def _unpack_to_pair_dif(zrh, zrl, zih, zil, inner: int, outer: int,
                        w: int):
    """Fused Hermitian unpack + power spectra + conjugate pair split,
    entirely in KERNEL LAYOUT (the DIF leg-2 form), row-slabbed.

    Input: the leg-1 outer kernel's output pair, four (inner,
    w·outer) f32 arrays with element (k1, wc·outer + k2) =
    Z[k1 + inner·k2]. Output: the SAME layout holding (p1 − i·p2) —
    which is exactly the DIF inverse leg's engine operand
    ((j1, (wc, j2)) = series index j1 + inner·j2), so the inter-leg
    k-major corner turn (_fwd_from_kernel_pair, 25 ms/acf at the
    N=2^20 rung) disappears from the chain.

    Index algebra: the Hermitian mirror m → (M−m) mod M maps
    (k1, k2) → (inner−k1, outer−1−k2) for k1 ≥ 1 and
    (0, k2) → (0, (outer−k2) mod outer); both lane maps are static
    flips/rolls of the j2 minor axis (_mirror_lanes /
    _mirror_lanes_row0 — no gathers). Each slab reconstructs f64 in
    VMEM-sized pieces (hi + lo, ~1e-16 relative — far inside the
    1e-11 contract), runs the same f64 algebra as the historical
    k-major unpack, and splits back to f32 pairs at the end.

    Hermitian-output symmetry: both power spectra of the two packed
    REAL series satisfy p[M−m] = p[m] — f1r/f2r are even and f1i/f2i
    odd in m by construction (the same two summands commute / negate,
    which is EXACT in floating point), and squaring kills the sign.
    The slabbed path therefore computes only rows k1 ≤ inner/2 and
    writes rows inner/2+1..inner−1 as row-flipped, lane-mirrored
    copies: half the direct+rev reads and half the f64 algebra +
    pair splits, bit-identical output (asserted against the
    straight-line path in tests/test_deep_acf.py)."""
    f64 = jnp.float64
    cols = zrh.shape[1]

    # slab ROWS scale inversely with width: the budget is ELEMENTS
    # (_UNPACK_SLAB rows at the w=128 reference width, rows here are
    # w·outer wide). Each slab processes ll+1 rows (its block plus
    # the one-row mirror overlap), holds ~6 live (ll+1, cols) f64
    # temps through the algebra, and emits 8 f32 parts (4 firsts +
    # 4 mirrors).
    ll = max(1, _UNPACK_SLAB * 128 // max(cols, 1))
    ll = 1 << (ll.bit_length() - 1)  # pow2 floor divides pow2 inner
    if inner % ll or inner <= ll:
        zr = zrh.astype(f64) + zrl.astype(f64)
        zi = zih.astype(f64) + zil.astype(f64)

        def rev(z):
            # row k1 -> (inner-k1) mod inner, j2 -> outer-1-j2 ...
            r = _mirror_lanes(
                jnp.roll(jnp.flip(z, axis=0), 1, axis=0), w, outer)
            # ... except the k1 = 0 row, whose mirror stays in row 0
            # with the (outer - k2) mod outer lane map
            r0 = _mirror_lanes_row0(z[:1], w, outer)
            return jnp.concatenate([r0, r[1:]], axis=0)

        r_rev = rev(zr)
        i_rev = rev(zi)
        f1r = 0.5 * (zr + r_rev)
        f1i = 0.5 * (zi - i_rev)
        f2r = 0.5 * (zi + i_rev)
        f2i = 0.5 * (r_rev - zr)
        rh, rl = _pf._split_pair(f1r * f1r + f1i * f1i)
        ih, il = _pf._split_pair(-(f2r * f2r + f2i * f2i))
        return rh, rl, ih, il

    # the mirror alignment below needs pow2 inner (ll is a pow2, so
    # ll <= inner/2 and (inner/2) % ll == 0 follow); only
    # supported() — which enforces pow2 M — gates production
    # dispatch, so make the precondition loud here
    assert inner & (inner - 1) == 0, (
        f"slabbed unpack requires pow2 inner, got {inner}")
    half = inner // 2

    # Each slab runs the algebra on rows a..a+ll (ONE extra row) and
    # writes two blocks STRAIGHT into the preallocated outputs via
    # in-place dynamic_update_slice on the fori_loop carries: its
    # first-half block [a, a+ll) verbatim and its mirror block
    # (rows inner-a-ll..inner-a-1 = the row-flipped, lane-mirrored
    # rows (a, a+ll]). The row inner/2 rides the last slab's extra
    # row through the general formula (its mirror is itself,
    # lane-mirrored — exact by the evenness argument above).
    def slab(a0):
        a = a0 * ll

        def direct(h, l):
            hs = jax.lax.dynamic_slice(h, (a, 0), (ll + 1, cols))
            ls = jax.lax.dynamic_slice(l, (a, 0), (ll + 1, cols))
            return hs.astype(f64) + ls.astype(f64)

        def rev(h, l):
            def cut(z):
                tail = jax.lax.dynamic_slice(
                    z, (inner - a - ll, 0), (ll, cols))
                head = jax.lax.dynamic_slice(
                    z, ((inner - a) % inner, 0), (1, cols))
                return jnp.concatenate(
                    [head, jnp.flip(tail, axis=0)], axis=0)

            zz = _mirror_lanes(
                cut(h).astype(f64) + cut(l).astype(f64), w, outer)
            # slab 0's head row is k1 = 0: swap in its special lane
            # map (one (1, cols) select — negligible)
            h0 = _mirror_lanes_row0(
                h[:1].astype(f64) + l[:1].astype(f64), w, outer)
            fixed = jnp.where(a0 == 0, h0, zz[:1])
            return jnp.concatenate([fixed, zz[1:]], axis=0)

        zs = direct(zrh, zrl)
        is_ = direct(zih, zil)
        r_rev = rev(zrh, zrl)
        i_rev = rev(zih, zil)
        f1r = 0.5 * (zs + r_rev)
        f1i = 0.5 * (is_ - i_rev)
        f2r = 0.5 * (is_ + i_rev)
        f2i = 0.5 * (r_rev - zs)
        rh, rl = _pf._split_pair(f1r * f1r + f1i * f1i)
        ih, il = _pf._split_pair(-(f2r * f2r + f2i * f2i))
        firsts = tuple(a_[:ll] for a_ in (rh, rl, ih, il))
        mirrors = tuple(
            _mirror_lanes(jnp.flip(a_[1:], axis=0), w, outer)
            for a_ in (rh, rl, ih, il))
        return firsts + mirrors

    def body(a0, outs):
        parts = slab(a0)
        new = []
        for i in range(4):
            o = jax.lax.dynamic_update_slice(
                outs[i], parts[i], (a0 * ll, 0))
            o = jax.lax.dynamic_update_slice(
                o, parts[4 + i], (inner - (a0 + 1) * ll, 0))
            new.append(o)
        return tuple(new)

    init = tuple(
        jnp.zeros((inner, cols), jnp.float32) for _ in range(4))
    return jax.lax.fori_loop(0, half // ll, body, init)


@functools.partial(
    jax.jit, static_argnames=("inner", "outer", "w"))
def _unpack_rev_planes(zrh, zrl, zih, zil, inner: int, outer: int,
                       w: int):
    """The Hermitian-mirror operand R[k] = Z[(M-k) mod M] of each f32
    plane, materialized by XLA relayouts (flip + roll + lane mirror,
    row 0 special-cased — the same index algebra as the slabbed
    path's rev()). Feeds the Pallas unpack kernel, which then needs
    no in-kernel reversal (Mosaic has no `rev` lowering)."""
    def rev(z):
        # fused two-axis rev (see _unpack_rev_planes_half)
        tail = z[1:].reshape(inner - 1, w, outer)
        tail = jnp.flip(tail, axis=(0, 2)).reshape(inner - 1, -1)
        r0 = _mirror_lanes_row0(z[:1], w, outer)
        return jnp.concatenate([r0, tail], axis=0)

    return rev(zrh), rev(zrl), rev(zih), rev(zil)


def _unpack_rev_planes_half(zrh, zrl, zih, zil, inner: int,
                            outer: int, w: int, need: int):
    """First ``need`` rows of the Hermitian-mirror operand only:
    R[k] = Z[(M-k) mod M] for k < need. The Pallas unpack computes
    rows k <= inner/2 directly and synthesizes the rest from the
    output symmetry p[M-m] = p[m], so only ~half a spectra set of
    mirror transient is ever live — the chunk-capacity half of
    ROADMAP lever 3 (the full-plane mirror was a peak-HBM wash
    against the slabbed path's while-carry copies).

    On TPU backends the mirror materializes through the MXU
    permutation-matmul kernel (ops/pallas_mirror.py, bit-identical,
    ~236 vs ~70 GB/s measured at the north-star plane); elsewhere
    (and as fallback) the fused two-axis XLA rev below."""
    from . import pallas_mirror as _pm

    if _pf.is_tpu_backend() and _pm.supported(inner, outer, w, need):
        return _pm.mirror_half_planes(
            zrh, zrl, zih, zil, inner, outer, w, need)
    return _unpack_rev_planes_half_xla(
        zrh, zrl, zih, zil, inner, outer, w, need)


@functools.partial(
    jax.jit, static_argnames=("inner", "outer", "w", "need"))
def _unpack_rev_planes_half_xla(zrh, zrl, zih, zil, inner: int,
                                outer: int, w: int, need: int):
    """XLA formulation of the mirror materialization (see the
    dispatcher above)."""
    def rev(z):
        # rows 1..need-1 = lane-mirrored z[inner-1 .. inner-need+1]:
        # the row flip and the j2 lane mirror are ONE two-axis
        # lax.rev over the 3D view — composing them as separate
        # flip + reshape-mirror passes measured 18 ms/plane vs
        # ~9 for the fused rev (hardware, north-star shape)
        tail = z[inner - need + 1:].reshape(need - 1, w, outer)
        tail = jnp.flip(tail, axis=(0, 2)).reshape(need - 1, -1)
        r0 = _mirror_lanes_row0(z[:1], w, outer)
        return jnp.concatenate([r0, tail], axis=0)

    return rev(zrh), rev(zrl), rev(zih), rev(zil)


def _unpack_kernel_body(zrh_ref, zrl_ref, zih_ref, zil_ref,
                        rrh_ref, rrl_ref, rih_ref, ril_ref,
                        orh_ref, orl_ref, oih_ref, oil_ref):
    """Fused Hermitian unpack + power spectra + conjugate pair split
    on one block, in double-float pair arithmetic (the same algebra
    and grade as the engine's _inva_kernel_body; in interpret mode the
    Dekker products in _df_sq would be broken by XLA:CPU's FMA
    contraction, so the CPU path combines to f64 — exact there)."""
    from . import pallas_fft as _p

    zrh, zrl = zrh_ref[:], zrl_ref[:]
    zih, zil = zih_ref[:], zil_ref[:]
    mrh, mrl = rrh_ref[:], rrl_ref[:]
    mih, mil = rih_ref[:], ril_ref[:]

    if _p._interpret():
        f64 = jnp.float64
        zr = zrh.astype(f64) + zrl.astype(f64)
        zi = zih.astype(f64) + zil.astype(f64)
        rr = mrh.astype(f64) + mrl.astype(f64)
        ri = mih.astype(f64) + mil.astype(f64)
        f1r = 0.5 * (zr + rr)
        f1i = 0.5 * (zi - ri)
        f2r = 0.5 * (zi + ri)
        f2i = 0.5 * (rr - zr)
        p1 = f1r * f1r + f1i * f1i
        p2 = -(f2r * f2r + f2i * f2i)
        h1 = p1.astype(jnp.float32)
        h2 = p2.astype(jnp.float32)
        orh_ref[:] = h1
        orl_ref[:] = (p1 - h1.astype(f64)).astype(jnp.float32)
        oih_ref[:] = h2
        oil_ref[:] = (p2 - h2.astype(f64)).astype(jnp.float32)
        return

    f1r = _p._half(*_p._df_add(zrh, zrl, mrh, mrl))
    f1i = _p._half(*_p._df_add(zih, zil, -mih, -mil))
    f2r = _p._half(*_p._df_add(zih, zil, mih, mil))
    f2i = _p._half(*_p._df_add(mrh, mrl, -zrh, -zrl))
    p1h, p1l = _p._df_add(*_p._df_sq(*f1r), *_p._df_sq(*f1i))
    p2h, p2l = _p._df_add(*_p._df_sq(*f2r), *_p._df_sq(*f2i))
    orh_ref[:] = p1h
    orl_ref[:] = p1l
    oih_ref[:] = -p2h
    oil_ref[:] = -p2l


@functools.partial(
    jax.jit, static_argnames=("inner", "outer", "w"),
    donate_argnums=(0, 1, 2, 3))
def _unpack_to_pair_dif_pallas(zrh, zrl, zih, zil, inner: int,
                               outer: int, w: int):
    """Pallas formulation of _unpack_to_pair_dif: one XLA relayout
    pass materializes the Hermitian-mirror planes (block-level row
    reversal would otherwise need an in-kernel `rev`, which Mosaic
    does not lower, or an O(block²) permutation matmul — measured far
    too slow), then ONE streaming kernel does the pair-domain unpack
    algebra with the direct operands aliased onto the outputs.

    vs the slabbed XLA path (hardware, N=2^20 chunk): the fori_loop
    dynamic_update_slice carries copied ~0.85 spectra sets per call
    (the 46·M·w HBM anchor of auto_atom_chunk) and the emulated-f64
    slab algebra ran at 43-47 GB/s; this path's peak is in + rev + out
    (out aliased onto in) and the kernel streams at f32 rates.

    HALF-SYMMETRY (round 8): the output satisfies p[M-m] = p[m]
    EXACTLY (both power spectra are even in m — the same summands
    commute/negate and squaring kills the sign; the slabbed path
    already relies on this bit-exactly). The kernel therefore only
    computes rows k <= inner/2 (+ one 512-row block of overlap whose
    values the synthesis pass overwrites with bit-identical data),
    the mirror operand materializes at ~half a spectra set (the
    chunk-capacity lever — ROADMAP lever 3), and rows inner/2+1.. are
    synthesized as lane-mirrored row flips of the computed half."""
    cols = zrh.shape[1]
    half = inner // 2
    rows = 512
    grid_rows = half // rows + 1         # cover rows [0, half]
    need = grid_rows * rows              # mirror rows materialized
    rr = _unpack_rev_planes_half(zrh, zrl, zih, zil, inner, outer, w,
                                 need)

    cb = 512 if cols % 512 == 0 else (256 if cols % 256 == 0 else 128)
    spec = pl.BlockSpec((rows, cb), lambda r, c: (r, c),
                        memory_space=pltpu.VMEM)
    f32 = jnp.float32
    outs = pl.pallas_call(
        _unpack_kernel_body,
        grid=(grid_rows, cols // cb),
        in_specs=[spec] * 8,
        out_specs=(spec,) * 4,
        out_shape=(jax.ShapeDtypeStruct((inner, cols), f32),) * 4,
        # direct operands: block (r, c) is read only by grid step
        # (r, c), so the outputs may overwrite them in place — the
        # mirror operands live in their own (transient, half-size)
        # buffers. Rows beyond the visited grid keep the aliased
        # input's bytes and are replaced by the synthesis below.
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_pf._interpret(),
    )(zrh, zrl, zih, zil, *rr)

    from . import pallas_mirror as _pm

    if _pf.is_tpu_backend() and _pm.synth_supported(inner, outer, w):
        # in-place MXU permutation-matmul synthesis (row half is
        # rewritten bit-identically — see synth_tail_planes)
        return _pm.synth_tail_planes(*outs, inner=inner, outer=outer,
                                     w=w)

    def synth(o):
        # rows half+1 .. inner-1 = lane-mirror of row-flipped rows
        # 1 .. half-1 (exact by the evenness argument above); one
        # fused two-axis rev, as in _unpack_rev_planes_half
        tail = o[1:half].reshape(half - 1, w, outer)
        tail = jnp.flip(tail, axis=(0, 2)).reshape(half - 1, -1)
        return jax.lax.dynamic_update_slice(o, tail, (half + 1, 0))

    return tuple(synth(o) for o in outs)


def _unpack_dispatch(zrh, zrl, zih, zil, inner: int, outer: int,
                     w: int):
    """Unpack dispatch: Pallas streaming kernel on TPU backends (and
    in interpret-mode tests), slabbed XLA fallback via
    TRANSPORT_ANALYSIS_TPU_NO_PALLAS_UNPACK=1 or when the row/lane
    grid does not divide (inner is always a multiple of 512 for
    supported() transforms; cols = w·outer is a multiple of 128)."""
    cols = zrh.shape[1]
    if (
        not _os.environ.get("TRANSPORT_ANALYSIS_TPU_NO_PALLAS_UNPACK")
        and inner % 512 == 0
        and cols % 128 == 0
    ):
        return _unpack_to_pair_dif_pallas(zrh, zrl, zih, zil,
                                          inner, outer, w)
    return _unpack_to_pair_dif(zrh, zrl, zih, zil, inner, outer, w)


def _df_mul(ah, al, bh, bl):
    """Double-float product: exact ah*bh via a Dekker/Veltkamp split
    (no FMA on the VPU) plus first-order cross terms (~2^-46)."""
    c = ah * np.float32(4097.0)
    hh = c - (c - ah)
    ht = ah - hh
    d = bh * np.float32(4097.0)
    gh = d - (d - bh)
    gt = bh - gh
    p = ah * bh
    e = ((hh * gh - p) + hh * gt + ht * gh) + ht * gt
    return p, e + (ah * bl + al * bh)


def _slice_pair_cols_into(ref, lane: int, pos, hi, lo,
                          hi_bands=None):
    """Write one band slab [RE_q | IM_q] per significance position into
    the (rows, 2*lane*(nb+1)) int8 lhs scratch; ``pos`` maps band q to
    slab position (bands stacked REVERSED left-to-right so the grouped
    dots take suffixes). hi/lo are ((rh, rl), (ih, il))."""
    (rh, rl), (ih, il) = hi, lo
    if hi_bands is None:
        hi_bands = _pf._HI_BANDS
    n = len(pos)
    rr, ri = rh, ih
    for q in range(n):
        if q == hi_bands:
            rr = rr + rl
            ri = ri + il
        s = np.float32(2.0 ** (_pf._DELTA * (q + 1) - 1))
        g = np.float32(2.0 ** -(_pf._DELTA * (q + 1) - 1))
        mr = jnp.rint(rr * s)
        mi = jnp.rint(ri * s)
        base = pos[q] * 2 * lane
        ref[:, base: base + lane] = mr.astype(jnp.int8)
        ref[:, base + lane: base + 2 * lane] = mi.astype(jnp.int8)
        rr = rr - mr * g
        ri = ri - mi * g


def _df_twiddle(rh, rl, ih, il, tch, tcl, tsh, tsl):
    """Complex multiply by the unit twiddle (tc + i·ts) on double-float
    pairs: tr = r*tc - i*ts, ti = r*ts + i*tc. On hardware this is
    Dekker pair arithmetic (Mosaic is f32-only); in interpret mode it
    runs in native f64 — XLA:CPU's LLVM backend contracts mul+add
    chains into FMAs inside fused loops, which silently breaks the
    error-free transforms (the f32 rounding of a*b never happens,
    ~2^-24 of the product leaks). Interpret mode = CPU tests only,
    where native f64 is exact; Mosaic preserves the pair arithmetic
    1:1 (TPU-hardware-validated at 1.7e-13)."""
    if _pf._interpret():
        f64 = jnp.float64
        r64 = rh.astype(f64) + rl.astype(f64)
        i64 = ih.astype(f64) + il.astype(f64)
        tc = tch.astype(f64) + tcl.astype(f64)
        ts = tsh.astype(f64) + tsl.astype(f64)
        tr64 = r64 * tc - i64 * ts
        ti64 = r64 * ts + i64 * tc
        tr_h = tr64.astype(jnp.float32)
        tr_l = (tr64 - tr_h.astype(f64)).astype(jnp.float32)
        ti_h = ti64.astype(jnp.float32)
        ti_l = (ti64 - ti_h.astype(f64)).astype(jnp.float32)
    else:
        ar, al = _df_mul(rh, rl, tch, tcl)
        br, bl = _df_mul(ih, il, tsh, tsl)
        tr_h, tr_l = _pf._df_add(ar, al, -br, -bl)
        cr, cl = _df_mul(rh, rl, tsh, tsl)
        dr, dl = _df_mul(ih, il, tch, tcl)
        ti_h, ti_l = _pf._df_add(cr, cl, dr, dl)
    return tr_h, tr_l, ti_h, ti_l


def _outer_kernel_body(n_bands: int, max_group: int, lane: int,
                       dif: bool,
                       rre_ref, rim_ref,
                       rh_ref, rl_ref, ih_ref, il_ref,
                       tch_ref, tcl_ref, tsh_ref, tsl_ref,
                       orh_ref, orl_ref, oih_ref, oil_ref,
                       lhs_scratch):
    """Fused twiddle + outer DFT on one (rows, L) block.

    The engine's double-float pair is twiddled IN PAIR ARITHMETIC
    (Dekker products — never a float64 op, Mosaic is f32-only), scaled
    per ROW by an exact power of two, band-sliced into the int8 lhs
    scratch (data is the LHS here; the tiny block-diagonal DFT is the
    constant RHS), contracted with one exact int8 MXU product per
    significance group, merged, and unscaled. An extra (n_bands+1)-th
    data band pairs with the rhs's leading band to absorb the scale
    slack of lanes quieter than their row's loudest lane (same trick
    as the engine's fused power-spectrum slicing).

    ``dif`` = decimation-in-frequency order: the DFT contracts FIRST
    and the twiddle multiplies the merged result (the deep inverse
    leg's factorization — Y[n1*outer+n2] needs the outer DFT over k2
    before the W_M^(k1 n2) twiddle; same tables, same rhs since
    DFT_outer is symmetric)."""
    rh, rl = rh_ref[:], rl_ref[:]
    ih, il = ih_ref[:], il_ref[:]
    tch, tcl = tch_ref[:], tcl_ref[:]
    tsh, tsl = tsh_ref[:], tsl_ref[:]

    if not dif:
        rh, rl, ih, il = _df_twiddle(
            rh, rl, ih, il, tch, tcl, tsh, tsl)

    s = _pf._pow2_ceil_f32(jnp.max(
        jnp.maximum(jnp.abs(rh), jnp.abs(ih)),
        axis=1, keepdims=True))
    inv = 1.0 / s

    # bands n..0 left-to-right (position p holds band n-p; the extra
    # band n sits leftmost and is consumed by the suffix of nothing —
    # only the explicit extra product below reads it)
    pos = [n_bands - q for q in range(n_bands + 1)]
    _slice_pair_cols_into(
        lhs_scratch, lane, pos,
        (rh * inv, rl * inv), (ih * inv, il * inv))

    k_slab = 2 * lane
    k_total = k_slab * (n_bands + 1)

    def dots(rhs_ref):
        groups = [
            jax.lax.dot(
                lhs_scratch[:, k_total - k_slab * (g + 1):],
                rhs_ref[: k_slab * (g + 1)],
                preferred_element_type=jnp.int32,
            )
            for g in range(max_group + 1)
        ]
        # _merge scales by LIST POSITION (see pallas_fft._inva's
        # dots_extra): zero-fill to put the extra product at ulp
        # 2^-(7*n_bands+12)
        for _ in range(max_group + 1, n_bands):
            groups.append(jnp.zeros_like(groups[0]))
        groups.append(jax.lax.dot(
            lhs_scratch[:, :k_slab], rhs_ref[:k_slab],
            preferred_element_type=jnp.int32,
        ))
        return groups

    re_hi, re_lo = _pf._merge(dots(rre_ref))
    im_hi, im_lo = _pf._merge(dots(rim_ref))
    re_hi, re_lo = re_hi * s, re_lo * s
    im_hi, im_lo = im_hi * s, im_lo * s
    if dif:
        re_hi, re_lo, im_hi, im_lo = _df_twiddle(
            re_hi, re_lo, im_hi, im_lo, tch, tcl, tsh, tsl)
    orh_ref[:] = re_hi
    orl_ref[:] = re_lo
    oih_ref[:] = im_hi
    oil_ref[:] = im_lo


@functools.partial(
    jax.jit, static_argnames=("inner", "outer", "w", "n_bands",
                              "max_group", "dif"),
    donate_argnums=(0, 1, 2, 3))
def _outer_level_pallas(rh, rl, ih, il, tch, tcl, tsh, tsl,
                        rhs_re, rhs_im, inner: int, outer: int,
                        w: int, n_bands: int, max_group: int,
                        dif: bool = False):
    """Run the fused twiddle+outer kernel over the (inner, w*outer)
    engine output pair (lanes (w, j2)); emits the spectrum pair in the
    same layout with lanes (w, k2). ``dif`` selects the
    decimation-in-frequency stage order (outer DFT first, twiddle
    after) used by the deep inverse leg — see _outer_kernel_body."""
    lane, wg = _outer_lane(outer)
    rows = min(_OUTER_ROWS, inner)
    n_r = inner // rows
    n_l = (w * outer) // lane

    data_spec = pl.BlockSpec((rows, lane), lambda r, l: (r, l),
                             memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((rows, lane), lambda r, l: (r, _Z0),
                           memory_space=pltpu.VMEM)
    rhs_spec = pl.BlockSpec(rhs_re.shape, lambda r, l: (_Z0, _Z0),
                            memory_space=pltpu.VMEM)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_outer_kernel_body, n_bands, max_group, lane,
                          dif),
        grid=(n_r, n_l),
        in_specs=[rhs_spec, rhs_spec] + [data_spec] * 4 + [tw_spec] * 4,
        out_specs=(data_spec,) * 4,
        out_shape=(jax.ShapeDtypeStruct((inner, w * outer), f32),) * 4,
        scratch_shapes=[
            pltpu.VMEM((rows, 2 * lane * (n_bands + 1)), jnp.int8)],
        # in-place: each (r, l) data block is read only by its own grid
        # step, so the outputs may overwrite the inputs — the jit-level
        # donation alone cannot alias through the Mosaic custom call,
        # and the 4 full-size f32 outputs would otherwise double the
        # stage's transient HBM (hardware: 8 GB extra at the N=2^20
        # rung)
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_pf._interpret(),
    )(rhs_re, rhs_im, rh, rl, ih, il, tch, tcl, tsh, tsl)
    return outs


@functools.partial(
    jax.jit, static_argnames=("inner", "outer", "w"),
    donate_argnums=(0, 1, 2, 3))
def _fwd_from_kernel(rh, rl, ih, il, inner: int, outer: int, w: int):
    """Kernel layout (k1, (w, k2)) f32 pairs -> k-major (M, w) float64
    spectra (the corner turn between the two deep transforms; the f32
    halves transpose first so the physical relayout moves f32, the
    emulated-f64 add fuses into the output write)."""
    def conv(h, l):
        h = jnp.moveaxis(h.reshape(inner, w, outer), 2, 0)
        l = jnp.moveaxis(l.reshape(inner, w, outer), 2, 0)
        h = h.reshape(inner * outer, w)
        l = l.reshape(inner * outer, w)
        return h.astype(jnp.float64) + l.astype(jnp.float64)

    return conv(rh, rl), conv(ih, il)


@functools.partial(
    jax.jit, static_argnames=("inner", "outer", "w"),
    donate_argnums=(0, 1, 2, 3))
def _fwd_from_kernel_pair(rh, rl, ih, il, inner: int, outer: int,
                          w: int):
    """Kernel layout (k1, (w, k2)) f32 pairs -> k-major (M, w) f32
    pairs. The autocorrelation's internal corner turn: keeping the
    spectra as pairs (the f64 add deferred into the unpack slabs)
    halves this stage's write traffic AND the live inter-stage HBM
    (4 x f32 instead of 2 x f64 would be equal — but the f64 path
    also reads the pairs; net 13 GB -> 8.6 GB at the N=2^20 rung)."""
    def mv(a):
        a = jnp.moveaxis(a.reshape(inner, w, outer), 2, 0)
        return a.reshape(inner * outer, w)

    return mv(rh), mv(rl), mv(ih), mv(il)


def _dif_rows(inner: int, outer: int, n_out: int) -> int:
    """Engine output rows the DIF inverse leg must keep: output index
    n = n1·outer + n2 < n_out needs n1 <= (n_out-1)//outer, rounded
    up to the engine's 128-row level-2 granularity."""
    need = -(-n_out // outer)
    return min(inner, -(-need // 128) * 128)


def _inv_from_kernel_dif(rh, rl, ih, il, inner: int, outer: int,
                         w: int, n_out: int, s: int, sum_d: int = 0):
    """DIF kernel layout -> the assembled (n_out, s) autocorrelation.

    The inverse leg's engine transform arrives row-trimmed (l2_rows:
    only n1 < _dif_rows(...) were computed), element (n1, wc·outer +
    n2) = Y[n1·outer + n2]·M. The epilogue relayouts (n1, wc, n2) →
    (n1, n2, wc) (touching only the kept ~half of the spectrum),
    applies the exact power-of-two 1/M, and packs [re, -im] (the
    two-for-one real-series unpacking of the conjugation-trick
    inverse).

    ``sum_d`` > 0 additionally sums groups of ``sum_d`` adjacent
    series columns (the per-particle component sum of the (N, P, d)
    analyses) INSIDE this fused epilogue — emitting (n_out, s/sum_d)
    directly instead of materializing the (n_out, s) f64 array for a
    separate reduce pass.

    Dispatch (a PLAIN function, so the env kill-switch is honored per
    call rather than frozen into a trace cache): the Pallas
    transposing epilogue on TPU/interpret backends at lane-compatible
    shapes — Mosaic's in-register (r1, w, outer) reshape/transpose
    needs outer and w both multiples of the 128-lane tile (outer=16 /
    w=24 at the N=2^17 gate shape fails tpu.reshape legalization);
    auto_atom_chunk's pad-filling chunks give w = 128k, so production
    rides the kernel. Everything else: the XLA formulation."""
    rows = rh.shape[0]
    if (
        (_pf.is_tpu_backend() or _pf._interpret())
        and rows % 8 == 0
        and outer % 128 == 0
        and w % 128 == 0
        and not _os.environ.get(
            "TRANSPORT_ANALYSIS_TPU_NO_PALLAS_EPILOGUE")
    ):
        return _inv_dif_pallas(rh, rl, ih, il, inner=inner,
                               outer=outer, w=w, n_out=n_out, s=s,
                               sum_d=sum_d)
    return _inv_dif_xla(rh, rl, ih, il, inner=inner, outer=outer,
                        w=w, n_out=n_out, s=s, sum_d=sum_d)


@functools.partial(
    jax.jit,
    static_argnames=("inner", "outer", "w", "n_out", "s", "sum_d"),
    donate_argnums=(0, 1, 2, 3))
def _inv_dif_pallas(rh, rl, ih, il, inner: int, outer: int,
                    w: int, n_out: int, s: int, sum_d: int = 0):
    """The (n1, wc, n2) -> (n1, n2, wc) relayout as a Pallas
    minor-dims transpose (XLA's f64-adjacent swapaxes ran at
    18-38 GB/s — the worst achieved-bandwidth stage in the round-7
    roofline; Mosaic lowers the in-kernel lane transpose exactly).
    The exact pow2 1/M rides the f32 pair (identical values to the
    f64-side multiply); without sum_d the f64 combine is
    bit-identical to the XLA path, with sum_d the component sum runs
    in PAIR arithmetic (TwoSum over d, the acf._sumlast_pair_post
    pattern, ~2^-48 relative — far inside the 1e-11 contract)."""
    inv_m = 1.0 / (inner * outer)
    rh, rl, ih, il = _epilogue_transpose_pallas(
        rh, rl, ih, il, outer=outer, w=w, inv_m=np.float32(inv_m))

    if sum_d:
        hi = jnp.concatenate(
            [rh[:n_out], -ih[:n_out]], axis=1)[:, :s]
        lo = jnp.concatenate(
            [rl[:n_out], -il[:n_out]], axis=1)[:, :s]
        hi3 = hi.reshape(n_out, s // sum_d, sum_d)
        lo3 = lo.reshape(n_out, s // sum_d, sum_d)
        sh, sl = hi3[..., 0], lo3[..., 0]
        for c in range(1, sum_d):
            s2 = sh + hi3[..., c]
            bv = s2 - sh
            e = (sh - (s2 - bv)) + (hi3[..., c] - bv)  # TwoSum
            sh = s2
            sl = sl + e + lo3[..., c]
        return (sh.astype(jnp.float64) + sl.astype(jnp.float64),)

    def conv(h, l):
        return (h[:n_out].astype(jnp.float64)
                + l[:n_out].astype(jnp.float64))

    out = jnp.concatenate(
        [conv(rh, rl), -conv(ih, il)], axis=1)[:, :s]
    return (out,)


@functools.partial(
    jax.jit,
    static_argnames=("inner", "outer", "w", "n_out", "s", "sum_d"),
    donate_argnums=(0, 1, 2, 3))
def _inv_dif_xla(rh, rl, ih, il, inner: int, outer: int,
                 w: int, n_out: int, s: int, sum_d: int = 0):
    """XLA fallback epilogue (all backends/shapes; f64 summation
    order jnp.sum(out.reshape(n_out, -1, sum_d), axis=-1))."""
    rows = rh.shape[0]
    inv_m = 1.0 / (inner * outer)

    def conv(h, l):
        h = h.reshape(rows, w, outer).swapaxes(1, 2)
        l = l.reshape(rows, w, outer).swapaxes(1, 2)
        h = h.reshape(rows * outer, w)[:n_out]
        l = l.reshape(rows * outer, w)[:n_out]
        return (h.astype(jnp.float64) + l.astype(jnp.float64)) * inv_m

    out = jnp.concatenate([conv(rh, rl), -conv(ih, il)], axis=1)[:, :s]
    if sum_d:
        out = jnp.sum(out.reshape(n_out, s // sum_d, sum_d), axis=-1)
    return (out,)


def _epi_tr_body(r1: int, outer: int, w: int, inv_m,
                 rh_ref, rl_ref, ih_ref, il_ref,
                 orh_ref, orl_ref, oih_ref, oil_ref):
    """(r1, w*outer) block [n1, (wc, j2)] -> (r1*outer, w) block
    [(n1, j2), wc]: one in-register minor-dims transpose per plane,
    with the exact pow2 1/M folded in."""
    def tr(ref):
        v = ref[:].reshape(r1, w, outer)
        return jnp.swapaxes(v, 1, 2).reshape(r1 * outer, w) * inv_m

    orh_ref[:] = tr(rh_ref)
    orl_ref[:] = tr(rl_ref)
    oih_ref[:] = tr(ih_ref)
    oil_ref[:] = tr(il_ref)


@functools.partial(
    jax.jit, static_argnames=("outer", "w", "inv_m"),
    donate_argnums=(0, 1, 2, 3))
def _epilogue_transpose_pallas(rh, rl, ih, il, outer: int, w: int,
                               inv_m):
    """All four planes (rows, w*outer) -> (rows*outer, w) in one
    full-width streaming kernel (blocks span the whole lane axis, so
    the grid is 1-D over 8-row groups)."""
    rows, b = rh.shape
    r1 = 8
    in_spec = pl.BlockSpec((r1, b), lambda i: (i, _Z0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((r1 * outer, w), lambda i: (i, _Z0),
                            memory_space=pltpu.VMEM)
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_epi_tr_body, r1, outer, w, inv_m),
        grid=(rows // r1,),
        in_specs=[in_spec] * 4,
        out_specs=(out_spec,) * 4,
        out_shape=(jax.ShapeDtypeStruct((rows * outer, w), f32),) * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_pf._interpret(),
    )(rh, rl, ih, il)


def _deep_fft_fwd_pair(pair, inner: int, outer: int, w: int,
                       as_pair: bool = False, raw_pair: bool = False,
                       profile=None):
    """Forward FFT via engine + fused outer-level kernel (the DIT
    leg). ``pair`` is the complex double-float (re_hi, re_lo, im_hi,
    im_lo), each (inner, w*outer) float32 with lanes (w, j2) —
    DONATED to the engine, so callers must drop their f64 sources
    before calling (HBM peak discipline).

    Output: k-major (M, w) float64 spectra by default; ``as_pair``
    keeps the k-major corner turn in f32 pairs; ``raw_pair`` skips
    the corner turn entirely and returns the kernel-layout pair
    (element (k1, (wc, k2)) = Y[k1 + inner·k2]) — the DIF leg-2
    operand form."""
    # one profile for both levels: the engine reads it internally,
    # the outer kernel takes it as statics (same 7-bit band grid);
    # float32 inputs ride the lighter 4-band profile
    n_bands, max_group = (profile if profile is not None
                          else _pf._profile(jnp.float64))
    pair = _pf.fft_banded_pair(pair, wt=_deep_wt())
    pair = _fence(*pair, tag="engine")
    tables = _outer_kernel_tables(inner, outer, n_bands)
    pair = _outer_level_pallas(*pair, *tables, inner=inner,
                               outer=outer, w=w, n_bands=n_bands,
                               max_group=max_group)
    pair = _fence(*pair, tag="outer")
    if raw_pair:
        return pair
    if as_pair:
        return _fwd_from_kernel_pair(*pair, inner=inner, outer=outer,
                                     w=w)
    return _fwd_from_kernel(*pair, inner=inner, outer=outer, w=w)


def _deep_fft_inv_dif(pair, inner: int, outer: int, w: int,
                      n_out: int, s: int, sum_d: int = 0,
                      profile=None):
    """The DIF inverse-by-conjugation leg: outer DFT + post-twiddle
    FIRST (dif=True), inner engine transform second (level 2 trimmed
    to the kept rows), fused assembly epilogue. ``pair`` is the
    kernel-layout (p1 − i·p2) from _unpack_to_pair_dif — DONATED."""
    n_bands, max_group = (profile if profile is not None
                          else _pf._profile(jnp.float64))
    tables = _outer_kernel_tables(inner, outer, n_bands)
    pair = _outer_level_pallas(*pair, *tables, inner=inner,
                               outer=outer, w=w, n_bands=n_bands,
                               max_group=max_group, dif=True)
    pair = _fence(*pair, tag="outer_dif")
    rows = _dif_rows(inner, outer, n_out)
    pair = _pf.fft_banded_pair(pair, wt=_deep_wt(),
                               l2_rows=rows // 128)
    # the engine trims level 2 itself; the defensive slice below is a
    # no-op there and keeps the CPU fake-engine stand-in (a plain
    # host FFT that ignores l2_rows) on the same output contract
    pair = tuple(a[:rows] for a in pair)
    pair = _fence(*pair, tag="engine_inv")
    return _inv_from_kernel_dif(*pair, inner=inner, outer=outer, w=w,
                                n_out=n_out, s=s, sum_d=sum_d)


# fence eager stages once the working set is big enough that letting
# the host race ahead would hold several stages' buffers live at once.
# Each fence costs a host<->device round trip (~70 ms on the tunneled
# runtime — removing them cut the N=2^20 chunk wall 2.74 s -> 2.24 s),
# so the default only fences stages ABOVE the pad-filled production
# stage size (auto_atom_chunk keeps M·w at 2^28 packed elements =
# 4.3 GB per pair stage, hardware-validated unfenced at the N=2^17
# wide-column and N=2^20 rungs; the historical N=2^17 x 768-series
# OOM predates the pair corner turn / in-place outer kernel / fused
# pad+sum peak cuts). Override via TRANSPORT_ANALYSIS_TPU_DEEP_FENCE_MB
# for backends with less headroom.
import os as _os_f

_FENCE_BYTES = int(float(_os_f.environ.get(
    "TRANSPORT_ANALYSIS_TPU_DEEP_FENCE_MB", 6144)) * 1024 * 1024)

# TRANSPORT_ANALYSIS_TPU_DEEP_HBM_DEBUG=1 prints device memory stats at
# every fence point (calibrates chunk-size memory models; dev-only)
import os as _os

_HBM_DEBUG = bool(_os.environ.get("TRANSPORT_ANALYSIS_TPU_DEEP_HBM_DEBUG"))


_last_fence_t = [None]


def _fence(*arrays, tag: str = ""):
    if _HBM_DEBUG or arrays[0].size * 8 * len(arrays) > _FENCE_BYTES:
        jax.block_until_ready(arrays)
        if _HBM_DEBUG:
            import time as _time

            # block_until_ready does not reliably fence on the
            # tunneled backend (BENCH_NOTES "Measurement integrity");
            # a 1-element readback does
            np.asarray(arrays[0][:1, :1])
            now = _time.perf_counter()
            dt = (now - _last_fence_t[0]) if _last_fence_t[0] else 0.0
            _last_fence_t[0] = now
            stats = getattr(
                jax.local_devices()[0], "memory_stats", lambda: None
            )() or {}
            print(
                f"[deep_hbm] {tag or 'fence'}: +{dt:.2f}s "
                f"in_use {stats.get('bytes_in_use', 0) / 1e9:.2f} GB",
                flush=True,
            )
    return arrays


@functools.partial(
    jax.jit,
    static_argnames=("inner", "outer", "w", "s", "n_out", "n_bands",
                     "max_group", "sum_d"),
    donate_argnums=(0,))
def _deep_chain_onejit(x, consts, tables, inner, outer, w, s, n_out,
                       n_bands, max_group, sum_d):
    """The full deep autocorrelation as ONE jit program.

    Every banded constant arrives as an ARGUMENT (consts/tables), so
    nothing embeds as a program literal — the historical reason the
    chain ran eagerly. XLA's buffer liveness keeps the peak at
    in-stage in+out (~8.6 GB at the pad-filled production stage size,
    hardware-validated at the N=2^20 rung), and collapsing ~8 eager
    dispatches into one removes the per-dispatch host round trips.
    Measured (benchmarks/deep_onejit.py, bit-identical output): with
    a loaded host 1.31 -> 1.07 s per acf; with an idle host the two
    are identical (pipelined eager dispatch hides the trips) — the
    one-jit's value is robustness to host load, which production
    hosts (IO, prefetch, decode threads) always have."""
    pair = _prepare_pair(x, inner, outer, w, s)
    return _deep_chain_core(pair, consts, tables, inner, outer, w, s,
                            n_out, n_bands, max_group, sum_d)


@functools.partial(
    jax.jit,
    static_argnames=("inner", "outer", "w", "s", "n_out", "n_bands",
                     "max_group", "sum_d"),
    donate_argnums=(0, 1))
def _deep_chain_onejit_hl(hi, lo, consts, tables, inner, outer, w, s,
                          n_out, n_bands, max_group, sum_d):
    """_deep_chain_onejit from an exact (hi, lo) f32-pair source (the
    pair-domain model feed) — no f64 materialization anywhere."""
    pair = _prepare_pair_hl(hi, lo, inner, outer, w, s)
    return _deep_chain_core(pair, consts, tables, inner, outer, w, s,
                            n_out, n_bands, max_group, sum_d)


@functools.partial(
    jax.jit,
    static_argnames=("inner", "outer", "w", "s", "n_out", "n_bands",
                     "max_group", "sum_d"),
    donate_argnums=(0,))
def _deep_chain_onejit_f32(x32, consts, tables, inner, outer, w, s,
                           n_out, n_bands, max_group, sum_d):
    """_deep_chain_onejit from an exactly-representable f32 source
    (trajectory data): the pair image is (x, 0) — zero tails are
    synthesized in-slab, so the chain reads HALF the source bytes of
    the f64 route and runs the SAME 7-band f64 profile (not the
    4-band f32 fast mode)."""
    pair = _prepare_pair_f32(x32, inner, outer, w, s)
    return _deep_chain_core(pair, consts, tables, inner, outer, w, s,
                            n_out, n_bands, max_group, sum_d)


def _deep_chain_core(pair, consts, tables, inner, outer, w, s, n_out,
                     n_bands, max_group, sum_d):
    pair = _pf._fft_fwd_auto(pair, consts, n_bands=n_bands,
                             max_group=max_group, wt=_deep_wt())
    pair = _outer_level_pallas(
        *pair, *tables, inner=inner, outer=outer, w=w,
        n_bands=n_bands, max_group=max_group)
    # leg 2 runs DECIMATION-IN-FREQUENCY (outer DFT + post-twiddle
    # first, engine second, output index n = n1·outer + n2): the
    # leg-1 kernel layout IS the DIF leg-2 operand layout (element
    # (k1, (wc, k2)) = Z[k1 + inner·k2] both ways), so the inter-leg
    # corner turn vanishes, and keeping only n < n_out trims the
    # leg-2 engine's level 2 to the first _dif_rows rows — half its
    # int8 flops and write traffic for the usual n_out = M/2.
    pair = _unpack_dispatch(*pair, inner, outer, w)
    pair = _outer_level_pallas(
        *pair, *tables, inner=inner, outer=outer, w=w,
        n_bands=n_bands, max_group=max_group, dif=True)
    rows = _dif_rows(inner, outer, n_out)
    pair = _pf._fft_fwd_auto(pair, consts, n_bands=n_bands,
                             max_group=max_group, wt=_deep_wt(),
                             l2_rows=rows // 128)
    (out,) = _inv_from_kernel_dif(*pair, inner=inner, outer=outer,
                                  w=w, n_out=n_out, s=s, sum_d=sum_d)
    return out


# once-per-process flag for the out-of-contract precision warning
_PRECISION_WARNED = [False]


def _warn_deep_precision(n_bands: int, max_group: int):
    """Warn (once per process) when a trimmed fft_precision profile
    reaches the deep composition. Hardware-measured at the N=2^20
    rung, split by metric (BENCH_NOTES round-8 precision ladder —
    the tail lags divide by (N-lag) -> 1 and amplify the raw error
    floor ~N-fold even in pure f64):

      profile        head (lags < N/2)   full range
      exact (7, 6)   2.0e-15             9.6e-12
      high  (7, 5)   3.3e-14             7.4e-10
      medium (5, 4)  3.6e-12             6.6e-8

    Only "exact" keeps the FULL-RANGE error at the f64 tail floor —
    the property a user diffing whole arrays against a reference f64
    run sees — so it remains the default and the contract mode;
    "high" is admissible where a 1e-8 full-range bar applies (the
    north-star config) and holds ~1e-13 on the head either way."""
    if _PRECISION_WARNED[0]:
        return
    _PRECISION_WARNED[0] = True
    import warnings

    warnings.warn(
        f"fft_precision profile (n_bands={n_bands}, max_group="
        f"{max_group}) on a deep-composition transform (> 32768 "
        "frames): full-range deep-shape error is ~7e-10 ('high') to "
        "~7e-8 ('medium') — above the f64 tail floor (~1e-11) that "
        "only the default 'exact' profile holds; the head half "
        "(lags < N/2) stays at ~1e-13 ('high') / ~4e-12 ('medium'). "
        "Use ops.fft_precision('exact') (the default) for "
        "contract-grade full-range results.",
        stacklevel=3,
    )


def raw_autocorr_deep(x, n_out: int, m: int = None,
                      sum_d: int = 0):
    """Raw linear autocorrelation per column for engine-ineligible
    lengths. Result contract identical to
    pallas_fft.raw_autocorr_pallas; ``x`` is (n_rows, S) float64 with
    the transform length ``m`` >= 2*series_length (default: n_rows,
    i.e. a pre-padded operand). Handing the UNPADDED series with an
    explicit ``m`` skips a full (M, S) f64 pad pass and halves the
    f64 held across the first stage (production dispatch does this).
    ``sum_d`` folds the component sum into the fused epilogue,
    returning (n_out, S // sum_d).

    On TPU backends the chain runs as ONE jit (_deep_chain_onejit,
    constants passed as arguments). The stage-by-stage EAGER chain
    below remains for CPU composition tests (whose host-FFT engine
    stand-in is not traceable), for HBM debugging
    (TRANSPORT_ANALYSIS_TPU_DEEP_HBM_DEBUG=1 prints per-stage device
    memory), and as a fallback (TRANSPORT_ANALYSIS_TPU_DEEP_EAGER=1)
    for backends where the one-jit peak does not fit; it fences
    between stages above _FENCE_BYTES and frees each stage's sources
    before the next runs — pass ``x`` as a temporary (no caller-held
    reference) so the rebinds here actually release HBM."""
    n_rows, s = x.shape
    if m is None:
        m = n_rows
    dtype = x.dtype
    n_bands, max_group = _pf._profile(dtype)
    if dtype == jnp.float64 and (
        (n_bands, max_group) != (_pf._N_BANDS, _pf._MAX_GROUP)
    ):
        _warn_deep_precision(n_bands, max_group)
    inner, outer = _split_m(m)

    use_onejit = (
        _pf.is_tpu_backend()
        and not _HBM_DEBUG
        and not _os.environ.get("TRANSPORT_ANALYSIS_TPU_DEEP_EAGER")
    )
    if use_onejit:
        w = _deep_w(s, outer)
        consts = _pf._device_constants(inner // 128, 1, n_bands)
        tables = _outer_kernel_tables(inner, outer, n_bands)
        box = [x]
        del x
        out = _deep_chain_onejit(
            box.pop(), consts, tables, inner, outer, w, s, n_out,
            n_bands, max_group, sum_d)
        return out.astype(dtype) if dtype != out.dtype else out

    if _HBM_DEBUG:
        import time as _time

        _last_fence_t[0] = _time.perf_counter()
        print("[deep_hbm] enter", flush=True)

    w = _deep_w(s, outer)
    pair = _fence(*_prepare_pair(x, inner, outer, w, s), tag="prepare")
    del x  # donated to _prepare_pair

    zp = _fence(
        *_deep_fft_fwd_pair(pair, inner, outer, w, raw_pair=True,
                            profile=(n_bands, max_group)),
        tag="fwd")
    del pair
    # fused unpack + power + conjugate pair split IN KERNEL LAYOUT:
    # the inverse of (p1 + i p2) runs through the forward machinery
    # on (p1 - i p2); neither full-M f64 spectra nor power spectra
    # are materialized, and the DIF leg-2 consumes the kernel layout
    # directly (no inter-leg corner turn; f64 only inside the slabs)
    pair = _fence(*_unpack_dispatch(*zp, inner, outer, w),
                  tag="unpack_to_pair")
    del zp
    # DIF inverse-by-conjugation leg: outer DFT + post-twiddle, then
    # the level-2-trimmed engine, fused assembly epilogue
    (out,) = _fence(
        *_deep_fft_inv_dif(pair, inner, outer, w, n_out=n_out, s=s,
                           sum_d=sum_d,
                           profile=(n_bands, max_group)),
        tag="inv")
    del pair
    if _HBM_DEBUG:
        _fence(out, tag="deep_done")
    return out.astype(dtype) if dtype != out.dtype else out


def raw_autocorr_deep_pair(hi, lo, n_out: int, m: int = None,
                           sum_d: int = 0):
    """:func:`raw_autocorr_deep` from an exact double-float (hi, lo)
    f32-pair source — the pair-domain model feed (ROADMAP round-8
    lever 1). The f64 value represented is ``hi + lo`` exactly;
    callers that already hold that form (the pair-centered Helfand
    accumulator in ops/einstein.py; f32 trajectory data, whose exact
    f64 image is (x, 0)) skip the 8-byte materialization and its
    emulated-f64 passes entirely. Output is float64, same contract
    as raw_autocorr_deep on ``hi.astype(f64) + lo.astype(f64)`` up
    to the pair grade (~2^-48 relative, inside the 1e-11 contract).

    Off the one-jit TPU path (CPU tests, eager/HBM-debug modes) the
    pair is combined to f64 and the standard entry runs."""
    n_rows, s = hi.shape
    if m is None:
        m = n_rows
    n_bands, max_group = _pf._profile(jnp.float64)
    if (n_bands, max_group) != (_pf._N_BANDS, _pf._MAX_GROUP):
        _warn_deep_precision(n_bands, max_group)
    inner, outer = _split_m(m)

    use_onejit = (
        _pf.is_tpu_backend()
        and not _HBM_DEBUG
        and not _os.environ.get("TRANSPORT_ANALYSIS_TPU_DEEP_EAGER")
    )
    if use_onejit:
        w = _deep_w(s, outer)
        consts = _pf._device_constants(inner // 128, 1, n_bands)
        tables = _outer_kernel_tables(inner, outer, n_bands)
        box = [hi, lo]
        del hi, lo
        lo_ = box.pop()
        return _deep_chain_onejit_hl(
            box.pop(), lo_, consts, tables, inner, outer, w, s,
            n_out, n_bands, max_group, sum_d)

    x = hi.astype(jnp.float64) + lo.astype(jnp.float64)
    del hi, lo
    box = [x]
    del x
    return raw_autocorr_deep(box.pop(), n_out, m=m, sum_d=sum_d)


def raw_autocorr_deep_f32(x32, n_out: int, m: int = None,
                          sum_d: int = 0):
    """:func:`raw_autocorr_deep` at the FULL f64 band profile from an
    exactly-representable float32 source (trajectory data is stored
    f32; its f64 image is exact, pair form (x, 0)). Output float64,
    identical contract to raw_autocorr_deep(x32.astype(f64)) — NOT
    the 4-band f32 fast mode. The chain reads half the source bytes
    and skips the upcast + split passes. Off the one-jit TPU path
    the source upcasts and the standard entry runs."""
    n_rows, s = x32.shape
    if m is None:
        m = n_rows
    n_bands, max_group = _pf._profile(jnp.float64)
    if (n_bands, max_group) != (_pf._N_BANDS, _pf._MAX_GROUP):
        _warn_deep_precision(n_bands, max_group)
    inner, outer = _split_m(m)

    use_onejit = (
        _pf.is_tpu_backend()
        and not _HBM_DEBUG
        and not _os.environ.get("TRANSPORT_ANALYSIS_TPU_DEEP_EAGER")
    )
    if use_onejit:
        w = _deep_w(s, outer)
        consts = _pf._device_constants(inner // 128, 1, n_bands)
        tables = _outer_kernel_tables(inner, outer, n_bands)
        box = [x32]
        del x32
        return _deep_chain_onejit_f32(
            box.pop(), consts, tables, inner, outer, w, s, n_out,
            n_bands, max_group, sum_d)

    x = x32.astype(jnp.float64)
    del x32
    box = [x]
    del x
    return raw_autocorr_deep(box.pop(), n_out, m=m, sum_d=sum_d)
