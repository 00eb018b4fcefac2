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
# demo shape — 0.5 GB over this chip)
_DEEP_WT = 128


def supported(m: int, s: int) -> bool:
    """Deep-composition eligibility (engine-ineligible M only)."""
    if jax.default_backend() in ("cpu", "gpu", "cuda", "rocm"):
        return False
    if s < 2 or m & (m - 1):
        return False
    inner, outer = _split_m(m)
    return inner is not None


def _split_m(m: int):
    """Largest in-engine inner length whose cofactor is <= _MAX_OUTER."""
    for inner in (65536, 32768, 16384):
        if m % inner == 0 and _pf.shape_supported(inner, 2 * _pf._W_TILE):
            outer = m // inner
            if 2 <= outer <= _MAX_OUTER:
                return inner, outer
    return None, None


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


# rows per slab of the fused unpack stage (128 MB of f64 at w = 128).
# Above ~2^19 rows a straight-line unpack's HLO temps (hi/lo splits +
# reversals of every operand, ~6 full-array f32 copies live at once)
# exceed the chip: hardware-measured 12 GB of temps at M = 2^21.
_UNPACK_SLAB = 131072


@functools.partial(
    jax.jit, static_argnames=("inner", "outer", "w"),
    donate_argnums=(0, 1, 2, 3),
)
def _unpack_to_pair(zrh, zrl, zih, zil, inner: int, outer: int,
                    w: int):
    """Fused Hermitian unpack + power spectra + conjugate pair split,
    k-major (M, w) f32-PAIR spectra → engine-layout (re_hi, re_lo,
    im_hi, im_lo) of (p1 − i·p2), row-slabbed.

    Replaces the _unpack_power → _power_to_pair two-stage chain on
    large transforms: that chain's peak stage held TWO full f64
    spectra pairs (inputs + stacked outputs, 32·M·w bytes ≈ 8.6 GB at
    M=2^21, w=128) and its successor another 8.6 GB — the margin that
    made the N=2^20 north-star rung OOM nondeterministically. Fusing
    emits the four f32 pair arrays directly, never materializing
    full-M f64 power spectra. The inputs arrive as f32 pairs straight
    from the pair corner turn (_fwd_from_kernel_pair); each slab
    reconstructs f64 in VMEM-sized pieces (hi + lo, ~1e-16 relative —
    far inside the 1e-11 contract), runs the identical f64 algebra,
    and splits back at the end.

    Output row k needs input rows k and (M−k) mod M: each slab reads
    its own contiguous slice plus the mirrored slice flipped, with the
    single wrap row prepended (same access pattern as _unpack_power's
    row-slab path).

    Hermitian-output symmetry (round-6 lever): both power spectra of
    the two packed REAL series satisfy p[M−k] = p[k] — f1r/f2r are
    even and f1i/f2i odd in k by construction (the same two summands
    commute / negate, which is EXACT in floating point), and squaring
    kills the sign. The slabbed path therefore computes only rows
    0..M/2 and mirrors rows M/2+1..M−1 as a flip copy: half the
    direct+rev gather reads and half the f64 algebra + pair splits,
    bit-identical output (asserted against the straight-line full-M
    path in tests/test_deep_acf.py)."""
    m, _ = zrh.shape
    # slab ROWS scale inversely with width: the budget is ELEMENTS
    # (_UNPACK_SLAB rows at the w=128 reference width). Each slab
    # processes ll+1 rows (its block plus the one-row mirror overlap),
    # holds ~6 live (ll+1, w) f64 temps through the algebra, and emits
    # 8 turned f32 parts (4 firsts + 4 mirrors) — half the slab count
    # of the pre-symmetry path, so the per-slab element budget is
    # unchanged. A fixed row count OOMed the N=2^17 × chunk=682 rung,
    # where w=1024 made each temp 8× larger.
    def turn(a, rows):
        # rows consecutive j = j1*outer + j2 -> lanes (w, j2)
        return a.reshape(rows // outer, outer, w).swapaxes(
            1, 2).reshape(rows // outer, w * outer)

    f64 = jnp.float64

    ll = max(1, _UNPACK_SLAB * 128 // max(w, 1))
    ll = 1 << (ll.bit_length() - 1)  # pow2 floor divides pow2 m
    ll = max(ll, outer)
    if m % ll or m <= ll:
        zr = zrh.astype(f64) + zrl.astype(f64)
        zi = zih.astype(f64) + zil.astype(f64)
        r_rev = jnp.roll(jnp.flip(zr, axis=0), 1, axis=0)
        i_rev = jnp.roll(jnp.flip(zi, axis=0), 1, axis=0)
        f1r = 0.5 * (zr + r_rev)
        f1i = 0.5 * (zi - i_rev)
        f2r = 0.5 * (zi + i_rev)
        f2i = 0.5 * (r_rev - zr)
        rh, rl = _pf._split_pair(f1r * f1r + f1i * f1i)
        ih, il = _pf._split_pair(-(f2r * f2r + f2i * f2i))
        return tuple(
            turn(a, m).reshape(inner, w * outer)
            for a in (rh, rl, ih, il)
        )

    # the mirror alignment below needs pow2 m (ll is a pow2, so
    # ll <= half and half % ll == 0 follow); _split_m can accept a
    # non-pow2 outer, but only supported() — which enforces pow2 —
    # gates production dispatch, so make the precondition loud here
    assert m & (m - 1) == 0, f"slabbed unpack requires pow2 M, got {m}"
    half = m // 2

    # Each slab runs the algebra on rows a..a+ll (ONE extra row) and
    # writes two turned blocks STRAIGHT into the preallocated outputs
    # via in-place dynamic_update_slice on the fori_loop carries: its
    # first-half block [a, a+ll) and its own mirror block —
    # p[m-k] = p[k] puts the mirrors of k in (a, a+ll] at raw output
    # rows [m-a-ll, m-a), which is ll-aligned, so the in-slab
    # raw-space flip turns cleanly (no lane permutes, no full-array
    # transpose) and each update is a static-size slice at a dynamic
    # row. The Nyquist row k = half rides the last slab's extra row
    # through the general formula (f1i/f2i vanish exactly there, so
    # the algebra is bit-equal to its special case). Writing through
    # the loop carries (instead of stacking lax.map results and
    # flip+concatenating them) removes a full-size copy per output
    # and the stacked intermediate's transient HBM.
    def slab(a0):
        a = a0 * ll

        def direct(h, l):
            hs = jax.lax.dynamic_slice(h, (a, 0), (ll + 1, w))
            ls = jax.lax.dynamic_slice(l, (a, 0), (ll + 1, w))
            return hs.astype(f64) + ls.astype(f64)

        def rev(h, l):
            def cut(z):
                tail = jax.lax.dynamic_slice(
                    z, (m - a - ll, 0), (ll, w))
                head = jax.lax.dynamic_slice(
                    z, ((m - a) % m, 0), (1, w))
                return jnp.concatenate(
                    [head, jnp.flip(tail, axis=0)], axis=0)

            return cut(h).astype(f64) + cut(l).astype(f64)

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
        firsts = tuple(turn(a_[:ll], ll) for a_ in (rh, rl, ih, il))
        mirrors = tuple(
            turn(jnp.flip(a_[1:], axis=0), ll)
            for a_ in (rh, rl, ih, il))
        return firsts + mirrors

    llt = ll // outer

    def body(a0, outs):
        parts = slab(a0)
        new = []
        for i in range(4):
            o = jax.lax.dynamic_update_slice(
                outs[i], parts[i], (a0 * llt, 0))
            o = jax.lax.dynamic_update_slice(
                o, parts[4 + i], (inner - (a0 + 1) * llt, 0))
            new.append(o)
        return tuple(new)

    init = tuple(
        jnp.zeros((inner, w * outer), jnp.float32) for _ in range(4))
    return jax.lax.fori_loop(0, half // ll, body, init)


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


def _outer_kernel_body(n_bands: int, max_group: int, lane: int,
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
    as the engine's fused power-spectrum slicing)."""
    rh, rl = rh_ref[:], rl_ref[:]
    ih, il = ih_ref[:], il_ref[:]
    tch, tcl = tch_ref[:], tcl_ref[:]
    tsh, tsl = tsh_ref[:], tsl_ref[:]

    # (r + i*i_) * (tc + i*ts): tr = r*tc - i*ts, ti = r*ts + i*tc
    if _pf._interpret():
        # XLA:CPU's LLVM backend contracts mul+add chains into FMAs
        # inside fused loops, which silently breaks the Dekker/TwoSum
        # error-free transforms below (hardware-measured: the f32
        # rounding of a*b simply never happens, ~2^-24 of the product
        # leaks). Interpret mode = CPU tests only, where native f64 is
        # available and exact; Mosaic preserves the pair arithmetic
        # 1:1 (the engine's identical EFTs are TPU-hardware-validated
        # at 1.7e-13). Pow2-scaled products (band slicing, _merge)
        # are contraction-safe everywhere — fma(x, 2^-k, y) rounds
        # identically because the product is exact.
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

    s = _pf._pow2_ceil_f32(jnp.max(
        jnp.maximum(jnp.abs(tr_h), jnp.abs(ti_h)),
        axis=1, keepdims=True))
    inv = 1.0 / s

    # bands n..0 left-to-right (position p holds band n-p; the extra
    # band n sits leftmost and is consumed by the suffix of nothing —
    # only the explicit extra product below reads it)
    pos = [n_bands - q for q in range(n_bands + 1)]
    _slice_pair_cols_into(
        lhs_scratch, lane, pos,
        (tr_h * inv, tr_l * inv), (ti_h * inv, ti_l * inv))

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
    orh_ref[:] = re_hi * s
    orl_ref[:] = re_lo * s
    oih_ref[:] = im_hi * s
    oil_ref[:] = im_lo * s


@functools.partial(
    jax.jit, static_argnames=("inner", "outer", "w", "n_bands",
                              "max_group"),
    donate_argnums=(0, 1, 2, 3))
def _outer_level_pallas(rh, rl, ih, il, tch, tcl, tsh, tsl,
                        rhs_re, rhs_im, inner: int, outer: int,
                        w: int, n_bands: int, max_group: int):
    """Run the fused twiddle+outer kernel over the (inner, w*outer)
    engine output pair (lanes (w, j2)); emits the spectrum pair in the
    same layout with lanes (w, k2)."""
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
        functools.partial(_outer_kernel_body, n_bands, max_group, lane),
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


@functools.partial(
    jax.jit,
    static_argnames=("inner", "outer", "w", "n_out", "s", "sum_d"),
    donate_argnums=(0, 1, 2, 3))
def _inv_from_kernel(rh, rl, ih, il, inner: int, outer: int, w: int,
                     n_out: int, s: int, sum_d: int = 0):
    """Kernel layout -> the assembled (n_out, s) autocorrelation:
    lane-trims k2 >= ceil(n_out/inner) BEFORE the corner turn (half
    the transpose traffic for the usual n_out = M/2), applies the
    exact power-of-two 1/M, and packs [re, -im] (the two-for-one
    real-series unpacking of the conjugation-trick inverse).

    ``sum_d`` > 0 additionally sums groups of ``sum_d`` adjacent
    series columns (the per-particle component sum of the (N, P, d)
    analyses) INSIDE this fused epilogue — emitting (n_out, s/sum_d)
    directly instead of materializing the (n_out, s) f64 array for a
    separate reduce pass (same f64 summation order as
    jnp.sum(out.reshape(n_out, -1, sum_d), axis=-1))."""
    nr = -(-n_out // inner)
    inv_m = 1.0 / (inner * outer)

    def conv(h, l):
        h = h.reshape(inner, w, outer)[:, :, :nr]
        l = l.reshape(inner, w, outer)[:, :, :nr]
        h = jnp.moveaxis(h, 2, 0).reshape(nr * inner, w)[:n_out]
        l = jnp.moveaxis(l, 2, 0).reshape(nr * inner, w)[:n_out]
        return (h.astype(jnp.float64) + l.astype(jnp.float64)) * inv_m

    out = jnp.concatenate([conv(rh, rl), -conv(ih, il)], axis=1)[:, :s]
    if sum_d:
        out = jnp.sum(out.reshape(n_out, s // sum_d, sum_d), axis=-1)
    return (out,)


def _deep_fft_fwd_pair(pair, inner: int, outer: int, w: int,
                       n_out: int = None, s: int = None,
                       as_pair: bool = False, sum_d: int = 0,
                       profile=None):
    """Forward FFT via engine + fused outer-level kernel. ``pair`` is
    the complex double-float (re_hi, re_lo, im_hi, im_lo), each
    (inner, w*outer) float32 with lanes (w, j2) — DONATED to the
    engine, so callers must drop their f64 sources before calling
    (HBM peak discipline). float64 out.

    With ``n_out``/``s`` set (the inverse-by-conjugation leg of the
    autocorrelation), the epilogue lane-trims k2, folds the 1/M, and
    emits the assembled (n_out, s) result directly."""
    # one profile for both levels: the engine reads it internally,
    # the outer kernel takes it as statics (same 7-bit band grid);
    # float32 inputs ride the lighter 4-band profile
    n_bands, max_group = (profile if profile is not None
                          else _pf._profile(jnp.float64))
    pair = _pf.fft_banded_pair(pair, wt=_DEEP_WT)
    pair = _fence(*pair, tag="engine")
    tables = _outer_kernel_tables(inner, outer, n_bands)
    pair = _outer_level_pallas(*pair, *tables, inner=inner,
                               outer=outer, w=w, n_bands=n_bands,
                               max_group=max_group)
    pair = _fence(*pair, tag="outer")
    if n_out is not None:
        return _inv_from_kernel(*pair, inner=inner, outer=outer, w=w,
                                n_out=n_out, s=s, sum_d=sum_d)
    if as_pair:
        return _fwd_from_kernel_pair(*pair, inner=inner, outer=outer,
                                     w=w)
    return _fwd_from_kernel(*pair, inner=inner, outer=outer, w=w)


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
    pair = _pf._fft_fwd_impl(pair, consts, n_bands=n_bands,
                             max_group=max_group, wt=_DEEP_WT)
    pair = _outer_level_pallas(
        *pair, *tables, inner=inner, outer=outer, w=w,
        n_bands=n_bands, max_group=max_group)
    zp = _fwd_from_kernel_pair(*pair, inner=inner, outer=outer, w=w)
    pair = _unpack_to_pair(*zp, inner, outer, w)
    pair = _pf._fft_fwd_impl(pair, consts, n_bands=n_bands,
                             max_group=max_group, wt=_DEEP_WT)
    pair = _outer_level_pallas(
        *pair, *tables, inner=inner, outer=outer, w=w,
        n_bands=n_bands, max_group=max_group)
    (out,) = _inv_from_kernel(*pair, inner=inner, outer=outer,
                              w=w, n_out=n_out, s=s, sum_d=sum_d)
    return out


# once-per-process flag for the out-of-contract precision warning
_PRECISION_WARNED = [False]


def _warn_deep_precision(n_bands: int, max_group: int):
    """Warn (once per process) when a trimmed fft_precision profile
    reaches the deep composition: the engine-only grade of a trimmed
    profile does NOT survive the extra outer level + conjugation leg.
    Hardware-measured at the N=2^20 rung (BENCH_NOTES "precision
    ladder"): "high" (7, 5) lands at 2.4e-10 and "medium" (5, 4) at
    4.9e-8 — both outside the package's 1e-11 float64 contract, which
    only the default "exact" profile holds at deep shapes."""
    if _PRECISION_WARNED[0]:
        return
    _PRECISION_WARNED[0] = True
    import warnings

    warnings.warn(
        f"fft_precision profile (n_bands={n_bands}, max_group="
        f"{max_group}) on a deep-composition transform (> 32768 "
        "frames): measured deep-shape error is ~1e-10 ('high') to "
        "~1e-8 ('medium'), OUTSIDE the 1e-11 float64 contract that "
        "the default 'exact' profile holds. Use ops.fft_precision("
        "'exact') (the default) if you need contract-grade results.",
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
        jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
        and not _HBM_DEBUG
        and not _os.environ.get("TRANSPORT_ANALYSIS_TPU_DEEP_EAGER")
    )
    if use_onejit:
        half = (s + 1) // 2
        w = -(-half // _DEEP_WT) * _DEEP_WT
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

    half = (s + 1) // 2
    w = -(-half // _DEEP_WT) * _DEEP_WT
    pair = _fence(*_prepare_pair(x, inner, outer, w, s), tag="prepare")
    del x  # donated to _prepare_pair

    zp = _fence(
        *_deep_fft_fwd_pair(pair, inner, outer, w, as_pair=True,
                            profile=(n_bands, max_group)),
        tag="fwd")
    del pair
    # fused unpack + power + conjugate pair split: the inverse of
    # (p1 + i p2) runs through the forward machinery on (p1 - i p2);
    # neither full-M f64 spectra nor power spectra are materialized
    # (the corner turn stays in f32 pairs; f64 only inside the slabs)
    pair = _fence(*_unpack_to_pair(*zp, inner, outer, w),
                  tag="unpack_to_pair")
    del zp
    # inverse-by-conjugation leg: row-trimmed outer DFT with the 1/M
    # scale folded into the (tiny) DFT matrices, epilogue fused in
    (out,) = _fence(
        *_deep_fft_fwd_pair(pair, inner, outer, w, n_out=n_out, s=s,
                            sum_d=sum_d,
                            profile=(n_bands, max_group)),
        tag="inv")
    del pair
    if _HBM_DEBUG:
        _fence(out, tag="deep_done")
    return out.astype(dtype) if dtype != out.dtype else out
