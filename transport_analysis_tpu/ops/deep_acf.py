"""Deep autocorrelation: the banded Pallas engine beyond M = 65536.

The fused engine (ops/pallas_fft.py) covers transforms M = 128*n2 up
to n2 = 512 — the twiddle-folding that makes its kernels cheap stores
one constant matrix per inner batch column, which cannot scale to a
third level (128^3 would need gigabytes of folded constants). This
module composes ONE extra four-step level around the engine instead:

    M = M_inner * n_outer,   M_inner in-engine, n_outer <= 256 (pow2)

    x[j],  j = j1*n_outer + j2         (j1 < M_inner, j2 < n_outer)
    T[k1, j2]  = FFT_{M_inner} over j1          (fused engine, batched)
    T         *= W_M^{k1 j2}                    (f64 twiddle, XLA)
    Z[k2, k1] = DFT_{n_outer} over j2           (Ozaki banded GEMMs)
    k = k2*M_inner + k1                         (rows land k-major)

which reaches M = 65536*256 = 2^24 (8.4M frames). The Hermitian
unpack + power spectrum runs in XLA float64, and the inverse reuses
the forward machinery via conjugation, so no new kernels exist here.

Composition is EAGER (each stage is its own jit): tracing the engine
inside an outer jit embeds its banded constants as program literals
(~350 MB at n2 = 512 — see ops/pallas_fft.py), and the stages at
M ~ 2^21 move multi-GB arrays whose buffers should be freed between
stages rather than held by one giant program.

Dispatched from ops/acf.py (raw_autocorr / raw_autocorr_sumlast) for
float64 series with M > the engine ceiling; measured numbers live in
BENCH_NOTES.md ("deep composition").
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from . import pallas_fft as _pf

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


@functools.lru_cache(maxsize=4)
def _outer_tables_inv(inner: int, outer: int, n_out: int):
    """Row-trimmed, 1/M-prescaled outer DFT matrices for the inverse
    transform: only rows k2 < ceil(n_out / inner) of the k-major
    output are kept (the autocorrelation keeps n_out <= M/2 lags, so
    at least half the outer GEMM and its output traffic disappears),
    and the exact power-of-two 1/M scale rides the tiny host matrices
    instead of a full-size elementwise pass."""
    t = _outer_tables(inner, outer)
    nr = -(-n_out // inner)
    inv_m = 1.0 / (inner * outer)
    return t["twc"], t["tws"], t["dc"][:nr] * inv_m, t["ds"][:nr] * inv_m


@functools.partial(
    jax.jit, static_argnames=("inner", "outer", "w", "s"),
    donate_argnums=(0,),
)
def _prepare_pair(x, inner: int, outer: int, w: int, s: int):
    """(M, s) f64 → engine-layout f32 pairs.

    Large transforms run as a lax.map over row slabs: XLA does not
    reliably fuse the pad → double-float split → column slices, and
    the materialized full-width hi/lo f32 intermediates (~2·8·M·w
    bytes on top of input + outputs) made this stage's peak ~13 GB at
    M=2^21 — the nondeterministic OOM at the N=2^20 north-star rung.
    Slabs bound the intermediates; input + stacked outputs ≈ 8.6 GB.
    Small transforms keep the straight-line single program (donated
    input, fused chain)."""
    m = x.shape[0]
    ll = max(1, _UNPACK_SLAB * 128 // max(2 * w, 1))
    ll = 1 << (ll.bit_length() - 1)
    if m % ll or m <= ll:
        x = jnp.pad(x, ((0, 0), (0, 2 * w - s)))
        hi, lo = _pf._split_pair(x)
        return tuple(
            src[:, cols].reshape(inner, outer * w)
            for src, cols in (
                (hi, slice(0, w)), (lo, slice(0, w)),
                (hi, slice(w, None)), (lo, slice(w, None)),
            )
        )

    def slab(a0):
        xs = jax.lax.dynamic_slice(x, (a0 * ll, 0), (ll, s))
        xs = jnp.pad(xs, ((0, 0), (0, 2 * w - s)))
        hi, lo = _pf._split_pair(xs)
        return hi[:, :w], lo[:, :w], hi[:, w:], lo[:, w:]

    parts = jax.lax.map(slab, jnp.arange(m // ll))
    return tuple(a.reshape(inner, outer * w) for a in parts)


# rows per slab of the fused unpack stage (128 MB of f64 at w = 128).
# Above ~2^19 rows a straight-line unpack's HLO temps (hi/lo splits +
# reversals of every operand, ~6 full-array f32 copies live at once)
# exceed the chip: hardware-measured 12 GB of temps at M = 2^21.
_UNPACK_SLAB = 131072


@functools.partial(
    jax.jit, static_argnames=("inner", "outer", "w"),
    donate_argnums=(0, 1),
)
def _unpack_to_pair(zr, zi, inner: int, outer: int, w: int):
    """Fused Hermitian unpack + power spectra + conjugate pair split,
    (M, w) f64 spectra → engine-layout (re_hi, re_lo, im_hi, im_lo)
    of (p1 − i·p2), row-slabbed.

    Replaces the _unpack_power → _power_to_pair two-stage chain on
    large transforms: that chain's peak stage held TWO full f64
    spectra pairs (inputs + stacked outputs, 32·M·w bytes ≈ 8.6 GB at
    M=2^21, w=128) and its successor another 8.6 GB — the margin that
    made the N=2^20 north-star rung OOM nondeterministically. Fusing
    emits the four f32 pair arrays directly (16·M·w bytes of output
    against 16·M·w of input), never materializing full-M f64 power
    spectra; per-slab algebra is identical (f64 in-slab, split at the
    end), so accuracy is unchanged.

    Output row k needs input rows k and (M−k) mod M: each slab reads
    its own contiguous slice plus the mirrored slice flipped, with the
    single wrap row prepended (same access pattern as _unpack_power's
    row-slab path)."""
    m, _ = zr.shape
    # slab ROWS scale inversely with width: the budget is ELEMENTS
    # (_UNPACK_SLAB rows at the w=128 reference width — ~6 live slab
    # temps of 128 MB f64 each). A fixed row count OOMed the
    # N=2^17 × chunk=682 rung, where w=1024 made each temp 8× larger.
    ll = max(1, _UNPACK_SLAB * 128 // max(w, 1))
    ll = 1 << (ll.bit_length() - 1)  # pow2 floor divides pow2 m
    if m % ll or m <= ll:
        r_rev = jnp.roll(jnp.flip(zr, axis=0), 1, axis=0)
        i_rev = jnp.roll(jnp.flip(zi, axis=0), 1, axis=0)
        f1r = 0.5 * (zr + r_rev)
        f1i = 0.5 * (zi - i_rev)
        f2r = 0.5 * (zi + i_rev)
        f2i = 0.5 * (r_rev - zr)
        rh, rl = _pf._split_pair(f1r * f1r + f1i * f1i)
        ih, il = _pf._split_pair(-(f2r * f2r + f2i * f2i))
        return tuple(
            a.reshape(inner, outer * w) for a in (rh, rl, ih, il)
        )

    def slab(a0):
        a = a0 * ll

        def rev(z):
            tail = jax.lax.dynamic_slice(z, (m - a - ll, 0), (ll, w))
            head = jax.lax.dynamic_slice(z, ((m - a) % m, 0), (1, w))
            return jnp.concatenate(
                [head, jnp.flip(tail, axis=0)[: ll - 1]], axis=0)

        zs = jax.lax.dynamic_slice(zr, (a, 0), (ll, w))
        is_ = jax.lax.dynamic_slice(zi, (a, 0), (ll, w))
        r_rev = rev(zr)
        i_rev = rev(zi)
        f1r = 0.5 * (zs + r_rev)
        f1i = 0.5 * (is_ - i_rev)
        f2r = 0.5 * (is_ + i_rev)
        f2i = 0.5 * (r_rev - zs)
        rh, rl = _pf._split_pair(f1r * f1r + f1i * f1i)
        ih, il = _pf._split_pair(-(f2r * f2r + f2i * f2i))
        return rh, rl, ih, il

    parts = jax.lax.map(slab, jnp.arange(m // ll))
    return tuple(a.reshape(inner, outer * w) for a in parts)


_K1_SLAB = 8192  # k1 rows per sequential slab in the outer stage


@functools.partial(
    jax.jit,
    static_argnames=("inner", "outer", "w", "n_slices", "max_band",
                     "final_s", "final_n"),
    donate_argnums=(0, 1, 2, 3))
def _twiddle_and_outer(rh, rl, ih, il, twc, tws, dc, ds,
                       inner: int, outer: int, w: int,
                       n_slices: int = None, max_band: int = None,
                       final_s: int = None, final_n: int = None):
    """(T * W_M^{k1 j2}) then DFT_{n_outer} over j2, in float64 with
    the Ozaki banded complex product (the contraction is tiny).

    Consumes the engine's double-float (hi, lo) pairs DIRECTLY — the
    f64 reconstruction happens per slab (fused with the twiddle
    multiply), so the full-size float64 re/im arrays of the former
    _from_pairs stage are never materialized: one whole HBM pass per
    transform removed, and the slab input reads halve.

    Runs as a lax.map over k1 slabs: columns are independent, and the
    banded product's full rhs band stack at inner*w ~ 8M columns would
    otherwise materialize ~7 GB of bf16 bands (plus f64 temps — a
    hardware-measured 36 GB peak). Sequential slabs bound the live set
    while keeping ONE dispatched program.

    ``dc``/``ds`` may be row-trimmed (see _outer_tables_inv): only the
    leading k2 rows of the k-major output are computed. When
    ``final_s``/``final_n`` are set the program also emits the
    assembled autocorrelation ``concat([zr, -zi], 1)[:final_n,
    :final_s]`` — the raw_autocorr_deep epilogue, fused here instead
    of running as separate eager full-size passes."""
    from .ozaki import complex_dft_matmul

    n_slab = max(1, inner // _K1_SLAB)
    k1s = inner // n_slab

    def eng(a):
        return a.reshape(n_slab, k1s, outer, w)

    rh, rl, ih, il = eng(rh), eng(rl), eng(ih), eng(il)
    twc = twc.reshape(n_slab, k1s, outer, 1)
    tws = tws.reshape(n_slab, k1s, outer, 1)

    def slab(args):
        rh_, rl_, ih_, il_, tc, ts = args
        r = rh_.astype(jnp.float64) + rl_.astype(jnp.float64)
        i = ih_.astype(jnp.float64) + il_.astype(jnp.float64)
        tr = r * tc - i * ts
        ti = r * ts + i * tc
        tr = jnp.moveaxis(tr, 1, 0).reshape(outer, k1s * w)
        ti = jnp.moveaxis(ti, 1, 0).reshape(outer, k1s * w)
        return complex_dft_matmul(dc, ds, tr, ti,
                                  n_slices=n_slices, max_band=max_band)

    zr, zi = jax.lax.map(slab, (rh, rl, ih, il, twc, tws))
    # (n_slab, nr, slab*w) -> rows k2, cols (k1, w) -> k-major rows
    nr = dc.shape[0]
    zr = jnp.moveaxis(zr, 0, 1).reshape(nr * inner, w)
    zi = jnp.moveaxis(zi, 0, 1).reshape(nr * inner, w)
    if final_s is None:
        return zr, zi
    return (jnp.concatenate(
        [zr[:final_n], -zi[:final_n]], axis=1)[:, :final_s],)


def _deep_fft_fwd_pair(pair, inner: int, outer: int, w: int,
                       n_out: int = None, s: int = None):
    """Forward FFT via engine + outer level. ``pair`` is the complex
    double-float (re_hi, re_lo, im_hi, im_lo), each (inner, outer*w)
    float32 — DONATED to the engine, so callers must drop their f64
    sources before calling (HBM peak discipline). float64 out.

    With ``n_out``/``s`` set (the inverse-by-conjugation leg of the
    autocorrelation), the outer stage is row-trimmed + 1/M-prescaled
    and emits the assembled (n_out, s) result directly."""
    # one profile for both levels: the engine reads it internally,
    # the Ozaki outer DFT takes it as statics (same 7-bit band grid)
    n_bands, max_group = _pf._profile(jnp.float64)
    pair = _pf.fft_banded_pair(pair, wt=_DEEP_WT)
    pair = _fence(*pair, tag="engine")
    if n_out is None:
        t = _outer_tables(inner, outer)
        twc, tws, dc, ds = t["twc"], t["tws"], t["dc"], t["ds"]
        final = {}
    else:
        twc, tws, dc, ds = _outer_tables_inv(inner, outer, n_out)
        final = {"final_s": s, "final_n": n_out}
    return _twiddle_and_outer(*pair, twc, tws, dc, ds,
                              inner, outer, w,
                              n_slices=n_bands, max_band=max_group,
                              **final)


# fence eager stages once the working set is big enough that letting
# the host race ahead would hold several stages' buffers live at once
# (hardware-measured: N=2^17 x 768 series OOMed a 16 GB chip unfenced)
_FENCE_BYTES = 256 * 1024 * 1024

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


def raw_autocorr_deep(x, n_out: int):
    """Raw linear autocorrelation per column for engine-ineligible
    lengths. Contract identical to pallas_fft.raw_autocorr_pallas:
    ``x`` (M, S) float64 zero-padded to M >= 2*series_length.

    The stages run EAGERLY (module docstring) and, at large shapes,
    fence between stages: async dispatch would otherwise enqueue the
    whole chain while every intermediate's buffer stays live —
    multi-GB peaks the chip does not have. For the same reason the
    float64 operands convert to f32 pairs FIRST and are freed before
    the engine runs (the engine donates its pair inputs); pass ``x``
    as a temporary (no caller-held reference) so the rebinds here
    actually release HBM."""
    m, s = x.shape
    inner, outer = _split_m(m)

    if _HBM_DEBUG:
        import time as _time

        _last_fence_t[0] = _time.perf_counter()
        print("[deep_hbm] enter", flush=True)

    half = (s + 1) // 2
    w = -(-half // _DEEP_WT) * _DEEP_WT
    pair = _fence(*_prepare_pair(x, inner, outer, w, s), tag="prepare")
    del x  # donated to _prepare_pair

    zr, zi = _fence(*_deep_fft_fwd_pair(pair, inner, outer, w),
                    tag="fwd")
    del pair
    # fused unpack + power + conjugate pair split: the inverse of
    # (p1 + i p2) runs through the forward machinery on (p1 - i p2);
    # the full-M f64 power spectra are never materialized
    pair = _fence(*_unpack_to_pair(zr, zi, inner, outer, w),
                  tag="unpack_to_pair")
    del zr, zi
    # inverse-by-conjugation leg: row-trimmed outer DFT with the 1/M
    # scale folded into the (tiny) DFT matrices, epilogue fused in
    (out,) = _fence(
        *_deep_fft_fwd_pair(pair, inner, outer, w, n_out=n_out, s=s),
        tag="inv")
    del pair
    if _HBM_DEBUG:
        _fence(out, tag="deep_done")
    return out
