"""Ablate the banded engine LEVEL kernel at the north-star geometry.

The round-7 attribution (BENCH_NOTES "engine-level attribution") found
a profile-FLAT ~0.125 s base in `fft_banded_pair` that the MAX_GROUP
override cannot touch, and blamed the serial band slicing + int8
convert passes. micro_slice.py could NOT reproduce that cost in
isolation (slicing+copy runs at copy rates), so this probe ablates the
REAL `_banded_level` call — same specs, same grid, swapped kernel
bodies — to locate the base:

  full       the production _level_kernel_body
  nodots     slicing + merge of constant groups (GEMMs skipped)
  noslice    dots on a once-written scratch (slicing skipped)
  passthru   read all 7 operands, write all 5 outputs, no compute

Usage: python benchmarks/micro_level.py [--m 16384] [--b 16384]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/transport_analysis_tpu_xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import transport_analysis_tpu  # noqa: E402,F401
from transport_analysis_tpu.ops import pallas_fft as pf  # noqa: E402


def _body_passthru(transposed_out, n_bands, max_group, lre_ref, lim_ref,
                   rh_ref, rl_ref, ih_ref, il_ref, s_ref, orh_ref,
                   orl_ref, oih_ref, oil_ref, omax_ref, rhs_scratch):
    touch = (lre_ref[0, :1, :1] + lim_ref[0, :1, :1]).astype(jnp.float32)
    rh = rh_ref[:] + touch[0, 0] * np.float32(1e-30)
    if transposed_out:
        orh_ref[0] = rh[: orh_ref.shape[1]]
        orl_ref[0] = rl_ref[:][: orh_ref.shape[1]]
        oih_ref[0] = ih_ref[:][: orh_ref.shape[1]]
        oil_ref[0] = il_ref[:][: orh_ref.shape[1]]
    else:
        orh_ref[:] = rh[: orh_ref.shape[0]]
        orl_ref[:] = rl_ref[:][: orh_ref.shape[0]]
        oih_ref[:] = ih_ref[:][: orh_ref.shape[0]]
        oil_ref[:] = il_ref[:][: orh_ref.shape[0]]
    omax_ref[:] = s_ref[:]


def _body_nodots(transposed_out, n_bands, max_group, lre_ref, lim_ref,
                 rh_ref, rl_ref, ih_ref, il_ref, s_ref, orh_ref,
                 orl_ref, oih_ref, oil_ref, omax_ref, rhs_scratch):
    s = s_ref[:]
    inv = 1.0 / s
    rh, rl = rh_ref[:] * inv, rl_ref[:] * inv
    ih, il = ih_ref[:] * inv, il_ref[:] * inv
    k = rh.shape[0]
    pf._slice_pair_into(rhs_scratch, 0, 2 * k, rh, rl, n_bands)
    pf._slice_pair_into(rhs_scratch, k, 2 * k, ih, il, n_bands)
    # merge constant-ish groups (read one scratch row into the mix so
    # the slicing survives DCE); no GEMMs
    seed = rhs_scratch[:1].astype(jnp.int32)[0, 0]
    rows = orh_ref.shape[1] if transposed_out else orh_ref.shape[0]
    g0 = jnp.full((rows, rh.shape[1]), seed, jnp.int32)
    groups = [g0 for _ in range(max_group + 1)]
    re_hi, re_lo = pf._merge(groups)
    im_hi, im_lo = pf._merge(groups)
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
    omax_ref[:] = jnp.max(jnp.abs(re_hi), axis=0, keepdims=True)


def _body_noslice(transposed_out, n_bands, max_group, lre_ref, lim_ref,
                  rh_ref, rl_ref, ih_ref, il_ref, s_ref, orh_ref,
                  orl_ref, oih_ref, oil_ref, omax_ref, rhs_scratch):
    s = s_ref[:]
    k = rh_ref.shape[0]
    # one full-scratch constant store (same write volume as the 14
    # band stores it replaces; Mosaic runs the body per grid step, so
    # nothing hoists)
    rhs_scratch[:] = jnp.zeros(rhs_scratch.shape, jnp.int8)
    re_hi, re_lo = pf._merge(pf._grouped_dots(
        lre_ref[0], rhs_scratch, 2 * k, n_bands, max_group))
    im_hi, im_lo = pf._merge(pf._grouped_dots(
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


def time_level(tag, m, b, wt, reps, body=None):
    n2 = m // 128
    n_bands, max_group = pf._profile(jnp.float64)
    consts = pf._device_constants(n2, 1, n_bands)
    n_w = b // wt

    saved = pf._level_kernel_body
    if body is not None:
        pf._level_kernel_body = body
    try:
        @functools.partial(jax.jit, static_argnames=("lvl",))
        def run_l1(pair, scale, lre, lim, lvl):
            out, cm = pf._banded_level(
                lre, lim, pair, scale, 128, True, n_w,
                transposed_out=True, n_bands=n_bands,
                max_group=max_group, wt=wt)
            return out, cm

        key = jax.random.PRNGKey(0)
        pair = tuple(
            jax.random.uniform(jax.random.fold_in(key, i),
                               (128, n2 * b), jnp.float32, -1, 1)
            for i in range(4))
        scale = jnp.ones((1, n2 * b), jnp.float32)
        out, cm = run_l1(pair, scale, consts["l1_re"], consts["l1_im"],
                         "l1")
        np.asarray(jnp.sum(cm))
        t0 = time.perf_counter()
        for _ in range(reps):
            out, cm = run_l1(pair, scale, consts["l1_re"],
                             consts["l1_im"], "l1")
        np.asarray(jnp.sum(cm))
        wall = (time.perf_counter() - t0) / reps
        gb = (8 * 128 * n2 * b + 4 * n2 * b) * 4 / 1e9
        print(f"{tag:10s} {wall * 1e3:8.2f} ms  {gb / wall:7.1f} GB/s "
              f"(L1 {m}x{b}, grid {n2 * n_w})", flush=True)
    finally:
        pf._level_kernel_body = saved
    return wall


def time_stages(m, b, wt, reps):
    """Time the pieces of _fft_fwd_impl separately (fresh jits, no
    donation so inputs can be reused across reps)."""
    n2 = m // 128
    n_bands, max_group = pf._profile(jnp.float64)
    consts = pf._device_constants(n2, 1, n_bands)
    n_w = b // wt
    _N1 = 128

    key = jax.random.PRNGKey(0)
    pair0 = tuple(
        jax.random.uniform(jax.random.fold_in(key, i),
                           (_N1, n2 * b), jnp.float32, -1, 1)
        for i in range(4))
    scale = jnp.ones((1, n2 * b), jnp.float32)

    @jax.jit
    def l1(pair, scale, lre, lim):
        return pf._banded_level(lre, lim, pair, scale, _N1, True, n_w,
                                transposed_out=True, n_bands=n_bands,
                                max_group=max_group, wt=wt)

    @jax.jit
    def s1_reduce(pair3):
        return pf._pow2_ceil_f32(jnp.max(
            jnp.maximum(jnp.abs(pair3[0]), jnp.abs(pair3[2])),
            axis=0).reshape(1, _N1 * b))

    @jax.jit
    def l2(pair3, s1, lre, lim):
        pair = tuple(a.reshape(n2, _N1 * b) for a in pair3)
        return pf._banded_level(lre, lim, pair, s1, n2, False, n_w,
                                n_bands=n_bands, max_group=max_group,
                                wt=wt)

    @jax.jit
    def fwd_full(pair, lre1, lim1, lre2, lim2):
        # _fft_fwd_impl donates; inline its body without donation
        pr = tuple(a.reshape(_N1, n2 * b) for a in pair)
        s_in = pf._pow2_ceil_f32(jnp.maximum(
            jnp.max(jnp.abs(pr[0]), axis=0, keepdims=True),
            jnp.max(jnp.abs(pr[2]), axis=0, keepdims=True)))
        p1, _ = pf._banded_level(lre1, lim1, pr, s_in, _N1, True, n_w,
                                 transposed_out=True, n_bands=n_bands,
                                 max_group=max_group, wt=wt)
        s1 = pf._pow2_ceil_f32(jnp.max(
            jnp.maximum(jnp.abs(p1[0]), jnp.abs(p1[2])),
            axis=0).reshape(1, _N1 * b))
        p1 = tuple(a.reshape(n2, _N1 * b) for a in p1)
        p2, _ = pf._banded_level(lre2, lim2, p1, s1, n2, False, n_w,
                                 n_bands=n_bands, max_group=max_group,
                                 wt=wt)
        return p2

    @jax.jit
    def fwd_chain2(x4, lre1, lim1, lre2, lim2):
        # the REAL chain entry/exit: pair arrives (M, B), reshapes to
        # the (128, n2*B) engine layout (free in linear memory, but a
        # PHYSICAL relayout in the TPU's tiled layout), and the result
        # reshapes back to k-major (M, B) at the end
        pr = tuple(a.reshape(_N1, n2 * b) for a in x4)
        s_in = pf._pow2_ceil_f32(jnp.maximum(
            jnp.max(jnp.abs(pr[0]), axis=0, keepdims=True),
            jnp.max(jnp.abs(pr[2]), axis=0, keepdims=True)))
        p1, _ = pf._banded_level(lre1, lim1, pr, s_in, _N1, True, n_w,
                                 transposed_out=True, n_bands=n_bands,
                                 max_group=max_group, wt=wt)
        s1 = pf._pow2_ceil_f32(jnp.max(
            jnp.maximum(jnp.abs(p1[0]), jnp.abs(p1[2])),
            axis=0).reshape(1, _N1 * b))
        p1 = tuple(a.reshape(n2, _N1 * b) for a in p1)
        p2, _ = pf._banded_level(lre2, lim2, p1, s1, n2, False, n_w,
                                 n_bands=n_bands, max_group=max_group,
                                 wt=wt)
        return tuple(
            a.reshape(n2, _N1, b).reshape(n2 * _N1, b) for a in p2)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import functools as ft

    def _body3d(n_bands_, max_group_, lre_ref, lim_ref, rh_ref, rl_ref,
                ih_ref, il_ref, s_ref, orh_ref, orl_ref, oih_ref,
                oil_ref, omax_ref, rhs_scratch):
        s = s_ref[:]
        inv = 1.0 / s
        sq = lambda r: r[:, 0, :]  # noqa: E731
        rh, rl = sq(rh_ref) * inv, sq(rl_ref) * inv
        ih, il = sq(ih_ref) * inv, sq(il_ref) * inv
        k = rh.shape[0]
        pf._slice_pair_into(rhs_scratch, 0, 2 * k, rh, rl, n_bands_)
        pf._slice_pair_into(rhs_scratch, k, 2 * k, ih, il, n_bands_)
        re_hi, re_lo = pf._merge(pf._grouped_dots(
            lre_ref[0], rhs_scratch, 2 * k, n_bands_, max_group_))
        im_hi, im_lo = pf._merge(pf._grouped_dots(
            lim_ref[0], rhs_scratch, 2 * k, n_bands_, max_group_))
        re_hi, re_lo, im_hi, im_lo = (
            re_hi * s, re_lo * s, im_hi * s, im_lo * s)
        orh_ref[0] = re_hi
        orl_ref[0] = re_lo
        oih_ref[0] = im_hi
        oil_ref[0] = im_lo
        omax_ref[:] = jnp.max(
            jnp.maximum(jnp.abs(re_hi), jnp.abs(im_hi)),
            axis=0, keepdims=True)

    def _l1_3d(lre, lim, x4, scale):
        """L1 reading the (M, B) layout via a 3D strided BlockSpec:
        x4 enters as the free (128, n2, B) leading-split view."""
        nb3 = b // wt
        n_tiles = n2 * nb3
        lhs_spec = pl.BlockSpec(
            (1,) + lre.shape[1:],
            lambda t: (jax.lax.div(t, np.int32(nb3)), pf._Z0, pf._Z0),
            memory_space=pltpu.VMEM)
        data_spec = pl.BlockSpec(
            (_N1, 1, wt),
            lambda t: (pf._Z0, jax.lax.div(t, np.int32(nb3)),
                       jax.lax.rem(t, np.int32(nb3))),
            memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec(
            (1, _N1, wt),
            lambda t: (jax.lax.div(t, np.int32(nb3)), pf._Z0,
                       jax.lax.rem(t, np.int32(nb3))),
            memory_space=pltpu.VMEM)
        max_spec = pl.BlockSpec(
            (1, wt), lambda t: (pf._Z0, t),
            memory_space=pltpu.VMEM)
        f32 = jnp.float32
        outs = pl.pallas_call(
            ft.partial(_body3d, n_bands, max_group),
            grid=(n_tiles,),
            in_specs=[lhs_spec, lhs_spec] + [data_spec] * 4
            + [max_spec],
            out_specs=(out_spec,) * 4 + (max_spec,),
            out_shape=(
                (jax.ShapeDtypeStruct((n2, _N1, b), f32),) * 4
                + (jax.ShapeDtypeStruct((1, n2 * b), f32),)
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * _N1 * n_bands, wt), jnp.int8)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
            interpret=pf._interpret(),
        )(lre, lim, *x4, scale)
        return outs[:4], outs[4]

    @jax.jit
    def l1_3d(x4, scale, lre, lim):
        x3 = tuple(a.reshape(_N1, n2, b) for a in x4)
        return _l1_3d(lre, lim, x3, scale)

    def bench(tag, fn, *args_):
        def f(o):
            return jax.tree_util.tree_leaves(o)[0]

        out = fn(*args_)
        np.asarray(jnp.sum(f(out)))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args_)
        np.asarray(jnp.sum(f(out)))
        wall = (time.perf_counter() - t0) / reps
        print(f"{tag:12s} {wall * 1e3:8.2f} ms", flush=True)
        return out, wall

    out, _ = bench("fwd_full", fwd_full, pair0, consts["l1_re"],
                   consts["l1_im"], consts["l2_re"], consts["l2_im"])
    del out
    x4 = tuple(a.reshape(m, b) for a in pair0)
    out, _ = bench("fwd_chain", fwd_chain2, x4, consts["l1_re"],
                   consts["l1_im"], consts["l2_re"], consts["l2_im"])
    del out
    (p3, cm3), _ = bench("l1_3d", l1_3d, x4, scale,
                         consts["l1_re"], consts["l1_im"])
    del x4, cm3
    (p1, cm), _ = bench("l1", l1, pair0, scale,
                        consts["l1_re"], consts["l1_im"])
    err = float(jnp.max(jnp.abs(p3[0] - p1[0])))
    print(f"l1_3d vs l1 max diff: {err:.3e}", flush=True)
    del pair0, cm, p3
    s1v, _ = bench("s1_reduce", s1_reduce, p1)
    bench("l2", l2, p1, s1v, consts["l2_re"], consts["l2_im"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=16384)
    ap.add_argument("--b", type=int, default=16384)
    ap.add_argument("--wt", type=int, default=128)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--stages", action="store_true")
    args = ap.parse_args()

    if args.stages:
        time_stages(args.m, args.b, args.wt, args.reps)
        return
    time_level("full", args.m, args.b, args.wt, args.reps)
    time_level("nodots", args.m, args.b, args.wt, args.reps,
               _body_nodots)
    time_level("noslice", args.m, args.b, args.wt, args.reps,
               _body_noslice)


if __name__ == "__main__":
    main()
