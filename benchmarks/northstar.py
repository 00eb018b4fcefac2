"""North-star-shaped demo: 100k atoms × 32k frames, VACF + Helfand,
streamed through one chip (BASELINE.json north star is 100k × 1M on a
v5p-8; this is the largest single-(tunneled-)chip slice of that shape).

Two feed modes, because this box's host→device tunnel moves only
~40 MB/s (measured; a real TPU host feeds at PCIe/DMA rates):

--feed device (default): each atom chunk is synthesized ON DEVICE
  (jax PRNG + cumsum inside the jitted step, keyed per chunk) so the
  pipeline measures the sustained correlation rate the chip delivers
  when the feed keeps up — the number a real host's decode+DMA path
  (io/_native C++ TRR decode, ~GB/s) would sustain.

--feed host: chunks are generated on the host and shipped with
  device_put, the shape of the real file-streaming path. On this
  tunnel it is honestly feed-bound (~25× slower than the chip).

Per chunk (1024 atoms × all frames): f64 VACF (FFT autocorrelation)
+ Helfand lag-difference curve, both particle-summed ON DEVICE →
two (frames,) readbacks (~0.5 MB) which also fence the chunk, so the
walls are honest (BENCH_NOTES.md "Measurement integrity").
Accumulators live on host; device memory stays bounded by the chunk
size whatever the total atom count. Effective atom-frame-lags/s uses
the reference's windowed work units: 2 analyses × N(N+1)/2 lags × P.

Usage:
  python benchmarks/northstar.py                      # 100352 × 32768
  python benchmarks/northstar.py --feed host --atoms 16384 --frames 8192
"""

import argparse
import json
import os
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/transport_analysis_tpu_xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import transport_analysis_tpu  # noqa: E402,F401
from transport_analysis_tpu import ops  # noqa: E402
from transport_analysis_tpu.ops.acf import (  # noqa: E402
    acf_fft_numpy, next_pow_2,
)
from transport_analysis_tpu.utils.units import constants  # noqa: E402

KB = constants["Boltzmann_constant"]
TEMP = 300.0
VOL = 8000.0


def _analyze(vel, pos, masses):
    """Per-chunk VACF + Helfand sums.

    Called EAGERLY (each op is internally jitted): wrapping this in an
    outer jit would embed the Pallas engine's banded level matrices as
    program literals — ~350 MB at the n2 = 512 shape this demo uses —
    which this box's tunneled remote-compile rejects (HTTP 413) and
    any backend would recompile per shape. Eager composition keeps the
    constants as runtime arguments; the few extra dispatches are noise
    against a multi-hundred-ms chunk.
    """
    vacf_sum = ops.acf_fft(vel).sum(axis=1)  # (N,)
    accum = masses[None, :, None] * vel * pos
    # N=2^20 chunks brush the 16 GB HBM ceiling: drop the velocity/
    # position blocks before the Einstein pass (callers pass
    # temporaries, so these dels release the buffers), and hand accum
    # over as this frame's only live (N, chunk, 3) array
    del vel, pos
    helf_sum = ops.einstein_difference_fft(accum, "mean").sum(axis=1)
    return vacf_sum, helf_sum


def _host_chunk(n_frames, chunk, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    vel = rng.standard_normal(
        (n_frames, chunk, 3), dtype=np.float32
    ) * np.float32(5.0)
    pos = (
        np.cumsum(vel, axis=0, dtype=np.float32) * np.float32(0.002)
        + rng.uniform(0, 20, (1, chunk, 3)).astype(np.float32)
    )
    masses = rng.uniform(1, 16, chunk)
    return vel, pos, masses


def _device_kernel(n_frames, chunk, f32_source=False):
    """Two passes per chunk, each synthesizing its own input so only
    ONE (N, chunk, 3) source array is live alongside the FFT stages
    (synthesis is ~free on device; holding vel+pos across the VACF
    would cost a second N*chunk*24 B against the HBM peak — the
    difference between chunk=16 and chunk=64 fitting at N=2^20).

    ``f32_source`` mirrors the PRODUCTION spool feed: trajectory
    samples (and the spooled m·v·x accumulator) are float32 on disk,
    so the chunk enters as f32 and the f64-GRADE *_from_f32 entries
    run — same band profile, no upcast pass, half the source HBM."""

    @jax.jit
    def synth_vel(key):
        kv = jax.random.split(key, 3)[0]
        vel32 = 5.0 * jax.random.normal(
            kv, (n_frames, chunk, 3), jnp.float32
        )
        return vel32 if f32_source else vel32.astype(jnp.float64)

    @jax.jit
    def synth_accum(key):
        kv, kp, km = jax.random.split(key, 3)
        vel32 = 5.0 * jax.random.normal(
            kv, (n_frames, chunk, 3), jnp.float32
        )
        pos32 = (
            jnp.cumsum(vel32, axis=0) * jnp.float32(0.002)
            + jax.random.uniform(
                kp, (1, chunk, 3), jnp.float32, 0.0, 20.0
            )
        )
        masses = jax.random.uniform(km, (chunk,), jnp.float64, 1.0, 16.0)
        accum = (masses[:, None] * vel32.astype(jnp.float64)
                 * pos32.astype(jnp.float64))
        # the spool writer quantizes the derived accumulator to f32
        # (parallel/out_of_core.build_spools) — mirror that
        return accum.astype(jnp.float32) if f32_source else accum

    def vacf_of(block):
        if f32_source:
            return ops.acf_fft_from_f32(block)
        return ops.acf_fft(block)

    def helfand_of(block):
        if f32_source:
            return ops.einstein_difference_fft_from_f32(block, "mean")
        return ops.einstein_difference_fft(block, "mean")

    def step(key):
        # hand each synthesized block over WITHOUT keeping a local
        # (box.pop()): ops.acf_fft / einstein_difference_fft propagate
        # the consume discipline, so the (N, chunk, 3) f64 source is
        # freed before the deep chain's multi-GB stages run — a held
        # source adds its full size onto the chain's HBM peak
        box = [synth_vel(key)]
        # readback fences pass 1 so its buffers are truly free before
        # pass 2 enqueues (see _analyze: no outer jit)
        vs = np.asarray(vacf_of(box.pop()).sum(axis=1))
        box = [synth_accum(key)]
        hs = np.asarray(helfand_of(box.pop()).sum(axis=1))
        return vs, hs

    step.synth_vel = synth_vel
    step.synth_accum = synth_accum
    step.vacf_of = vacf_of
    step.helfand_of = helfand_of
    return step


def _host_kernel():
    def step(vel32, pos32, masses):
        vel = jnp.asarray(vel32).astype(jnp.float64)
        pos = jnp.asarray(pos32).astype(jnp.float64)
        return _analyze(vel, pos, jnp.asarray(masses))

    return step


def auto_chunk(n_frames: int, hbm_budget_gb: float | None = None) -> int:
    """Pad-filling HBM-fitting atom chunk — now provided by the
    package (ops.acf.auto_atom_chunk); kept as a thin alias for the
    CLI contract and older scripts. The budget default follows the
    package's per-branch calibration (the old 13.5 GB override
    admitted chunk=107 at N=2^20, which OOMs — 18.0 GB program)."""
    from transport_analysis_tpu.ops.acf import auto_atom_chunk

    return auto_atom_chunk(n_frames, d=3, hbm_budget_gb=hbm_budget_gb)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32768)
    ap.add_argument("--atoms", type=int, default=100352)
    ap.add_argument("--chunk", type=int, default=0,
                    help="atoms per device chunk (0 = auto from HBM)")
    ap.add_argument("--feed", choices=("device", "host"), default="device")
    ap.add_argument("--check", action="store_true",
                    help="verify one chunk against the host f64 oracle")
    ap.add_argument("--stages", action="store_true",
                    help="fenced per-stage breakdown of one chunk")
    ap.add_argument("--substages", action="store_true",
                    help="fenced breakdown of the Helfand leg's "
                         "extras over the VACF leg (center+sq, "
                         "correlation, Kneller assembly)")
    ap.add_argument("--precision", default="exact",
                    help="ops.fft_precision profile for the banded "
                         "engine (exact/high/medium/fast); the north "
                         "star's 1e-8 contract admits 'medium'")
    ap.add_argument("--f32-source", action="store_true",
                    help="feed the chunks as float32 (the production "
                         "spool format) through the f64-grade "
                         "*_from_f32 entries — same band profile, no "
                         "upcast pass, half the source HBM")
    args = ap.parse_args()

    n_frames = args.frames
    chunk = args.chunk or auto_chunk(n_frames)
    precision_ctx = ops.fft_precision(args.precision)
    n_chunks = -(-args.atoms // chunk)
    n_atoms = n_chunks * chunk  # keep chunks uniform

    vacf_acc = np.zeros(n_frames, np.float64)
    helf_acc = np.zeros(n_frames, np.float64)
    precision_ctx.__enter__()  # module-scope: whole run at this grade

    if args.stages:
        # fenced per-stage walls of ONE chunk, two-pass layout
        # (synth_vel / VACF / synth_accum / Helfand) — warm once, then
        # time a second chunk so compile cost is excluded
        kernels = _device_kernel(n_frames, chunk,
                                 f32_source=args.f32_source)
        key = jax.random.PRNGKey(0)
        kernels(jax.random.fold_in(key, 10**6))  # warm (fenced internally)

        synth_vel = kernels.synth_vel
        synth_accum = kernels.synth_accum
        k = jax.random.fold_in(key, 1)
        dev = jax.local_devices()[0]

        def _peak_gb():
            stats = getattr(dev, "memory_stats", lambda: None)() or {}
            return round(stats.get("peak_bytes_in_use", 0) / 1e9, 2)

        stages, hbm_peaks = {}, {}
        t0 = time.perf_counter()
        box = [synth_vel(k)]
        # fence via a cheap reduction: slicing [-1, -1] would compile a
        # dynamic-slice copy whose (8,128) tiling pads the minor dim
        # 3 -> 128 lanes (34 GB for a 0.8 GB array)
        np.asarray(jnp.sum(box[0]))
        stages["synth_vel"] = time.perf_counter() - t0
        hbm_peaks["synth_vel"] = _peak_gb()
        t0 = time.perf_counter()
        # consume the source exactly like the production step — a
        # held (N, chunk, 3) f64 source adds onto the deep chain's
        # peak and OOMs the largest rungs
        np.asarray(kernels.vacf_of(box.pop()).sum(axis=1)[-1])
        stages["vacf_fft"] = time.perf_counter() - t0
        hbm_peaks["vacf_fft"] = _peak_gb()
        t0 = time.perf_counter()
        box = [synth_accum(k)]
        np.asarray(jnp.sum(box[0]))  # reduction fence (see synth_vel)
        stages["synth_accum"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(
            kernels.helfand_of(box.pop()).sum(axis=1)[-1]
        )
        stages["helfand_fft"] = time.perf_counter() - t0
        hbm_peaks["helfand_fft"] = _peak_gb()
        print(json.dumps({
            "metric": (
                f"north-star chunk stages (N={n_frames}, "
                f"chunk={chunk}, "
                f"{'f32-source' if args.f32_source else 'f64'})"),
            "stages_s": {k: round(v, 2) for k, v in stages.items()},
            "chunk_wall_s": round(sum(stages.values()), 2),
            "hbm_peak_gb": hbm_peaks,
        }))
        return

    if args.substages:
        # Where does helfand_fft's ~0.2 s over vacf_fft live? Fence
        # each extra separately: center+sq, the shared deep-chain
        # correlation, and the Kneller/Calandrini assembly (prefix
        # sums + head/tail windows). Warm first, time second.
        from transport_analysis_tpu.ops import einstein as ein

        kernels = _device_kernel(n_frames, chunk)
        synth_accum = kernels.synth_accum
        key = jax.random.PRNGKey(0)

        def one(k):
            walls = {}
            box = [synth_accum(k)]
            np.asarray(jnp.sum(box[0]))
            t0 = time.perf_counter()
            a, sq = ein._center_and_sq(box.pop())
            np.asarray(sq[-1, -1])
            walls["center_and_sq"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            box = [a]
            del a
            corr = ops.acf.raw_autocorr_sumlast(box.pop())
            np.asarray(corr[-1, -1])
            walls["raw_autocorr"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = ein._einstein_fft_impl(sq, "mean", 3, corr)
            np.asarray(out[-1, -1])
            walls["kneller_assembly"] = time.perf_counter() - t0
            return walls

        one(jax.random.fold_in(key, 10**6))  # warm
        walls = one(jax.random.fold_in(key, 1))
        print(json.dumps({
            "metric": (
                f"helfand substages (N={n_frames}, chunk={chunk}, "
                f"f64)"),
            "stages_s": {k: round(v, 3) for k, v in walls.items()},
        }))
        return

    if args.feed == "device":
        step = _device_kernel(n_frames, chunk)
        key = jax.random.PRNGKey(0)
        warm = step(jax.random.fold_in(key, 10**6))
        np.asarray(warm[0])
        t0 = time.perf_counter()
        for c in range(n_chunks):
            vs, hs = step(jax.random.fold_in(key, c))
            vacf_acc += np.asarray(vs)  # readback fences the chunk
            helf_acc += np.asarray(hs)
        wall = time.perf_counter() - t0
    else:
        step = _host_kernel()
        q = queue.Queue(maxsize=2)

        def produce():
            for c in range(n_chunks):
                q.put((c,) + _host_chunk(n_frames, chunk, 1000 + c))
            q.put(None)

        threading.Thread(target=produce, daemon=True).start()
        vel, pos, masses = _host_chunk(n_frames, chunk, 999)
        warm = step(
            jnp.asarray(vel), jnp.asarray(pos), jnp.asarray(masses)
        )
        np.asarray(warm[0])
        t0 = time.perf_counter()
        while True:
            item = q.get()
            if item is None:
                break
            _, vel, pos, masses = item
            vs, hs = step(
                jax.device_put(vel), jax.device_put(pos),
                jax.device_put(masses),
            )
            vacf_acc += np.asarray(vs)
            helf_acc += np.asarray(hs)
        wall = time.perf_counter() - t0

    vacf_ts = vacf_acc / n_atoms
    helf_ts = helf_acc / n_atoms / (2.0 * KB * VOL * TEMP)
    times = np.arange(n_frames) * 0.002
    trapezoid = getattr(np, "trapezoid", None) or np.trapz  # numpy<2
    gk_d = trapezoid(vacf_ts, times) / 3.0
    w = slice(n_frames // 8, n_frames // 2)
    slope = np.polyfit(np.arange(n_frames)[w], helf_ts[w], 1)[0]

    lags = 2 * (n_frames * (n_frames + 1) // 2) * n_atoms
    result = {
        "metric": (
            f"north-star slice VACF+Helfand (N={n_frames}, P={n_atoms}, "
            f"chunk={chunk}, f64, feed={args.feed})"
        ),
        "value": lags / wall,
        "unit": "atom-frame-lags/s",
        "wall_s": round(wall, 1),
        "chunk": chunk,
        "n_chunks": n_chunks,
        "gk_diffusivity": float(gk_d),
        "helfand_slope": float(slope),
    }
    if args.precision != "exact":
        result["fft_precision"] = args.precision

    if args.check:
        vel, pos, masses = _host_chunk(n_frames, chunk, 1000)
        sub = slice(0, 64)
        ref = acf_fft_numpy(vel[:, sub].astype(np.float64)).sum(axis=1)
        got = np.asarray(
            ops.acf_fft(jnp.asarray(vel[:, sub].astype(np.float64)))
        ).sum(axis=1)
        result["hostchunk_vacf_rel_err"] = float(
            np.max(np.abs(got - ref)) / np.abs(ref).max()
        )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
