"""File-based north-star rehearsal: TRR on disk → C++ decode →
atom-chunk spools → (deep) FFT correlation → VACF timeseries.

This is the REAL end-to-end pipeline (no device-side synthesis):
everything `vacf_out_of_core` does, at the largest slice the local
disk affords, with per-stage walls. Complements benchmarks/
northstar.py, which isolates the device correlation rate from this
box's ~40 MB/s host→device tunnel.

Usage:
  python benchmarks/northstar_spool.py --frames 16384 --atoms 4096
  # disk use ≈ frames × atoms × 12 B (TRR, velocities only is not a
  # TRR option — positions ride along) ≈ 2 × that for spools
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/transport_analysis_tpu_xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import transport_analysis_tpu as ta  # noqa: E402


def write_trajectory(path, n_frames, n_atoms, block=256):
    """Random-walk TRR with velocities, written in frame blocks."""
    from transport_analysis_tpu.io.trr import TRRWriter

    rng = np.random.Generator(np.random.PCG64(7))
    dims = [40.0, 40.0, 40.0, 90.0, 90.0, 90.0]
    pos = rng.uniform(0, 40, (n_atoms, 3)).astype(np.float32)
    with TRRWriter(path, n_atoms=n_atoms) as w:
        for i in range(n_frames):
            vel = rng.normal(0, 10, (n_atoms, 3)).astype(np.float32)
            w.write(positions=pos, velocities=vel, dimensions=dims,
                    time=0.002 * i, step=i)
            pos += vel * np.float32(0.002)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16384)
    ap.add_argument("--atoms", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--keep-dir", default=None,
                    help="reuse/keep the data dir (default: temp)")
    ap.add_argument("--prod-wall", type=float, default=0.51,
                    help="assumed per-chunk DEVICE wall on production"
                         " hardware (s) for the feed-requirement"
                         " analysis; default = the measured v5e"
                         " analysis wall (1.20 s/chunk at N=2^20,"
                         " chunk=85) over the v5p bf16-compute ratio"
                         " 2.33")
    args = ap.parse_args()

    workdir = args.keep_dir or tempfile.mkdtemp(prefix="nsspool_")
    os.makedirs(workdir, exist_ok=True)
    trr = os.path.join(workdir, "traj.trr")

    t0 = time.perf_counter()
    if not os.path.exists(trr):
        write_trajectory(trr, args.frames, args.atoms)
    t_write = time.perf_counter() - t0
    size_gb = os.path.getsize(trr) / 1e9

    # minimal topology: Universe over the TRR alone
    from transport_analysis_tpu.parallel.out_of_core import (
        build_spools, correlate_spools, device_f64,
    )
    from transport_analysis_tpu import ops
    from transport_analysis_tpu.io.trr import TRRReader

    reader = TRRReader(trr)
    frames = np.arange(args.frames)
    spool_dir = os.path.join(workdir, "spools")

    t0 = time.perf_counter()
    paths = build_spools(
        reader, frames, np.arange(args.atoms), [0, 1, 2], spool_dir,
        args.chunk, field="velocities",
    )
    t_spool = time.perf_counter() - t0

    def kernel(block):
        # f32 ships (half the feed bytes), upcast on device;
        # particle-sum ON DEVICE so the readback is (L,) ~2 MB, not
        # the (L, chunk) ~2 GB per-atom curves (which serialized the
        # round-3 first run at 133 s/chunk on this box's tunnel)
        return ops.acf_fft(device_f64(block)).sum(axis=1)

    t0 = time.perf_counter()
    stats = {}
    ts = correlate_spools(kernel, paths, args.atoms, stats=stats)
    t_corr = time.perf_counter() - t0

    # oracle on a small sub-block
    ref_block = np.load(paths[0], mmap_mode="r")[:, :16]
    ref = ops.acf.acf_fft_numpy(
        np.asarray(ref_block, np.float64)).mean(axis=1)
    got = np.asarray(
        ops.acf_fft(np.asarray(ref_block, np.float64))).mean(axis=1)
    rel = float(np.max(np.abs(got - ref)) / np.abs(ref).max())

    # Production feed requirement (VERDICT r4 #5): the measured
    # overlap below rides tunnel-inflated device walls (35-58 s per
    # chunk on this rig vs ~0.5-1.2 s in production), so "overlap =
    # 1.0 measured" must NOT be read as "feed solved". The binding
    # number is: bytes per chunk over the PRODUCTION chunk wall.
    spool_b = float(np.mean([os.path.getsize(p) for p in paths]))
    req_chip = spool_b / args.prod_wall
    reads = stats.get("read_s", [])
    meas_rate = (spool_b * len(reads[1:]) / sum(reads[1:])
                 if len(reads) >= 2 and sum(reads[1:]) > 0 else None)
    production_feed = {
        "assumed_prod_chunk_wall_s": args.prod_wall,
        "spool_bytes_per_chunk": spool_b,
        "required_feed_gbs_per_chip": round(req_chip / 1e9, 2),
        # v5p-8 topology: 2 CPU hosts x 4 chips
        "required_feed_gbs_per_host_v5p8": round(
            4 * req_chip / 1e9, 2),
        "measured_disk_read_gbs": (round(meas_rate / 1e9, 3)
                                   if meas_rate else None),
        "feed_margin": (round(meas_rate / req_chip, 3)
                        if meas_rate else None),
        "note": (
            "overlap=1.0 below is measured under tunnel-inflated "
            "device walls; production starves unless storage sustains"
            " required_feed_gbs_per_host (feed_margin >= chips/host)"
        ),
    }

    lags = args.frames * (args.frames + 1) // 2 * args.atoms
    print(json.dumps({
        "metric": (
            f"spool pipeline VACF (N={args.frames}, P={args.atoms}, "
            f"chunk={args.chunk}, f64, file={size_gb:.2f} GB)"),
        "value": lags / t_corr, "unit": "atom-frame-lags/s",
        "stages_s": {
            "write_fixture": round(t_write, 1),
            "decode_to_spools": round(t_spool, 1),
            "correlate": round(t_corr, 1),
        },
        "decode_mb_s": round(size_gb * 1e3 / t_spool, 1),
        "chunk_vacf_rel_err_vs_host": rel,
        "timeseries_lag0": float(ts[0]),
        "production_feed": production_feed,
        # real-pipeline prefetch overlap (VERDICT r3 #4): per-chunk
        # disk-read walls vs consumer stalls. The first chunk's read
        # cannot hide (nothing computes yet); steady-state overlap =
        # 1 - stall/read over the remaining chunks.
        "prefetch": {
            "read_s": [round(v, 2) for v in stats.get("read_s", [])],
            "stall_s": [round(v, 2) for v in stats.get("stall_s", [])],
            "kernel_s": [round(v, 2) for v in stats.get("kernel_s", [])],
            # null when there is no steady state to speak of (prefetch
            # off, or a single-chunk run) — sum([])/eps would otherwise
            # report a fictitious perfect 1.0 (round-4 advisor finding)
            "steady_overlap_frac": (
                round(
                    1.0 - sum(stats["stall_s"][1:])
                    / max(sum(stats["read_s"][1:]), 1e-9), 3)
                if len(stats.get("read_s", [])) >= 2
                and len(stats.get("stall_s", [])) >= 2 else None),
        },
    }))
    if not args.keep_dir:
        shutil.rmtree(workdir)


if __name__ == "__main__":
    main()
