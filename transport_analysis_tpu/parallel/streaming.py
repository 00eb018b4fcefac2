"""Atom-chunked streaming with checkpoint/resume.

The reference materializes the whole (frames, particles, d) float64
block in RAM and dies at scale (SURVEY.md §5 "THE scaling wall"). Here
the particle axis streams through the device in chunks: each chunk's
correlation runs on-device while the running particle-sum accumulates,
bounding device memory at O(N·chunk·d) regardless of total atoms.

Each chunk boundary is a natural checkpoint: with ``checkpoint=path``,
partial accumulators land in an .npz after every chunk and an
interrupted run resumes from the last finished chunk — the
checkpoint/resume subsystem the reference lacks (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


def chunked_per_particle(
    kernel: Callable,
    series: np.ndarray,
    chunk_particles: int,
    want_by_particle: bool = True,
    checkpoint: Optional[str] = None,
):
    """Run ``kernel((N, p, d)) → (N, p)`` over particle chunks.

    Returns (timeseries_mean (N,), by_particle (N, P) or None).
    """
    n_frames, n_particles, _ = series.shape
    n_chunks = -(-n_particles // chunk_particles)

    # accumulators are sized from the kernel output (kernels may return
    # fewer rows than n_frames, e.g. with max_lag capping)
    acc = None
    by_particle = None
    start_chunk = 0

    if checkpoint and os.path.exists(checkpoint):
        state = np.load(checkpoint)
        if (
            int(state["n_frames"]) == n_frames
            and int(state["n_particles"]) == n_particles
            and int(state["chunk_particles"]) == chunk_particles
        ):
            start_chunk = int(state["next_chunk"])
            acc = state["acc"]
            if want_by_particle and "by_particle" in state:
                by_particle = state["by_particle"]

    for c in range(start_chunk, n_chunks):
        lo = c * chunk_particles
        hi = min(lo + chunk_particles, n_particles)
        result = np.asarray(kernel(series[:, lo:hi, :]))
        if acc is None:
            acc = np.zeros(result.shape[0], dtype=np.float64)
        if by_particle is None and want_by_particle:
            by_particle = np.zeros((result.shape[0], n_particles))
        acc += result.sum(axis=1)
        if by_particle is not None:
            by_particle[:, lo:hi] = result
        if checkpoint:
            payload = {
                "n_frames": n_frames,
                "n_particles": n_particles,
                "chunk_particles": chunk_particles,
                "next_chunk": c + 1,
                "acc": acc,
            }
            if by_particle is not None:
                payload["by_particle"] = by_particle
            tmp = checkpoint + ".tmp"
            with open(tmp, "wb") as fh:
                np.savez(fh, **payload)
            os.replace(tmp, checkpoint)

    if acc is None:  # zero particles / zero chunks
        acc = np.zeros(n_frames, dtype=np.float64)
    timeseries = acc / max(n_particles, 1)
    return timeseries, by_particle
