"""Profiling & throughput observability.

The reference has no tracing/metrics at all (SURVEY.md §5). Here every
analysis records a stage-timing breakdown (``analysis.timing``) with
derived throughput counters, and ``trace()`` wraps ``jax.profiler`` for
full XLA traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class StageTimer:
    """Wall-clock stage timer with throughput derivation.

    Usage::

        t = StageTimer()
        with t.stage("io"): ...
        with t.stage("compute"): ...
        t.counters(n_frames=N, n_particles=P)
        t.as_dict()  # {'io': ..., 'compute': ..., 'total': ...,
                     #  'frames_per_s': ..., 'atom_frame_lags_per_s': ...}
    """

    def __init__(self):
        self._stages: dict[str, float] = {}
        self._t0 = time.perf_counter()
        self._meta: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            self._stages[name] = (
                self._stages.get(name, 0.0) + time.perf_counter() - start
            )

    def counters(self, n_frames: int = 0, n_particles: int = 0):
        self._meta["n_frames"] = n_frames
        self._meta["n_particles"] = n_particles

    def as_dict(self) -> dict:
        total = time.perf_counter() - self._t0
        out = dict(self._stages)
        out["total"] = total
        n = self._meta.get("n_frames", 0)
        p = self._meta.get("n_particles", 0)
        if n and total > 0:
            out["frames_per_s"] = n / total
            # effective windowed-lag work units (see bench.py)
            out["atom_frame_lags_per_s"] = (
                (n * (n + 1) // 2) * max(p, 1) / total
            )
        return out


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace context (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(str(log_dir)):
        yield
