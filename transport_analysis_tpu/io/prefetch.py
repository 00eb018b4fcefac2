"""Async host-side prefetch: decode trajectory blocks on a background
thread while the device computes.

The reference's per-frame loop serializes decode and compute; here a
producer thread runs ``read_frames_batch`` for upcoming frame blocks
(C++ decode path for TRR) and hands finished batches through a bounded
queue, so host decode overlaps device compute — the prefetch pipeline
SURVEY.md §2c calls for.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Sequence

import numpy as np


def iter_frame_blocks(frames: Sequence[int], block_size: int):
    """Split a frame-index selection into contiguous blocks."""
    frames = np.asarray(frames)
    for lo in range(0, len(frames), block_size):
        yield frames[lo:lo + block_size]


class BatchPrefetcher:
    """Iterate decoded frame batches with background prefetch.

    Parameters
    ----------
    reader : ProtoReader
    blocks : iterable of frame-index arrays
    depth : queue depth (decoded blocks buffered ahead), default 2.

    Iteration yields the dicts ``read_frames_batch`` returns. Exceptions
    in the producer propagate to the consumer.
    """

    _SENTINEL = object()

    def __init__(self, reader, blocks: Iterable, depth: int = 2):
        self._reader = reader
        self._blocks = list(blocks)
        self._queue: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._error = None
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._started = False

    def _produce(self):
        try:
            for block in self._blocks:
                self._queue.put(self._reader.read_frames_batch(block))
        except BaseException as err:  # propagate to consumer
            self._error = err
        finally:
            self._queue.put(self._SENTINEL)

    def __len__(self):
        return len(self._blocks)

    def __iter__(self) -> Iterator[dict]:
        if not self._started:
            self._thread.start()
            self._started = True
        while True:
            item = self._queue.get()
            if item is self._SENTINEL:
                if self._error is not None:
                    raise self._error
                return
            yield item


def prefetch_batches(reader, frames, block_size: int = 4096,
                     depth: int = 2) -> BatchPrefetcher:
    """Convenience constructor: prefetching iterator over frame blocks."""
    return BatchPrefetcher(
        reader, iter_frame_blocks(frames, block_size), depth=depth
    )
