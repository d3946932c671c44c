"""Host→device prefetching for batch streams.

The window gather runs on device (grids live in HBM), so the only host→device
traffic per step is the anchor index/label micro-batch — and, with real CXR
JPEGs, the decoded pixel batch. :class:`DevicePrefetcher` overlaps that
transfer (and any host-side decode callback) with device compute: a
background thread keeps ``depth`` batches in flight, already placed on the
mesh with the batch sharding.

Replaces the reference's DataLoader(num_workers=8, pin_memory=True) role
(training_duett/trainer.py:54-60) in the TPU runtime.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

from ..parallel import mesh as meshlib

_END = object()


class DevicePrefetcher:
    """Wrap a host batch iterator; yield device-resident batches.

    Args:
        batches: host iterator of dict-of-arrays.
        mesh: target mesh (leading axis sharded over ``data``).
        depth: number of batches kept in flight.
        host_fn: optional host-side transform run in the worker thread
            (e.g. JPEG decode via the native loader) before device_put.
    """

    def __init__(self, batches: Iterable[dict], mesh, depth: int = 2,
                 host_fn: Optional[Callable[[dict], dict]] = None,
                 stacked: bool = False):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._err: Optional[BaseException] = None

        def worker():
            try:
                for b in batches:
                    if host_fn is not None:
                        b = host_fn(b)
                    self._q.put(meshlib.shard_batch(b, mesh,
                                                    stacked=stacked))
            except BaseException as e:   # surface in the consumer thread
                self._err = e
            finally:
                self._q.put(_END)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator[dict]:
        while True:
            item = self._q.get()
            if item is _END:
                if self._err is not None:
                    raise self._err
                return
            yield item


def prefetch(batches: Iterable[dict], mesh, depth: int = 2,
             host_fn: Optional[Callable[[dict], dict]] = None,
             stacked: bool = False) -> Iterator[dict]:
    """Functional wrapper: ``for batch in prefetch(ds.iter_batches(...), mesh)``."""
    return iter(DevicePrefetcher(batches, mesh, depth, host_fn, stacked))


def stack_host_batches(batches: Iterable[dict], k: int) -> Iterator[dict]:
    """Group a host batch stream into K-stacked megabatches for
    ``engine.scan_steps`` (new leading axis K on every field).

    The final group carries the remainder (< k) — a second, smaller scan
    shape that XLA compiles once. Pick ``k`` dividing steps-per-epoch to
    avoid that extra compile on remote backends."""
    import numpy as np
    buf = []
    for b in batches:
        buf.append(b)
        if len(buf) == k:
            yield {key: np.stack([bb[key] for bb in buf]) for key in buf[0]}
            buf = []
    if buf:
        yield {key: np.stack([bb[key] for bb in buf]) for key in buf[0]}
