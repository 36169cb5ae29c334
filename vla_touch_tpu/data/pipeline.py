"""Host-side prefetch pipeline feeding the device.

The reference overlaps IO with compute via DataLoader worker processes and a
producer/consumer buffer (SURVEY §2.7 process-level parallelism).  Here a
thread pool builds batches ahead of the training loop while jax's async
dispatch overlaps the host→device transfer with the previous step's compute:

    loader = PrefetchLoader(lambda: build_batch(...), depth=2, workers=2)
    for batch in loader:         # batches arrive pre-built
        state, metrics = step_fn(state, key, batch)

Threads (not processes) suffice: batch assembly is numpy/cv2/h5py work that
releases the GIL, and the native episode cache decodes JPEG without the GIL
entirely.
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Callable, Iterable, Optional


class PrefetchLoader:
    """Run ``make_batch()`` in background threads, yielding results.

    ``depth``: max batches queued ahead; ``workers``: builder threads;
    ``num_batches``: stop after N (None = infinite).
    """

    def __init__(self, make_batch: Callable[[], dict], depth: int = 2,
                 workers: int = 1, num_batches: Optional[int] = None):
        self.make_batch = make_batch
        self.num_batches = num_batches
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._produced = 0
        self._consumed = 0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(workers)
        ]
        for t in self._threads:
            t.start()

    def _claim(self) -> bool:
        with self._lock:
            if (self.num_batches is not None
                    and self._produced >= self.num_batches):
                return False
            self._produced += 1
            return True

    _SENTINEL = object()

    def _worker(self):
        while not self._stop.is_set():
            if not self._claim():
                return
            try:
                batch = self.make_batch()
            except BaseException as e:  # surface in the consumer
                with self._lock:
                    if self._error is None:  # first error wins
                        self._error = e
                self._stop.set()
                # Unblock the consumer even if the queue is full: drop one
                # pending batch if necessary.
                try:
                    self._q.put_nowait(self._SENTINEL)
                except queue.Full:
                    try:
                        self._q.get_nowait()
                    except queue.Empty:
                        pass
                    try:
                        self._q.put_nowait(self._SENTINEL)
                    except queue.Full:
                        pass
                return
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        if (self.num_batches is not None
                and self._consumed >= self.num_batches):
            raise StopIteration
        while True:
            if self._error is not None:
                self.close()
                raise self._error
            try:
                item = self._q.get(timeout=0.5)
            except queue.Empty:
                # Either workers are slow or the loader died; re-check error.
                if self._stop.is_set() and self._error is None:
                    raise StopIteration
                continue
            if item is self._SENTINEL:
                continue  # loop re-checks _error and raises
            self._consumed += 1
            return item

    def close(self):
        self._stop.set()
        # Drain so workers blocked on put() can exit.
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class OrderedPrefetcher:
    """Map ``fn`` over ``tasks`` with a thread pool, yielding results IN
    TASK ORDER with a bounded number in flight.

    Unlike :class:`PrefetchLoader` (free-running builders, arrival order),
    this is the drop-in for epoch-style loops whose batch sequence must be
    deterministic (``ControllerDataset.batches(workers=N)``): identical
    output to the serial path, with assembly overlapped.  ``depth`` extra
    tasks are kept in flight beyond the worker count."""

    def __init__(self, fn: Callable, tasks: Iterable, workers: int = 2,
                 depth: int = 2):
        from concurrent.futures import ThreadPoolExecutor

        self._fn = fn
        self._tasks = iter(tasks)
        self._inflight = max(1, workers) + max(0, depth)
        self._pool = ThreadPoolExecutor(max_workers=max(1, workers))
        self._futures: collections.deque = collections.deque()

    def _fill(self):
        while len(self._futures) < self._inflight:
            try:
                t = next(self._tasks)
            except StopIteration:
                return
            self._futures.append(self._pool.submit(self._fn, t))

    def __iter__(self):
        return self

    def __next__(self):
        self._fill()
        if not self._futures:
            raise StopIteration
        out = self._futures.popleft().result()  # re-raises builder errors
        self._fill()
        return out

    def close(self):
        for f in self._futures:
            f.cancel()
        self._futures.clear()
        self._pool.shutdown(wait=False)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
