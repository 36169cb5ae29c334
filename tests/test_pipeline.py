"""Prefetch loader: ordering-free delivery, bounded depth, error surfacing."""

import threading
import time

import numpy as np
import pytest

from vla_touch_tpu.data.pipeline import PrefetchLoader


def test_delivers_exactly_n_batches():
    counter = {"n": 0}
    lock = threading.Lock()

    def make():
        with lock:
            counter["n"] += 1
            i = counter["n"]
        return {"x": np.full(4, i)}

    with PrefetchLoader(make, depth=2, workers=2, num_batches=7) as loader:
        got = [b["x"][0] for b in loader]
    assert len(got) == 7
    assert sorted(got) == list(range(1, 8))


def test_overlaps_production_with_consumption():
    def make():
        time.sleep(0.05)
        return {"x": np.zeros(1)}

    # Best of 3 runs: on a loaded 1-core CI host a single run can lose
    # ~0.3s to scheduler noise and read as serial; the overlap property
    # only needs to show up once.
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        with PrefetchLoader(make, depth=4, workers=4, num_batches=8) as loader:
            for b in loader:
                time.sleep(0.05)  # "compute"
        elapsed = min(elapsed, time.perf_counter() - t0)
        if elapsed < 0.7:
            break
    # Serial would be 8*(0.05+0.05)=0.8s; overlapped ~0.45s.
    assert elapsed < 0.7, elapsed


def test_error_propagates():
    def make():
        raise ValueError("boom")

    with PrefetchLoader(make, depth=1, workers=1, num_batches=3) as loader:
        with pytest.raises(ValueError, match="boom"):
            next(iter(loader))
