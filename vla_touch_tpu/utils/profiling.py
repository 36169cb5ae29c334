"""Profiling and per-stage latency metrics.

The reference instruments hot paths with ad-hoc ``time.time()`` prints
("double dino time", "bridger_time" — ``bridge_controller.py:105-109,
178-181``; SURVEY.md §5).  Here per-stage latency is a first-class metric:

- :func:`stage` — a context manager that records wall-clock spans into a
  process-wide registry (and blocks on a jax array when given one, so the
  span covers device execution, not just dispatch);
- :func:`stage_stats` / :func:`reset_stages` — p50/p95/mean per stage;
- :func:`trace` — wraps ``jax.profiler.trace`` to dump an xprof trace
  directory for TensorBoard;
- ``jax.named_scope`` is used directly inside the models for HLO-level
  attribution.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
import numpy as np

_SPANS: dict = defaultdict(list)


@contextlib.contextmanager
def stage(name: str, block_on=None):
    """Record one span.  ``block_on``: optional jax array (or pytree leaf
    list) fetched at exit so device work is included in the span."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if block_on is not None:
            import jax

            jax.block_until_ready(block_on)
        _SPANS[name].append(time.perf_counter() - t0)


def record(name: str, seconds: float) -> None:
    _SPANS[name].append(seconds)


def stage_stats(reset: bool = False) -> dict:
    out = {}
    for name, vals in _SPANS.items():
        a = np.asarray(vals)
        out[name] = {
            "count": int(a.size),
            "mean_ms": float(a.mean() * 1e3),
            "p50_ms": float(np.percentile(a, 50) * 1e3),
            "p95_ms": float(np.percentile(a, 95) * 1e3),
        }
    if reset:
        reset_stages()
    return out


def reset_stages() -> None:
    _SPANS.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """xprof trace for TensorBoard (``jax.profiler.trace``)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
