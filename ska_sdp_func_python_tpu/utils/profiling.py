"""Lightweight tracing/metrics (SURVEY.md §5.1).

The reference logs ad-hoc ``time.time()`` deltas inside the cleaners
(cleaners.py:121-131 "ms per minor cycle"); this module provides the
framework-wide equivalent: stage timers that synchronise the device, a
metrics registry, and a hook into ``jax.profiler`` for deep traces.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

import jax

log = logging.getLogger("ska-sdp-func-python-tpu")

__all__ = ["timer", "metrics", "reset_metrics", "profile_trace"]

_METRICS: dict = defaultdict(list)


@contextlib.contextmanager
def timer(name: str, sync: bool = True, items: int | None = None):
    """Time a stage; with ``items`` also records a rate (items/s).

    ``sync`` inserts a device barrier before/after so the wall time covers
    the actual device work, not just dispatch.
    """
    if sync:
        (jax.device_put(0.0) + 0).block_until_ready()
    t0 = time.perf_counter()
    yield
    if sync:
        (jax.device_put(0.0) + 0).block_until_ready()
    dt = time.perf_counter() - t0
    _METRICS[name].append(dt)
    if items is not None and dt > 0:
        _METRICS[f"{name}.rate"].append(items / dt)
        log.info(
            "%s: %.3f s (%.1f items/s)", name, dt, items / dt
        )
    else:
        log.info("%s: %.3f s", name, dt)


def metrics() -> dict:
    """Snapshot of accumulated stage timings/rates."""
    return {
        k: {
            "count": len(v),
            "total": sum(v),
            "mean": sum(v) / len(v),
            "last": v[-1],
        }
        for k, v in _METRICS.items()
        if v
    }


def reset_metrics():
    _METRICS.clear()


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Wrap a block in a jax.profiler trace (view with tensorboard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
