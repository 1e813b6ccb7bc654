"""Profiling hooks (SURVEY §5: the reference has wall-clock timing only).

- `trace(logdir)`: context manager around jax.profiler.trace — produces a
  TensorBoard-compatible device trace (op-level TPU timeline).
- `device_timer`: precise wall time of a jitted callable with
  block_until_ready fencing, warmup, and repeats.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_timer(fn: Callable, *args, warmup: int = 1, repeats: int = 5, **kwargs):
    """Returns (seconds_per_call, last_output)."""
    out = None
    for _ in range(max(warmup, 0)):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats, out
