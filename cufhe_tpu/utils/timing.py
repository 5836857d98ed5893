"""Benchmark/profiling helpers (the cudaEvent timing harness analogue,
test/test_util.h:30-72)."""
from __future__ import annotations

import time
from contextlib import contextmanager

import jax


def block(tree):
    """Wait for all device computation feeding `tree` (event-sync analogue)."""
    return jax.block_until_ready(tree)


def time_fn(fn, *args, iters: int = 5, warmup: int = 1):
    """Median wall-clock seconds per call of fn(*args), device-synced."""
    for _ in range(warmup):
        block(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        block(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


@contextmanager
def trace(path: str):
    """jax.profiler trace context for deep perf work."""
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
