"""Profiling & timing harness.

SURVEY.md §5.1: the reference has no profiler; the TPU build provides
`jax.profiler` trace capture plus a dispatch-honest timing helper (the
axon tunnel reports `block_until_ready` early — force a host transfer).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the trace timeline (use around solver steps)."""
    return jax.profiler.TraceAnnotation(name)


def sync(tree):
    """Dispatch-honest synchronisation: host-transfer one element per leaf.

    `jax.block_until_ready` can return early through the axon TPU tunnel;
    fetching bytes cannot."""
    for leaf in jax.tree_util.tree_leaves(tree):
        jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)
    return tree


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 10):
    """Median wall time of ``fn(*args)`` with honest synchronisation."""
    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
