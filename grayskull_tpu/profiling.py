"""Profiling and timing utilities.

The reference has no perf tooling at all (SURVEY.md §5); this provides the
TPU-native equivalents:

* :func:`trace` — context manager around ``jax.profiler`` emitting a TensorBoard
  trace directory;
* :func:`timeit` — steady-state wall-clock timing with *forced host readback*
  synchronization (``block_until_ready`` is unreliable on tunneled/async TPU
  platforms, so a one-element device->host copy is used as the fence);
* :func:`throughput` — frames/sec helper used by bench.py and the examples.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np

__all__ = ["trace", "timeit", "throughput", "sync"]


def sync(tree) -> None:
    """Block until every array in ``tree`` is computed (host-readback fence)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[0:1])


@contextlib.contextmanager
def trace(logdir: str):
    """``with trace("/tmp/tb"): ...`` — capture a jax.profiler trace."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn, *args, iters: int = 10, warmup: int = 2, **kwargs) -> float:
    """Mean seconds per call of ``fn(*args)`` at steady state."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    sync(out)
    return (time.perf_counter() - t0) / iters


def throughput(fn, batch, iters: int = 10, warmup: int = 2) -> dict:
    """Frames/sec and pixel rate of a batched pipeline call."""
    dt = timeit(fn, batch, iters=iters, warmup=warmup)
    n = batch.shape[0]
    pixels = int(np.prod(batch.shape))
    return {
        "sec_per_batch": dt,
        "frames_per_sec": n / dt,
        "gpix_per_sec": pixels / dt / 1e9,
    }
