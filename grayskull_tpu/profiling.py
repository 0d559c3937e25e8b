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

__all__ = ["trace", "timeit", "throughput", "sync", "hbm_bandwidth_gbps"]


def hbm_bandwidth_gbps(mbytes: int = 256, iters: int = 20) -> dict:
    """Measured achievable HBM bandwidth (GB/s) via Pallas copy and triad
    kernels — the honest roofline denominator (the v5e spec sheet says
    819 GB/s; the tunneled sandbox chip sustains ~290/360, VERDICT r2 #1).

    Returns ``{"copy_gbps": ..., "triad_gbps": ...}`` on TPU, ``{}`` elsewhere.
    """
    from .core import on_tpu

    if not on_tpu():
        return {}
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = 512, 1024
    n = mbytes * 1024 * 1024 // (h * w)
    x = jnp.zeros((n, h, w), jnp.uint8) + jnp.uint8(1)

    def copy_kernel(x_ref, o_ref):
        o_ref[0] = x_ref[0]

    def triad_kernel(x_ref, y_ref, o_ref):
        o_ref[0] = (x_ref[0].astype(jnp.int32) + y_ref[0].astype(jnp.int32)).astype(
            jnp.uint8)

    spec = pl.BlockSpec((1, 256, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n, h, w), jnp.uint8)

    @jax.jit
    def copy(a):
        return pl.pallas_call(copy_kernel, grid=(n, h // 256), in_specs=[spec],
                              out_specs=spec, out_shape=shape)(a)

    @jax.jit
    def triad(a, b):
        return pl.pallas_call(triad_kernel, grid=(n, h // 256), in_specs=[spec, spec],
                              out_specs=spec, out_shape=shape)(a, b)

    y = copy(x)
    nb = n * h * w
    dt_c = timeit(copy, x, iters=iters)
    dt_t = timeit(triad, x, y, iters=iters)
    return {"copy_gbps": 2 * nb / dt_c / 1e9, "triad_gbps": 3 * nb / dt_t / 1e9}


def sync(tree) -> None:
    """Block until every array in ``tree`` is computed (host-readback fence).

    One combined readback: per-leaf reads cost a full tunnel round trip each
    (~2-5 ms on the sandbox TPU), which inflated multi-leaf stage timings by
    tens of ms (r3).
    """
    leaves = [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "ravel")]
    if not leaves:
        return
    if len(leaves) == 1:
        np.asarray(leaves[0].ravel()[0:1])
        return
    import jax.numpy as jnp

    fence = jnp.stack([x.ravel()[0].astype(jnp.float32) for x in leaves])
    np.asarray(fence)


@contextlib.contextmanager
def trace(logdir: str):
    """``with trace("/tmp/tb"): ...`` — capture a jax.profiler trace."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn, *args, iters: int = 10, warmup: int = 2, repeat: int = 1,
           **kwargs) -> float:
    """Mean seconds per call of ``fn(*args)`` at steady state.

    ``repeat > 1`` times that window ``repeat`` times and returns the BEST
    window mean.  Through the tunneled backend a single RTT stall (hundreds
    of ms) inside one window inflates its mean arbitrarily — measured: the
    same single-frame ``scan()`` read 9.5 and 29.7 ms in back-to-back
    windows of the same process — so dispatch-sensitive latency metrics
    should use ``repeat=3`` (the headline bench.py already does this with
    its own best-of-3 windows)."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
    sync(out)
    best = None
    for _ in range(max(repeat, 1)):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, **kwargs)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


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
