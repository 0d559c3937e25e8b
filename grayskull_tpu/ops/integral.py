"""Integral image — ``gs_integral`` / ``gs_integral_sum``
(/root/reference/grayskull.h:744-763).

The reference computes a sequential 2D running sum in 32-bit unsigned ints.  On
TPU a single-pass Pallas kernel (``kernels.integral``: triangular MXU matmul
scans with a carry row, ~4x) handles gated geometries; the fallback is two
``cumsum`` passes (XLA lowers them to parallel prefix scans — exact for
integers since modular addition is associative even under wraparound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import on_tpu as _on_tpu

__all__ = ["integral", "integral_sum"]


@functools.partial(jax.jit, static_argnames=("force_xla",))
def integral(img: jnp.ndarray, force_xla: bool = False) -> jnp.ndarray:
    """Inclusive 2D prefix sum, uint32 — ``gs_integral`` (grayskull.h:744-752).

    Accepts (H, W) or (N, H, W) uint8; returns same shape uint32.  On TPU a
    single-pass Pallas strip kernel (MXU triangular-matmul scans, ~2.6x) is
    used when the geometry allows; the XLA double-cumsum covers the rest.
    """
    if _on_tpu() and not force_xla and img.ndim in (2, 3):
        from ..kernels.integral import integral_pallas, integral_pallas_available

        if integral_pallas_available(img.shape[-2], img.shape[-1]):
            return integral_pallas(img)
    x = img.astype(jnp.uint32)
    return jnp.cumsum(jnp.cumsum(x, axis=-1), axis=-2)


@jax.jit
def integral_sum(ii: jnp.ndarray, x, y, w, h) -> jnp.ndarray:
    """Inclusive rect sum from an integral image — ``gs_integral_sum``
    (grayskull.h:754-763).  ``D + A - B - C`` with edge guards; args may be traced
    scalars or arrays (broadcast), enabling vectorized cascade evaluation.
    """
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    w = jnp.asarray(w, jnp.int32)
    h = jnp.asarray(h, jnp.int32)
    x2 = x + w - 1
    y2 = y + h - 1

    def take(yy, xx):
        # clamped gather; the guard masks zero out the clamped reads
        yy_c = jnp.clip(yy, 0, ii.shape[-2] - 1)
        xx_c = jnp.clip(xx, 0, ii.shape[-1] - 1)
        return ii[..., yy_c, xx_c]

    a = jnp.where((x > 0) & (y > 0), take(y - 1, x - 1), jnp.uint32(0))
    b = jnp.where(y > 0, take(y - 1, x2), jnp.uint32(0))
    c = jnp.where(x > 0, take(y2, x - 1), jnp.uint32(0))
    d = take(y2, x2)
    return d + a - b - c
