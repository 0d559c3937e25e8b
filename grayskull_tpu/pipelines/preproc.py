"""Fused preprocessing pipeline — the benchmark headline:

    blur(r) -> Otsu -> threshold -> sobel        (BASELINE.json config #1 + sobel)

On TPU with VMEM-sized frames this runs two fused Pallas kernels plus a tiny
Otsu sweep (see kernels/preproc.py); otherwise it composes the regular ops.
Both paths are bit-exact vs the C reference chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import on_tpu as _on_tpu
from ..kernels.preproc import fused_blur_hist, fused_threshold_sobel, preproc_available
from ..ops.histogram import histogram, otsu_from_histogram
from ..ops.pixel import blur, sobel, threshold

__all__ = ["preprocess", "preprocess_reference"]


@functools.partial(jax.jit, static_argnames=("radius",))
def preprocess_reference(imgs: jnp.ndarray, radius: int = 2):
    """Composed-ops path (any backend/size): returns (blurred, binary, edges, t)."""
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    blurred = blur(imgs, radius)
    t = otsu_from_histogram(histogram(blurred), imgs.shape[-2] * imgs.shape[-1])
    binary = threshold(blurred, t[:, None, None])
    edges = sobel(binary)
    if single:
        return blurred[0], binary[0], edges[0], t[0]
    return blurred, binary, edges, t


@functools.partial(jax.jit, static_argnames=("radius",))
def _preprocess_pallas(imgs: jnp.ndarray, radius: int):
    blurred, hist = fused_blur_hist(imgs, radius)
    t = otsu_from_histogram(hist, imgs.shape[-2] * imgs.shape[-1])
    binary, edges = fused_threshold_sobel(blurred, t)
    return blurred, binary, edges, t


def preprocess(imgs: jnp.ndarray, radius: int = 2, force_xla: bool = False):
    """blur -> otsu -> threshold -> sobel, fused.  (N, H, W) or (H, W) uint8.

    Returns ``(blurred, binary, edges, thresholds)``.
    """
    single = imgs.ndim == 2
    batch = imgs[None] if single else imgs
    h, w = batch.shape[-2:]
    use_pallas = not force_xla and preproc_available(h, w, radius) and _on_tpu()
    if use_pallas:
        out = _preprocess_pallas(batch, radius)
    else:
        out = preprocess_reference(batch, radius)
    if single:
        return tuple(v[0] for v in out)
    return out
