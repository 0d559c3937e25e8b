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
from ..kernels.preproc import (blur_pallas, fused_blur_hist,
                               fused_threshold_sobel, preproc_available,
                               sobel_pallas, stencil_available)
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


@functools.partial(jax.jit, static_argnames=("radius", "want_binary", "interpret"))
def _preprocess_pallas(imgs: jnp.ndarray, radius: int, want_binary: bool = True,
                       interpret: bool = False):
    blurred, hist = fused_blur_hist(imgs, radius, interpret=interpret)
    t = otsu_from_histogram(hist, imgs.shape[-2] * imgs.shape[-1])
    binary, edges = fused_threshold_sobel(blurred, t, want_binary,
                                          interpret=interpret)
    return blurred, binary, edges, t


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def _preprocess_stencil(imgs: jnp.ndarray, radius: int,
                        interpret: bool = False):
    """Middle tier for geometries the fused pair can't take (w not
    128-divisible, or heights the histogram kernel can't row-pad): the
    standalone row-padded stencils do blur and sobel (2 B/px each), the
    histogram/threshold stages stay XLA.  ~7 B/px vs the composed XLA
    path's several full-frame f32 intermediates; bit-exact either way."""
    blurred = blur_pallas(imgs, radius, interpret=interpret)
    t = otsu_from_histogram(histogram(blurred), imgs.shape[-2] * imgs.shape[-1])
    binary = threshold(blurred, t[:, None, None])
    edges = sobel_pallas(binary, interpret=interpret)
    return blurred, binary, edges, t


def preprocess(imgs: jnp.ndarray, radius: int = 2, force_xla: bool = False,
               want_binary: bool = True):
    """blur -> otsu -> threshold -> sobel, fused.  (N, H, W) or (H, W) uint8.

    Returns ``(blurred, binary, edges, thresholds)``.  ``want_binary=False``
    returns ``binary=None`` and skips its HBM write on the Pallas path (the
    binary map is only the Sobel stage's input — consumers that need just
    edges save 1 B/pixel of the pipeline's 5).
    """
    single = imgs.ndim == 2
    batch = imgs[None] if single else imgs
    h, w = batch.shape[-2:]
    on_tpu = not force_xla and _on_tpu()
    if on_tpu and preproc_available(h, w, radius):
        out = _preprocess_pallas(batch, radius, want_binary)
    elif on_tpu and stencil_available(h, w, radius):
        out = _preprocess_stencil(batch, radius)
        if not want_binary:
            out = (out[0], None, out[2], out[3])
    else:
        out = preprocess_reference(batch, radius)
        if not want_binary:
            out = (out[0], None, out[2], out[3])
    if single:
        return tuple(None if v is None else v[0] for v in out)
    return out
