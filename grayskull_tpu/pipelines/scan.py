"""Document scanner pipeline — ``scan()``
(/root/reference/examples/nanomagick/nanomagick.c:186-210).

blur(1) → threshold(otsu+10) → blobs → largest blob → corners → perspective warp.
The whole chain runs on device in one jit; only the final warped page comes back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import Point, Rect
from ..ops.blobs import blob_corners, blobs
from ..ops.histogram import otsu_threshold
from ..ops.pixel import blur, threshold
from ..ops.warp import perspective_correct

__all__ = ["scan", "preprocess_binarize"]


@jax.jit
def preprocess_binarize(img: jnp.ndarray) -> jnp.ndarray:
    """blur(1) → threshold(otsu + 10), the scanner's binarization stage.

    Note the reference passes ``otsu + 10`` through a uint8 parameter
    (nanomagick.c:191), so the threshold wraps mod 256 — reproduced here.
    """
    tmp = blur(img, 1)
    t = (otsu_threshold(tmp).astype(jnp.int32) + 10) % 256
    return threshold(tmp, t.astype(jnp.uint8))


def _scan_corners(img, max_blobs):
    binary = preprocess_binarize(img)
    table, labels, _ = blobs(binary, max_blobs)
    # largest blob, first-occurrence tie-break (nanomagick.c:197-199)
    largest = jnp.argmax(table.area).astype(jnp.int32)
    blob_box = Rect(
        table.box.x[largest], table.box.y[largest],
        table.box.w[largest], table.box.h[largest],
    )
    blob_cent = Point(table.centroid.x[largest], table.centroid.y[largest])
    return blob_corners(binary, labels, table.label[largest], blob_box, blob_cent)


@functools.partial(jax.jit, static_argnames=("out_size", "max_blobs"))
def _scan_batch(imgs, out_size, max_blobs):
    # corner finding vmaps per frame; the warp runs BATCHED below the vmap —
    # on TPU it is a scalar-prefetch Pallas kernel (kernels/warp.py), which
    # must not be vmapped, and one launch serves the whole batch anyway
    corners = jax.vmap(lambda im: _scan_corners(im, max_blobs))(imgs)
    pages = perspective_correct(imgs, corners, out_size)
    return pages, corners


def scan(img: jnp.ndarray, out_size=(1000, 800), max_blobs: int = 1000):
    """Scan a document photo to a rectified ``out_size=(h, w)`` page.

    Returns ``(page, corners)`` — the reference CLI uses 800x1000 output
    (nanomagick.c:204) and 1000 blob capacity (nanomagick.c:194).
    """
    out_size = (int(out_size[0]), int(out_size[1]))
    if img.ndim == 3:
        return _scan_batch(img, out_size, max_blobs)
    pages, corners = _scan_batch(img[None], out_size, max_blobs)
    return pages[0], corners[0]
