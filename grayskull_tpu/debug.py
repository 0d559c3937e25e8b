"""Debug utilities: image dumps, NaN guards, overlay rendering.

The reference's only debugging aids are the PGM writer and the terminal viewer
(SURVEY.md §5).  This module rounds those out for pipeline debugging:

* :func:`dump` — write any (H, W) or (N, H, W) array to auto-numbered PGMs;
* :func:`nan_guard` — context manager enabling ``jax_debug_nans``;
* :func:`draw_rects` / :func:`draw_crosses` — host-side overlays for detection
  tables (the WASM demo's overlay renderers, re-homed).
"""

from __future__ import annotations

import contextlib
import itertools
import os

import jax
import numpy as np

from . import io as gio
from .cli import draw_line

__all__ = ["dump", "nan_guard", "draw_rects", "draw_crosses"]

_counter = itertools.count()


def dump(arr, name: str = "dump", directory: str = "/tmp/grayskull_dumps") -> list[str]:
    """Write image array(s) as PGM(s); returns the written paths."""
    os.makedirs(directory, exist_ok=True)
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        lo, hi = arr.min(), arr.max()
        arr = ((arr - lo) / max(hi - lo, 1e-9) * 255).astype(np.uint8)
    frames = arr[None] if arr.ndim == 2 else arr
    paths = []
    for frame in frames:
        path = os.path.join(directory, f"{name}_{next(_counter):04d}.pgm")
        gio.write_pgm(frame, path)
        paths.append(path)
    return paths


@contextlib.contextmanager
def nan_guard():
    """Raise on NaN production inside the block (useful for float paths)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def draw_rects(img: np.ndarray, rects, color: int = 255) -> np.ndarray:
    """Overlay a Rects table (or iterable of (x, y, w, h)) on a copy of img."""
    out = np.asarray(img).copy()
    if hasattr(rects, "n"):
        n = int(rects.n)
        items = zip(
            np.asarray(rects.x)[:n], np.asarray(rects.y)[:n],
            np.asarray(rects.w)[:n], np.asarray(rects.h)[:n],
        )
    else:
        items = rects
    for (x, y, w, h) in items:
        x, y, w, h = int(x), int(y), int(w), int(h)
        draw_line(out, x, y, x + w, y, color)
        draw_line(out, x, y + h, x + w, y + h, color)
        draw_line(out, x, y, x, y + h, color)
        draw_line(out, x + w, y, x + w, y + h, color)
    return out


def draw_crosses(img: np.ndarray, kps, color: int = 255, r: int = 2) -> np.ndarray:
    """Overlay a Keypoints table (or iterable of (x, y)) as crosses."""
    out = np.asarray(img).copy()
    h, w = out.shape
    if hasattr(kps, "n"):
        n = int(kps.n)
        pts = zip(np.asarray(kps.x)[:n], np.asarray(kps.y)[:n])
    else:
        pts = kps
    for (x, y) in pts:
        x, y = int(x), int(y)
        for d in range(-r, r + 1):
            if 0 <= y + d < h and 0 <= x < w:
                out[y + d, x] = color
            if 0 <= y < h and 0 <= x + d < w:
                out[y, x + d] = color
    return out
