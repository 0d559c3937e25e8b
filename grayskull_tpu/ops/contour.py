"""Moore-neighbor contour tracing — ``gs_trace_contour``
(/root/reference/grayskull.h:446-480).

Inherently sequential (one walker stepping around a boundary); expressed as a
``lax.while_loop`` so it jits and composes with the rest of a pipeline.  Used
per-contour — the dense work (finding candidate starts) stays vectorized.

Semantics preserved from the reference:

* 8-direction clockwise neighbor table starting E (grayskull.h:448-449);
* scan starts at ``(dir + 1) % 8`` and backtracks to ``(d + 6) % 8``;
* foreground is ``pixel > 128`` (note: *strictly* greater — different from the
  ``>= 128`` used by blobs, a reference quirk);
* length counts unique visited pixels; stops at the second arrival at the start
  or at a dead end; box updates in the C statement order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Contour, Point, Rect

__all__ = ["trace_contour"]

# clockwise from East (grayskull.h:448-449)
_DX = jnp.array([1, 1, 0, -1, -1, -1, 0, 1], jnp.int32)
_DY = jnp.array([0, 1, 1, 1, 0, -1, -1, -1], jnp.int32)


@jax.jit
def trace_contour(img: jnp.ndarray, start, visited: jnp.ndarray | None = None) -> Contour:
    """Trace one contour from ``start=(x, y)``.  Returns a :class:`Contour` with the
    box, length and the updated visited mask (255 at visited pixels).

    ``visited`` may carry state across calls (multi-contour extraction), matching
    the reference's caller-provided mask.
    """
    h, w = img.shape
    if visited is None:
        visited = jnp.zeros((h, w), jnp.uint8)
    sx = jnp.asarray(start[0], jnp.int32)
    sy = jnp.asarray(start[1], jnp.int32)

    # state: px, py, dir, length, seenstart, bx, by, bw, bh, visited, done, steps
    init = (sx, sy, jnp.int32(7), jnp.int32(0), jnp.bool_(False),
            sx, sy, jnp.int32(1), jnp.int32(1), visited, jnp.bool_(False), jnp.int32(0))
    # Safety bound — a DELIBERATE improvement over the reference: gs_trace_contour
    # only stops at a dead end or a second visit of the start pixel, and a walk on
    # noisy input can cycle without revisiting the start, hanging the C code
    # forever.  Within the bound the walk is identical to the reference's.
    max_steps = 4 * h * w + 8

    def cond(s):
        return (~s[10]) & (s[11] < max_steps)

    def body(s):
        px, py, d, length, seen, bx, by, bw, bh, vis, done, steps = s
        fresh = vis[py, px] == 0
        length = length + fresh.astype(jnp.int32)
        vis = vis.at[py, px].set(255)

        ndir = (d + 1) % 8
        dirs = (ndir + jnp.arange(8, dtype=jnp.int32)) % 8
        nx = px + _DX[dirs]
        ny = py + _DY[dirs]
        inb = (nx >= 0) & (nx < w) & (ny >= 0) & (ny < h)
        vals = img[jnp.clip(ny, 0, h - 1), jnp.clip(nx, 0, w - 1)]
        ok = inb & (vals > 128)
        found = jnp.any(ok)
        first = jnp.argmax(ok).astype(jnp.int32)
        sel = dirs[first]
        npx = jnp.where(found, nx[first], px)
        npy = jnp.where(found, ny[first], py)
        nd = jnp.where(found, (sel + 6) % 8, d)

        # box update in C statement order (grayskull.h:471-474), only when found
        bx2 = jnp.where(found, jnp.minimum(bx, npx), bx)
        by2 = jnp.where(found, jnp.minimum(by, npy), by)
        bw2 = jnp.where(found, jnp.maximum(bw, npx - bx2 + 1), bw)
        bh2 = jnp.where(found, jnp.maximum(bh, npy - by2 + 1), bh)

        at_start = found & (npx == sx) & (npy == sy)
        stop = (~found) | (at_start & seen)
        seen2 = seen | at_start
        return (npx, npy, nd, length, seen2, bx2, by2, bw2, bh2, vis, stop, steps + 1)

    out = jax.lax.while_loop(cond, body, init)
    _, _, _, length, _, bx, by, bw, bh, vis, _, _ = out
    return Contour(
        box=Rect(bx, by, bw, bh),
        start=Point(sx, sy),
        length=length,
        visited=vis,
    )
