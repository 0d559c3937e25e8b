"""Face detection pipeline — ``faces()``
(/root/reference/examples/nanomagick/nanomagick.c:347-376).

integral → multi-scale LBP cascade sweep (scales 1.0→4.0 ×1.2).

Faithfulness note: the reference CLI passes its ``min_neighbors`` argument as the
*window stride* (``step``) of ``gs_lbp_detect`` — there is no neighbor grouping
or NMS of detections at all (nanomagick.c:363-364).  The parameter here is named
``step`` to say what it actually does.

Unlike the reference (static 640x480 integral buffer, nanomagick.c:348), any
frame size works.

First-call cost on TPU: each ladder scale compiles its own specialized Pallas
kernel (~8-20 s each; ``force_xla=True`` on ``lbp_detect`` skips them).  The
package enables a persistent XLA compilation cache (see
``grayskull_tpu/__init__.py``), so any later process warms in seconds;
production servers should still warm the pipeline once per frame geometry at
startup.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..cascade import load_frontalface
from ..core import LbpCascade, Rects
from ..ops.integral import integral
from ..ops.lbp import lbp_detect

__all__ = ["detect_faces"]


@functools.partial(
    jax.jit,
    static_argnames=("cascade", "max_rects", "scale_factor", "min_scale", "max_scale", "step"),
)
def detect_faces(img: jnp.ndarray, cascade: LbpCascade | None = None,
                 max_rects: int = 100, scale_factor=1.2, min_scale=1.0,
                 max_scale=4.0, step: int = 1) -> Rects:
    """Detect faces in a uint8 frame; returns a fixed-capacity :class:`Rects` table."""
    if cascade is None:
        cascade = load_frontalface()
    ii = integral(img)
    return lbp_detect(cascade, ii, max_rects, scale_factor, min_scale, max_scale, step)
