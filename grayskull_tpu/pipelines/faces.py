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
program (~8-25 s each — one or two chunked cascade kernels per scale, see
``kernels.lbp``; ``force_xla=True`` on ``lbp_detect`` skips them).  The
scales are independent programs, so :func:`warm_start` compiles them
concurrently — the compiler overlaps ~2x, roughly halving first-call wall
time — and the persistent XLA compilation cache (see
``grayskull_tpu/__init__.py``) can warm later processes further when the
backend honors it.  Production servers should call ``warm_start`` once per
frame geometry at startup.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..cascade import load_frontalface
from ..core import LbpCascade, Rects
from ..ops.integral import integral
from ..ops.lbp import lbp_detect, lbp_warm_start

__all__ = ["detect_faces", "warm_start"]


def detect_faces(img: jnp.ndarray, cascade: LbpCascade | None = None,
                 max_rects: int = 100, scale_factor=1.2, min_scale=1.0,
                 max_scale=4.0, step: int = 1) -> Rects:
    """Detect faces in a uint8 frame (or an (N, H, W) batch); returns a
    fixed-capacity :class:`Rects` table.

    Each ladder scale dispatches as its own cached executable (see
    ``ops.lbp.lbp_detect``), so the first call per geometry compiles the
    scale kernels — use :func:`warm_start` to pay that concurrently.
    """
    if cascade is None:
        cascade = load_frontalface()
    ii = integral(img)
    return lbp_detect(cascade, ii, max_rects, scale_factor, min_scale, max_scale, step)


def warm_start(h: int, w: int, batch: int = 1, cascade: LbpCascade | None = None,
               max_rects: int = 100, scale_factor=1.2, min_scale=1.0,
               max_scale=4.0, step: int = 1, max_workers: int = 4) -> float:
    """Pre-compile :func:`detect_faces` for one frame geometry; returns
    seconds spent.

    The per-scale cascade kernels compile concurrently (~2x overlap measured
    on the TPU compiler — exp/exp_warm_parallel.py).  Shapes are part of the
    executable cache key: warm with the batch size you will serve (``batch=1``
    also covers single-frame ``(H, W)`` calls, which evaluate as a 1-batch).
    """
    if cascade is None:
        cascade = load_frontalface()
    from ..profiling import sync

    img = jnp.zeros((batch, h, w), jnp.uint8)
    sync(integral(img))  # compile the integral for this geometry (one-element
    # fence — a full np.asarray readback would ship the ~39 MB batch integral
    # back through the ~5 ms/MB tunnel just to wait on the compile)
    return lbp_warm_start(cascade, h, w, nb=batch, max_rects=max_rects,
                          scale_factor=scale_factor, min_scale=min_scale,
                          max_scale=max_scale, step=step,
                          max_workers=max_workers)
