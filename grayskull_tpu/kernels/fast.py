"""Fused Pallas FAST-9 kernel — scoremap + 3x3 NMS + packed top-k keys.

The XLA formulation (``ops.features.fast_scoremap``) materializes ~140
full-frame intermediates through HBM (16 shifted circle views, the 25-step
run sweep, 16 |diff| mins, NMS compares) — ~2 ms per 640x480 frame.  This
kernel streams row blocks through VMEM once and emits everything ``fast()``
needs in a single pass:

* ``score``  — the uint8 FAST score map (``gs_fast`` pass 1,
  grayskull.h:489-515), bit-exact including the unsigned-wraparound compare
  quirks (``v < p - thr`` wraps when ``p < thr``; the else-if chain lets
  "bright" win when both hold);
* ``key``    — int32 ``(h*w - raster_index) << 8 | score`` at 3x3-NMS local
  maxima (zero elsewhere), so the caller's ``top_k`` yields the first
  ``cap`` corners in scan order with scores riding along (the scan-order
  emission of grayskull.h:517-531 without a serializing scatter).

Cross-block stencil rows come from 8-row neighbor-block views of the input
(same edge-clamped index-map scheme as the preproc kernels; circle radius 3
+ one NMS row = 4 rows per edge).  Scores are computed for one extra row
above/below each block so the NMS compares see cross-block neighbors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .preproc import _halo_specs, _pad_blk, _pad_rows

__all__ = ["fast_pallas", "fast_pallas_available"]

# The kernel keeps ~30 (blk+2, W) int32 intermediates live (16 circle
# views, run counters, diffs), so its VMEM budget is much tighter than the
# preproc kernels': blk*W <= 48K keeps the working set ~6 MB (a 256x512
# frame at preproc's 256K bound hit a 33 MB scoped-vmem OOM).  Awkward
# heights zero-pad to the cost-optimal block (preproc._pad_blk): pad rows
# are inert — the interior mask uses the real h, so they score 0 and emit
# no keys, and interior circle windows never reach them.
_VMEM_BUDGET = 48 * 1024

# FAST Bresenham circle of radius 3 (grayskull.h:485-486)
_CDX = (0, 1, 2, 3, 3, 3, 2, 1, 0, -1, -2, -3, -3, -3, -2, -1)
_CDY = (-3, -3, -2, -1, 0, 1, 2, 3, 3, 3, 2, 1, 0, -1, -2, -3)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fast_pallas(imgs: jnp.ndarray, threshold, interpret: bool = False):
    """(N, H, W) uint8 + threshold -> (score uint8 (N,H,W), key int32 (N,H,W)).

    ``key`` is nonzero exactly at scan-order-NMS corners; ``top_k`` over the
    flattened keys gives the first ``cap`` corners in raster order.
    """
    n, h, w = imgs.shape
    blk, hp = _pad_blk(h, w, 1, budget=_VMEM_BUDGET)
    wp = -(-w // 128) * 128
    x = jnp.pad(imgs, ((0, 0), (0, 0), (0, wp - w)))
    x = _pad_rows(x, hp)
    thr = jnp.asarray(threshold, jnp.int32)

    def kernel(t_ref, x_ref, top_ref, bot_ref, score_ref, key_ref):
        # rebind the closure placeholder to the SMEM threshold scalar
        _fast_kernel_impl(t_ref[0], x_ref, top_ref, bot_ref, score_ref, key_ref)

    def _fast_kernel_impl(thr_v, x_ref, top_ref, bot_ref, score_ref, key_ref):
        j = pl.program_id(1)
        nbk = pl.num_programs(1)
        # 4-row halos (circle radius 3 + one NMS row) from the neighbor
        # blocks' 8-row views; frame edges are masked to zero
        top = jnp.where(j > 0, top_ref[0, 4:8, :].astype(jnp.int32), 0)
        bot = jnp.where(j < nbk - 1, bot_ref[0, 0:4, :].astype(jnp.int32), 0)
        rows = jnp.concatenate([top, x_ref[0].astype(jnp.int32), bot], axis=0)
        rp = jnp.pad(rows, ((0, 0), (3, 3)))
        ext = blk + 2
        p = rows[3 : 3 + ext, :]

        def view(k):
            return rp[3 + _CDY[k] : 3 + _CDY[k] + ext, 3 + _CDX[k] : 3 + _CDX[k] + wp]

        views = [view(k) for k in range(16)]
        d = p - thr_v
        bright = [v > p + thr_v for v in views]
        dark = [(~b) & ((d < 0) | (v < d)) for v, b in zip(views, bright)]

        run_b = jnp.zeros((ext, wp), jnp.int32)
        run_d = jnp.zeros((ext, wp), jnp.int32)
        corner = jnp.zeros((ext, wp), jnp.bool_)
        for i in range(16 + 9):
            k = i % 16
            run_b = jnp.where(bright[k], run_b + 1, 0)
            run_d = jnp.where(dark[k], run_d + 1, 0)
            corner = corner | (run_b >= 9) | (run_d >= 9)

        min_diff = jnp.abs(views[0] - p)
        for v in views[1:]:
            min_diff = jnp.minimum(min_diff, jnp.abs(v - p))

        y0 = j * blk
        yy = jax.lax.broadcasted_iota(jnp.int32, (ext, wp), 0) + (y0 - 1)
        xx = jax.lax.broadcasted_iota(jnp.int32, (ext, wp), 1)
        interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
        s = jnp.where(corner & interior, min_diff, 0)
        score_ref[0] = s[1 : 1 + blk].astype(jnp.uint8)

        sp = jnp.pad(s, ((0, 0), (1, 1)))
        smid = s[1 : 1 + blk]
        is_max = smid > 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                is_max &= ~(sp[1 + dy : 1 + dy + blk, 1 + dx : 1 + dx + wp] > smid)

        # fresh iotas at the output size — slicing a broadcast-layout iota
        # crashes this Mosaic version's layout pass
        ym = jax.lax.broadcasted_iota(jnp.int32, (blk, wp), 0) + y0
        xm = jax.lax.broadcasted_iota(jnp.int32, (blk, wp), 1)
        idx = ym * w + xm
        key = jnp.where(is_max, ((jnp.int32(h * w) - idx) << 8) | smid, 0)
        key_ref[0] = key

    nb = hp // blk
    top_spec, bot_spec = _halo_specs(blk, hp, wp)
    score, key = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk, wp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            top_spec,
            bot_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, blk, wp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, wp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, hp, wp), jnp.uint8),
            jax.ShapeDtypeStruct((n, hp, wp), jnp.int32),
        ],
        interpret=interpret,
    )(thr.reshape(1), x, x, x)
    return score[:, :h, :w], key[:, :h, :w]


def fast_pallas_available(h: int, w: int) -> bool:
    return (_pad_blk(h, w, 1, budget=_VMEM_BUDGET)[0] >= 8 and w >= 8
            and h * w < (1 << 23))