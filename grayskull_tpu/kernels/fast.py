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

__all__ = ["fast_pallas", "fast_pallas_compact", "fast_pallas_lean",
           "fast_pallas_available"]

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


def _fast_block_body(thr_v, x_ref, top_ref, bot_ref, blk, wp, h, w):
    """Shared per-block FAST body -> (score (blk, wp) i32, key (blk, wp) i32)."""
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

    # factor the circle views' lane shifts: the 16 (dy, dx) slices share only
    # 7 distinct dx, so slice the 7 lane-offset columns of rp ONCE and take
    # row (sublane) views per circle point — 7 lane relayouts instead of 16
    # (r5; the lane-misaligned slice is the expensive part, cf. kernels/lbp.py)
    cols = {dx: rp[:, 3 + dx : 3 + dx + wp] for dx in sorted(set(_CDX))}

    def view(k):
        return cols[_CDX[k]][3 + _CDY[k] : 3 + _CDY[k] + ext, :]

    d = p - thr_v
    pthr = p + thr_v

    # wrapped run-of-9 detection as bitmask shift-AND folding (r5): pack the
    # 16 polarity tests into one int32 lane mask, duplicate the first 9 bits
    # above bit 16 (the C scans 16+9 wrapped samples, grayskull.h:493-512),
    # then fold — bit i of m9 says samples i..i+8 all pass.  ~16 vector ops
    # replace the 25-step x ~7-op run sweep (the kernel's hottest chain).
    # Bits stay <= 24 so arithmetic >> never smears a sign bit.
    # Each view is consumed the moment it is built (mask bit + |diff| min) so
    # the live set stays ~8 block values instead of ~35 — the old form's
    # intermediates spilled through VMEM and dominated the kernel's time.
    bb = jnp.zeros((ext, wp), jnp.int32)
    dd = jnp.zeros((ext, wp), jnp.int32)
    min_diff = None
    for k in range(16):
        v = view(k)
        br = v > pthr
        dk = (~br) & ((d < 0) | (v < d))
        bb = bb | (br.astype(jnp.int32) << k)
        dd = dd | (dk.astype(jnp.int32) << k)
        ad = jnp.abs(v - p)
        min_diff = ad if min_diff is None else jnp.minimum(min_diff, ad)

    def run9(m):
        x = m | ((m & 0x1FF) << 16)
        m1 = x & (x >> 1)   # run >= 2 at bit i
        m2 = m1 & (m1 >> 2)  # run >= 4
        m4 = m2 & (m2 >> 4)  # run >= 8
        return (m4 & (x >> 8)) != 0  # run >= 9

    corner = run9(bb) | run9(dd)

    y0 = j * blk
    yy = jax.lax.broadcasted_iota(jnp.int32, (ext, wp), 0) + (y0 - 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (ext, wp), 1)
    interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    s = jnp.where(corner & interior, min_diff, 0)

    sp = jnp.pad(s, ((0, 0), (1, 1)))
    # same lane-shift factoring for the 3x3 NMS: 2 lane relayouts, row views
    ncols = {dx: sp[:, 1 + dx : 1 + dx + wp] for dx in (-1, 0, 1)}
    smid = s[1 : 1 + blk]
    is_max = smid > 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            is_max &= ~(ncols[dx][1 + dy : 1 + dy + blk, :] > smid)

    # fresh iotas at the output size — slicing a broadcast-layout iota
    # crashes this Mosaic version's layout pass
    ym = jax.lax.broadcasted_iota(jnp.int32, (blk, wp), 0) + y0
    xm = jax.lax.broadcasted_iota(jnp.int32, (blk, wp), 1)
    idx = ym * w + xm
    key = jnp.where(is_max, ((jnp.int32(h * w) - idx) << 8) | smid, 0)
    return smid, key


_FOLD_K = 2  # residual strips per block (see _fold_compact)
_FOLD_SHIFTS = (128, 256, 384)  # lane rotation per fold level (128-aligned)


def _lane_roll(x, shift: int, wp: int):
    """Lane rotation by a 128-multiple — two aligned slices + concat."""
    s = shift % wp
    if s == 0:
        return x
    return jnp.concatenate([x[:, wp - s :], x[:, : wp - s]], axis=1)


def _fold_compact(key, blk: int, wp: int):
    """Lossless-when-gated sublane compaction of a sparse key map.

    Pairwise max/min folding: each fold halves the map; ``max`` keeps one
    key per colliding pair and ``min`` is exactly the other (or zero when
    at most one cell was set), so a single fold level loses nothing.
    Overflow (min) maps cascade through further folds and merge into
    ``_FOLD_K`` shared residual strips by open addressing (each probe
    rotates lanes by a different 128-multiple — keys are self-describing,
    so placement is free); only keys evicted past the LAST residual strip
    bump ``lost``, and the caller falls back to full-map emission when any
    strip in the batch reports ``lost > 0``.

    Two design points against structured images (measured on testdata):
    * the fold pairs rows blk/2 apart AND rotates the lower half's lanes
      per level — vertically periodic corners (aruco markers) and
      same-column text stacks stop colliding (no-shift folding lost 5
      keys on aruco; shifted folding loses 0 on aruco/receipt/grayskull);
    * unlike the 2x2 spatial reduction (exp/exp_fastred_r4.py — dead: NMS
      keeps exactly-tied 8-adjacent survivors, common on real frames),
      distant pairing makes collisions ~density^2 rare.

    Dense frames (random noise, dense text at ~5%+ survivor density)
    exceed the scheme's capacity and take the gated fallback — the
    compaction is a bandwidth optimization for the common sparse regime,
    never a correctness risk.

    Returns (a (8, wp), residuals (_FOLD_K*8, wp), lost scalar int32).
    """
    res = [jnp.zeros((8, wp), jnp.int32) for _ in range(_FOLD_K)]
    lost = jnp.zeros((), jnp.int32)

    def merge(m):
        nonlocal lost
        for i in range(_FOLD_K):
            m = _lane_roll(m, 128 * (i + 1), wp)
            ov = jnp.minimum(res[i], m)
            res[i] = jnp.maximum(res[i], m)
            m = ov
        lost = lost + jnp.sum((m > 0).astype(jnp.int32))

    def fold_to_8(m, lev: int):
        """One max/min fold chain m -> 8 rows; overflows recurse + merge."""
        rows = m.shape[0]
        while rows > 8:
            half = 8 * (rows // 16)  # largest 8-multiple <= rows/2
            t = m[:half]
            b = _lane_roll(m[rows - half : rows],
                           _FOLD_SHIFTS[lev % len(_FOLD_SHIFTS)], wp)
            mid = m[half : rows - half]
            ov = jnp.minimum(t, b)
            na = jnp.maximum(t, b)
            m = jnp.concatenate([na, mid], axis=0) if mid.shape[0] else na
            rows = rows - half
            merge(fold_to_8(ov, lev + 1))
            lev += 1
        return m

    a = fold_to_8(key, 0)
    return a, jnp.concatenate(res, axis=0), lost


def _fast_call(imgs, threshold, interpret: bool, compact: bool,
               lean: bool = False):
    n, h, w = imgs.shape
    blk, hp = _pad_blk(h, w, 1, budget=_VMEM_BUDGET)
    wp = -(-w // 128) * 128
    x = jnp.pad(imgs, ((0, 0), (0, 0), (0, wp - w)))
    x = _pad_rows(x, hp)
    thr = jnp.asarray(threshold, jnp.int32)
    nb = hp // blk
    top_spec, bot_spec = _halo_specs(blk, hp, wp)

    def kernel(t_ref, *refs):
        x_ref, top_ref, bot_ref = refs[:3]
        smid, key = _fast_block_body(t_ref[0], x_ref, top_ref, bot_ref,
                                     blk, wp, h, w)
        outs = refs[3:]
        if not lean:
            score_ref, key_ref = outs[:2]
            score_ref[0] = smid.astype(jnp.uint8)
            key_ref[0] = key
            outs = outs[2:]
        if compact:
            red_ref, lost_ref = outs
            a, res, lost = _fold_compact(key, blk, wp)
            # two slice stores, not a concat: the fold chain leaves ``a``
            # with a sublane offset Mosaic's concatenate can't merge with
            # the offset-0 residuals ("result/input offset mismatch on
            # non-concat dimension")
            red_ref[0, 0:8] = a
            red_ref[0, 8 : 8 * (1 + _FOLD_K)] = res
            lost_ref[0, 0, pl.program_id(1)] = lost

    blk_spec = pl.BlockSpec((1, blk, wp), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    out_specs = []
    out_shape = []
    if not lean:
        out_specs += [blk_spec, blk_spec]
        out_shape += [
            jax.ShapeDtypeStruct((n, hp, wp), jnp.uint8),
            jax.ShapeDtypeStruct((n, hp, wp), jnp.int32),
        ]
    if compact:
        rr = 8 * (1 + _FOLD_K)  # folded + residual rows per strip
        out_specs += [
            pl.BlockSpec((1, rr, wp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nb), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((n, nb * rr, wp), jnp.int32),
            jax.ShapeDtypeStruct((n, 1, nb), jnp.int32),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk_spec,
            top_spec,
            bot_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(thr.reshape(1), x, x, x)
    if lean:
        return outs[0], outs[1]
    score, key = outs[0][:, :h, :w], outs[1][:, :h, :w]
    if compact:
        return score, key, outs[2], outs[3]
    return score, key


@functools.partial(jax.jit, static_argnames=("interpret",))
def fast_pallas(imgs: jnp.ndarray, threshold, interpret: bool = False):
    """(N, H, W) uint8 + threshold -> (score uint8 (N,H,W), key int32 (N,H,W)).

    ``key`` is nonzero exactly at scan-order-NMS corners; ``top_k`` over the
    flattened keys gives the first ``cap`` corners in raster order.
    """
    return _fast_call(imgs, threshold, interpret, compact=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fast_pallas_compact(imgs: jnp.ndarray, threshold, interpret: bool = False):
    """``fast_pallas`` + a folded key map for cheap emission.

    Extra returns: ``red`` (N, nb*(1+_FOLD_K)*8, wp) int32 — per strip an
    8-row max-folded key map stacked on ``_FOLD_K`` 8-row residual strips
    (see ``_fold_compact``), holding EVERY key of the full map whenever
    ``lost`` (N, 1, nb) int32 is all zero.  ``approx_max_k`` emission over
    ``red`` (typically L/4 the keys) is then bit-identical to emission over
    the full map; the caller must gate on ``lost.sum() == 0`` and fall back
    to the full map otherwise.
    """
    return _fast_call(imgs, threshold, interpret, compact=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fast_pallas_lean(imgs: jnp.ndarray, threshold, interpret: bool = False):
    """Fold-compacted keys ONLY: ``(red, lost)`` with no full-frame outputs.

    The ablation profile (exp/results_fast_ablate_r5.json) showed the
    full-frame score (u8) and key (i32) map writes cost as much as the whole
    circle compute; the batched ORB path discards the score map and reads
    the key map only when a fold reported loss.  This variant skips both
    writes — callers must re-run :func:`fast_pallas` inside the (rare)
    ``lost > 0`` fallback branch, which stays cheaper in expectation because
    fold losses need ~5%+ survivor density (dense noise), never natural
    frames (see ``_fold_compact``).
    """
    return _fast_call(imgs, threshold, interpret, compact=True, lean=True)


def fast_pallas_available(h: int, w: int) -> bool:
    return (_pad_blk(h, w, 1, budget=_VMEM_BUDGET)[0] >= 8 and w >= 8
            and h * w < (1 << 23))