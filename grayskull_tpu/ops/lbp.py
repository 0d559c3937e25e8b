"""Multi-scale LBP cascade detection — ``gs_lbp_code`` / ``gs_lbp_match`` /
``gs_lbp_window`` / ``gs_lbp_detect`` (/root/reference/grayskull.h:765-835).

The reference slides a window over the integral image one position at a time,
evaluating 20 boosted stages with early exit.  The TPU formulation scores **every
window position of a scale in parallel**: each weak classifier's nine block sums
become strided gathers over the integral image for the whole window grid at once,
the MB-LBP code and subset test are vectorized compares, and stage early-exit
becomes an AND-reduction (same result — early exit is purely a serial-CPU
optimization).  Detections are emitted in the reference's (scale, y, x) order via
rank-scatter with the ``max_rects`` cap.

Float semantics: the scale ladder (``scale *= scale_factor``), window and feature
scaling (float32 multiply + C truncation) are computed host-side in numpy float32
— they depend only on static parameters.  Stage sums accumulate float32 leaf
values sequentially with plain adds (no products are involved, so no FMA
contraction hazard).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import LbpCascade, Rects

__all__ = ["lbp_detect", "lbp_window", "scale_ladder"]


def scale_ladder(cascade: LbpCascade, iw: int, ih: int, scale_factor, min_scale, max_scale):
    """The reference's float32 scale ladder (grayskull.h:819-821), host-side.

    Returns [(scale, win_w, win_h), ...] for scales whose window fits the image.
    """
    f = np.float32
    out = []
    scale = f(min_scale)
    factor = f(scale_factor)
    maxs = f(max_scale)
    while scale <= maxs:
        win_w = int(f(cascade.window_w) * scale)  # (int)(w * scale), f32 mult
        win_h = int(f(cascade.window_h) * scale)
        if win_w > iw or win_h > ih:
            break
        out.append((float(scale), win_w, win_h))
        scale = f(scale * factor)
    return out


def _scaled_features(cascade: LbpCascade, scale: float):
    """Per-feature scaled geometry (grayskull.h:799-804), host-side f32 truncation."""
    f = np.float32
    s = f(scale)
    feats = cascade.features.astype(np.int32)
    fx = (feats[:, 0].astype(np.float32) * s).astype(np.int32)
    fy = (feats[:, 1].astype(np.float32) * s).astype(np.int32)
    fw = np.maximum((feats[:, 2].astype(np.float32) * s).astype(np.int32), 1)
    fh = np.maximum((feats[:, 3].astype(np.float32) * s).astype(np.int32), 1)
    return fx, fy, fw, fh


def _weak_geometry(cascade: LbpCascade, scale: float):
    """Host-side per-weak 3x3 block-rect corner offsets for one scale.

    Returns four (nweaks, 9) int32 arrays of *corner* offsets for the integral
    differencing: y_top, y_bot, x_left, x_right (relative to the window origin),
    in block order TL TC TR / L C R / BL BC BR.
    """
    fx, fy, fw, fh = _scaled_features(cascade, scale)
    wi = cascade.weak_feature_idx.astype(np.int32)
    x0, y0 = fx[wi], fy[wi]
    w_, h_ = fw[wi], fh[wi]
    bys = np.stack([y0, y0, y0, y0 + h_, y0 + h_, y0 + h_,
                    y0 + 2 * h_, y0 + 2 * h_, y0 + 2 * h_], axis=1)
    bxs = np.stack([x0, x0 + w_, x0 + 2 * w_] * 3, axis=1)
    y_top = bys  # rect starts
    x_left = bxs
    y_bot = bys + h_[:, None] - 1  # inclusive rect ends
    x_right = bxs + w_[:, None] - 1
    return y_top.astype(np.int32), y_bot.astype(np.int32), x_left.astype(np.int32), x_right.astype(np.int32)


# block order in _weak_geometry: TL TC TR L C R BL BC BR -> code bit per block
# (grayskull.h:781-782): TL<<7, TC<<6, TR<<5, R<<4, BR<<3, BC<<2, BL<<1, L<<0
_BLOCK_BITS = np.array([7, 6, 5, 0, -1, 4, 1, 2, 3], np.int32)  # -1 = center


def _subset_matrix(cascade: LbpCascade):
    """(nweaks, 8) int32 subset words (zero-padded) + (nweaks,) counts."""
    W = np.zeros((cascade.nweaks, 8), np.int32)
    for wi in range(cascade.nweaks):
        off = int(cascade.weak_subset_offset[wi])
        num = min(int(cascade.weak_num_subsets[wi]), 8)
        W[wi, :num] = cascade.subsets[off : off + num]
    return W, cascade.weak_num_subsets.astype(np.int32)


def _eval_windows(cascade: LbpCascade, ii, ys, xs, scale: float):
    """Evaluate the full cascade for a grid of windows; returns (ny, nx) bool.

    All (nweaks x 9) block sums for the entire window grid are computed with four
    batched gathers; codes, subset tests and stage sums are dense vector ops.
    """
    H, W = ii.shape
    ny, nx = ys.shape[0], xs.shape[0]
    y_top, y_bot, x_left, x_right = _weak_geometry(cascade, scale)
    nw = cascade.nweaks

    # index grids: (nw*9, ny, nx)
    yt = jnp.asarray(y_top.reshape(-1))[:, None, None] + ys[None, :, None]
    yb = jnp.asarray(y_bot.reshape(-1))[:, None, None] + ys[None, :, None]
    xl = jnp.asarray(x_left.reshape(-1))[:, None, None] + xs[None, None, :]
    xr = jnp.asarray(x_right.reshape(-1))[:, None, None] + xs[None, None, :]

    def take(yy, xx):
        return ii[jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]

    zero = jnp.uint32(0)
    a = jnp.where((xl > 0) & (yt > 0), take(yt - 1, xl - 1), zero)
    b = jnp.where(yt > 0, take(yt - 1, xr), zero)
    c = jnp.where(xl > 0, take(yb, xl - 1), zero)
    d = take(yb, xr)
    sums = (d + a - b - c).reshape(nw, 9, ny, nx)

    center = sums[:, 4]
    ge = sums >= center[:, None]
    code = jnp.zeros((nw, ny, nx), jnp.int32)
    for blk, bit in enumerate(_BLOCK_BITS):
        if bit < 0:
            continue
        code = code | (ge[:, blk].astype(jnp.int32) << int(bit))

    subs, counts = _subset_matrix(cascade)
    idx = code >> 5
    bit = code & 31
    word = jnp.asarray(subs)[jnp.arange(nw)[:, None, None], jnp.clip(idx, 0, 7)]
    match = (idx < jnp.asarray(counts)[:, None, None]) & (((word >> bit) & 1) == 1)
    leaf = jnp.where(
        match,
        jnp.asarray(cascade.weak_left_val)[:, None, None],
        jnp.asarray(cascade.weak_right_val)[:, None, None],
    )

    # stage sums: sequential f32 adds in weak order (no products -> no FMA hazard)
    ok = jnp.ones((ny, nx), bool)
    for si in range(cascade.nstages):
        s0 = int(cascade.stage_weak_start[si])
        cnt = int(cascade.stage_nweaks[si])
        ssum = leaf[s0]
        for k in range(1, cnt):
            ssum = ssum + leaf[s0 + k]
        ok = ok & (ssum >= jnp.float32(cascade.stage_threshold[si]))
    return ok


@functools.partial(
    jax.jit, static_argnames=("cascade", "max_rects", "scale_factor", "min_scale",
                              "max_scale", "step"),
)
def lbp_detect(cascade: LbpCascade, ii: jnp.ndarray, max_rects: int,
               scale_factor=1.2, min_scale=1.0, max_scale=4.0, step: int = 1) -> Rects:
    """Multi-scale sliding-window cascade detection — ``gs_lbp_detect``
    (grayskull.h:815-835).

    ``ii`` is the uint32 integral image (see :func:`grayskull_tpu.ops.integral`).
    Detections come back as a fixed-capacity :class:`Rects` table in the
    reference's (scale, y, x) emission order with its ``max_rects`` truncation.
    """
    ih, iw = ii.shape
    cap = int(max_rects)
    ladder = scale_ladder(cascade, iw, ih, scale_factor, min_scale, max_scale)

    hits = []
    metas = []
    for scale, win_w, win_h in ladder:
        ys = np.arange(0, ih - win_h + 1, step, dtype=np.int32)
        xs = np.arange(0, iw - win_w + 1, step, dtype=np.int32)
        if len(ys) == 0 or len(xs) == 0:
            continue
        ok = _eval_windows(cascade, ii, jnp.asarray(ys), jnp.asarray(xs), scale)
        hits.append(ok.reshape(-1))
        gx, gy = np.meshgrid(xs, ys)
        metas.append(
            (gx.reshape(-1), gy.reshape(-1),
             np.full(gx.size, win_w, np.int32), np.full(gx.size, win_h, np.int32))
        )

    if not hits:
        z = jnp.zeros(cap, jnp.int32)
        return Rects(n=jnp.int32(0), x=z, y=z, w=z, h=z)

    mask = jnp.concatenate(hits)
    all_x = jnp.asarray(np.concatenate([m[0] for m in metas]))
    all_y = jnp.asarray(np.concatenate([m[1] for m in metas]))
    all_w = jnp.asarray(np.concatenate([m[2] for m in metas]))
    all_h = jnp.asarray(np.concatenate([m[3] for m in metas]))

    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    ok = mask & (rank < cap)
    dst = jnp.where(ok, rank, cap)

    def scatter(v):
        return jnp.zeros(cap + 1, v.dtype).at[dst].set(v, mode="drop")[:cap]

    n = jnp.minimum(jnp.sum(mask.astype(jnp.int32)), cap)
    return Rects(n=n.astype(jnp.int32), x=scatter(all_x), y=scatter(all_y),
                 w=scatter(all_w), h=scatter(all_h))


@functools.partial(jax.jit, static_argnames=("cascade", "scale"))
def lbp_window(cascade: LbpCascade, ii: jnp.ndarray, x: int, y: int, scale: float):
    """Single-window cascade evaluation — ``gs_lbp_window`` (grayskull.h:790-813).

    Returns a bool scalar.  Out-of-bounds windows are 0 like the reference.
    """
    ih, iw = ii.shape
    f = np.float32
    win_w = int(f(cascade.window_w) * f(scale))
    win_h = int(f(cascade.window_h) * f(scale))
    xs = jnp.asarray([x], jnp.int32)
    ys = jnp.asarray([y], jnp.int32)
    ok = _eval_windows(cascade, ii, ys, xs, float(scale))[0, 0]
    fits = (x + win_w <= iw) & (y + win_h <= ih)
    return ok & fits
