"""FAST-9 corners, ORB (oriented BRIEF) descriptors, Hamming matching —
``gs_fast`` / ``gs_compute_orientation`` / ``gs_brief_descriptor`` /
``gs_orb_extract`` / ``gs_match_orb`` (/root/reference/grayskull.h:482-699).

TPU formulation: dense masked scoring instead of branchy per-pixel loops —

* FAST: 16 shifted views of the frame, a 25-step vectorized run-length sweep for
  the 9-consecutive arc test (with the reference's unsigned-wraparound compare
  quirks preserved), dense 3x3 NMS, then scan-order table emission via packed
  inverse-index ``top_k`` (scatters serialize on TPU); the whole pass runs as
  one fused Pallas kernel on TPU (``kernels.fast``), XLA elsewhere;
* orientation/BRIEF: ONE shared 48x48 patch per keypoint (vmapped
  ``dynamic_slice`` of the zero-padded frame) feeds both the integer-exact
  moment masks and the rotated one-hot MXU sampling — no per-sample image
  gathers; rotations use contraction-proof float32 subs in exact mode;
* matching: XOR + popcount distance matrix (one dense (n1, n2) block) with the
  reference's best/second-best bookkeeping reproduced as masked reductions.

Reference quirks preserved (verified by differential tests):

* ``v < p - threshold`` in C promotes to *unsigned*: for pixels darker than the
  threshold the compare wraps and every circle sample counts as "darker"
  (grayskull.h:498) — so very dark pixels are corner candidates whose score is
  usually 0 (dropped by NMS), but not always;
* FAST's score is ``min |v_i - p|`` over ALL 16 circle pixels, not just the arc
  (grayskull.h:505-510);
* keypoints are emitted in raster-scan order, capped (grayskull.h:530);
* the ORB candidate sort is a *stable* descending bubble sort (grayskull.h:639);
* match acceptance is ``best <= max_dist && best < 0.8f * second`` with
  best/second initialized to ``max_dist + 1`` (grayskull.h:685-696).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core import Keypoints, Matches, on_tpu as _on_tpu
from ..exactf32 import f32_add, f32_sub
from ..libm32 import atan2f as _atan2f_impl, cosf_like_reference, sinf as _sinf_impl

__all__ = [
    "fast",
    "fast_scoremap",
    "compute_orientation",
    "brief_descriptor",
    "orb_extract",
    "hamming_distance",
    "match_orb",
    "BRIEF_PATTERN",
]

# FAST Bresenham circle of radius 3 (grayskull.h:485-486)
_CIRCLE_DX = (0, 1, 2, 3, 3, 3, 2, 1, 0, -1, -2, -3, -3, -3, -2, -1)
_CIRCLE_DY = (-3, -3, -2, -1, 0, 1, 2, 3, 3, 3, 2, 1, 0, -1, -2, -3)

_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "data")
# 256 (x1, y1, x2, y2) BRIEF test pairs (grayskull.h:541-605; standard ORB layout)
BRIEF_PATTERN = np.load(os.path.join(_DATA_DIR, "brief_pattern.npy"))


def _fast_score_slab(slab, threshold, gy0, h: int, w: int):
    """FAST-9 scores for a row slab of the full frame.

    ``slab`` is ``(R, w)`` uint8 covering global rows ``gy0-3 .. gy0+R-4``
    (zeros outside the frame); returns ``(R-6, w)`` uint8 scores for global
    rows ``gy0 .. gy0+R-7`` with the reference's 3-px interior mask applied
    in *global* coordinates (``gy0`` may be traced — the space-sharded path
    passes each shard's row offset).  Arithmetic is the exact ``gs_fast``
    pass 1 (grayskull.h:489-515) including the unsigned-wraparound compares.
    """
    rows = slab.shape[0] - 6
    p = slab[3 : 3 + rows].astype(jnp.uint32)
    thr = jnp.asarray(threshold, jnp.uint32)
    padded = jnp.pad(slab, ((0, 0), (3, 3))).astype(jnp.uint32)
    views = [padded[3 + dy : 3 + dy + rows, 3 + dx : 3 + dx + w]
             for dx, dy in zip(_CIRCLE_DX, _CIRCLE_DY)]
    # unsigned-wraparound compares, exactly like C (grayskull.h:496-498).
    # NOTE the C else-if chain: a sample can satisfy BOTH compares when p < thr
    # (p - thr wraps to a huge unsigned), and then "bright" wins.
    bright = [v > p + thr for v in views]
    dark = [(~b) & (v < p - thr) for v, b in zip(views, bright)]

    # 25-step run sweep over wrapped indices: run of >= 9 consecutive same-type
    run_b = jnp.zeros((rows, w), jnp.int32)
    run_d = jnp.zeros((rows, w), jnp.int32)
    corner = jnp.zeros((rows, w), bool)
    for i in range(16 + 9):
        k = i % 16
        run_b = jnp.where(bright[k], run_b + 1, 0)
        run_d = jnp.where(dark[k], run_d + 1, 0)
        corner = corner | (run_b >= 9) | (run_d >= 9)

    diffs = [jnp.abs(v.astype(jnp.int32) - p.astype(jnp.int32)) for v in views]
    min_diff = diffs[0]
    for d in diffs[1:]:
        min_diff = jnp.minimum(min_diff, d)
    score = jnp.where(corner, min_diff, 0)

    ys = jnp.arange(rows)[:, None] + jnp.asarray(gy0, jnp.int32)
    xs = jnp.arange(w)[None, :]
    interior = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    return jnp.where(interior, score, 0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=())
def fast_scoremap(img: jnp.ndarray, threshold) -> jnp.ndarray:
    """Dense FAST-9 score map (pass 1 of ``gs_fast``, grayskull.h:489-515).

    Returns a uint8 (H, W) map; the 3-px border is 0 (the reference never writes
    it — callers supply zeroed buffers).
    """
    h, w = img.shape
    return _fast_score_slab(jnp.pad(img, ((3, 3), (0, 0))), threshold, 0, h, w)


def _rank_scatter(mask_flat, cap, values):
    """Scatter values of masked positions into a cap-table in flat order."""
    rank = jnp.cumsum(mask_flat.astype(jnp.int32)) - 1
    ok = mask_flat & (rank < cap)
    dst = jnp.where(ok, rank, cap)
    outs = []
    for v in values:
        buf = jnp.zeros((cap + 1,) + v.shape[1:], v.dtype)
        outs.append(buf.at[dst].set(v, mode="drop")[:cap])
    n = jnp.minimum(jnp.sum(mask_flat.astype(jnp.int32)), cap)
    return n.astype(jnp.int32), outs


def _emit_packed_batched(key2: jnp.ndarray, k_out: int) -> jnp.ndarray:
    """(B, L) packed ``(inverse_rank << 8) | score`` int32 keys -> (B, k_out)
    descending packed values — the first ``k_out`` nonzero keys in scan order.

    ``approx_max_k`` cost grows ~linearly with k on the v5e
    (exp/results_amk_scaling.json: k=500 2.7 ms vs k=2000 5.5 ms over
    (16, 307200) keys), so emission is adaptive: one cheap survivor-count
    reduction picks the smallest k whose top-k provably loses nothing —
    any k >= max per-frame count keeps every survivor (tail slots are the
    zero keys either way), and the last branch's top-next_pow2(k_out)
    sliced to ``k_out`` is the exact top-k_out for ANY count (pow-2 k also
    measured ~9% faster than k=2000 outright).  Ranks are < 2^23 and unique,
    so f32 ``approx_max_k`` at ``recall_target=1.0`` is exact and sorted;
    dead slots gather score 0 because key==0 wherever rank==0."""
    _, L = key2.shape
    rk = (key2 >> 8).astype(jnp.float32)

    def emit_amk(k):
        def f(_):
            vals_f, idxs = jax.lax.approx_max_k(rk, k, recall_target=1.0)
            scores = jnp.take_along_axis(key2, idxs, axis=1) & 255
            v = (vals_f.astype(jnp.int32) << 8) | scores
            if k >= k_out:
                return v[:, :k_out]
            return jnp.pad(v, ((0, 0), (0, k_out - k)))
        return f

    def emit_topk(_):
        # sort ordering of the packed int key == rank ordering (ranks are
        # unique), and the score rides inside the value — no gather needed
        vals, _ = jax.lax.top_k(key2, k_out)
        return vals

    # COMPILER SAFETY: batched approx_max_k with k > 2048 SIGABRTs the v5e
    # backend for specific (batch, N, k) combos — (1, 307200, 3332) and
    # (1, *, 4096) crash TopkEmitter's windowed-r2 pipeline ("span_size
    # .RawSize() > 0 (0 vs 0)") while neighbors compile fine; the pattern is
    # not predictable from (N, k) alone (exp/exp_amk_scaling.py crash
    # matrix).  No k <= 2048 config has ever crashed, so amk branches are
    # capped there and anything larger uses the reliable sort-based
    # lax.top_k lowering (~22% slower — only dense frames pay it).
    kfull = min(1 << (k_out - 1).bit_length(), L)
    if kfull > k_out and kfull > k_out * 5 // 4:
        kfull = k_out  # pow-2 rounding only pays when it's a <=25% overshoot
    if k_out <= 2048:
        ks = [k for k in (512, 1024) if k < min(k_out, L)] + [min(kfull, 2048)]
        branches = [emit_amk(k) for k in ks]
    else:
        ks = [k for k in (512, 1024, 2048) if k < L] + [k_out]
        branches = [emit_amk(k) for k in ks[:-1]] + [emit_topk]
    if len(ks) == 1:
        return branches[0](None)
    counts = jnp.sum((key2 != 0).astype(jnp.int32), axis=1)
    m = jnp.max(counts)
    b = jnp.zeros((), jnp.int32)
    for kk in ks[:-1]:
        b = b + (m > kk).astype(jnp.int32)
    return jax.lax.switch(b, branches, None)


def _fast_table_from_vals(vals: jnp.ndarray, h: int, w: int):
    """(B, cap) packed emission values -> batched (n, x, y, response)."""
    row_valid = vals > 0
    n = jnp.sum(row_valid, axis=1).astype(jnp.int32)
    ridx = h * w - (vals >> 8)
    tx = jnp.where(row_valid, ridx % w, 0).astype(jnp.int32)
    ty = jnp.where(row_valid, ridx // w, 0).astype(jnp.int32)
    tr = jnp.where(row_valid, vals & 255, 0).astype(jnp.int32)
    return n, tx, ty, tr


def _emit_compact_gated(key3, red3, lost, k_out: int):
    """Emission over the kernel's folded key map, gated bit-exact.

    When no strip reported a fold loss the reduced map holds every key, so
    the adaptive-k emission runs over ~L/4 keys (the ORB pipeline's largest
    stage shrinks accordingly); any loss falls back to the full map.  The
    cond sits ABOVE any vmap on purpose — a vmapped cond lowers to select
    and would execute both branches."""
    B, h, w = key3.shape
    L = h * w
    Lr = red3.shape[1] * red3.shape[2]
    if Lr >= L:  # tiny frames: the fold floor (16 rows/strip) saves nothing
        return _emit_packed_batched(key3.reshape(B, L), k_out)
    k_red = min(k_out, Lr)

    def emit_red():
        v = _emit_packed_batched(red3.reshape(B, Lr), k_red)
        if k_out > k_red:
            # gate passed => survivor count <= Lr, so zero-padding is exact
            v = jnp.pad(v, ((0, 0), (0, k_out - k_red)))
        return v

    return jax.lax.cond(
        jnp.sum(lost) == 0,
        emit_red,
        lambda: _emit_packed_batched(key3.reshape(B, L), k_out),
    )


def _fast_batched_tpu(imgs: jnp.ndarray, cap: int, threshold):
    """Batched FAST tables via the LEAN fused kernel + compacted adaptive-k
    emission.

    The lean kernel writes only the folded key strips (no full-frame score
    or key maps — the r5 ablation measured those writes at ~half the kernel,
    exp/results_fast_ablate_r5.json); the bit-exactness fallback for fold
    losses re-runs the full kernel INSIDE the rare ``lost > 0`` cond branch,
    so natural frames never pay for it.  Callers gate on ``_on_tpu() and
    fast_pallas_available(h, w)`` (which implies ``h*w < 2^23``)."""
    from ..kernels.fast import fast_pallas, fast_pallas_lean

    B, h, w = imgs.shape
    threshold = jnp.maximum(jnp.asarray(threshold, jnp.int32), 0)
    red3, lost = fast_pallas_lean(imgs, threshold)
    L = h * w
    Lr = red3.shape[1] * red3.shape[2]
    k_out = min(cap, L)
    k_red = min(k_out, Lr)

    def emit_red():
        v = _emit_packed_batched(red3.reshape(B, Lr), k_red)
        if k_out > k_red:
            # gate passed => survivor count <= Lr, so zero-padding is exact
            v = jnp.pad(v, ((0, 0), (0, k_out - k_red)))
        return v

    def emit_full():
        _, key3 = fast_pallas(imgs, threshold)
        return _emit_packed_batched(key3.reshape(B, L), k_out)

    if Lr >= L:  # tiny frames: the fold floor (16 rows/strip) saves nothing
        vals = emit_full()
    else:
        vals = jax.lax.cond(jnp.sum(lost) == 0, emit_red, emit_full)
    if cap > L:
        vals = jnp.pad(vals, ((0, 0), (0, cap - L)))
    n, tx, ty, tr = _fast_table_from_vals(vals, h, w)
    return n, tx, ty, tr


@functools.partial(jax.jit, static_argnames=("max_kps",))
def fast(img: jnp.ndarray, max_kps: int, threshold):
    """FAST-9 with 3x3 NMS — ``gs_fast`` (grayskull.h:482-534).

    Returns a :class:`Keypoints` table (angle/descriptor zeroed) with up to
    ``max_kps`` corners in raster-scan order, plus the score map.

    On TPU a fused Pallas kernel produces the score map, the NMS mask and
    the packed scan-order keys in one VMEM pass (the XLA formulation streams
    ~140 full-frame intermediates through HBM).
    """
    h, w = img.shape
    cap = int(max_kps)
    # C's threshold parameter is `unsigned` (grayskull.h:482) — negative
    # values don't exist in its domain.  Clamp here so the XLA path (uint32
    # wrap arithmetic) and the Pallas kernel (int32 with an explicit wrap
    # mirror, valid for thr >= 0) can never diverge on out-of-domain input.
    threshold = jnp.maximum(jnp.asarray(threshold, jnp.int32), 0)
    from ..kernels.fast import fast_pallas_available, fast_pallas_compact

    if _on_tpu() and fast_pallas_available(h, w):
        score3, key3, red3, lost = fast_pallas_compact(img[None], threshold)
        score = score3[0]
        key = key3[0].reshape(-1)
        compact = (key3, red3, lost)
    else:
        compact = None
        score = fast_scoremap(img, threshold)
        s = score.astype(jnp.int32)
        sp = jnp.pad(s, 1)
        is_max = s > 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                is_max &= ~(sp[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w] > s)
        ys = jnp.arange(h)[:, None]
        xs = jnp.arange(w)[None, :]
        interior = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
        mask = (is_max & interior).reshape(-1)
        # scan-order emission WITHOUT a big scatter (scatters serialize on
        # TPU): pack (inverse raster index << 8) | score into one key — top_k
        # then yields the first `cap` corners in raster order, and the score
        # rides along free.  score <= 255 and h*w < 2^23 keep the packing
        # collision-free in int32.
        idx = jnp.arange(h * w, dtype=jnp.int32)
        if h * w < (1 << 23):
            key = jnp.where(mask, ((h * w - idx) << 8) | s.reshape(-1), 0)
        else:
            # huge frames: unpacked keys (the shift would overflow int32);
            # scores come from a tiny cap-sized gather instead
            key = jnp.where(mask, h * w - idx, 0)
    packed = h * w < (1 << 23)  # the Pallas gate implies this, so both paths agree
    k_out = min(cap, h * w)
    if compact is not None:
        # compacted adaptive-k emission over the kernel's folded key map
        # (~L/4 the keys), gated bit-exact on the fold-loss counters
        vals = _emit_compact_gated(*compact, k_out)[0]
    elif packed and _on_tpu():
        # exact adaptive-k approx_max_k emission (see _emit_packed_batched) —
        # measured 22% faster than lax.top_k at k=2000, and ~2x faster again
        # when the frame's survivor count fits a smaller k branch.
        vals = _emit_packed_batched(key[None], k_out)[0]
    else:
        vals, _ = jax.lax.top_k(key, k_out)
    if cap > h * w:
        vals = jnp.pad(vals, (0, cap - h * w))
    row_valid = vals > 0
    n = jnp.sum(row_valid).astype(jnp.int32)
    ridx = h * w - (vals >> 8) if packed else h * w - vals
    tx = jnp.where(row_valid, ridx % w, 0).astype(jnp.int32)
    ty = jnp.where(row_valid, ridx // w, 0).astype(jnp.int32)
    if packed:
        tr = jnp.where(row_valid, vals & 255, 0).astype(jnp.int32)
    else:
        safe = jnp.clip(ridx, 0, h * w - 1)
        tr = jnp.where(row_valid, score.reshape(-1)[safe].astype(jnp.int32), 0)
    return (
        Keypoints(
            n=n, x=tx, y=ty, response=tr,
            angle=jnp.zeros(cap, jnp.float32),
            descriptor=jnp.zeros((cap, 8), jnp.uint32),
        ),
        score,
    )


# --- orientation & descriptor ------------------------------------------------


def _orientation_single(img, x, y, r: int):
    """Intensity-centroid angle at one keypoint (grayskull.h:608-621)."""
    size = 2 * r + 1
    patch = jax.lax.dynamic_slice(
        img, (y - r, x - r), (size, size)
    ).astype(jnp.int32)
    dyy, dxx = np.mgrid[-r : r + 1, -r : r + 1]
    disc = (dxx * dxx + dyy * dyy) <= r * r
    # integer-exact sums (|m| < 2^24, so f32 conversion is exact)
    m01 = jnp.sum(jnp.where(disc, dyy * patch, 0))
    m10 = jnp.sum(jnp.where(disc, dxx * patch, 0))
    return _atan2f_impl(m01.astype(jnp.float32), m10.astype(jnp.float32))


def _orientation_maps(img, r: int):
    """Dense m01/m10 disc-moment maps, exact int32, gather-free.

    Per-keypoint patch gathers serialize on TPU (and a dense conv lowers
    poorly for a single channel), so the disc is decomposed by rows: with
    ``w(dy) = floor(sqrt(r^2 - dy^2))`` the moments are sums over 2r+1 rows of
    windowed row sums, which come from (weighted) row prefix sums as shifted
    slices.  Valid for keypoints >= r from the border (the C contract); border
    values are garbage-but-unused.
    """
    H, W = img.shape
    x = img.astype(jnp.int32)
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    # prefix sums with one leading zero column
    P = jnp.pad(jnp.cumsum(x, axis=1), ((0, 0), (1, 0)))
    U = jnp.pad(jnp.cumsum(cols * x, axis=1), ((0, 0), (1, 0)))
    # pad rows for dy shifts and columns for window ends (zeros: unused at borders)
    Pp = jnp.pad(P, ((r, r), (r, r)))
    Up = jnp.pad(U, ((r, r), (r, r)))
    xs = cols  # (1, W)

    m01 = jnp.zeros((H, W), jnp.int32)
    m10 = jnp.zeros((H, W), jnp.int32)
    for dy in range(-r, r + 1):
        wd = int(np.floor(np.sqrt(r * r - dy * dy)))
        rlo = r + dy
        s = (
            Pp[rlo : rlo + H, r + wd + 1 : r + wd + 1 + W]
            - Pp[rlo : rlo + H, r - wd : r - wd + W]
        )
        u = (
            Up[rlo : rlo + H, r + wd + 1 : r + wd + 1 + W]
            - Up[rlo : rlo + H, r - wd : r - wd + W]
        )
        m01 = m01 + dy * s
        m10 = m10 + (u - xs * s)
    return m01.astype(jnp.float32), m10.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("radius",))
def compute_orientation(img: jnp.ndarray, x, y, radius: int = 15):
    """Intensity-centroid orientation — ``gs_compute_orientation``.

    ``x, y`` may be scalars or arrays.  Keypoints must be >= radius from the
    border (asserted in C).  Array inputs use dense moment maps (MXU convs +
    two scalar gathers per keypoint); scalars use a single-patch reduction.
    """
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    if x.ndim == 0:
        return _orientation_single(img, x, y, radius)
    if x.shape[0] >= 32:
        m01, m10 = _orientation_maps(img, radius)
        return _atan2f_impl(m01[y, x], m10[y, x])
    return jax.vmap(lambda xx, yy: _orientation_single(img, xx, yy, radius))(x, y)


def _brief_single(img, x, y, angle):
    """256-bit rBRIEF descriptor for one keypoint (grayskull.h:623-637)."""
    from ..libm32 import exact_mode

    h, w = img.shape
    pat = jnp.asarray(BRIEF_PATTERN.astype(np.float32))  # (256, 4)
    sin_a = _sinf_impl(angle)
    cos_a = cosf_like_reference(angle)  # C uses gs_sin(a + 1.57079f), not cos
    # dx1 = px1*cos - py1*sin ...  In exact (parity) mode the adds fed by
    # products go through the contraction-proof emulated adder; the fast
    # default uses plain f32 ops (a potential FMA fusion shifts the rotated
    # offset by <=1 ulp, which the (int) truncation almost never notices —
    # the same tolerance already accepted for the libm trig).
    if exact_mode():
        dx1 = f32_sub(pat[:, 0] * cos_a, pat[:, 1] * sin_a)
        dy1 = f32_add(pat[:, 0] * sin_a, pat[:, 1] * cos_a)
        dx2 = f32_sub(pat[:, 2] * cos_a, pat[:, 3] * sin_a)
        dy2 = f32_add(pat[:, 2] * sin_a, pat[:, 3] * cos_a)
    else:
        dx1 = pat[:, 0] * cos_a - pat[:, 1] * sin_a
        dy1 = pat[:, 0] * sin_a + pat[:, 1] * cos_a
        dx2 = pat[:, 2] * cos_a - pat[:, 3] * sin_a
        dy2 = pat[:, 2] * sin_a + pat[:, 3] * cos_a
    x1 = x + dx1.astype(jnp.int32)  # C (int) cast truncates toward zero
    y1 = y + dy1.astype(jnp.int32)
    x2 = x + dx2.astype(jnp.int32)
    y2 = y + dy2.astype(jnp.int32)

    def sample(xx, yy):
        ok = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        v = img[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        return jnp.where(ok, v, 0).astype(jnp.int32)

    bits = (sample(x1, y1) > sample(x2, y2)).astype(jnp.uint32)  # (256,)
    weights = jnp.asarray((1 << np.arange(32, dtype=np.int64)).astype(np.uint32))
    return jnp.sum(bits.reshape(8, 32) * weights[None, :], axis=1, dtype=jnp.uint32)


# max |(int)(rotated pattern offset)|: pattern radius < 20.52 (grayskull.h:540-606),
# so truncated offsets stay in [-20, 20] and a 41-wide patch covers every sample
_BRIEF_PAD = 20
_BRIEF_PATCH = 48  # 41 rounded up to the sublane multiple

# pattern endpoints stacked (512,): p1 then p2
_PAT_X = jnp.asarray(np.concatenate([BRIEF_PATTERN[:, 0], BRIEF_PATTERN[:, 2]]).astype(np.float32))
_PAT_Y = jnp.asarray(np.concatenate([BRIEF_PATTERN[:, 1], BRIEF_PATTERN[:, 3]]).astype(np.float32))


def _extract_patches(img, x, y):
    """(N, 48, 48) uint8 patches, patch (r, c) = image(y - 20 + r, x - 20 + c)
    with zeros outside the frame (== ``gs_get`` OOB semantics)."""
    P = _BRIEF_PATCH
    # pad bottom/right past PAD so a slice starting at (y, x) never clamps
    imgp = jnp.pad(img, ((_BRIEF_PAD, P), (_BRIEF_PAD, P)))
    return jax.vmap(
        lambda xx, yy: jax.lax.dynamic_slice(imgp, (yy, xx), (P, P))
    )(x, y)


def _orientation_from_patches(patches, radius: int):
    """Intensity-centroid angles from pre-extracted 48x48 patches.

    Same integer moment sums as ``_orientation_single`` (exact: |m| <
    255*709*15 < 2^24), but N keypoints reduce against two static weight
    masks — no full-frame moment maps, no per-keypoint gathers.
    """
    r = radius
    assert r <= _BRIEF_PAD
    c = _BRIEF_PAD
    dy, dx = np.mgrid[-c : _BRIEF_PATCH - c, -c : _BRIEF_PATCH - c]
    disc = (dx * dx + dy * dy) <= r * r
    wy = jnp.asarray(np.where(disc, dy, 0).astype(np.int32))
    wx = jnp.asarray(np.where(disc, dx, 0).astype(np.int32))
    p = patches.astype(jnp.int32)
    m01 = jnp.sum(p * wy[None], axis=(1, 2))
    m10 = jnp.sum(p * wx[None], axis=(1, 2))
    return _atan2f_impl(m01.astype(jnp.float32), m10.astype(jnp.float32))


def _brief_offsets(angle):
    """Rotated, truncated, patch-relative sample offsets (N, 512) int32."""
    from ..libm32 import exact_mode

    sin_a = _sinf_impl(angle)[:, None]
    cos_a = cosf_like_reference(angle)[:, None]  # C uses gs_sin(a + 1.57079f)
    if exact_mode():
        dx1 = f32_sub(_PAT_X[None, :] * cos_a, _PAT_Y[None, :] * sin_a)
        dy1 = f32_add(_PAT_X[None, :] * sin_a, _PAT_Y[None, :] * cos_a)
    else:
        dx1 = _PAT_X[None, :] * cos_a - _PAT_Y[None, :] * sin_a
        dy1 = _PAT_X[None, :] * sin_a + _PAT_Y[None, :] * cos_a
    # C (int) casts truncate toward zero; +PAD makes them patch-relative
    dx = dx1.astype(jnp.int32) + _BRIEF_PAD  # (N, 512) in [0, 41)
    dy = dy1.astype(jnp.int32) + _BRIEF_PAD
    return dy, dx


def _brief_from_patches(patches, angle, corr=None):
    """512 rotated BRIEF samples per patch via one-hot row select (MXU) +
    one-hot column mask — no gathers.  See ``_brief_batch``.

    ``corr`` (optional (N,), (N,) int32) shifts each keypoint's patch-relative
    sample offsets — used by ``_brief_batch`` to keep out-of-bounds keypoints
    bit-exact (offsets that land outside the 48x48 patch produce an all-zero
    one-hot row, i.e. a zero sample — exactly ``gs_get``'s OOB-read-0).
    """
    dy, dx = _brief_offsets(angle)
    if corr is not None:
        dy = dy + corr[0][:, None]
        dx = dx + corr[1][:, None]

    # NOTE: a Pallas per-keypoint sampler (block-diagonal one-hot matmuls in
    # VMEM) was measured SLOWER than this batched einsum on v5e — 128 serial
    # (512,48)@(48,48) matmuls underutilize the MXU; XLA's batched lowering
    # wins despite the HBM one-hot traffic.
    P = _BRIEF_PATCH
    ar = jnp.arange(P)
    oh_y = (dy[:, :, None] == ar[None, None, :]).astype(jnp.bfloat16)
    oh_x = (dx[:, :, None] == ar[None, None, :]).astype(jnp.float32)
    rows = jnp.einsum(
        "nkp,npq->nkq", oh_y, patches.astype(jnp.int32).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (N, 512, P) — exact: one-hot x uint8
    vals = jnp.sum(rows * oh_x, axis=-1)  # (N, 512)

    bits = (vals[:, :256] > vals[:, 256:]).astype(jnp.uint32)
    weights = jnp.asarray((1 << np.arange(32, dtype=np.int64)).astype(np.uint32))
    return jnp.sum(bits.reshape(-1, 8, 32) * weights[None, None, :], axis=2,
                   dtype=jnp.uint32)


def _brief_batch(img, x, y, angle):
    """Batched rBRIEF, gather-free (VERDICT r1 #4).

    Per-keypoint scalar image gathers serialize on TPU, so the batched path
    samples through dense algebra instead:

    * one 48x48 patch per keypoint via ``dynamic_slice`` of the zero-padded
      image (zero padding == ``gs_get`` OOB-reads-return-0; reference call
      sites guarantee a 15 px border, grayskull.h:661, and offsets are <= 20);
    * the 512 rotated samples become a one-hot **row select** contracted on
      the MXU (bf16 is exact for uint8 values) followed by a one-hot column
      mask reduction — no gathers anywhere.

    Out-of-bounds keypoints are exact too: the patch is extracted at the
    nearest representable position and the per-keypoint offset correction
    shifts the sample indices back, so samples whose true image coordinate is
    OOB fall outside the patch's one-hot range and read 0 — ``gs_get``
    semantics, matching the scalar ``_brief_single`` path bit-for-bit.
    """
    h, w = img.shape
    cy = jnp.clip(y, 0, h + _BRIEF_PAD)
    cx = jnp.clip(x, 0, w + _BRIEF_PAD)
    patches = _extract_patches(img, cx, cy)
    return _brief_from_patches(patches, angle, corr=(y - cy, x - cx))


@jax.jit
def brief_descriptor(img: jnp.ndarray, x, y, angle):
    """Rotated BRIEF descriptor(s) — ``gs_brief_descriptor`` (grayskull.h:623-637).

    Returns (8,) uint32 for scalars or (N, 8) for arrays.  The array path is
    the gather-free batched formulation (requires in-bounds keypoints, the C
    border contract); the scalar path samples a single patch directly.
    """
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    angle = jnp.asarray(angle, jnp.float32)
    if x.ndim == 0:
        return _brief_single(img, x, y, angle)
    return _brief_batch(img, x, y, angle)


@functools.partial(jax.jit, static_argnames=("max_kps",))
def orb_extract(img: jnp.ndarray, max_kps: int, threshold, limit=None):
    """Full ORB extraction — ``gs_orb_extract`` (grayskull.h:651-669).

    ``img`` may be (H, W) or a batch (N, H, W) — batched extraction vmaps the
    whole chain (one keypoint table per frame), amortizing TPU dispatch.

    FAST with a 4x candidate budget (capped at 5000), stable sort by response
    descending, border filter (radius 15), then orientation + descriptor for the
    top ``max_kps``.  ``limit`` optionally caps the *count* dynamically (a traced
    scalar <= max_kps) — used by the pyramid pipeline, whose per-level budget
    depends on how many keypoints earlier levels produced (nanomagick.c:275-277);
    the candidate budget stays ``min(4 * max_kps, 5000)`` like a C caller passing
    the dynamic ``nkps`` would get.
    """
    from ..kernels.patches import extract_patches_batched, patches_pallas_available

    h, w = img.shape[-2:]
    cap = int(max_kps)
    radius = 15
    use_kernel = _on_tpu() and patches_pallas_available(h, w)
    if img.ndim == 3 or use_kernel:
        # batched path: candidate selection vmaps per frame; the patch
        # extraction runs BATCHED in the Pallas window-select kernel (the
        # vmapped dynamic_slice gather was the dominant ORB stage, r3)
        imgs = img[None] if img.ndim == 2 else img
        from ..kernels.fast import fast_pallas_available

        if _on_tpu() and fast_pallas_available(h, w):
            # one batched kernel + adaptive emission for the whole batch
            n, tx, ty, tr = _orb_select_batched_tpu(imgs, cap, threshold, limit)
        elif limit is not None and jnp.ndim(limit) == 1:
            # per-frame dynamic budgets (the batched pyramid pipeline)
            n, tx, ty, tr = jax.vmap(
                lambda im, lm: _orb_select(im, cap, threshold, lm)
            )(imgs, jnp.asarray(limit, jnp.int32))
        else:
            n, tx, ty, tr = jax.vmap(
                lambda im: _orb_select(im, cap, threshold, limit)
            )(imgs)
        safe_x = jnp.clip(tx, radius, w - radius - 1)
        safe_y = jnp.clip(ty, radius, h - radius - 1)
        if use_kernel:
            patches = extract_patches_batched(imgs, safe_x, safe_y)
        else:
            patches = jax.vmap(_extract_patches)(imgs, safe_x, safe_y)
        angle = jax.vmap(lambda p: _orientation_from_patches(p, radius))(patches)
        desc = jax.vmap(_brief_from_patches)(patches, angle)
        row_ok = jnp.arange(cap)[None, :] < n[:, None]
        angle = jnp.where(row_ok, angle, 0.0)
        desc = jnp.where(row_ok[:, :, None], desc, 0)
        out = Keypoints(n=n, x=tx, y=ty, response=tr, angle=angle, descriptor=desc)
        if img.ndim == 2:
            return Keypoints(*(v[0] for v in out))
        return out
    n, tx, ty, tr = _orb_select(img, cap, threshold, limit)
    # compute angle/descriptor for all cap rows (invalid rows clamp to center);
    # one shared patch extraction feeds both (moment masks + rotated sampling)
    safe_x = jnp.clip(tx, radius, w - radius - 1)
    safe_y = jnp.clip(ty, radius, h - radius - 1)
    patches = _extract_patches(img, safe_x, safe_y)
    angle = _orientation_from_patches(patches, radius)
    desc = _brief_from_patches(patches, angle)
    row_valid = jnp.arange(cap) < n
    angle = jnp.where(row_valid, angle, 0.0)
    desc = jnp.where(row_valid[:, None], desc, 0)
    return Keypoints(n=n, x=tx, y=ty, response=tr, angle=angle, descriptor=desc)


def _select_candidates_sort(kps, valid, cap: int, radius: int, h: int, w: int):
    """Reference formulation of ``gs_orb_extract``'s candidate selection:
    stable descending sort on response, border filter, rank-scatter compact."""
    key = jnp.where(valid, -kps.response, 1)
    order = jnp.argsort(key, stable=True)
    sx = kps.x[order]
    sy = kps.y[order]
    sr = kps.response[order]
    sv = valid[order]
    border_ok = (sx >= radius) & (sy >= radius) & (sx < w - radius) & (sy < h - radius)
    n, (tx, ty, tr) = _rank_scatter(sv & border_ok, cap, (sx, sy, sr))
    return n, tx, ty, tr


def _select_candidates_approx(kps, valid, cap: int, radius: int, h: int, w: int):
    """TPU formulation, same table bit-for-bit: the selection IS "top ``cap``
    border-ok candidates by (response desc, candidate scan order asc)" — one
    exact ``approx_max_k`` over packed keys ``response << 13 | inverse_rank``
    (< 2^21, so f32-exact and tie-free) replaces the stable argsort + 4
    gathers + rank-scatter compaction.  The 13-bit rank field must cover
    ``cand_cap`` (<= 5000 by ``_orb_select``'s budget; a narrower field would
    let the rank overflow into the response bits and invert the order).
    Border filtering commutes with selection because it depends only on
    (x, y), so it masks the keys up front.  ``tests/test_features.py`` pins
    this equal to the sort path."""
    cand_cap = kps.x.shape[0]
    assert cand_cap < (1 << 13), cand_cap
    border_ok = ((kps.x >= radius) & (kps.y >= radius)
                 & (kps.x < w - radius) & (kps.y < h - radius))
    inv = cand_cap - jnp.arange(cand_cap, dtype=jnp.int32)
    packed = jnp.where(valid & border_ok, (kps.response << 13) | inv, 0)
    k_out = min(cap, cand_cap)
    if k_out <= 2048:
        vals_f, idxs = jax.lax.approx_max_k(
            packed.astype(jnp.float32), k_out, recall_target=1.0)
        vals = vals_f.astype(jnp.int32)
    else:
        # k > 2048 amk can SIGABRT the backend (see _emit_packed_batched);
        # under vmap this call lowers batched, so the same guard applies
        vals, idxs = jax.lax.top_k(packed, k_out)
    if cap > cand_cap:
        vals = jnp.pad(vals, (0, cap - cand_cap))
        idxs = jnp.pad(idxs, (0, cap - cand_cap))
    row_ok = vals > 0
    n = jnp.sum(row_ok).astype(jnp.int32)
    tx = jnp.where(row_ok, kps.x[idxs], 0)
    ty = jnp.where(row_ok, kps.y[idxs], 0)
    tr = jnp.where(row_ok, kps.response[idxs], 0)
    return n, tx, ty, tr


def _select_candidates_approx_b(x, y, resp, valid, cap: int, radius: int,
                                h: int, w: int):
    """Natively batched ``_select_candidates_approx`` over (B, cand_cap)
    tables — one batched exact ``approx_max_k`` instead of a vmapped one."""
    _, cand_cap = x.shape
    assert cand_cap < (1 << 13), cand_cap
    border_ok = ((x >= radius) & (y >= radius)
                 & (x < w - radius) & (y < h - radius))
    inv = cand_cap - jnp.arange(cand_cap, dtype=jnp.int32)
    packed = jnp.where(valid & border_ok, (resp << 13) | inv[None, :], 0)
    k_out = min(cap, cand_cap)
    if k_out <= 2048:
        vals_f, idxs = jax.lax.approx_max_k(
            packed.astype(jnp.float32), k_out, recall_target=1.0)
        vals = vals_f.astype(jnp.int32)
    else:
        # batched amk with k > 2048 can SIGABRT the backend compiler for
        # specific shapes (see _emit_packed_batched) — top_k is safe and
        # cand_cap <= 5000 keys make the sort cheap
        vals, idxs = jax.lax.top_k(packed, k_out)
    if cap > cand_cap:
        vals = jnp.pad(vals, ((0, 0), (0, cap - cand_cap)))
        idxs = jnp.pad(idxs, ((0, 0), (0, cap - cand_cap)))
    row_ok = vals > 0
    n = jnp.sum(row_ok, axis=1).astype(jnp.int32)
    tx = jnp.where(row_ok, jnp.take_along_axis(x, idxs, axis=1), 0)
    ty = jnp.where(row_ok, jnp.take_along_axis(y, idxs, axis=1), 0)
    tr = jnp.where(row_ok, jnp.take_along_axis(resp, idxs, axis=1), 0)
    return n, tx, ty, tr


def _orb_select_batched_tpu(imgs, cap: int, threshold, limit=None):
    """Batched ``_orb_select`` on the TPU fast path: the fused FAST kernel,
    ONE adaptive-k emission and ONE batched selection for the whole batch
    (the vmapped per-frame form can't use the adaptive emission — a
    data-dependent ``lax.switch`` under vmap executes every branch).

    ``limit``: None, a traced scalar, or a (B,) vector of per-frame caps."""
    B, h, w = imgs.shape
    cand_cap = min(cap * 4, 5000)
    radius = 15
    n_cand, tx, ty, tr = _fast_batched_tpu(imgs, cand_cap, threshold)
    if limit is not None:
        lims = jnp.broadcast_to(jnp.asarray(limit, jnp.int32), (B,))
        n_cand = jnp.minimum(n_cand, jnp.minimum(lims * 4, 5000))
    valid = jnp.arange(cand_cap)[None, :] < n_cand[:, None]
    n, sx, sy, sr = _select_candidates_approx_b(
        tx, ty, tr, valid, cap, radius, h, w)
    if limit is not None:
        lim = jnp.minimum(jnp.broadcast_to(jnp.asarray(limit, jnp.int32), (B,)),
                          cap)
        n = jnp.minimum(n, lim)
        row_ok = jnp.arange(cap)[None, :] < n[:, None]
        sx = jnp.where(row_ok, sx, 0)
        sy = jnp.where(row_ok, sy, 0)
        sr = jnp.where(row_ok, sr, 0)
    return n, sx, sy, sr


def _orb_select(img, cap: int, threshold, limit=None):
    """FAST candidates -> stable response sort -> border filter -> compacted
    (n, x, y, response) table — ``gs_orb_extract``'s selection stage."""
    h, w = img.shape
    cand_cap = min(cap * 4, 5000)
    radius = 15
    kps, _ = fast(img, cand_cap, threshold)
    n_cand = kps.n
    if limit is not None:
        # C computes the candidate budget from the dynamic nkps: min(4*nkps, 5000)
        n_cand = jnp.minimum(
            n_cand, jnp.minimum(jnp.asarray(limit, jnp.int32) * 4, 5000)
        )
    valid = jnp.arange(cand_cap) < n_cand
    select = _select_candidates_approx if _on_tpu() else _select_candidates_sort
    n, tx, ty, tr = select(kps, valid, cap, radius, h, w)
    if limit is not None:
        lim = jnp.minimum(jnp.asarray(limit, jnp.int32), cap)
        n = jnp.minimum(n, lim)
        row_ok = jnp.arange(cap) < n
        tx = jnp.where(row_ok, tx, 0)
        ty = jnp.where(row_ok, ty, 0)
        tr = jnp.where(row_ok, tr, 0)
    return n, tx, ty, tr


# --- matching ---------------------------------------------------------------


@jax.jit
def hamming_distance(desc1: jnp.ndarray, desc2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 256-bit Hamming distances — ``gs_hamming_distance``
    (grayskull.h:671-678).  (n1, 8) x (n2, 8) uint32 -> (n1, n2) int32."""
    x = desc1[:, None, :] ^ desc2[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_matches",))
def match_orb(kps1: Keypoints, kps2: Keypoints, max_matches: int, max_distance):
    """Brute-force best/second-best descriptor matching with Lowe ratio test —
    ``gs_match_orb`` (grayskull.h:680-699)."""
    cap = int(max_matches)
    maxd = jnp.asarray(max_distance, jnp.float32)
    sent = maxd + jnp.float32(1.0)
    n1cap = kps1.descriptor.shape[0]
    n2cap = kps2.descriptor.shape[0]
    d = hamming_distance(kps1.descriptor, kps2.descriptor).astype(jnp.float32)
    valid2 = (jnp.arange(n2cap) < kps2.n)[None, :]
    inf = jnp.float32(np.inf)
    dv = jnp.where(valid2, d, inf)
    b1 = jnp.min(dv, axis=1)
    best_idx = jnp.argmin(dv, axis=1).astype(jnp.int32)  # first occurrence of min
    # second smallest among valid (excluding one instance of the min)
    dv2 = dv.at[jnp.arange(n1cap), best_idx].set(inf)
    b2 = jnp.min(dv2, axis=1)
    # fold in the two sentinels (initial best/second = max_distance + 1)
    best = jnp.minimum(b1, sent)
    second = jnp.where(b1 <= sent, jnp.minimum(b2, sent), sent)
    accept = (best <= maxd) & (best < jnp.float32(0.8) * second)
    valid1 = jnp.arange(n1cap) < kps1.n
    mask = accept & valid1 & (b1 < inf)
    n, (ti1, ti2, td) = _rank_scatter(
        mask, cap,
        (jnp.arange(n1cap, dtype=jnp.int32), best_idx, best.astype(jnp.int32)),
    )
    return Matches(n=n, idx1=ti1, idx2=ti2, distance=td)
