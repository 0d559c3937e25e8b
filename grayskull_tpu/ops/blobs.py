"""Connected components and blob analytics — ``gs_blobs`` / ``gs_blob_corners``
(/root/reference/grayskull.h:322-421).

The reference does a two-pass union-find with raster-order label creation.  That is
pointer-chasing — hostile to a vector machine — so the TPU formulation is iterative
**min-index label propagation**: on TPU a Pallas serpentine-strip kernel
(``kernels/ccl.py``) runs per-strip fixpoints entirely in VMEM; elsewhere packed-key
``cummax`` segmented scans (with a pair-scan + pointer-jump fallback past the 31-bit
key budget).  The reference's creation-order numbering comes from propagating the
component-min *seed rank* (TPU — no gather) or a rank-at-representative lookup
(fallback); per-label statistics contract on the MXU instead of scattering:

* a *seed* is a foreground pixel with no foreground left/top neighbor — exactly the
  pixels where the C code allocates a fresh label (grayskull.h:347-351);
* the union step always merges into the smaller root (grayskull.h:363), so a
  component's final C label is the creation rank of its first raster-order seed —
  which is the component's minimum raster index.

Hence: component representative = min raster index (what propagation computes),
label = rank of that position among all seeds.  Bit-exact vs the C oracle whenever
the number of seeds fits ``max_blobs`` (the C behavior past capacity — silently
skipping pixels mid-scan, grayskull.h:348 — is a degenerate mode we do not mirror;
``Blobs.overflowed`` flags it).

Foreground is ``pixel >= 128`` (grayskull.h:342).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import Blobs, Point, Rect, on_tpu as _on_tpu

__all__ = ["blobs", "label_components", "blob_corners"]


def _segmented_min_scans(L, bg, big):
    """Min-propagate labels along foreground runs of every row and column.

    One segmented associative scan covers an entire run in O(log n) passes —
    the workhorse replacing per-pixel neighbor propagation (which needs
    O(run length) iterations).  Background pixels are barriers.
    """

    def op(a, c):
        av, ab = a
        cv, cb = c
        return jnp.where(cb, cv, jnp.minimum(av, cv)), ab | cb

    out = L
    for axis in (1, 0):
        for reverse in (False, True):
            vv, _ = jax.lax.associative_scan((lambda a, c: op(a, c)), (out, bg),
                                             axis=axis, reverse=reverse)
            out = jnp.minimum(out, jnp.where(bg, big, vv))
    return out


def _aggregate_matmul(seg2d, nseg: int):
    """Per-label area / coordinate sums / bbox via one-hot MXU contractions.

    ``jax.ops.segment_*`` lowers to scatters, which serialize on TPU (the
    aggregation was ~70% of the document-scan latency).  Instead contract the
    label map's hi/lo 5-bit one-hots over rows and over columns on the MXU:

        count_x[x, label] = #pixels of `label` in column x   (contract over y)
        count_y[y, label] = #pixels of `label` in row y      (contract over x)

    Every blob statistic is then a small dense reduction: area = sum over x,
    sum_x = sum of x*count_x, bbox = first/last nonzero.  Counts <= max(H, W)
    < 2^24 stay exact in the f32 accumulator; one-hot x one-hot products are
    exact in bf16.  The coordinate sums are exact in int32 only while
    W*H*max(W,H) < 2^31 (frames up to ~1.3 MP); past that they wrap — which
    is *still* bit-identical to the reference, whose ``unsigned cx[]``
    accumulators (grayskull.h:334) wrap mod 2^32 the same way (int32 add/mul
    is two's-complement wraparound, the same residue).  The centroid division
    must therefore be UNSIGNED like C's ``cx[i] / area`` (grayskull.h:395);
    ``blobs`` casts through uint32 before dividing.
    """
    h, w = seg2d.shape
    hh = -(-nseg // 32)
    hi = seg2d >> 5
    lo = seg2d & 31
    big = jnp.int32(h * w)

    def counts(hiM, loM):
        # hiM/loM: (B, L) — returns (B, hh*32) int32 counts per batch row
        a = (hiM[:, None, :] == jnp.arange(hh)[None, :, None]).astype(jnp.bfloat16)
        b = (loM[:, :, None] == jnp.arange(32)[None, None, :]).astype(jnp.bfloat16)
        c = jnp.einsum("bhl,bls->bhs", a, b, preferred_element_type=jnp.float32)
        return c.astype(jnp.int32).reshape(hiM.shape[0], hh * 32)

    count_x = counts(hi.T, lo.T)[:, :nseg]  # (W, nseg)
    count_y = counts(hi, lo)[:, :nseg]      # (H, nseg)

    xs = jnp.arange(w, dtype=jnp.int32)[:, None]
    ys = jnp.arange(h, dtype=jnp.int32)[:, None]
    area = jnp.sum(count_x, axis=0)
    sum_x = jnp.sum(xs * count_x, axis=0)
    sum_y = jnp.sum(ys * count_y, axis=0)
    min_x = jnp.min(jnp.where(count_x > 0, xs, big), axis=0)
    max_x = jnp.max(jnp.where(count_x > 0, xs, -1), axis=0)
    min_y = jnp.min(jnp.where(count_y > 0, ys, big), axis=0)
    max_y = jnp.max(jnp.where(count_y > 0, ys, -1), axis=0)
    # label 0 aggregates background pixels; callers mask it out (is_rep)
    return area, sum_x, sum_y, min_x, min_y, max_x, max_y


def _aggregate_stats(seg2d, nseg: int):
    """Per-label area / coordinate sums / bbox of a dense label map.

    ``seg2d``: (H, W) int32 labels in [0, nseg); label 0 is background.
    Dispatches to the MXU one-hot contraction on TPU and ``jax.ops.segment_*``
    elsewhere (scatters are fine on CPU).  Also used per-shard by the
    space-sharded scanner (parallel/sparse.py) with local label maps.
    """
    if _on_tpu():
        return _aggregate_matmul(seg2d, nseg)
    h, w = seg2d.shape
    big = jnp.int32(h * w)
    seg = seg2d.reshape(-1)
    ones = (seg > 0).astype(jnp.int32)
    xs = jnp.tile(jnp.arange(w, dtype=jnp.int32), h)
    ys = jnp.repeat(jnp.arange(h, dtype=jnp.int32), w)
    area = jax.ops.segment_sum(ones, seg, num_segments=nseg)
    sum_x = jax.ops.segment_sum(xs * ones, seg, num_segments=nseg)
    sum_y = jax.ops.segment_sum(ys * ones, seg, num_segments=nseg)
    min_x = jax.ops.segment_min(jnp.where(ones > 0, xs, big), seg, num_segments=nseg)
    min_y = jax.ops.segment_min(jnp.where(ones > 0, ys, big), seg, num_segments=nseg)
    max_x = jax.ops.segment_max(jnp.where(ones > 0, xs, -1), seg, num_segments=nseg)
    max_y = jax.ops.segment_max(jnp.where(ones > 0, ys, -1), seg, num_segments=nseg)
    return area, sum_x, sum_y, min_x, min_y, max_x, max_y


def _packed_vbits(h: int, w: int):
    """Bit budget for the packed-key scan: value (min raster index, sentinel
    h*w) in the low bits, per-line run id above it, sign bit untouched.
    Returns the value width, or None when the geometry doesn't fit."""
    vbits = (h * w).bit_length()
    max_runs = max(h, w) // 2 + 2
    return vbits if max_runs < (1 << (31 - vbits)) else None


@jax.jit
def label_components(img: jnp.ndarray) -> jnp.ndarray:
    """Label 4-connected components of ``img >= 128``.

    Returns an int32 (H, W) map: background = -1, foreground = min raster index
    of the pixel's component.

    On TPU the fixpoint runs in the Pallas serpentine-strip kernel
    (``kernels.ccl``): each VMEM strip is propagated to a LOCAL fixpoint
    on-chip and boundary rows ride a scratch carry, so HBM sees each strip
    once per sweep instead of once per propagation round (the XLA path's
    round count is the component serpentine depth — 20+ on real documents).
    Frame edges are padded to the kernel's geometry with background (padding
    never joins components; label values use the unpadded raster indices).

    XLA fallback (any backend, frames up to ~2 MP): the segmented min-scan
    is ONE ``lax.cummax`` per direction over a packed key
    ``runid << vbits | ~value`` — run ids increase along the scan, so a
    later run's key always beats values leaking across a background gap,
    and within a run the max key is the min value.  Run ids are loop
    invariants (4 cumsums, computed once).  This halved the scan traffic vs
    the (value, barrier) pair formulation and beat pointer jumping (a
    full-image gather per iteration — gathers serialize on TPU) by 8x; even
    a 128-turn serpentine converges faster than the jump variant.
    """
    h, w = img.shape
    if _on_tpu():
        from ..kernels.ccl import ccl_pallas_available, ccl_serpentine

        hp = -(-h // 8) * 8
        wp = -(-w // 128) * 128
        if ccl_pallas_available(hp, wp):
            big = jnp.int32(2**30)
            fg = img >= 128
            idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
            L0 = jnp.where(fg, idx, big)
            L0p = jnp.pad(L0, ((0, hp - h), (0, wp - w)), constant_values=2**30)
            L, _sweeps = ccl_serpentine(L0p[None])
            return jnp.where(fg, L[0, :h, :w], jnp.int32(-1))
    big = jnp.int32(h * w)
    fg = img >= 128
    bg = ~fg
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    L0 = jnp.where(fg, idx, big)
    vbits = _packed_vbits(h, w)

    if vbits is not None:
        vmask = jnp.int32((1 << vbits) - 1)
        fgl = jnp.concatenate([jnp.zeros((h, 1), bool), fg[:, :-1]], 1)
        fgr = jnp.concatenate([fg[:, 1:], jnp.zeros((h, 1), bool)], 1)
        fgt = jnp.concatenate([jnp.zeros((1, w), bool), fg[:-1]], 0)
        fgb = jnp.concatenate([fg[1:], jnp.zeros((1, w), bool)], 0)
        rids = (
            (1, False, jnp.cumsum((fg & ~fgl).astype(jnp.int32), axis=1)),
            (1, True, jnp.cumsum((fg & ~fgr).astype(jnp.int32)[:, ::-1], axis=1)[:, ::-1]),
            (0, False, jnp.cumsum((fg & ~fgt).astype(jnp.int32), axis=0)),
            (0, True, jnp.cumsum((fg & ~fgb).astype(jnp.int32)[::-1], axis=0)[::-1]),
        )

        def body(state):
            L, _ = state
            out = L
            for axis, reverse, rid in rids:
                key = (rid << vbits) | (~out & vmask)
                m = jax.lax.cummax(key, axis=axis, reverse=reverse)
                out = jnp.minimum(out, jnp.where(bg, big, ~m & vmask))
            return out, jnp.any(out != L)

    else:

        def body(state):
            L, _ = state
            Ln = _segmented_min_scans(L, bg, big)
            # pointer jump: follow the current pointer one hop (L[L[p]])
            flat = L.reshape(-1)
            tgt = jnp.clip(Ln.reshape(-1), 0, h * w - 1)
            Lj = jnp.where(Ln.reshape(-1) < big, flat[tgt], big).reshape(h, w)
            Ln2 = jnp.minimum(Ln, Lj)
            return Ln2, jnp.any(Ln2 != L)

    def cond(state):
        return state[1]

    L, _ = jax.lax.while_loop(cond, body, (L0, jnp.bool_(True)))
    return jnp.where(fg, L, jnp.int32(-1))


@functools.partial(jax.jit, static_argnames=("max_blobs",))
def blobs(img: jnp.ndarray, max_blobs: int):
    """Connected components with stats — ``gs_blobs`` (grayskull.h:330-402).

    Returns ``(blobs_table, labels)`` where ``labels`` is the uint16 creation-order
    label map (0 = background) and ``blobs_table`` is a :class:`~grayskull_tpu.core.Blobs`
    fixed-capacity struct-of-arrays table in the reference's compaction order
    (ascending creation label).  ``blobs_table.n`` is the valid count.
    """
    h, w = img.shape
    cap = int(max_blobs)
    big = jnp.int32(h * w)
    fg = img >= 128

    # seeds: fg with no fg left/top neighbor (where C allocates labels)
    fg_left = jnp.concatenate([jnp.zeros((h, 1), bool), fg[:, :-1]], axis=1)
    fg_top = jnp.concatenate([jnp.zeros((1, w), bool), fg[:-1, :]], axis=0)
    seed = fg & ~fg_left & ~fg_top

    seed_flat = seed.reshape(-1)
    # 1-based creation rank at each seed position
    rank_flat = jnp.cumsum(seed_flat.astype(jnp.int32))
    n_seeds = rank_flat[-1]
    overflowed = n_seeds > cap

    from ..kernels.ccl import ccl_pallas_available, ccl_serpentine

    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    if _on_tpu() and ccl_pallas_available(hp, wp):
        # Propagate the component-min RANK directly (seeds carry their rank,
        # other foreground starts at the sentinel; ranks are raster-increasing
        # so the component min is its rep seed's rank == the C creation
        # label).  This replaces the full-frame rank[rep] gather — gathers
        # serialize on TPU and dominated blobs() at ~19 ms/frame (r3).
        # the kernel derives its barrier mask from value == 2**30, so
        # non-seed FOREGROUND must start strictly below the sentinel (any
        # filler > every real rank works; each component has >= 1 seed, so
        # the converged min is always a real rank)
        bigs = jnp.int32(2**30)
        filler = jnp.int32(2**30 - 1)
        R0 = jnp.where(seed, rank_flat.reshape(h, w), filler)
        R0 = jnp.where(fg, R0, bigs)
        R0p = jnp.pad(R0, ((0, hp - h), (0, wp - w)), constant_values=2**30)
        R, _ = ccl_serpentine(R0p[None])
        label_flat = jnp.where(fg, R[0, :h, :w], 0).reshape(-1)
    else:
        rep = label_components(img)  # -1 background, else min raster index
        rep_flat = jnp.clip(rep.reshape(-1), 0, h * w - 1)
        label_flat = jnp.where(fg.reshape(-1), rank_flat[rep_flat], 0)

    # segment aggregates keyed by creation label (0 = background / dropped)
    seg = jnp.where(label_flat <= cap, label_flat, 0)
    nseg = cap + 1
    area, sum_x, sum_y, min_x, min_y, max_x, max_y = _aggregate_stats(
        seg.reshape(h, w), nseg
    )

    # which creation labels are component representatives (survive compaction)?
    # a label is used iff its component's rep pixel carries it, so presence
    # (area > 0) is equivalent — and needs no 786k-element scatter.
    is_rep = (jnp.arange(nseg) > 0) & (area > 0)

    # compact in ascending label order
    order = jnp.cumsum(is_rep.astype(jnp.int32)) - 1  # destination row per label
    n = jnp.sum(is_rep).astype(jnp.int32)
    dst = jnp.where(is_rep, order, cap)  # cap row = scratch, dropped

    def scatter(vals, fill=0):
        out = jnp.full((cap + 1,), fill, vals.dtype)
        return out.at[dst].set(vals, mode="drop")[:cap]

    labels_r = jnp.arange(nseg, dtype=jnp.int32)
    t_label = scatter(labels_r)
    t_area = scatter(area)
    safe_area = jnp.maximum(t_area, 1)
    t_box = Rect(
        scatter(min_x), scatter(min_y),
        scatter(max_x - min_x + 1), scatter(max_y - min_y + 1),
    )
    # unsigned division like C (grayskull.h:395): the coordinate sums wrap
    # mod 2^32 on huge frames (see _aggregate_matmul) and C divides the
    # wrapped *unsigned* value, not a sign-extended one
    def udiv(s):
        return (s.astype(jnp.uint32) // safe_area.astype(jnp.uint32)).astype(jnp.int32)

    t_cent = Point(udiv(scatter(sum_x)), udiv(scatter(sum_y)))

    table = Blobs(n=n, label=t_label, area=t_area, box=t_box, centroid=t_cent)
    label_map = jnp.where(label_flat <= cap, label_flat, 0).reshape(h, w).astype(jnp.uint16)
    return table, label_map, overflowed


@jax.jit
def blob_corners(img: jnp.ndarray, labels: jnp.ndarray, label, box: Rect, centroid: Point):
    """Quad corner finder — ``gs_blob_corners`` (grayskull.h:404-421).

    Returns a (4, 2) int32 array of (x, y) rows: TL, TR, BR, BL — extremes of
    ``x+y`` and ``x-y`` over the blob's pixels inside its bbox, first-occurrence
    tie-breaks in raster order.  All blob fields may be traced (device-resident
    pipeline).  With no matching pixels every corner is the centroid, like C.
    """
    h, w = img.shape
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]
    ys = jnp.arange(h, dtype=jnp.int32)[:, None]
    bx = jnp.asarray(box.x, jnp.int32)
    by = jnp.asarray(box.y, jnp.int32)
    bw = jnp.asarray(box.w, jnp.int32)
    bh = jnp.asarray(box.h, jnp.int32)
    mask = (
        (img >= 128)
        & (labels.astype(jnp.int32) == jnp.asarray(label, jnp.int32))
        & (xs >= bx) & (xs < bx + bw) & (ys >= by) & (ys < by + bh)
    )
    s = (xs + ys).astype(jnp.int32)
    d = (xs - ys).astype(jnp.int32)
    big = jnp.int32(2 ** 30)

    def first_min(key):
        flat = jnp.where(mask, key, big).reshape(-1)
        i = jnp.argmin(flat).astype(jnp.int32)
        return i % w, i // w

    def first_max(key):
        flat = jnp.where(mask, key, -big).reshape(-1)
        i = jnp.argmax(flat).astype(jnp.int32)
        return i % w, i // w

    any_px = jnp.any(mask)
    cx = jnp.asarray(centroid.x, jnp.int32)
    cy = jnp.asarray(centroid.y, jnp.int32)

    def pick(p):
        x, y = p
        return jnp.where(any_px, x, cx), jnp.where(any_px, y, cy)

    tl = pick(first_min(s))
    br = pick(first_max(s))
    bl = pick(first_min(d))
    tr = pick(first_max(d))
    return jnp.stack([jnp.stack(tl), jnp.stack(tr), jnp.stack(br), jnp.stack(bl)])
