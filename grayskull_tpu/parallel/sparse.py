"""Sharded sparse stages: distributed blob labeling, keypoint matching, and
LBP window grids (SURVEY.md §2.3 rows 3-5).

The reference is single-threaded scalar C; these are the mesh-parallel
counterparts of its irregular algorithms, bit-exact vs the single-device ops
(asserted on an 8-virtual-device CPU mesh by tests/test_parallel_sparse.py):

* :func:`label_components_sharded` — H-sharded connected components: each
  shard min-propagates labels (global raster indices) inside its slab, then a
  fixpoint of boundary min-exchanges over ``ppermute`` merges components that
  cross shard boundaries (``gs_blobs``' union-find becomes a distributed
  min-reduction; cf. grayskull.h:322-402).
* :func:`match_orb_sharded` — the O(n1*n2) Hamming-distance matrix sharded
  over query rows; each chip matches its queries against the *gathered*
  target descriptor table, and the tiny accept/emit bookkeeping is replayed
  replicated from all-gathered per-shard results (gs_match_orb,
  grayskull.h:680-699).
* :func:`lbp_detect_sharded` — the multi-scale window grid sharded by row
  bands: each chip evaluates the cascade on its band of windows (integral
  values are global prefix sums, so a band plus one guard row evaluates
  anywhere in the frame), and the per-scale hit masks are all-gathered for
  the reference-ordered emission (gs_lbp_detect, grayskull.h:815-835).
* :func:`orb_extract_spatial` — ``gs_orb_extract`` on one H-sharded frame:
  per-shard FAST + gathered scan-order keys + psum-routed patches
  (grayskull.h:651-669).
* :func:`blobs_sharded` — distributed ``gs_blobs`` statistics: per-shard
  one-hot aggregation merged by global representative with C
  creation-order numbering (grayskull.h:330-402).
* :func:`scan_spatial_shardmap` — the whole document scanner on one
  H-sharded frame: distributed binarize/CCL/stats/corners plus a
  band-sharded warp (nanomagick.c:186-210).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core import Keypoints, Matches, Rects
from .halo import exchange_halo

__all__ = [
    "label_components_sharded",
    "blobs_sharded",
    "match_orb_sharded",
    "lbp_detect_sharded",
    "orb_extract_spatial",
    "scan_spatial_shardmap",
    "detect_faces_sharded",
]


# --------------------------------------------------------------------------
# distributed connected components
# --------------------------------------------------------------------------


def _local_propagate(L, bg, big, row0, w):
    """Min-propagate labels to a fixpoint inside one slab.

    Same segmented scans + pointer jumping as ops.blobs.label_components, but
    labels are *global* raster indices; the pointer jump only follows targets
    that fall inside this slab.
    """
    from ..ops.blobs import _segmented_min_scans

    h_loc = L.shape[0]
    lo = row0 * w
    hi = lo + h_loc * w

    def body(state):
        Lc, _ = state
        Ln = _segmented_min_scans(Lc, bg, big)
        flat = Lc.reshape(-1)
        tgt = Ln.reshape(-1)
        in_slab = (tgt >= lo) & (tgt < hi)
        jumped = jnp.where(in_slab, flat[jnp.clip(tgt - lo, 0, h_loc * w - 1)], big)
        Ln2 = jnp.minimum(Ln, jumped.reshape(h_loc, -1))
        return Ln2, jnp.any(Ln2 != Lc)

    # initial flag derived from the sharded data so the carry's varying
    # manual axes match the body output under shard_map
    L, _ = jax.lax.while_loop(lambda s: s[1], body, (L, jnp.any(L <= big)))
    return L


def _label_sharded_body(img_local, *, w: int, space_axis: str):
    """(h_loc, w) uint8 slab -> (h_loc, w) int32 global min-index labels."""
    h_loc = img_local.shape[0]
    nsh = lax.axis_size(space_axis)
    idx = lax.axis_index(space_axis)
    row0 = idx.astype(jnp.int32) * h_loc
    big = jnp.int32(np.int32(2**31 - 1))

    fg = img_local >= 128
    bg = ~fg
    gidx = (jnp.arange(h_loc, dtype=jnp.int32)[:, None] + row0) * w + jnp.arange(
        w, dtype=jnp.int32
    )[None, :]
    L = jnp.where(fg, gidx, big)
    L = _local_propagate(L, bg, big, row0, w)

    fwd = [(i, (i + 1) % nsh) for i in range(nsh)]
    bwd = [(i, (i - 1) % nsh) for i in range(nsh)]

    def round_body(state):
        Lc, _ = state
        # 4-connectivity: vertical neighbors across the boundary (same column)
        from_prev = lax.ppermute(Lc[-1:, :], space_axis, fwd)  # prev slab's last row
        from_next = lax.ppermute(Lc[:1, :], space_axis, bwd)  # next slab's first row
        from_prev = jnp.where(idx == 0, big, from_prev)
        from_next = jnp.where(idx == nsh - 1, big, from_next)
        top = jnp.where(fg[:1, :], jnp.minimum(Lc[:1, :], from_prev), Lc[:1, :])
        bot = jnp.where(fg[-1:, :], jnp.minimum(Lc[-1:, :], from_next), Lc[-1:, :])
        Ln = Lc.at[0:1, :].set(top).at[h_loc - 1 : h_loc, :].set(bot)
        Ln = _local_propagate(Ln, bg, big, row0, w)
        changed = lax.psum(jnp.any(Ln != Lc).astype(jnp.int32), space_axis) > 0
        return Ln, changed

    # psum makes `changed` invariant across shards; init matches (plain bool)
    L, _ = jax.lax.while_loop(lambda s: s[1], round_body, (L, jnp.bool_(True)))
    return jnp.where(fg, L, jnp.int32(-1))


def label_components_sharded(img, mesh: Mesh, space_axis: str = "space"):
    """H-sharded 4-connected labeling, bit-identical to ``label_components``.

    ``img``: (H, W) uint8 with H divisible by the space axis; returns the
    (H, W) int32 min-raster-index label map, sharded along H.
    """
    h, w = img.shape
    body = functools.partial(_label_sharded_body, w=w, space_axis=space_axis)
    spec = P(space_axis, None)
    fn = shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec)
    img = jax.device_put(img, NamedSharding(mesh, spec))
    return jax.jit(fn)(img)


# --------------------------------------------------------------------------
# space-sharded document scanner
# --------------------------------------------------------------------------


def _binarize_sharded(img_local, h: int, w: int, axis: str):
    """The scanner's binarization (nanomagick.c:190-191) on one H-shard:
    blur(1) with halo exchange + psum histogram Otsu, threshold at
    ``(otsu + 10) mod 256`` (the reference's uint8 parameter wrap)."""
    from ..ops.histogram import otsu_from_histogram

    r = 1
    h_loc = img_local.shape[0]
    idx = lax.axis_index(axis)
    row0 = idx.astype(jnp.int32) * h_loc
    x = exchange_halo(img_local.astype(jnp.int32), r, axis)
    px = jnp.pad(x, ((0, 0), (r, r)))
    rowsum = px[:, 0:w]
    for k in range(1, 2 * r + 1):
        rowsum = rowsum + px[:, k : k + w]
    colsum = rowsum[0:h_loc, :]
    for k in range(1, 2 * r + 1):
        colsum = colsum + rowsum[k : k + h_loc, :]
    gi = jnp.arange(h_loc, dtype=jnp.int32) + row0
    cy = (jnp.minimum(gi + r, h - 1) - jnp.maximum(gi - r, 0) + 1)
    cxv = np.arange(w)
    cx = jnp.asarray(
        (np.minimum(cxv + r, w - 1) - np.maximum(cxv - r, 0) + 1).astype(np.int32)
    )
    blurred = (colsum // (cy[:, None] * cx[None, :])).astype(jnp.uint8)

    flat = blurred.reshape(1, -1)
    local_hist = jax.vmap(lambda f: jnp.bincount(f, length=256))(
        flat.astype(jnp.int32)
    )[0]
    hist = lax.psum(local_hist, axis)
    t = otsu_from_histogram(hist.astype(jnp.uint32), h * w)
    tw = ((t.astype(jnp.int32) + 10) % 256).astype(jnp.uint8)
    binary = jnp.where(blurred > tw, jnp.uint8(255), jnp.uint8(0))
    return binary


def _first_extreme_sharded(mask, key, row0, w: int, axis: str, want_max: bool):
    """Global first-occurrence (raster order) arg-extreme of ``key`` over
    ``mask`` on an H-sharded frame.  Returns (x, y, found)."""
    h_loc = mask.shape[0]
    big = jnp.int32(2**30)
    if want_max:
        flat = jnp.where(mask, key, -big).reshape(-1)
        i = jnp.argmax(flat).astype(jnp.int32)
    else:
        flat = jnp.where(mask, key, big).reshape(-1)
        i = jnp.argmin(flat).astype(jnp.int32)
    val = flat[i]
    has = jnp.any(mask)
    gidx = jnp.where(has, row0 * w + i, jnp.int32(2**30))
    vals = lax.all_gather(val, axis)  # (nsh,)
    gidxs = lax.all_gather(gidx, axis)
    hass = lax.all_gather(has, axis)
    vbest = (jnp.max(jnp.where(hass, vals, -big)) if want_max
             else jnp.min(jnp.where(hass, vals, big)))
    cand = hass & (vals == vbest)
    gsel = jnp.min(jnp.where(cand, gidxs, jnp.int32(2**30)))
    return gsel % w, gsel // w, jnp.any(hass)


def _shard_blob_rows(binary, L, row0, w: int, cap: int, axis: str):
    """Per-shard blob-statistic rows keyed by global representative.

    Aggregates this shard's slab over slab-local dense labels (one-hot MXU
    contraction on TPU), tags each row with its component's global rep (the
    min raster index from the sharded CCL) and, on the shard owning the rep,
    the C creation-order label (global seed rank).  Returns per-slab-label
    arrays of length ``cap_loc`` ready for :func:`_merge_blob_rows`.
    """
    from ..ops.blobs import _aggregate_stats

    h_loc = binary.shape[0]
    nsh = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    big = jnp.int32(np.int32(2**31 - 1))
    fg = binary >= 128
    bg = ~fg
    gidx = (jnp.arange(h_loc, dtype=jnp.int32)[:, None] + row0) * w + jnp.arange(
        w, dtype=jnp.int32
    )[None, :]
    Lloc = _local_propagate(jnp.where(fg, gidx, big), bg, big, row0, w)

    fg_left = jnp.concatenate([jnp.zeros((h_loc, 1), bool), fg[:, :-1]], axis=1)
    fg_top_slab = jnp.concatenate([jnp.zeros((1, w), bool), fg[:-1, :]], axis=0)
    seeds_slab = fg & ~fg_left & ~fg_top_slab  # slab connectivity (row 0 cut)
    # global seeds: row 0 needs the previous shard's last row
    prev_last = lax.ppermute(fg[-1:, :], axis, [(i, (i + 1) % nsh) for i in range(nsh)])
    prev_last = jnp.where(idx == 0, False, prev_last)
    fg_top_glob = jnp.concatenate([prev_last, fg[:-1, :]], axis=0)
    seeds_glob = fg & ~fg_left & ~fg_top_glob

    # Slab row cuts create EXTRA slab seeds (a run entering from above turns
    # its first row-0 pixel into a slab seed): bound them by the max number
    # of runs in one row so no <=cap-global-seed component ever drops pixels.
    cap_loc = cap + w // 2 + 1

    rank_slab = jnp.cumsum(seeds_slab.reshape(-1).astype(jnp.int32))  # 1-based
    rep_off = jnp.clip(Lloc.reshape(-1) - row0 * w, 0, h_loc * w - 1)
    dense = jnp.where(fg.reshape(-1), rank_slab[rep_off], 0)
    dense = jnp.where(dense <= cap_loc, dense, 0).reshape(h_loc, w)

    area, sum_x, sum_y, min_x, min_y, max_x, max_y = _aggregate_stats(dense, cap_loc + 1)
    # local row indices -> global
    sum_y = sum_y + row0 * area
    min_y = jnp.where(area > 0, min_y + row0, min_y)
    max_y = jnp.where(area > 0, max_y + row0, max_y)

    # per-local-label: position of its defining seed (scan order == rank order)
    lidx2 = (jnp.arange(h_loc, dtype=jnp.int32)[:, None] * w
             + jnp.arange(w, dtype=jnp.int32)[None, :])
    skey = jnp.where(seeds_slab, jnp.int32(h_loc * w) - lidx2, 0)
    svals, _ = lax.top_k(skey.reshape(-1), min(cap_loc, h_loc * w))
    if cap_loc > h_loc * w:
        svals = jnp.pad(svals, (0, cap_loc - h_loc * w))
    seed_ok = svals > 0
    seed_lidx = jnp.where(seed_ok, jnp.int32(h_loc * w) - svals, 0)
    seed_gidx = jnp.where(seed_ok, seed_lidx + row0 * w, -1)
    # creation numbering counts GLOBAL seeds in global raster order
    nseed_loc = jnp.sum(seeds_glob.astype(jnp.int32))
    seed_counts = lax.all_gather(nseed_loc, axis)  # (nsh,)
    seed_offset = jnp.sum(jnp.where(jnp.arange(nsh) < idx, seed_counts, 0))
    rank_glob = jnp.cumsum(seeds_glob.reshape(-1).astype(jnp.int32)) + seed_offset
    final_rep = jnp.where(seed_ok, L.reshape(-1)[seed_lidx], -1)
    local_rep = jnp.where(seed_ok, Lloc.reshape(-1)[seed_lidx], -2)
    creation = jnp.where(seed_ok, rank_glob[seed_lidx], 0)
    # row l (0-based) describes slab label l+1; authoritative iff this shard
    # owns the component's global rep (then local rep == global rep == seed)
    lbl_rows = jnp.arange(1, cap_loc + 1)
    area_r = area[lbl_rows]
    auth = seed_ok & (area_r > 0) & (final_rep == local_rep) & (final_rep == seed_gidx)
    label_r = jnp.where(auth, creation, 0)
    rep_r = jnp.where(area_r > 0, final_rep, big)
    return (rep_r, area_r, sum_x[lbl_rows], sum_y[lbl_rows],
            jnp.where(area_r > 0, min_x[lbl_rows], big),
            jnp.where(area_r > 0, min_y[lbl_rows], big),
            jnp.where(area_r > 0, max_x[lbl_rows], -1),
            jnp.where(area_r > 0, max_y[lbl_rows], -1), label_r)


def _merge_blob_rows(rep_r, area_r, sx_r, sy_r, mnx_r, mny_r, mxx_r, mxy_r,
                     label_r, *, cap: int, axis: str):
    """All-gather per-shard blob rows and combine rows sharing a global rep.

    Replicated small-table work (<= nshards * cap_loc rows): sort by rep,
    segment-reduce each group.  Returns per-group (rep, area, sum_x, sum_y,
    bbox mins/maxs, creation label, valid)."""
    big = jnp.int32(np.int32(2**31 - 1))

    def gat(v):
        return lax.all_gather(v, axis).reshape(-1)

    reps_all = gat(rep_r)
    area_all = gat(area_r)
    sx_all = gat(sx_r)
    sy_all = gat(sy_r)
    mnx_all = gat(mnx_r)
    mny_all = gat(mny_r)
    mxx_all = gat(mxx_r)
    mxy_all = gat(mxy_r)
    lab_all = gat(label_r)

    nrows = reps_all.shape[0]
    order = jnp.argsort(reps_all)
    r_s = reps_all[order]
    newgrp = jnp.concatenate([jnp.ones(1, bool), r_s[1:] != r_s[:-1]])
    grp = jnp.cumsum(newgrp.astype(jnp.int32)) - 1

    def seg_sum(v):
        return jax.ops.segment_sum(v[order], grp, num_segments=nrows)

    def seg_min(v):
        return jax.ops.segment_min(v[order], grp, num_segments=nrows)

    def seg_max(v):
        return jax.ops.segment_max(v[order], grp, num_segments=nrows)

    g_rep = seg_min(reps_all)
    g_area = seg_sum(area_all)
    g_sx = seg_sum(sx_all)
    g_sy = seg_sum(sy_all)
    g_mnx = seg_min(mnx_all)
    g_mny = seg_min(mny_all)
    g_mxx = seg_max(mxx_all)
    g_mxy = seg_max(mxy_all)
    g_lab = seg_max(lab_all)
    g_valid = (g_rep < big) & (g_area > 0) & (g_lab >= 1) & (g_lab <= cap)
    return g_rep, g_area, g_sx, g_sy, g_mnx, g_mny, g_mxx, g_mxy, g_lab, g_valid


def _blobs_sharded_body(img_local, *, w: int, cap: int, axis: str):
    """Distributed ``gs_blobs``: sharded CCL + per-shard stats + replicated
    merge, compacted to the creation-order fixed-cap table."""
    h_loc = img_local.shape[0]
    idx = lax.axis_index(axis)
    row0 = idx.astype(jnp.int32) * h_loc
    big = jnp.int32(np.int32(2**31 - 1))
    L = _label_sharded_body(img_local, w=w, space_axis=axis)
    rows = _shard_blob_rows(img_local, L, row0, w, cap, axis)
    (_, g_area, g_sx, g_sy, g_mnx, g_mny, g_mxx, g_mxy, g_lab, g_valid) = (
        _merge_blob_rows(*rows, cap=cap, axis=axis)
    )
    # compact in ascending creation-label order (the C compaction order)
    sort_lab = jnp.where(g_valid, g_lab, big)
    order = jnp.argsort(sort_lab)[:cap]
    ok = jnp.take(g_valid, order)
    n = jnp.sum(g_valid.astype(jnp.int32))

    def take(v, fill=0):
        return jnp.where(ok, jnp.take(v, order), fill)

    area = take(g_area)
    safe = jnp.maximum(area, 1)

    def udiv(s):
        return (s.astype(jnp.uint32) // safe.astype(jnp.uint32)).astype(jnp.int32)

    return (n, take(g_lab), area,
            take(g_mnx), take(g_mny),
            take(g_mxx - g_mnx + 1), take(g_mxy - g_mny + 1),
            udiv(take(g_sx)), udiv(take(g_sy)))


def blobs_sharded(img, mesh: Mesh, max_blobs: int, space_axis: str = "space"):
    """``gs_blobs`` statistics of one H-sharded frame (VERDICT r2 next #5).

    Distributed counterpart of ``ops.blobs.blobs``: sharded min-index CCL,
    per-shard one-hot stat aggregation, replicated merge keyed by global
    representative.  Returns the :class:`Blobs` table (replicated),
    bit-identical to the single-device one whenever the global seed count
    fits ``max_blobs`` (label maps stay sharded — use
    ``label_components_sharded`` for them).
    """
    from ..core import Blobs, Point, Rect

    h, w = img.shape
    nsh = mesh.shape[space_axis]
    if h % nsh:
        raise ValueError(f"H={h} must be divisible by {nsh} shards")
    body = functools.partial(_blobs_sharded_body, w=w, cap=int(max_blobs),
                             axis=space_axis)
    fn = shard_map(
        body, mesh=mesh, in_specs=(P(space_axis, None),),
        out_specs=(P(),) * 9,
        check_vma=False,  # replicated by construction post-merge
    )
    img = jax.device_put(img, NamedSharding(mesh, P(space_axis, None)))
    n, lab, area, bx, by, bw, bh, cx, cy = jax.jit(fn)(img)
    return Blobs(n=n, label=lab, area=area, box=Rect(bx, by, bw, bh),
                 centroid=Point(cx, cy))


def _scan_spatial_body(img_local, *, h: int, w: int, cap: int, out_size,
                       axis: str):
    """One shard's slice of the document scanner (nanomagick.c:186-210):

    binarize -> global CCL -> distributed blob stats (per-shard one-hot
    aggregation over slab-local dense labels, merged replicated by global
    representative) -> largest blob -> sharded corner extremes -> warp of
    this shard's output row band (input gathered once for the sampling).
    Bit-identical to ``pipelines.scan`` whenever the global seed count fits
    ``cap`` (the same contract as ``ops.blobs.blobs``).
    """
    h_loc = img_local.shape[0]
    nsh = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    row0 = idx.astype(jnp.int32) * h_loc
    big = jnp.int32(np.int32(2**31 - 1))

    # ---- 1. binarize ----
    binary = _binarize_sharded(img_local, h, w, axis)

    # ---- 2. global labels (min raster index per component) ----
    L = _label_sharded_body(binary, w=w, space_axis=axis)  # -1 = background

    # ---- 3+4. distributed blob stats: per-shard rows, replicated merge ----
    rows = _shard_blob_rows(binary, L, row0, w, cap, axis)
    (g_rep, g_area, g_sx, g_sy, _g_mnx, _g_mny, _g_mxx, _g_mxy, g_lab,
     g_valid) = _merge_blob_rows(*rows, cap=cap, axis=axis)

    # ---- 5. largest blob, first max in creation order (nanomagick.c:197-199) ----
    areas = jnp.where(g_valid, g_area, -1)
    amax = jnp.max(areas)
    lab_at_max = jnp.where(g_valid & (g_area == amax), g_lab, big)
    lab_sel = jnp.min(lab_at_max)
    sel = g_valid & (g_area == amax) & (g_lab == lab_sel)

    def take(v, fill=0):
        return jnp.sum(jnp.where(sel, v, fill))  # exactly one selected row

    b_rep = jnp.where(jnp.any(sel), take(g_rep), jnp.int32(-2))
    b_area = jnp.maximum(take(g_area), 1)
    cent_x = (take(g_sx).astype(jnp.uint32) // b_area.astype(jnp.uint32)).astype(jnp.int32)
    cent_y = (take(g_sy).astype(jnp.uint32) // b_area.astype(jnp.uint32)).astype(jnp.int32)

    # ---- 6. corners: extremes of x+y / x-y over the blob (grayskull.h:404-421) ----
    mask = L == b_rep
    gx = jnp.arange(w, dtype=jnp.int32)[None, :] + jnp.zeros((h_loc, 1), jnp.int32)
    gy = jnp.arange(h_loc, dtype=jnp.int32)[:, None] + row0 + jnp.zeros((1, w), jnp.int32)
    s_key = gx + gy
    d_key = gx - gy

    tlx, tly, found = _first_extreme_sharded(mask, s_key, row0, w, axis, False)
    brx, bry, _ = _first_extreme_sharded(mask, s_key, row0, w, axis, True)
    blx, bly, _ = _first_extreme_sharded(mask, d_key, row0, w, axis, False)
    trx, try_, _ = _first_extreme_sharded(mask, d_key, row0, w, axis, True)

    def pick(x, y):
        return (jnp.where(found, x, cent_x), jnp.where(found, y, cent_y))

    corners = jnp.stack([
        jnp.stack(pick(tlx, tly)), jnp.stack(pick(trx, try_)),
        jnp.stack(pick(brx, bry)), jnp.stack(pick(blx, bly)),
    ])  # (4, 2) TL, TR, BR, BL

    # ---- 7. warp this shard's output row band (input gathered for sampling) ----
    out_h, out_w = out_size
    band = out_h // nsh
    img_full = lax.all_gather(img_local, axis, tiled=True)  # (h, w)
    from ..ops.warp import _warp_rows

    u = jnp.asarray(np.arange(out_w, dtype=np.float32) / np.float32(out_w - 1.0))
    v_full = jnp.asarray(np.arange(out_h, dtype=np.float32) / np.float32(out_h - 1.0))
    v = jax.lax.dynamic_slice(v_full, (idx.astype(jnp.int32) * band,), (band,))
    page_band = _warp_rows(img_full, corners, u, v)
    return page_band, corners


def scan_spatial_shardmap(img, mesh: Mesh, out_size=(1000, 800),
                          max_blobs: int = 1000, space_axis: str = "space"):
    """The document scanner on ONE H-sharded frame (SURVEY §2.3; VERDICT r2
    next #5): every stage — binarize, CCL, blob statistics, corner finding,
    warp — runs distributed over the mesh's space axis.

    ``img``: (H, W) uint8, H divisible by the axis size, ``out_size[0]`` too.
    Returns ``(page, corners)`` bit-identical to
    ``pipelines.scan(img, out_size, max_blobs)`` whenever the global seed
    count fits ``max_blobs``.
    """
    h, w = img.shape
    nsh = mesh.shape[space_axis]
    out_size = (int(out_size[0]), int(out_size[1]))
    if h % nsh or out_size[0] % nsh:
        raise ValueError(f"H={h} and out_h={out_size[0]} must divide {nsh} shards")
    body = functools.partial(
        _scan_spatial_body, h=h, w=w, cap=int(max_blobs), out_size=out_size,
        axis=space_axis,
    )
    fn = shard_map(
        body, mesh=mesh, in_specs=(P(space_axis, None),),
        out_specs=(P(space_axis, None), P()),
        check_vma=False,  # corners replicated via gathered extremes
    )
    img = jax.device_put(img, NamedSharding(mesh, P(space_axis, None)))
    return jax.jit(fn)(img)


# --------------------------------------------------------------------------
# space-sharded ORB extraction
# --------------------------------------------------------------------------


def _orb_spatial_body(img_local, threshold, *, h: int, w: int, cap: int,
                      axis: str):
    """One shard's slice of ``gs_orb_extract`` (grayskull.h:651-669) on an
    H-sharded frame:

    * FAST scores + 3x3 NMS on the local slab (4-row halo: circle radius 3
      plus one NMS row), interior masks in global coordinates;
    * scan-order candidate emission: per-shard packed-key ``top_k``, then an
      ``all_gather`` of the tiny per-shard key tables and a replicated merge
      ``top_k`` — global scan order falls out of the descending key order;
    * the response sort / border filter / table compaction replay replicated
      (cap-sized work);
    * 48x48 patches are extracted by the shard that owns each keypoint's row
      (28-row halo covers the patch span) and combined with one ``psum``;
      orientation + rBRIEF then run replicated from the patch table — the
      exact single-device code, so the output is bit-identical to
      ``ops.features.orb_extract``.
    """
    from ..ops.features import (
        _BRIEF_PAD, _BRIEF_PATCH, _brief_from_patches, _fast_score_slab,
        _orientation_from_patches, _rank_scatter,
    )

    radius = 15
    cand_cap = min(cap * 4, 5000)
    h_loc = img_local.shape[0]
    nsh = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    row0 = idx.astype(jnp.int32) * h_loc
    threshold = jnp.maximum(jnp.asarray(threshold, jnp.int32), 0)  # C: unsigned

    # ---- FAST scores for local rows plus one NMS guard row each side ----
    slab = exchange_halo(img_local, 4, axis)  # (h_loc + 8, w)
    s_ext = _fast_score_slab(slab, threshold, row0 - 1, h, w).astype(jnp.int32)
    s = s_ext[1 : 1 + h_loc]

    sp = jnp.pad(s_ext, ((0, 0), (1, 1)))
    is_max = s > 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            is_max &= ~(sp[1 + dy : 1 + dy + h_loc, 1 + dx : 1 + dx + w] > s)

    # ---- scan-order emission: local top-k, all_gather, replicated merge ----
    gidx = (jnp.arange(h_loc, dtype=jnp.int32)[:, None] + row0) * w + jnp.arange(
        w, dtype=jnp.int32
    )[None, :]
    packed = h * w < (1 << 23)
    k_local = min(cand_cap, h_loc * w)
    if packed:
        key = jnp.where(is_max, ((jnp.int32(h * w) - gidx) << 8) | s, 0)
        kloc, _ = lax.top_k(key.reshape(-1), k_local)
        kall = lax.all_gather(kloc, axis).reshape(-1)
        vals, _ = lax.top_k(kall, min(cand_cap, nsh * k_local))
        vals = jnp.pad(vals, (0, cand_cap - vals.shape[0]))
        row_valid = vals > 0
        ridx = jnp.int32(h * w) - (vals >> 8)
        cr = jnp.where(row_valid, vals & 255, 0)
    else:
        key = jnp.where(is_max, jnp.int32(h * w) - gidx, 0)
        kloc, aloc = lax.top_k(key.reshape(-1), k_local)
        sloc = jnp.where(kloc > 0, s.reshape(-1)[aloc], 0)
        kall = lax.all_gather(kloc, axis).reshape(-1)
        sall = lax.all_gather(sloc, axis).reshape(-1)
        vals, amerge = lax.top_k(kall, min(cand_cap, nsh * k_local))
        scores = sall[amerge]
        vals = jnp.pad(vals, (0, cand_cap - vals.shape[0]))
        scores = jnp.pad(scores, (0, cand_cap - scores.shape[0]))
        row_valid = vals > 0
        ridx = jnp.int32(h * w) - vals
        cr = jnp.where(row_valid, scores, 0)
    cx_ = jnp.where(row_valid, ridx % w, 0)
    cy_ = jnp.where(row_valid, ridx // w, 0)
    n_cand = jnp.sum(row_valid).astype(jnp.int32)

    # ---- replicated tail: stable response sort, border filter, compaction ----
    valid = jnp.arange(cand_cap) < n_cand
    sort_key = jnp.where(valid, -cr, 1)
    order = jnp.argsort(sort_key, stable=True)
    sx, sy, sr, sv = cx_[order], cy_[order], cr[order], valid[order]
    border_ok = (sx >= radius) & (sy >= radius) & (sx < w - radius) & (sy < h - radius)
    n, (tx, ty, tr) = _rank_scatter(sv & border_ok, cap, (sx, sy, sr))

    # ---- per-shard patch extraction + psum combine ----
    safe_x = jnp.clip(tx, radius, w - radius - 1)
    safe_y = jnp.clip(ty, radius, h - radius - 1)
    pslab = exchange_halo(img_local, 28, axis)  # rows row0-28 .. row0+h_loc+27
    padded = jnp.pad(pslab, ((0, 0), (_BRIEF_PAD, _BRIEF_PATCH)))
    owned = (safe_y >= row0) & (safe_y < row0 + h_loc)
    ly = jnp.clip(safe_y - row0 + 8, 0, h_loc + 8)  # patch start row in slab coords
    patches = jax.vmap(
        lambda xx, yy: jax.lax.dynamic_slice(
            padded, (yy, xx), (_BRIEF_PATCH, _BRIEF_PATCH)
        )
    )(safe_x, ly)
    # int32 for the collective; each patch is owned by exactly one shard, so
    # the psum just routes it (values stay uint8-ranged, conversions exact)
    patches = jnp.where(owned[:, None, None], patches.astype(jnp.int32), 0)
    patches = lax.psum(patches, axis)

    angle = _orientation_from_patches(patches, radius)
    desc = _brief_from_patches(patches, angle)
    row_ok = jnp.arange(cap) < n
    angle = jnp.where(row_ok, angle, 0.0)
    desc = jnp.where(row_ok[:, None], desc, 0)
    return n, tx, ty, tr, angle, desc


def orb_extract_spatial(img, mesh: Mesh, max_kps: int, threshold,
                        space_axis: str = "space") -> Keypoints:
    """``gs_orb_extract`` on one H-sharded frame (SURVEY §2.3 row 5).

    ``img``: (H, W) uint8 with H divisible by the mesh's space axis and
    ``H/nshards >= 28`` (the patch halo).  Returns a replicated
    :class:`Keypoints` table bit-identical to
    ``ops.features.orb_extract(img, max_kps, threshold)``.
    """
    h, w = img.shape
    nsh = mesh.shape[space_axis]
    if h % nsh or h // nsh < 28:
        raise ValueError(f"H={h} must be divisible by {nsh} shards of >= 28 rows")
    body = functools.partial(
        _orb_spatial_body, h=h, w=w, cap=int(max_kps), axis=space_axis
    )
    fn = shard_map(
        body, mesh=mesh, in_specs=(P(space_axis, None), P()),
        out_specs=(P(),) * 6,
        check_vma=False,  # outputs replicated by construction (gather/psum)
    )
    img = jax.device_put(img, NamedSharding(mesh, P(space_axis, None)))
    n, x, y, r, angle, desc = jax.jit(fn)(img, jnp.asarray(threshold, jnp.int32))
    return Keypoints(n=n, x=x, y=y, response=r, angle=angle, descriptor=desc)


# --------------------------------------------------------------------------
# sharded descriptor matching
# --------------------------------------------------------------------------


def _match_body(desc1_local, n1, desc2, n2, *, cap1: int, maxd: float,
                max_matches: int, axis: str):
    """Queries row-sharded; targets replicated.  Emits the full Matches table
    (replicated) after all-gathering the per-shard best/accept columns."""
    from ..ops.features import hamming_distance

    nsh = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    cap_loc = desc1_local.shape[0]
    maxd_f = jnp.float32(maxd)
    sent = maxd_f + jnp.float32(1.0)

    d = hamming_distance(desc1_local, desc2).astype(jnp.float32)
    valid2 = (jnp.arange(desc2.shape[0]) < n2)[None, :]
    inf = jnp.float32(np.inf)
    dv = jnp.where(valid2, d, inf)
    b1 = jnp.min(dv, axis=1)
    best_idx = jnp.argmin(dv, axis=1).astype(jnp.int32)
    dv2 = dv.at[jnp.arange(cap_loc), best_idx].set(inf)
    b2 = jnp.min(dv2, axis=1)
    best = jnp.minimum(b1, sent)
    second = jnp.where(b1 <= sent, jnp.minimum(b2, sent), sent)
    grow = jnp.arange(cap_loc, dtype=jnp.int32) + idx.astype(jnp.int32) * cap_loc
    accept = (best <= maxd_f) & (best < jnp.float32(0.8) * second)
    accept &= (grow < n1) & (b1 < inf)

    # gather the tiny per-query columns; every shard replays the same emit
    acc_all = lax.all_gather(accept, axis).reshape(-1)
    idx_all = lax.all_gather(best_idx, axis).reshape(-1)
    dist_all = lax.all_gather(best.astype(jnp.int32), axis).reshape(-1)

    cap = int(max_matches)
    rank = jnp.cumsum(acc_all.astype(jnp.int32)) - 1
    ok = acc_all & (rank < cap)
    dst = jnp.where(ok, rank, cap)

    def scatter(v):
        return jnp.zeros(cap + 1, v.dtype).at[dst].set(v, mode="drop")[:cap]

    n = jnp.minimum(jnp.sum(acc_all.astype(jnp.int32)), cap)
    return (n.astype(jnp.int32), scatter(jnp.arange(cap1, dtype=jnp.int32)),
            scatter(idx_all), scatter(dist_all))


def match_orb_sharded(kps1: Keypoints, kps2: Keypoints, mesh: Mesh,
                      max_matches: int, max_distance,
                      axis: str = "space") -> Matches:
    """``gs_match_orb`` with the distance matrix sharded over query rows.

    The query table's cap must be divisible by the mesh axis.  Output matches
    the single-device :func:`ops.features.match_orb` exactly.
    """
    cap1 = kps1.descriptor.shape[0]
    body = functools.partial(
        _match_body, cap1=cap1, maxd=float(max_distance),
        max_matches=int(max_matches), axis=axis,
    )
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(), P(None, None), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,  # outputs replicated by construction (post-all_gather)
    )
    n, i1, i2, dist = jax.jit(fn)(
        kps1.descriptor, kps1.n, kps2.descriptor, kps2.n
    )
    return Matches(n=n, idx1=i1, idx2=i2, distance=dist)


# --------------------------------------------------------------------------
# sharded LBP detection
# --------------------------------------------------------------------------


def _lbp_band_masks(cascade, ii_guarded, scale: float, ny: int, nx: int,
                    band: int, slab_rows: int, axis: str):
    """Evaluate one scale's window grid on this shard's row band.

    ``ii_guarded`` is the integral image with ONE leading zero row (the
    global ``gs_integral_sum`` top edge guard), zero-padded at the bottom so
    every slab slice is in bounds.  A slab starting at padded row ``y0``
    carries the guard row for window row ``y0`` — windows in local rows
    ``1..band`` of the slab evaluate exactly as in the full-frame path
    (integral values are position-independent global prefix sums).
    """
    from ..ops.lbp import _eval_windows

    idx = lax.axis_index(axis)
    y0 = idx.astype(jnp.int32) * band
    nb = ii_guarded.shape[0]
    slab = lax.dynamic_slice(
        ii_guarded, (jnp.int32(0), y0, jnp.int32(0)),
        (nb, slab_rows, ii_guarded.shape[2]),
    )
    ok = _eval_windows(cascade, slab, scale, band + 1, nx, 1)  # row 0 discarded
    wy = jnp.arange(band, dtype=jnp.int32)[None, :, None] + y0
    return ok[:, 1 : band + 1, :] & (wy < ny)


def lbp_detect_sharded(cascade, ii, mesh: Mesh, max_rects: int,
                       scale_factor=1.2, min_scale=1.0, max_scale=4.0,
                       data_axis: str = "data", space_axis: str = "space") -> Rects:
    """``gs_lbp_detect`` with the window grid row-sharded over ``space`` and
    frames sharded over ``data``.  Bit-identical output to ``lbp_detect``
    (step=1), including the (scale, y, x) emission order and truncation.
    """
    from ..ops.lbp import _scaled_features, scale_ladder

    single = ii.ndim == 2
    iib = ii[None] if single else ii
    nb, ih, iw = iib.shape
    cap = int(max_rects)
    nsh = mesh.shape[space_axis]
    ladder = scale_ladder(cascade, iw, ih, scale_factor, min_scale, max_scale)

    # static per-scale geometry
    plans = []
    max_slab = 0
    for scale, win_w, win_h in ladder:
        ny, nx = ih - win_h + 1, iw - win_w + 1
        if ny <= 0 or nx <= 0:
            continue
        band = -(-ny // nsh)
        fx, fy, fw, fh = _scaled_features(cascade, scale)
        wi = cascade.weak_feature_idx.astype(np.int32)
        ext = max(int(fy[f] + 4 * fh[f]) for f in wi) + 2
        slab_rows = band + 1 + win_h + ext
        plans.append((scale, win_w, win_h, ny, nx, band, slab_rows))
        max_slab = max(max_slab, band + slab_rows)

    pad_bottom = max(max_slab - (ih + 1), 0) + nsh  # slices always in bounds
    iig = jnp.pad(iib, ((0, 0), (1, pad_bottom), (0, 0)))

    def body(iig_local):
        masks = []
        for scale, _ww, _wh, ny, nx, band, slab_rows in plans:
            m = _lbp_band_masks(cascade, iig_local, scale, ny, nx, band,
                                slab_rows, space_axis)
            # (nsh, n_loc, band, nx) -> (n_loc, nsh*band, nx) -> valid rows
            g = lax.all_gather(m, space_axis)
            g = jnp.moveaxis(g, 0, 1).reshape(m.shape[0], nsh * band, nx)
            masks.append(g[:, :ny, :].reshape(m.shape[0], -1))
        return jnp.concatenate(masks, axis=1)

    in_spec = P(data_axis, None, None)
    fn = shard_map(
        body, mesh=mesh, in_specs=(in_spec,),
        out_specs=P(data_axis, None),
        check_vma=False,  # gathered masks are replicated along `space`
    )
    iig = jax.device_put(iig, NamedSharding(mesh, in_spec))
    mask = jax.jit(fn)(iig)

    metas = []
    for scale, win_w, win_h, ny, nx, _band, _sr in plans:
        gx, gy = np.meshgrid(np.arange(nx, dtype=np.int32), np.arange(ny, dtype=np.int32))
        metas.append((gx.reshape(-1), gy.reshape(-1),
                      np.full(gx.size, win_w, np.int32), np.full(gx.size, win_h, np.int32)))
    all_x = jnp.asarray(np.concatenate([m[0] for m in metas]))
    all_y = jnp.asarray(np.concatenate([m[1] for m in metas]))
    all_w = jnp.asarray(np.concatenate([m[2] for m in metas]))
    all_h = jnp.asarray(np.concatenate([m[3] for m in metas]))

    @jax.jit
    def emit(m):
        # first `cap` set windows in ladder order via inverse-index top_k
        # (rank-scatter over the full window count serializes on TPU)
        total = m.shape[0]
        key = jnp.where(m, total - jnp.arange(total, dtype=jnp.int32), 0)
        vals, _ = jax.lax.top_k(key, min(cap, total))
        if cap > total:
            vals = jnp.pad(vals, (0, cap - total))
        row_ok = vals > 0
        widx = jnp.where(row_ok, total - vals, 0)
        n = jnp.sum(row_ok).astype(jnp.int32)

        def take(v):
            return jnp.where(row_ok, v[widx], 0)

        return Rects(n=n, x=take(all_x), y=take(all_y), w=take(all_w), h=take(all_h))

    table = jax.vmap(emit)(mask)
    if single:
        return Rects(*(v[0] for v in table))
    return table


def detect_faces_sharded(imgs, mesh: Mesh, cascade=None, max_rects: int = 100,
                         scale_factor=1.2, min_scale=1.0, max_scale=4.0,
                         data_axis: str = "data", space_axis: str = "space") -> Rects:
    """End-to-end sharded face detection: distributed integral image (carry
    exchange over ``space``) feeding the row-sharded cascade sweep.

    Bit-identical to :func:`grayskull_tpu.pipelines.detect_faces` at step=1
    (the reference pipeline, nanomagick.c:347-376, minus its static 640x480
    buffer bound).  ``imgs`` is (H, W) or (N, H, W) uint8.
    """
    from ..cascade import load_frontalface
    from .sharded import integral_sharded

    if cascade is None:
        cascade = load_frontalface()
    single = imgs.ndim == 2
    batch = imgs[None] if single else imgs
    ii = integral_sharded(batch, mesh, data_axis=data_axis, space_axis=space_axis)
    out = lbp_detect_sharded(cascade, ii, mesh, max_rects, scale_factor,
                             min_scale, max_scale, data_axis, space_axis)
    if single:
        return Rects(*(v[0] for v in out))
    return out
