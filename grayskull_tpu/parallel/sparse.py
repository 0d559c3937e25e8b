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

__all__ = ["label_components_sharded", "match_orb_sharded", "lbp_detect_sharded"]


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
