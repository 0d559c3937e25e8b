"""Multi-scale LBP cascade detection — ``gs_lbp_code`` / ``gs_lbp_match`` /
``gs_lbp_window`` / ``gs_lbp_detect`` (/root/reference/grayskull.h:765-835).

The reference slides a window over the integral image one position at a time,
evaluating 20 boosted stages with early exit.  The TPU formulation scores **every
window position of a scale in parallel**, gather-free: dense rect-sum maps per
distinct block size (static slices of the padded integral image), phase-decomposed
by the window stride so each weak classifier's nine block sums are contiguous
``dynamic_slice`` reads inside a ``lax.scan`` over the weaks (one small compiled
body).  MB-LBP codes and subset tests are vectorized compares; stage early-exit
becomes an AND-reduction (same result — early exit is purely a serial-CPU
optimization).  On TPU the per-scale evaluation runs in the Pallas full-width
strip kernel (``kernels.lbp`` — any window stride via phase-decomposed
integrals) with ONE shared padded integral for the whole ladder; this XLA
formulation is the fallback (~30 M windows/s).
Detections are emitted in the reference's (scale, y, x) order via packed
inverse-index ``top_k`` with the ``max_rects`` cap.

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

from ..core import LbpCascade, Rects, on_tpu as _on_tpu

__all__ = ["lbp_detect", "lbp_warm_start", "lbp_window", "scale_ladder"]


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



# block order (bj*3+bi): TL TC TR L C R BL BC BR -> code bit per block
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


def _eval_windows(cascade: LbpCascade, ii, scale: float, ny: int, nx: int, step: int,
                  origin=(0, 0)):
    """Evaluate the full cascade over the window grid; ``ii`` is (..., H, W)
    uint32; returns (..., ny, nx) bool.

    Gather-free formulation (gathers serialize on TPU): zero-padding the
    integral image one leading row/column removes ``gs_integral_sum``'s edge
    guards, a dense rect-sum map per distinct scaled block size is four static
    slices, and every weak's nine block sums become static *strided* slices of
    those maps.  Pure slice + elementwise ops — XLA fuses the lot.
    """
    lead = ii.shape[:-2]
    H, W = ii.shape[-2:]
    fx, fy, fw, fh = _scaled_features(cascade, scale)
    wi = cascade.weak_feature_idx.astype(np.int32)
    used = sorted(set((int(fw[f]), int(fh[f])) for f in wi))

    oy0, ox0 = int(origin[0]), int(origin[1])
    span_y = (ny - 1) * step + oy0
    span_x = (nx - 1) * step + ox0
    max_oy = max(int(fy[f] + 3 * fh[f]) for f in wi)
    max_ox = max(int(fx[f] + 3 * fw[f]) for f in wi)
    # rect-sum maps need indices up to span + max offset; pad with zeros beyond
    # the integral image (windows always fit; features can poke past only into
    # the padded zero region at the very last positions, matching C's reads
    # inside ii for this cascade and degrading gracefully otherwise)
    Hm = span_y + max_oy + 1
    Wm = span_x + max_ox + 1
    max_h = max(h_ for (_, h_) in ((int(fw[f]), int(fh[f])) for f in wi))
    max_w = max(int(fw[f]) for f in wi)
    pad_b = max(Hm + max_h - (H + 1), 0)
    pad_r = max(Wm + max_w - (W + 1), 0)
    iip = jnp.pad(ii, [(0, 0)] * len(lead) + [(1, pad_b), (1, pad_r)])

    # stacked rect-sum maps, one per distinct size (a handful of static slices)
    size_index = {s: i for i, s in enumerate(used)}
    rs_maps = jnp.stack(
        [
            iip[..., h_ : h_ + Hm, w_ : w_ + Wm]
            + iip[..., 0:Hm, 0:Wm]
            - iip[..., 0:Hm, w_ : w_ + Wm]
            - iip[..., h_ : h_ + Hm, 0:Wm]
            for (w_, h_) in used
        ],
        axis=len(lead),
    )  # (..., nsizes, Hm, Wm)

    # phase decomposition so window stride `step` becomes contiguous
    # dynamic_slices: rsp[..., s, p*step+q, y, x] = rs_maps[..., s, y*step+p, x*step+q]
    sy_n = -(-Hm // step)
    sx_n = -(-Wm // step)
    pad_spec = [(0, 0)] * (len(lead) + 1) + [(0, sy_n * step - Hm), (0, sx_n * step - Wm)]
    rsp = jnp.pad(rs_maps, pad_spec)
    rsp = rsp.reshape(lead + (len(used), sy_n, step, sx_n, step))
    L = len(lead)
    perm = list(range(L)) + [L, L + 2, L + 4, L + 1, L + 3]  # (S, pY, pX, sy, sx)
    rsp = jnp.transpose(rsp, perm)
    rsp = rsp.reshape(lead + (len(used), step * step, sy_n, sx_n))

    # per-weak geometry tables (host-side)
    nw = cascade.nweaks
    geo_size = np.zeros(nw, np.int32)
    geo_phase = np.zeros((nw, 9), np.int32)
    geo_sy = np.zeros((nw, 9), np.int32)
    geo_sx = np.zeros((nw, 9), np.int32)
    for k in range(nw):
        f = int(wi[k])
        w_, h_ = int(fw[f]), int(fh[f])
        geo_size[k] = size_index[(w_, h_)]
        for bj in range(3):
            for bi in range(3):
                oy = int(fy[f]) + bj * h_ + oy0
                ox = int(fx[f]) + bi * w_ + ox0
                blk = bj * 3 + bi
                geo_phase[k, blk] = (oy % step) * step + (ox % step)
                geo_sy[k, blk] = oy // step
                geo_sx[k, blk] = ox // step
    subs, counts = _subset_matrix(cascade)

    nb = int(np.prod(lead)) if lead else 1
    rsp_flat = rsp.reshape((nb,) + rsp.shape[len(lead):])

    def weak_body(_, xs):
        size_i, phase9, sy9, sx9, subs8, count, left, right = xs

        def block(blk):
            m = jax.lax.dynamic_index_in_dim(rsp_flat, size_i, axis=1, keepdims=False)
            m = jax.lax.dynamic_index_in_dim(m, phase9[blk], axis=1, keepdims=False)
            return jax.lax.dynamic_slice(
                m, (jnp.int32(0), sy9[blk], sx9[blk]), (nb, ny, nx)
            )

        center = block(4)
        code = jnp.zeros((nb, ny, nx), jnp.int32)
        for blk, bit in enumerate(_BLOCK_BITS):
            if bit < 0:
                continue
            code = code | ((block(blk) >= center).astype(jnp.int32) << int(bit))
        idx = code >> 5
        bit_i = code & 31
        word = jnp.zeros_like(code)
        for j in range(8):
            word = jnp.where(idx == j, subs8[j], word)
        match = (idx < count) & (((word >> bit_i) & 1) == 1)
        leaf = jnp.where(match, left, right)
        return None, leaf

    xs = (
        jnp.asarray(geo_size), jnp.asarray(geo_phase), jnp.asarray(geo_sy),
        jnp.asarray(geo_sx), jnp.asarray(subs), jnp.asarray(counts),
        jnp.asarray(cascade.weak_left_val), jnp.asarray(cascade.weak_right_val),
    )
    _, leafs = jax.lax.scan(weak_body, None, xs)  # (nw, nb, ny, nx)

    ok = None
    for si in range(cascade.nstages):
        s0 = int(cascade.stage_weak_start[si])
        cnt = int(cascade.stage_nweaks[si])
        ssum = leafs[s0]
        for k in range(1, cnt):
            ssum = ssum + leafs[s0 + k]
        passed = ssum >= jnp.float32(cascade.stage_threshold[si])
        ok = passed if ok is None else ok & passed
    return ok.reshape(lead + (ny, nx))


# XLA-fallback scales dispatch as their own cached executables (one per
# (geometry, scale)), same as the Pallas kernels — see lbp_detect below.
_eval_windows_jit = functools.partial(
    jax.jit, static_argnames=("cascade", "scale", "ny", "nx", "step", "origin")
)(_eval_windows)


@functools.lru_cache(maxsize=64)
def _grid_plan(cascade, ih: int, iw: int, scale_factor, min_scale, max_scale,
               step: int):
    """Host-side ladder plan: ((scale, win_w, win_h, ny, nx), ...) for every
    scale with a non-empty window grid at stride ``step``."""
    ladder = scale_ladder(cascade, iw, ih, scale_factor, min_scale, max_scale)
    out = []
    for scale, win_w, win_h in ladder:
        ny = (ih - win_h) // step + 1
        nx = (iw - win_w) // step + 1
        if ny > 0 and nx > 0:
            out.append((scale, win_w, win_h, ny, nx))
    return tuple(out)


@functools.lru_cache(maxsize=32)
def _window_metas(cascade, ih: int, iw: int, scale_factor, min_scale, max_scale,
                  step: int):
    """Device-resident per-window (x, y, w, h) tables in the reference's
    (scale, y, x) order — constants of the frame geometry, built once (when
    ``lbp_detect`` was one jitted program these were baked in at trace time;
    dispatching per-scale executables instead must not re-upload ~26 MB of
    coordinates per call)."""
    plan = _grid_plan(cascade, ih, iw, scale_factor, min_scale, max_scale, step)
    cols = ([], [], [], [])
    for scale, win_w, win_h, ny, nx in plan:
        ys = np.arange(0, ih - win_h + 1, step, dtype=np.int32)
        xs = np.arange(0, iw - win_w + 1, step, dtype=np.int32)
        gx, gy = np.meshgrid(xs, ys)
        cols[0].append(gx.reshape(-1))
        cols[1].append(gy.reshape(-1))
        cols[2].append(np.full(gx.size, win_w, np.int32))
        cols[3].append(np.full(gx.size, win_h, np.int32))
    return tuple(jnp.asarray(np.concatenate(c)) for c in cols)


@functools.partial(jax.jit, static_argnames=("cap",))
def _emit_rects(mask, all_x, all_y, all_w, all_h, cap: int) -> Rects:
    """First ``cap`` set windows per frame in ladder order WITHOUT a big
    scatter (scatters/cumsum-rank over ~1.6M windows serialize on TPU): top_k
    over descending inverse window index keys yields them directly."""

    def emit(m):
        total = m.shape[0]
        k_out = min(cap, total)
        key = jnp.where(m, total - jnp.arange(total, dtype=jnp.int32), 0)
        if total < (1 << 23) and _on_tpu():
            # exact top-k via approx_max_k (recall_target=1.0 is an exact
            # partial reduction): inverse window indices are < 2^23, exactly
            # f32-representable and tie-free among set windows.  The ladder
            # emission's lax.top_k over ~1.6M keys x batch was 133 ms of the
            # 474 ms batch-32 faces() call (28%); approx_max_k cuts it ~10x.
            vals = jax.lax.approx_max_k(
                key.astype(jnp.float32), k_out, recall_target=1.0
            )[0].astype(jnp.int32)
        else:
            vals, _ = jax.lax.top_k(key, k_out)
        if cap > total:
            vals = jnp.pad(vals, (0, cap - total))
        row_ok = vals > 0
        widx = jnp.where(row_ok, total - vals, 0)
        n = jnp.sum(row_ok).astype(jnp.int32)

        def take(v):
            return jnp.where(row_ok, v[widx], 0)

        return Rects(n=n, x=take(all_x), y=take(all_y), w=take(all_w), h=take(all_h))

    return jax.vmap(emit)(mask)


def _rects_from_vals(vals, total: int, all_x, all_y, all_w, all_h, cap: int) -> Rects:
    """Descending inverse-index key values (nb, cap) -> Rects tables."""
    row_ok = vals > 0
    widx = jnp.where(row_ok, total - vals, 0)
    n = jnp.sum(row_ok, axis=1).astype(jnp.int32)

    def take(v):
        return jnp.where(row_ok, v[widx], 0)

    return Rects(n=n, x=take(all_x), y=take(all_y), w=take(all_w), h=take(all_h))


@functools.partial(jax.jit, static_argnames=("cap",))
def _emit_rects_ladder(hits: tuple, all_x, all_y, all_w, all_h,
                       cap: int) -> Rects:
    """Fused ladder emission: per-scale exact ``approx_max_k`` + tiny merge.

    The concat-then-top-k path (``_emit_rects``) materializes the ~1.6M-window
    mask concat AND a separate f32 key-build pass over it; here each scale's
    (nb, ny*nx) hit mask becomes its f32 key map directly (inverse GLOBAL
    window index, so keys are comparable and tie-free across scales) and is
    reduced to ``<= cap`` survivors immediately — the merge then runs
    ``top_k`` over ``nscales * cap`` values instead of the whole ladder.
    Bit-identical to ``_emit_rects`` on the concatenated mask: every key is
    an integer < 2^23 (exact in f32) and ``recall_target=1.0`` is an exact
    partial reduction."""
    total = sum(h.shape[1] for h in hits)
    parts = []
    off = 0
    for h in hits:
        tn = h.shape[1]
        base = jnp.float32(total - off)
        key = jnp.where(
            h, base - jnp.arange(tn, dtype=jnp.float32)[None, :], jnp.float32(0))
        parts.append(jax.lax.approx_max_k(key, min(cap, tn),
                                          recall_target=1.0)[0])
        off += tn
    merged = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    k_out = min(cap, merged.shape[1])
    vals = jax.lax.top_k(merged, k_out)[0].astype(jnp.int32)
    if cap > k_out:
        vals = jnp.pad(vals, ((0, 0), (0, cap - k_out)))
    return _rects_from_vals(vals, total, all_x, all_y, all_w, all_h, cap)


def _scale_calls(cascade, iib, iip, plan, use_pallas, step):
    """One (pallas | xla) window-grid evaluation per ladder scale."""
    from ..kernels.lbp import lbp_eval_scale

    nb = iib.shape[0]
    hits = []
    for (scale, _, _, ny, nx), pallas_ok in zip(plan, use_pallas):
        if pallas_ok:
            ok = lbp_eval_scale(cascade, iip, scale, ny, nx, step)
        else:
            ok = _eval_windows_jit(cascade, iib, scale, ny, nx, step)
        hits.append(ok.reshape(nb, -1))
    return hits


def lbp_detect(cascade: LbpCascade, ii: jnp.ndarray, max_rects: int,
               scale_factor=1.2, min_scale=1.0, max_scale=4.0, step: int = 1,
               force_xla: bool = False) -> Rects:
    """Multi-scale sliding-window cascade detection — ``gs_lbp_detect``
    (grayskull.h:815-835).

    ``ii`` is the uint32 integral image, (H, W) or batched (N, H, W).
    Detections come back as fixed-capacity :class:`Rects` tables (leading batch
    dim on every field for batched input) in the reference's (scale, y, x)
    emission order with its ``max_rects`` truncation.

    The per-scale window maps are evaluated gather-free (strided slices of
    dense rect-sum maps — see ``_eval_windows``), which maps cleanly onto the
    TPU vector unit.  Each ladder scale dispatches as its OWN cached
    executable (rather than one fused program) so that ``lbp_warm_start`` can
    compile the scales concurrently — the remote TPU compiler overlaps ~2x
    (exp/exp_warm_parallel.py) — and so a recompile of one scale never pays
    for the other eight.  Per-call host overhead is a few jit-cache lookups;
    the window-coordinate tables are cached device-resident per geometry.
    """
    single = ii.ndim == 2
    iib = jnp.asarray(ii[None] if single else ii)
    nb, ih, iw = iib.shape
    cap = int(max_rects)
    plan = _grid_plan(cascade, ih, iw, scale_factor, min_scale, max_scale, step)

    if not plan:
        z = jnp.zeros((nb, cap), jnp.int32)
        table = Rects(n=jnp.zeros(nb, jnp.int32), x=z, y=z, w=z, h=z)
        return Rects(*(v[0] for v in table)) if single else table

    from ..kernels.lbp import lbp_pad_for, lbp_pallas_available

    use_pallas = [
        _on_tpu() and not force_xla and lbp_pallas_available(cascade, ih, iw, scale, step)
        for scale, _, _, _, _ in plan
    ]
    # one shared padded integral for every Pallas scale (padding per scale
    # costs a full HBM copy of the batch); sized over the Pallas-enabled
    # scales only — a gated-off scale runs on the XLA fallback with the
    # unpadded integral and must not inflate the shared pad
    pallas_ladder = [(s, ww, wh) for s, ww, wh, _, _ in
                     (e for e, ok in zip(plan, use_pallas) if ok)]
    iip = (lbp_pad_for(cascade, iib, pallas_ladder, ih, iw, step)
           if pallas_ladder else None)

    hits = _scale_calls(cascade, iib, iip, plan, use_pallas, step)
    all_x, all_y, all_w, all_h = _window_metas(
        cascade, ih, iw, scale_factor, min_scale, max_scale, step)
    total = sum(int(h.shape[1]) for h in hits)
    if _on_tpu() and total < (1 << 23):
        # fused per-scale emission — skips the whole-ladder mask concat and
        # its key-build pass (measured: the concat + single big top-k was
        # the 227 -> 281 M win/s kernel-to-pipeline gap's largest term)
        table = _emit_rects_ladder(tuple(hits), all_x, all_y, all_w, all_h, cap)
    else:
        mask = jnp.concatenate(hits, axis=1)  # (nb, total_windows)
        table = _emit_rects(mask, all_x, all_y, all_w, all_h, cap)
    if single:
        return Rects(*(v[0] for v in table))
    return table


def lbp_warm_start(cascade: LbpCascade, ih: int, iw: int, nb: int = 1,
                   max_rects: int = 100, scale_factor=1.2, min_scale=1.0,
                   max_scale=4.0, step: int = 1, force_xla: bool = False,
                   max_workers: int = 4) -> float:
    """Compile every executable ``lbp_detect`` needs for one frame geometry,
    with the per-scale kernels compiled CONCURRENTLY; returns seconds spent.

    Each ladder scale is an independent program, and the TPU compiler overlaps
    concurrent compilations ~2x (measured: 4 Mosaic scale kernels compile in
    56 s concurrently vs ~27 s *each* sequentially — exp/exp_warm_parallel.py),
    so warming a 9-scale 640x480 ladder costs roughly half the serial first
    call.  Shapes must match the later calls exactly: same ``nb`` batch size
    (or ``nb=1`` for single-frame ``ii``), same ladder parameters.
    """
    import time
    from concurrent.futures import ThreadPoolExecutor

    from ..kernels.lbp import lbp_pad_for, lbp_pallas_available

    t0 = time.perf_counter()
    plan = _grid_plan(cascade, ih, iw, scale_factor, min_scale, max_scale, step)
    if not plan:
        return time.perf_counter() - t0
    iib = jnp.zeros((nb, ih, iw), jnp.uint32)
    use_pallas = [
        _on_tpu() and not force_xla and lbp_pallas_available(cascade, ih, iw, scale, step)
        for scale, _, _, _, _ in plan
    ]
    pallas_ladder = [(s, ww, wh) for s, ww, wh, _, _ in
                     (e for e, ok in zip(plan, use_pallas) if ok)]
    iip = (lbp_pad_for(cascade, iib, pallas_ladder, ih, iw, step)
           if pallas_ladder else None)

    def compile_one(entry):
        e, pallas_ok = entry
        hits = _scale_calls(cascade, iib, iip, [e], [pallas_ok], step)
        # one-element readback fence (block_until_ready can be a no-op, and a
        # full np.asarray would ship each scale's multi-MB hit mask back
        # through the tunnel)
        from ..profiling import sync

        sync(hits[0])

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        list(ex.map(compile_one, zip(plan, use_pallas)))

    # the cheap tail: the emission executable for this window count
    metas = _window_metas(cascade, ih, iw, scale_factor, min_scale, max_scale, step)
    total = int(metas[0].shape[0])
    np.asarray(
        _emit_rects(jnp.zeros((nb, total), bool), *metas, int(max_rects)).n)
    return time.perf_counter() - t0


@functools.partial(jax.jit, static_argnames=("cascade", "scale", "x", "y"))
def lbp_window(cascade: LbpCascade, ii: jnp.ndarray, x: int, y: int, scale: float):
    """Single-window cascade evaluation — ``gs_lbp_window`` (grayskull.h:790-813).

    Returns a bool scalar.  Out-of-bounds windows are 0 like the reference.
    """
    ih, iw = ii.shape
    f = np.float32
    win_w = int(f(cascade.window_w) * f(scale))
    win_h = int(f(cascade.window_h) * f(scale))
    ok = _eval_windows(cascade, ii[None], float(scale), 1, 1, 1,
                       origin=(int(y), int(x)))[0, 0, 0]
    fits = (x + win_w <= iw) & (y + win_h <= ih)
    return ok & fits
