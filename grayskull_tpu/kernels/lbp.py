"""Pallas LBP cascade evaluator — the TPU fast path behind ``ops.lbp``.

The XLA formulation in ``ops/lbp.py`` materializes ~1,250 full-window-grid
slices per scale through HBM (9 block reads x 139 weaks), which makes it
HBM-bound at ~30 M windows/s.  This kernel keeps the integral image resident
in VMEM and evaluates the whole cascade per window strip in registers:

* grid ``(N, strips_y, strips_x)`` with window strips of (``TH``, <=768) —
  the strip spans the FULL window-grid width whenever it fits, so each
  weak's nine lane-misaligned block slices (the dominant cost: every one is
  a vector relayout) are paid once per strip row instead of once per
  256-wide tile; ``TH`` is the largest of 32/16/8 whose VMEM block fits —
  taller strips amortize the same relayouts over more window rows (r3: the
  TH=8 -> 32 change roughly doubled windows/s);
* the cascade is CHUNKED into two sequential kernels (stage ranges chained
  through the alive mask) when that buys TH=32 over TH=16: the scoped-VMEM
  live set scales with the kernel's unrolled weak count, so ~70-weak chunks
  admit strips twice as tall — measured 1.16-1.2x end-to-end despite the
  doubled map construction and extra launch (exp/exp_lbp_split.py; the
  pl.when-fused single-kernel form and per-stage region scoping both
  measured SLOWER — Mosaic regions serialize and pay entry/exit);
* the padded integral image is one revisited VMEM block per frame, so each
  weak's nine block sums are *static* slices of per-strip region values
  (the strip's dynamic row offset is a multiple of 8, satisfying Mosaic's
  alignment rule);
* **any window stride** (``step``): the integral is phase-decomposed
  host-side into ``step x step`` planes (``plane[p][I, J] =
  iip[I*step+p_y, J*step+p_x]``), so a rect-sum corner at feature offset
  ``(oy, ox)`` is a static slice of the ``(oy % step, ox % step)`` plane
  shifted by ``(oy // step, ox // step)`` — windows stay lane-dense for
  every stride (r3: ``nanomagick faces N>=2`` passes its min_neighbors arg
  as the stride, nanomagick.c:363-364, and used to fall off the fast path);
* rect-sum maps are built per strip per distinct (scaled block size, corner
  phase) actually used — ``gs_integral_sum``'s edge guards become the
  leading zero row/column of the padded integral, exactly like the XLA path;
* per-scale geometry (the reference's float32 feature scaling,
  grayskull.h:799-804) is host-side static data baked into the kernel, so
  each ladder scale compiles its own specialized program (~8-25 s; the
  two chunk kernels of a split scale compile within one program).  The
  scales are independent programs, so ``ops.lbp.lbp_warm_start`` compiles
  them concurrently (the compiler overlaps ~2x, halving first-call wall
  time); the persistent compilation cache enabled in
  ``grayskull_tpu/__init__`` can additionally warm later processes when
  the backend honors it.

The reference's per-window early exit (grayskull.h:810) deliberately has NO
counterpart here: surviving windows are *scattered*, not clustered — on the
640x480 testdata even after 8 stages (0.5% windows alive) ~90% of (8,128)
tiles still contain a survivor, so tile-granularity exits never fire (and
measured 0% win).  Dense evaluation of all 20 stages is semantics-identical
(the exit is purely a serial-CPU optimization) and lets the strips stay
branch-free.

Bit-exact vs ``ops.lbp._eval_windows`` and the C oracle (uint32 wrap
arithmetic, f32 stage sums in weak order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lbp_eval_scale", "lbp_pad_for", "lbp_pallas_available"]

_TW_MAX = 768  # full-width strips up to this many lanes; wider grids tile
_VMEM_BLOCK_BYTES = 11 * 1024 * 1024  # working-set budget (scoped limit 16M)
# tall strips (th > 8) at step > 1 underpredict harder — see
# _vmem_estimate; budget those configs so real usage keeps clear headroom
# under the 16 MB scoped limit (the observed OOM predicted 10.4 MB under
# this accounting; the observed pass predicted 9.9 MB)
_VMEM_BLOCK_BYTES_STEPN = 9_000_000
# th=48 with >= 4 chunks: _vmem_estimate under-predicts the big-scale map
# construction transients (r5 hardware calibration, exp_lbp_tail_r5: every
# 48x4 config predicted <= 10.28 MB compiled and ran; the 10.91 MB
# prediction hit a real 17.30 MB scoped-VMEM OOM) — gate those configs at
# the measured pass/fail boundary instead of the generic 11 MB budget.
_VMEM_BLOCK_BYTES_T48_MULTI = 10_500_000

# strip-config preference ladders for _padded_dims, ordered by measured
# throughput (see the comment block in _padded_dims).  Module-scope so
# hardware experiments can override + re-pick (exp/exp_lbp_tail_r5.py);
# _padded_dims is lru_cached — call _padded_dims.cache_clear() after
# changing these.
_CANDIDATES = ((48, 3), (48, 4), (48, 5), (32, 1), (32, 2), (32, 3),
               (32, 4), (16, 1), (16, 2), (16, 3), (8, 1), (8, 2))
_CANDIDATES_STEPN = _CANDIDATES[3:]


def _round(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _pick_tw(nx: int) -> int:
    return min(_round(nx, 128), _TW_MAX)


def _lbp_scale_kernel(ii_ref, *refs, cascade, ny, nx, geo, th, tw, step,
                      stages, first):
    """One cascade *chunk* (a contiguous stage range) over one window strip.

    ``first`` chunks initialize the alive mask from the grid bounds; later
    chunks AND into the previous chunk's mask (``alive_ref``).  Stage sums
    never cross stages (grayskull.h:790-813), so chunking is semantics-free;
    it exists so the unrolled weak chain per kernel stays small enough for
    Mosaic's scoped-VMEM allocator to admit th=32 strips (see
    ``_padded_dims``)."""
    if first:
        (out_ref,) = refs
    else:
        alive_ref, out_ref = refs
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    rh, rw = geo["rh"], geo["rw"]
    # per-phase strip regions: ii_ref is (1, step*step, Hp, Wp)
    regions = {
        p: ii_ref[0, p, pl.ds(ty * th, rh), pl.ds(tx * tw, rw)]
        for p in geo["phases_used"]
    }

    # per-(size, phase)-tight rect-sum maps: four phase-plane slices each
    maps = {}
    for (w_, h_, py, px), (mh, mw) in geo["map_dims"].items():
        def corner(dy, dx):
            cy, cx = py + dy, px + dx
            r = regions[(cy % step) * step + (cx % step)]
            sy, sx = cy // step, cx // step
            return r[sy : sy + mh, sx : sx + mw]

        maps[(w_, h_, py, px)] = (
            corner(h_, w_) + corner(0, 0) - corner(0, w_) - corner(h_, 0)
        )

    if first:
        wy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + ty * th
        wx = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + tx * tw
        alive = ((wy < ny) & (wx < nx)).astype(jnp.int32)
    else:
        alive = alive_ref[0].astype(jnp.int32)

    fx, fy, fw, fh, wi = geo["fx"], geo["fy"], geo["fw"], geo["fh"], geo["wi"]
    subs = geo["subs"]
    lefts, rights = geo["lefts"], geo["rights"]
    # code bit per block (bj*3+bi): TL<<7 TC<<6 TR<<5 L<<0 C=- R<<4 BL<<1 BC<<2 BR<<3
    block_bits = (7, 6, 5, 0, -1, 4, 1, 2, 3)  # grayskull.h:781-782

    def eval_weak(k):
        f = int(wi[k])
        w_, h_ = int(fw[f]), int(fh[f])
        oy0 = int(fy[f])
        ox0 = int(fx[f])

        # one lane-misaligned slice per block COLUMN per phase (the
        # expensive relayout), then cheap sublane-only sub-slices for the
        # three block rows SHARING that column's phase
        blocks = {}
        for bi in range(3):
            ox = ox0 + bi * w_
            px = ox % step
            # block rows bj = 0..2 have oy = oy0 + bj*h_: group rows by
            # their phase so each tall slice is cut once per distinct phase
            by_phase = {}
            for bj in range(3):
                oy = oy0 + bj * h_
                by_phase.setdefault(oy % step, []).append((bj, oy // step))
            for py, rows_list in by_phase.items():
                m = maps[(w_, h_, py, px)]
                sy_min = min(s for _, s in rows_list)
                sy_max = max(s for _, s in rows_list)
                tall = m[sy_min : sy_max + th, ox // step : ox // step + tw]
                for bj, sy in rows_list:
                    blocks[(bj, bi)] = tall[sy - sy_min : sy - sy_min + th, :]

        center = blocks[(1, 1)]
        code = jnp.zeros((th, tw), jnp.int32)
        for blk, bit in enumerate(block_bits):
            if bit < 0:
                continue
            c = (blocks[(blk // 3, blk % 3)] >= center).astype(jnp.int32)
            code = code | (c << int(bit))
        idx = code >> 5
        bit_i = code & 31
        # 3-level mux tree on idx bits; subset words beyond num_subsets are
        # zero-padded, so C's (code/32 < num_subsets) guard is subsumed — a
        # zero word can never match (grayskull.h:785-788)
        s = [jnp.int32(int(subs[k, jj])) for jj in range(8)]
        b0 = (idx & 1) != 0
        b1 = (idx & 2) != 0
        b2 = (idx & 4) != 0
        w01 = jnp.where(b0, s[1], s[0])
        w23 = jnp.where(b0, s[3], s[2])
        w45 = jnp.where(b0, s[5], s[4])
        w67 = jnp.where(b0, s[7], s[6])
        lo_w = jnp.where(b1, w23, w01)
        hi_w = jnp.where(b1, w67, w45)
        word = jnp.where(b2, hi_w, lo_w)
        match = ((word >> bit_i) & 1) == 1
        return jnp.where(match, jnp.float32(float(lefts[k])),
                         jnp.float32(float(rights[k])))

    for si in stages:
        s0 = int(cascade.stage_weak_start[si])
        cnt = int(cascade.stage_nweaks[si])
        ssum = eval_weak(s0)
        for k in range(1, cnt):
            ssum = ssum + eval_weak(s0 + k)
        passed = ssum >= jnp.float32(float(cascade.stage_threshold[si]))
        alive = alive & passed.astype(jnp.int32)

    out_ref[0] = alive.astype(jnp.uint8)


def _plan(cascade, scale: float, tw: int, th: int, step: int, k_lo: int = 0,
          k_hi: int | None = None):
    """Host-side static geometry for one ladder scale at strip (th, tw),
    restricted to weaks [k_lo, k_hi) — a cascade chunk's kernel only
    materializes the rect-sum maps its own weaks touch."""
    from ..ops.lbp import _scaled_features, _subset_matrix

    fx, fy, fw, fh = _scaled_features(cascade, scale)
    wi = cascade.weak_feature_idx.astype(np.int32)

    # distinct (size, corner phase) maps actually used, with tight extents
    map_dims = {}
    phases_used = set()
    for k in range(k_lo, cascade.nweaks if k_hi is None else k_hi):
        f = int(wi[k])
        w_, h_ = int(fw[f]), int(fh[f])
        for bi in range(3):
            ox = int(fx[f]) + bi * w_
            for bj in range(3):
                oy = int(fy[f]) + bj * h_
                key = (w_, h_, oy % step, ox % step)
                # map extents in window units: row sy = oy//step spans th
                # rows; col sx = ox//step spans tw cols
                mh = oy // step + th
                mw = ox // step + tw
                old = map_dims.get(key, (0, 0))
                map_dims[key] = (max(old[0], mh), max(old[1], mw))
                # corner phases this map construction touches
                py, px = oy % step, ox % step
                for dy, dx in ((0, 0), (0, w_), (h_, 0), (h_, w_)):
                    phases_used.add(((py + dy) % step) * step + ((px + dx) % step))

    # region extents: max over maps of construction reach in each phase plane
    rh = max(
        (py + h_) // step + mh
        for (w_, h_, py, px), (mh, mw) in map_dims.items()
    ) + 1
    rw = max(
        (px + w_) // step + mw
        for (w_, h_, py, px), (mh, mw) in map_dims.items()
    ) + 1
    subs, counts = _subset_matrix(cascade)
    geo = dict(fx=fx, fy=fy, fw=fw, fh=fh, wi=wi, subs=subs,
               counts=counts.astype(np.int32),
               lefts=np.asarray(cascade.weak_left_val, np.float32),
               rights=np.asarray(cascade.weak_right_val, np.float32),
               map_dims=map_dims, phases_used=tuple(sorted(phases_used)),
               rh=_round(rh, 8), rw=_round(rw, 128))
    return geo


def _vmem_estimate(geo, th: int, tw: int, step: int, Hp: int, Wp: int,
                   nweaks: int) -> int:
    """Scoped-VMEM working-set estimate for one strip invocation: the input
    phase planes + every materialized rect-sum map + the live (th, tw)
    temporaries of the unrolled ``nweaks``-weak chain.  Mosaic's scoped
    stack limit is 16 MB and its allocator keeps ~(nweaks - 4) strip-sized
    values live across the stage-sum chain (calibrated against a measured
    17.27 MB overflow at th=32/tw=768 for the full 139-weak cascade, where
    this formula must predict >= ~16 MB) — which is exactly why the cascade
    is CHUNKED across two kernels when that buys a taller strip.

    Tall strips (th > 8) at step > 1 count the phase planes TWICE: grid
    pipelining double-buffers the next frame's planes (an r2 batch-32
    step-2 th=16 ladder overflowed the real limit while batch-1 compiles of
    the same kernel fit), and the per-phase map construction holds more
    transients than the formula sees (a th=32 step-2 scale predicted at
    10.2 MB compiled to a real 16.45 MB stack while a 9.9 MB prediction
    ran) — hence also the tighter ``_VMEM_BLOCK_BYTES_STEPN`` budget those
    configs are gated against.  th=8 step>1 configs keep the r2-shipping
    accounting they were validated under."""
    tall_stepn = step > 1 and th > 8
    planes = step * step * Hp * Wp * 4 * (2 if tall_stepn else 1)
    maps = sum(mh * mw * 4 for (mh, mw) in geo["map_dims"].values())
    temps = max(nweaks - 4, 8) * th * tw * 4
    return planes + maps + temps


def _stage_chunks(cascade, nchunks: int):
    """Contiguous stage ranges splitting the weak count ~evenly:
    ((s_lo, s_hi, k_lo, k_hi), ...)."""
    total = int(cascade.nweaks)
    bounds = [0]
    acc = 0
    for si in range(cascade.nstages):
        acc += int(cascade.stage_nweaks[si])
        if acc >= total / nchunks * len(bounds) and len(bounds) < nchunks:
            bounds.append(si + 1)
    bounds.append(int(cascade.nstages))
    # back-loaded stage weights can cross the last split threshold only at
    # the final stage (e.g. stage_nweaks=[1, 99], nchunks=2 -> [0, 2, 2]);
    # drop the duplicate rather than emit an empty chunk whose
    # stage_weak_start[s_lo] would index past the table
    bounds = sorted(set(bounds))
    out = []
    for ci in range(len(bounds) - 1):
        s_lo, s_hi = bounds[ci], bounds[ci + 1]
        k_lo = int(cascade.stage_weak_start[s_lo])
        k_hi = (int(cascade.stage_weak_start[s_hi - 1])
                + int(cascade.stage_nweaks[s_hi - 1]))
        out.append((s_lo, s_hi, k_lo, k_hi))
    return tuple(out)


@functools.lru_cache(maxsize=512)
def _padded_dims(cascade, scale: float, ny: int, nx: int, step: int):
    """Strip geometry: (tw, th, chunks, nty, ntx, Hp, Wp, fits) with the
    largest strip height whose working set fits scoped VMEM.  ``chunks`` is
    a tuple of (geo, stage_range) cascade chunks evaluated as sequential
    kernels chained through the alive mask: a 2-chunk split at th=32
    measured 1.16-1.20x the th=16 single-kernel throughput at 640x480
    (exp/exp_lbp_split.py — th=32 alone is worth +48% over th=16 but the
    split costs double map construction + an extra launch; fused/pl.when
    variants measured slower).

    step > 1 pins th=8 single-chunk: the step^2 phase planes and per-phase
    map copies push the real scoped usage past the estimate (a batch-32
    step-2 ladder at th=16 overflowed the 16 MB limit once grid pipelining
    double-buffers the next frame's planes; batch-1 compiles of the same
    kernel fit)."""
    tw = _pick_tw(nx)

    def build(th: int, nchunks: int):
        nty, ntx = -(-ny // th), -(-nx // tw)
        chunks = []
        counts = []
        Hp = Wp = 0
        for s_lo, s_hi, k_lo, k_hi in _stage_chunks(cascade, nchunks):
            geo = _plan(cascade, scale, tw, th, step, k_lo, k_hi)
            Hp = max(Hp, (nty - 1) * th + geo["rh"])
            Wp = max(Wp, (ntx - 1) * tw + geo["rw"])
            chunks.append((geo, tuple(range(s_lo, s_hi))))
            counts.append(k_hi - k_lo)
        if step > 1 and th > 8:
            budget = _VMEM_BLOCK_BYTES_STEPN
        elif th >= 48 and nchunks >= 4:
            budget = _VMEM_BLOCK_BYTES_T48_MULTI
        else:
            budget = _VMEM_BLOCK_BYTES
        fits = all(
            _vmem_estimate(geo, th, tw, step, Hp, Wp, cnt) <= budget
            for (geo, _), cnt in zip(chunks, counts)
        )
        return fits, (tw, th, tuple(chunks), nty, ntx, Hp, Wp, fits)

    # ordered by measured preference (exp/exp_lbp_split.py): taller strips
    # dominate (th=32 over th=16 is +48% before split costs), then fewer
    # chunks at equal th (the split pays double map construction + a launch:
    # single 226 > split2 177 M win/s at th=16; split2 262 > split3 238 at
    # th=32).  More chunks also shrink per-chunk maps, which is what admits
    # th=32 for the LARGE ladder scales (their scaled features need 4-5 MB
    # of rect-sum maps — these scales used to fall to th=8, 52 strips, and
    # ran 2.5x slower per window than scale 1).
    # the same ladder serves step > 1 (with the doubled planes term above):
    # measured at step 2 scale 1.0, th=32 x4 chunks = 84.2 M win/s vs the
    # previously pinned th=8 single's 55.6 (+51%), th=16 x1 = 80.9
    # r4: th=48 split-3 measured 281 vs 259 M win/s for the shipping th=32
    # split-2 at scale 1/step 1 (exp_lbp_split --tall; th=48 split-2 and all
    # th>=64 variants either overflow scoped VMEM or lose to map-rebuild
    # costs), so it leads the ladder; configs it doesn't fit fall back to
    # the validated 32/16/8 family (see _CANDIDATES at module scope —
    # experiments override it to A/B new configs, exp/exp_lbp_tail_r5.py)
    candidates = _CANDIDATES
    if step > 1:
        # th=48 was hardware-validated only on the step-1 scale ladder, and
        # _vmem_estimate is known to under-predict tall step>1 configs by
        # ~1.6x (a th=48 x4 neighbor OOM'd at a predicted 10.91 MB) — keep
        # step>1 on the 32/16/8 family whose accounting was validated.
        candidates = _CANDIDATES_STEPN
    best = None
    for th, nchunks in candidates:
        fits, best = build(th, nchunks)
        if fits:
            return best
    return best


@functools.partial(jax.jit, static_argnames=("cascade", "scale", "ny", "nx",
                                              "step", "interpret"))
def lbp_eval_scale(cascade, iip: jnp.ndarray, scale: float, ny: int, nx: int,
                   step: int = 1, interpret: bool = False):
    """(N, Hp', Wp') zero-guarded padded integral -> (N, ny, nx) bool hits.

    ``iip`` must carry one leading zero row/column (the ``gs_integral_sum``
    edge guards) and enough trailing zero padding for this scale's geometry —
    ``lbp_pad_for`` supplies a single shared padding for a whole ladder.
    ``ny``/``nx`` are the window-grid dims at stride ``step``.
    """
    n = iip.shape[0]
    tw, th, chunks, nty, ntx, Hp, Wp, _ = _padded_dims(cascade, scale, ny, nx,
                                                       step)
    need_h, need_w = Hp * step, Wp * step
    assert iip.shape[1] >= need_h and iip.shape[2] >= need_w, (
        iip.shape, need_h, need_w)
    # host-side phase decomposition: plane[p][I, J] = iip[I*step+py, J*step+px]
    if step == 1:
        # free expand_dims — the BlockSpec reads the (Hp, Wp) sub-block
        # directly, no HBM copy per scale
        planes = iip[:, None]
    else:
        planes = jnp.stack(
            [iip[:, py:need_h:step, px:need_w:step]
             for py in range(step) for px in range(step)], axis=1
        )  # (N, step^2, Hp, Wp)
    planes_spec = pl.BlockSpec((1, step * step, Hp, Wp),
                               lambda i, j, k: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    alive_spec = pl.BlockSpec((1, th, tw), lambda i, j, k: (i, j, k),
                              memory_space=pltpu.VMEM)
    out = None
    for ci, (geo, stages) in enumerate(chunks):
        first = ci == 0
        out = pl.pallas_call(
            functools.partial(_lbp_scale_kernel, cascade=cascade, ny=ny, nx=nx,
                              geo=geo, th=th, tw=tw, step=step, stages=stages,
                              first=first),
            grid=(n, nty, ntx),
            in_specs=[planes_spec] if first else [planes_spec, alive_spec],
            out_specs=alive_spec,
            out_shape=jax.ShapeDtypeStruct((n, nty * th, ntx * tw), jnp.uint8),
            interpret=interpret,
        )(*([planes] if first else [planes, out]))
    return out[:, :ny, :nx] != 0


def lbp_pad_for(cascade, iib: jnp.ndarray, ladder, ih: int, iw: int, step: int):
    """One shared zero-padded integral covering every ladder scale's kernel.

    Padding per scale costs a full HBM copy of the integral batch; the max
    over scales is padded once instead.  Trailing zeros are only reached by
    invalid windows / last-position feature overhang (same semantics as
    ``ops.lbp._eval_windows``); the leading zero row/column is the
    ``gs_integral_sum`` edge guard.  Callers pass only the Pallas-enabled
    ladder scales (gated-off scales run on the XLA fallback with the
    unpadded integral and must not inflate the shared pad).
    """
    Hp = Wp = 0
    for scale, win_w, win_h in ladder:
        ny = (ih - win_h) // step + 1
        nx = (iw - win_w) // step + 1
        if ny <= 0 or nx <= 0:
            continue
        _, _, _, _, _, hp, wp, _ = _padded_dims(cascade, scale, ny, nx, step)
        Hp, Wp = max(Hp, hp * step), max(Wp, wp * step)
    n, H, W = iib.shape
    return jnp.pad(iib, ((0, 0), (1, max(Hp - H - 1, 0)), (1, max(Wp - W - 1, 0))))


def lbp_pallas_available(cascade, ih: int, iw: int, scale: float, step: int) -> bool:
    """Geometry gate for the Pallas path (VMEM-sized phase planes).

    Mirrors ``lbp_eval_scale``'s actual padded-block allocation: the
    per-frame VMEM block is ``step^2`` planes of
    ``((nty-1)*th + rh, (ntx-1)*tw + rw)``.
    """
    if step < 1 or step > 4:
        return False
    f = np.float32
    win_w = int(f(cascade.window_w) * f(scale))
    win_h = int(f(cascade.window_h) * f(scale))
    ny = (ih - win_h) // step + 1
    nx = (iw - win_w) // step + 1
    if ny <= 0 or nx <= 0:
        return False
    return _padded_dims(cascade, scale, ny, nx, step)[7]
