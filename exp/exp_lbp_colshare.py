"""Experiment: cut the LBP kernel's lane-relayout traffic two independent ways.

The strip kernel's measured bound is the per-weak lane-misaligned column
slices (3 tall slices per weak after row-phase grouping — kernels/lbp.py).
Two untried levers:

1. **Column cache** (``colcache=True``): the 139 weaks' 417 grouped column
   slices hit only 220-241 DISTINCT (feature size, column offset) pairs at
   full-ladder scales (measured host-side; 290-310 within split-3 chunks).
   Slice each distinct column ONCE at the union of its users' row spans and
   serve every weak from sublane-only sub-slices.  If Mosaic already CSEs
   identical slice ops this measures ~0; if not, it cuts relayout bytes to
   0.73-0.83x (split-3) or 0.57-0.70x (single chunk).

2. **Tall-narrow strips** (``tw`` override): per-window relayout bytes scale
   as ``(th + span)/th * (tw/128 + 1)/(tw/128)`` (the +1 is the extra source
   vreg column a misaligned lane slice touches).  At scale 3.58 (span ~57)
   th=48/tw=768 costs 2.56 vreg-units/window vs th=128/tw=384 at 1.93 —
   a ~25% cut where the ladder drags most; at scale 1.0 it is a wash.
   Earlier probes (exp_lbp_split --tall) only ever tried th>=64 at tw=768,
   where the ~(weaks-4) live strip temporaries blow scoped VMEM.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python exp/exp_lbp_colshare.py

MEASURED VERDICTS (v5e, batch 32, 640x480, step 1, 2026-08-19): BOTH DEAD.
* Column cache: the only configs that compiled (th32 x3, scales 1.0/2.07)
  measured 214/206 M win/s vs ~238/228 for the same geometry WITHOUT the
  cache — a ~10% LOSS.  The extended live ranges hurt scheduling more than
  the re-slices cost (and/or Mosaic already CSEs identical slices).  At
  th>=48 the cached columns' live set blows scoped VMEM outright.
* Tall-narrow: every th>=96 variant (tw 384/256, x3/x4) FAILS to compile
  with a scoped-VMEM stack OOM (measured 17.49M vs the 16M limit for
  th96/tw384/x3) — map VMEM grows with th (mh = oy_max + th), which the
  slice-byte model ignored.  Tight map extents (union-of-users rows) would
  only save 5-18% of map bytes (host-side count) — not enough to admit
  th=96.  The shipping th=48/32 chunked family stands.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from grayskull_tpu.kernels.lbp import _pick_tw, _round, _stage_chunks  # noqa: E402
from grayskull_tpu.ops.lbp import _scaled_features, _subset_matrix  # noqa: E402

_BLOCK_BITS = (7, 6, 5, 0, -1, 4, 1, 2, 3)


def _plan_chunk(cascade, scale, tw, th, step, k_lo, k_hi):
    """kernels.lbp._plan for weaks [k_lo, k_hi), plus per-column row-span
    extents for the column cache."""
    fx, fy, fw, fh = _scaled_features(cascade, scale)
    wi = cascade.weak_feature_idx.astype(np.int32)
    map_dims = {}
    col_span = {}  # (w, h, py, px, sx) -> (sy_lo, sy_hi) union over users
    phases_used = set()
    for k in range(k_lo, k_hi):
        f = int(wi[k])
        w_, h_ = int(fw[f]), int(fh[f])
        for bi in range(3):
            ox = int(fx[f]) + bi * w_
            px = ox % step
            sx = ox // step
            for bj in range(3):
                oy = int(fy[f]) + bj * h_
                key = (w_, h_, oy % step, px)
                mh = oy // step + th
                mw = sx + tw
                old = map_dims.get(key, (0, 0))
                map_dims[key] = (max(old[0], mh), max(old[1], mw))
                ck = (w_, h_, oy % step, px, sx)
                sy = oy // step
                lo, hi = col_span.get(ck, (sy, sy))
                col_span[ck] = (min(lo, sy), max(hi, sy))
                py = oy % step
                for dy, dx in ((0, 0), (0, w_), (h_, 0), (h_, w_)):
                    phases_used.add(((py + dy) % step) * step + ((px + dx) % step))
    rh = max((py + h_) // step + mh
             for (w_, h_, py, px), (mh, mw) in map_dims.items()) + 1
    rw = max((px + w_) // step + mw
             for (w_, h_, py, px), (mh, mw) in map_dims.items()) + 1
    subs, counts = _subset_matrix(cascade)
    return dict(fx=fx, fy=fy, fw=fw, fh=fh, wi=wi, subs=subs,
                lefts=np.asarray(cascade.weak_left_val, np.float32),
                rights=np.asarray(cascade.weak_right_val, np.float32),
                map_dims=map_dims, col_span=col_span,
                phases_used=tuple(sorted(phases_used)),
                rh=_round(rh, 8), rw=_round(rw, 128))


def _eval_chunk(ii_ref, alive, geo, cascade, stages, th, tw, step,
                ty, tx, colcache):
    regions = {
        p: ii_ref[0, p, pl.ds(ty * th, geo["rh"]), pl.ds(tx * tw, geo["rw"])]
        for p in geo["phases_used"]
    }
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

    cols = {}

    def get_col(w_, h_, py, px, sx):
        """(union_span + th, tw) lane slice, cut once per distinct column."""
        ck = (w_, h_, py, px, sx)
        if ck not in cols:
            lo, hi = geo["col_span"][ck]
            m = maps[(w_, h_, py, px)]
            cols[ck] = (lo, m[lo : hi + th, sx : sx + tw])
        return cols[ck]

    fx, fy, fw, fh, wi = geo["fx"], geo["fy"], geo["fw"], geo["fh"], geo["wi"]
    subs = geo["subs"]
    lefts, rights = geo["lefts"], geo["rights"]

    def eval_weak(k):
        f = int(wi[k])
        w_, h_ = int(fw[f]), int(fh[f])
        oy0, ox0 = int(fy[f]), int(fx[f])
        blocks = {}
        for bi in range(3):
            ox = ox0 + bi * w_
            px = ox % step
            sx = ox // step
            if colcache:
                for bj in range(3):
                    oy = oy0 + bj * h_
                    lo, col = get_col(w_, h_, oy % step, px, sx)
                    sy = oy // step
                    blocks[(bj, bi)] = col[sy - lo : sy - lo + th, :]
            else:
                by_phase = {}
                for bj in range(3):
                    oy = oy0 + bj * h_
                    by_phase.setdefault(oy % step, []).append((bj, oy // step))
                for py, rows_list in by_phase.items():
                    m = maps[(w_, h_, py, px)]
                    sy_min = min(s for _, s in rows_list)
                    span = max(s for _, s in rows_list) - sy_min
                    tall = m[sy_min : sy_min + span + th, sx : sx + tw]
                    for bj, sy in rows_list:
                        blocks[(bj, bi)] = tall[sy - sy_min : sy - sy_min + th, :]
        center = blocks[(1, 1)]
        code = jnp.zeros((th, tw), jnp.int32)
        for blk, bit in enumerate(_BLOCK_BITS):
            if bit < 0:
                continue
            c = (blocks[(blk // 3, blk % 3)] >= center).astype(jnp.int32)
            code = code | (c << int(bit))
        idx = code >> 5
        bit_i = code & 31
        s = [jnp.int32(int(subs[k, jj])) for jj in range(8)]
        b0, b1, b2 = (idx & 1) != 0, (idx & 2) != 0, (idx & 4) != 0
        w01 = jnp.where(b0, s[1], s[0])
        w23 = jnp.where(b0, s[3], s[2])
        w45 = jnp.where(b0, s[5], s[4])
        w67 = jnp.where(b0, s[7], s[6])
        word = jnp.where(b2, jnp.where(b1, w67, w45), jnp.where(b1, w23, w01))
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
    return alive


def _chunk_kernel(ii_ref, *refs, cascade, ny, nx, geo, th, tw, step, stages,
                  first, colcache):
    if first:
        (out_ref,) = refs
    else:
        alive_ref, out_ref = refs
    ty, tx = pl.program_id(1), pl.program_id(2)
    if first:
        wy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + ty * th
        wx = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + tx * tw
        alive = ((wy < ny) & (wx < nx)).astype(jnp.int32)
    else:
        alive = alive_ref[0].astype(jnp.int32)
    alive = _eval_chunk(ii_ref, alive, geo, cascade, stages, th, tw, step,
                        ty, tx, colcache)
    out_ref[0] = alive.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("cascade", "scale", "ny", "nx",
                                             "step", "th", "tw", "nchunks",
                                             "colcache"))
def eval_scale_v(cascade, iip, scale, ny, nx, step=1, th=48, tw=None,
                 nchunks=3, colcache=False):
    n = iip.shape[0]
    if tw is None:
        tw = _pick_tw(nx)
    nty, ntx = -(-ny // th), -(-nx // tw)
    chunks = []
    for s_lo, s_hi, k_lo, k_hi in _stage_chunks(cascade, nchunks):
        geo = _plan_chunk(cascade, scale, tw, th, step, k_lo, k_hi)
        chunks.append((geo, tuple(range(s_lo, s_hi))))
    Hp = max((nty - 1) * th + g["rh"] for g, _ in chunks)
    Wp = max((ntx - 1) * tw + g["rw"] for g, _ in chunks)
    assert iip.shape[1] >= Hp * step and iip.shape[2] >= Wp * step, (
        iip.shape, Hp * step, Wp * step)
    if step == 1:
        planes = iip[:, None]
    else:
        need_h, need_w = Hp * step, Wp * step
        planes = jnp.stack(
            [iip[:, py:need_h:step, px:need_w:step]
             for py in range(step) for px in range(step)], axis=1)

    alive = None
    for ci, (geo, stages) in enumerate(chunks):
        first = ci == 0
        in_specs = [pl.BlockSpec((1, step * step, Hp, Wp),
                                 lambda i, j, k: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)]
        args = [planes]
        if not first:
            in_specs.append(pl.BlockSpec((1, th, tw), lambda i, j, k: (i, j, k),
                                         memory_space=pltpu.VMEM))
            args.append(alive)
        alive = pl.pallas_call(
            functools.partial(_chunk_kernel, cascade=cascade, ny=ny, nx=nx,
                              geo=geo, th=th, tw=tw, step=step, stages=stages,
                              first=first, colcache=colcache),
            grid=(n, nty, ntx),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, th, tw), lambda i, j, k: (i, j, k),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, nty * th, ntx * tw), jnp.uint8),
        )(*args)
    return alive[:, :ny, :nx] != 0


def main():
    from grayskull_tpu.cascade import load_frontalface
    from grayskull_tpu.kernels.lbp import lbp_eval_scale, lbp_pad_for
    from grayskull_tpu.ops.integral import integral
    from grayskull_tpu.profiling import timeit

    cascade = load_frontalface()
    nb, ih, iw = 32, 480, 640
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (nb, ih, iw), dtype=np.uint8)
    iib = integral(jnp.asarray(imgs))
    step = 1
    f = np.float32
    for scale in (1.0, float(1.2 ** 4), float(1.2 ** 7)):
        ww = int(f(cascade.window_w) * f(scale))
        wh = int(f(cascade.window_h) * f(scale))
        ny, nx = (ih - wh) + 1, (iw - ww) + 1
        iip = lbp_pad_for(cascade, iib, [(scale, ww, wh)], ih, iw, step)
        # shared pad must also cover the taller/narrower variant strips
        iip = jnp.pad(iip, ((0, 0), (0, 512), (0, 512)))

        base = np.asarray(lbp_eval_scale(cascade, iip, scale, ny, nx, step))
        t = timeit(lambda: lbp_eval_scale(cascade, iip, scale, ny, nx, step),
                   warmup=1, iters=10)
        print(f"scale {scale:.3f}  A shipping:      {t*1e3:8.2f} ms  "
              f"{nb*ny*nx/t/1e6:7.1f} M win/s")
        sys.stdout.flush()
        for name, kw in (
            ("B cache th48x3 tw768", dict(th=48, tw=768, nchunks=3, colcache=True)),
            ("C cache th48x2 tw768", dict(th=48, tw=768, nchunks=2, colcache=True)),
            ("D cache th96x3 tw384", dict(th=96, tw=384, nchunks=3, colcache=True)),
            ("E plain th96x3 tw384", dict(th=96, tw=384, nchunks=3, colcache=False)),
            ("F cache th128x4 tw384", dict(th=128, tw=384, nchunks=4, colcache=True)),
            ("G plain th128x4 tw384", dict(th=128, tw=384, nchunks=4, colcache=False)),
            ("H cache th128x4 tw256", dict(th=128, tw=256, nchunks=4, colcache=True)),
            # the cache extends each column's live range to its last user —
            # if that blows scoped VMEM at th>=48, shorter strips may still
            # net a win from the 0.68-0.73x slice-byte cut
            ("I cache th32x2 tw768", dict(th=32, tw=768, nchunks=2, colcache=True)),
            ("J cache th32x3 tw768", dict(th=32, tw=768, nchunks=3, colcache=True)),
        ):
            try:
                got = np.asarray(eval_scale_v(cascade, iip, scale, ny, nx,
                                              step, **kw))
                ok = (got == base).all()
                t = timeit(lambda: eval_scale_v(cascade, iip, scale, ny, nx,
                                                step, **kw),
                           warmup=1, iters=10)
                print(f"scale {scale:.3f}  {name}: {t*1e3:8.2f} ms  "
                      f"{nb*ny*nx/t/1e6:7.1f} M win/s  "
                      f"{'exact' if ok else 'MISMATCH'}")
            except Exception as e:  # noqa: BLE001
                print(f"scale {scale:.3f}  {name}: FAILED "
                      f"{type(e).__name__}: {str(e)[:140]}")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
