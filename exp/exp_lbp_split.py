"""Experiment: split the LBP cascade across sequential kernel passes so the
window strip can grow from th=16 to th=32.

Hypothesis (PERF_NOTES "LBP relayout-bound"): the kernel's cost is
(number of strips) x (weaks) x (~fixed lane-relayout cost per tall slice),
and th is pinned to 16 by the VMEM estimate's `135 * th * tw * 4` live-
temporary term — which counts the FULL unrolled 139-weak chain.  Splitting
the 20 stages into two ~70-weak chunks should halve the live temporaries,
let th=32 fit, halve the strip count, and so halve the dominant per-slice
cost.  The chunks chain through the alive mask (stage sums never cross
stages, grayskull.h:790-813).

Variants measured (640x480, batch 32, scale 1.0, step 1):
  A. baseline `kernels.lbp.lbp_eval_scale` (th picked by the shipping gate)
  B. two pallas_calls, chunked stages, th=32 (alive handed off through HBM)
  C. one pallas_call, 4th innermost grid dim = chunk, th=32 (planes stay
     VMEM-resident across chunks; tests whether Mosaic's scoped allocator
     treats pl.when regions as exclusive)
  D. two pallas_calls at th=16 (isolates the split overhead itself)

Run:  PYTHONPATH=/root/repo:/root/.axon_site python exp/exp_lbp_split.py
      (--r2: optimization_barrier variants, --r3: pl.when region variants)

MEASURED VERDICTS (v5e, batch 32, 640x480, scale 1.0, step 1; all exact):
  A baseline th=16 single:   39.9 ms  226 M win/s
  B split2 th=32:            34.5 ms  262 M win/s   << WINNER, shipped
  C fused2 th=32 (grid dim): 53.2 ms  170 M win/s   (block revisit + when)
  D split2 th=16:            51.1 ms  177 M win/s   (split overhead alone)
  E split3 th=32:            37.9 ms  238 M win/s
  F-I optimization_barrier:  does not lower in Mosaic (NotImplementedError)
  J th=32 per-stage pl.when region + VMEM-scratch alive: 67.2 ms 134 M win/s
  K as J, 2 stages/region:   54.8 ms  165 M win/s
  L th=64 per-stage regions: 52.0 ms  173 M win/s
Reading: th=32 alone is worth +48% over th=16 (D vs B) but costs double map
construction + an extra launch (A vs D = -22%); net +16-20% for B.  Region
scoping to cap the allocator's live set instead of splitting made things
WORSE — Mosaic regions serialize and pay entry/exit per region (consistent
with the exp_merged.py phase-region finding).  B is integrated in
kernels/lbp.py (_padded_dims candidates (32,1)/(32,2)/(16,1)/(8,1)).

ROUND 4 (--r4, step=2 scale 1.0 batch-32; shipping pin was th=8 single):
  A shipping th=8 x1:  40.8 ms   55.6 M win/s
  M th=16 x2:          32.3 ms   70.2 M win/s  exact
  N th=16 x1:          28.0 ms   80.9 M win/s  exact (r2's OOM did not recur)
  O th=32 x4:          26.9 ms   84.2 M win/s  exact  << best
  P th=8  x1 (re-impl) 41.0 ms   55.2 M win/s  exact
Integrated: one candidate ladder for every stride, with the phase-plane
term DOUBLED in _vmem_estimate for step > 1 (grid pipelining
double-buffers the planes — the r2 overflow).
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grayskull_tpu.kernels.lbp import _pick_tw, _round
from grayskull_tpu.ops.lbp import _scaled_features, _subset_matrix

_BLOCK_BITS = (7, 6, 5, 0, -1, 4, 1, 2, 3)


def _plan_chunk(cascade, scale, tw, th, step, k_lo, k_hi):
    """kernels.lbp._plan restricted to weaks [k_lo, k_hi)."""
    fx, fy, fw, fh = _scaled_features(cascade, scale)
    wi = cascade.weak_feature_idx.astype(np.int32)
    map_dims = {}
    phases_used = set()
    for k in range(k_lo, k_hi):
        f = int(wi[k])
        w_, h_ = int(fw[f]), int(fh[f])
        for bi in range(3):
            ox = int(fx[f]) + bi * w_
            for bj in range(3):
                oy = int(fy[f]) + bj * h_
                key = (w_, h_, oy % step, ox % step)
                mh = oy // step + th
                mw = ox // step + tw
                old = map_dims.get(key, (0, 0))
                map_dims[key] = (max(old[0], mh), max(old[1], mw))
                py, px = oy % step, ox % step
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
                map_dims=map_dims, phases_used=tuple(sorted(phases_used)),
                rh=_round(rh, 8), rw=_round(rw, 128))


def _eval_chunk(ii_ref, alive, geo, cascade, stages, ny, nx, th, tw, step, ty, tx):
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
            by_phase = {}
            for bj in range(3):
                oy = oy0 + bj * h_
                by_phase.setdefault(oy % step, []).append((bj, oy // step))
            for py, rows_list in by_phase.items():
                m = maps[(w_, h_, py, px)]
                sy_min = min(s for _, s in rows_list)
                tall = m[sy_min : sy_min + (max(s for _, s in rows_list) - sy_min) + th,
                         ox // step : ox // step + tw]
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
                  first):
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
    alive = _eval_chunk(ii_ref, alive, geo, cascade, stages, ny, nx, th, tw,
                        step, ty, tx)
    out_ref[0] = alive.astype(jnp.uint8)


def _fused_chunks_kernel(ii_ref, out_ref, *, cascade, ny, nx, geos, th, tw,
                         step, stage_chunks):
    ty, tx, c = pl.program_id(1), pl.program_id(2), pl.program_id(3)

    @pl.when(c == 0)
    def _():
        wy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + ty * th
        wx = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + tx * tw
        out_ref[0] = ((wy < ny) & (wx < nx)).astype(jnp.uint8)

    for ci, (geo, stages) in enumerate(zip(geos, stage_chunks)):
        @pl.when(c == ci)
        def _(geo=geo, stages=stages):
            alive = out_ref[0].astype(jnp.int32)
            alive = _eval_chunk(ii_ref, alive, geo, cascade, stages, ny, nx,
                                th, tw, step, ty, tx)
            out_ref[0] = alive.astype(jnp.uint8)


def _split_points(cascade, nchunks):
    """Stage boundaries splitting total weak count ~evenly."""
    total = int(cascade.nweaks)
    bounds = [0]
    acc = 0
    target = total / nchunks
    for si in range(cascade.nstages):
        acc += int(cascade.stage_nweaks[si])
        if acc >= target * len(bounds) and len(bounds) < nchunks:
            bounds.append(si + 1)
    bounds.append(cascade.nstages)
    return bounds


@functools.partial(jax.jit, static_argnames=("cascade", "scale", "ny", "nx",
                                             "step", "th", "nchunks", "fused"))
def eval_scale_split(cascade, iip, scale, ny, nx, step=1, th=32, nchunks=2,
                     fused=False):
    n = iip.shape[0]
    tw = _pick_tw(nx)
    nty, ntx = -(-ny // th), -(-nx // tw)
    bounds = _split_points(cascade, nchunks)
    chunks = []
    for ci in range(nchunks):
        s_lo, s_hi = bounds[ci], bounds[ci + 1]
        k_lo = int(cascade.stage_weak_start[s_lo])
        k_hi = (int(cascade.stage_weak_start[s_hi - 1])
                + int(cascade.stage_nweaks[s_hi - 1]))
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

    if fused:
        out = pl.pallas_call(
            functools.partial(_fused_chunks_kernel, cascade=cascade, ny=ny,
                              nx=nx, geos=tuple(g for g, _ in chunks), th=th,
                              tw=tw, step=step,
                              stage_chunks=tuple(s for _, s in chunks)),
            grid=(n, nty, ntx, nchunks),
            in_specs=[pl.BlockSpec((1, step * step, Hp, Wp),
                                   lambda i, j, k, c: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, th, tw), lambda i, j, k, c: (i, j, k),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, nty * th, ntx * tw), jnp.uint8),
        )(planes)
        return out[:, :ny, :nx] != 0

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
                              first=first),
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
    scale = 1.0
    step = 1
    ny = (ih - 24) // step + 1
    nx = (iw - 24) // step + 1
    ladder = [(scale, 24, 24)]
    iip = lbp_pad_for(cascade, iib, ladder, ih, iw, step)
    # shared pad must also cover the split variants' (possibly taller) strips
    iip = jnp.pad(iip, ((0, 0), (0, 64), (0, 0)))

    base = lbp_eval_scale(cascade, iip, scale, ny, nx, step)
    base_np = np.asarray(base)
    t_base = timeit(lambda: lbp_eval_scale(cascade, iip, scale, ny, nx, step),
                    warmup=1, iters=10)
    wps = nb * ny * nx / t_base
    print(f"A baseline:        {t_base*1e3:8.2f} ms  {wps/1e6:7.1f} M win/s")

    for name, kw in (
        ("B split2 th=32", dict(th=32, nchunks=2, fused=False)),
        ("C fused2 th=32", dict(th=32, nchunks=2, fused=True)),
        ("D split2 th=16", dict(th=16, nchunks=2, fused=False)),
        ("E split3 th=32", dict(th=32, nchunks=3, fused=False)),
    ):
        try:
            got = eval_scale_split(cascade, iip, scale, ny, nx, step, **kw)
            got_np = np.asarray(got)
            ok = (got_np == base_np).all()
            t = timeit(lambda: eval_scale_split(cascade, iip, scale, ny, nx,
                                                step, **kw),
                       warmup=1, iters=10)
            wps = nb * ny * nx / t
            print(f"{name}:   {t*1e3:8.2f} ms  {wps/1e6:7.1f} M win/s  "
                  f"{'exact' if ok else 'MISMATCH'}")
        except Exception as e:  # noqa: BLE001 — report compile/VMEM failures
            print(f"{name}:   FAILED {type(e).__name__}: {str(e)[:200]}")
        sys.stdout.flush()


if __name__ == "__main__" and not any(
        a in sys.argv for a in ("--r2", "--r3", "--r4", "--tall")):
    main()


# --- round 2: single kernel + per-stage optimization_barrier ---------------
# B showed th=32 is worth +48% but the 2-call split eats 2/3 of it (double
# map construction + extra launch + alive round trip).  If the 135-live
# VMEM estimate comes from Mosaic software-pipelining weak temporaries
# ACROSS stages, an identity optimization_barrier on the stage boundary
# should cap the live set near one stage's weaks and let th=32 compile as a
# single kernel.

def _barrier_kernel(ii_ref, out_ref, *, cascade, ny, nx, geo, th, tw, step,
                    every: int):
    ty, tx = pl.program_id(1), pl.program_id(2)
    wy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + ty * th
    wx = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + tx * tw
    alive = ((wy < ny) & (wx < nx)).astype(jnp.int32)
    stages = tuple(range(cascade.nstages))
    for group in range(0, len(stages), every):
        alive = _eval_chunk(ii_ref, alive, geo, cascade,
                            stages[group : group + every], ny, nx, th, tw,
                            step, ty, tx)
        alive = jax.lax.optimization_barrier(alive)
    out_ref[0] = alive.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("cascade", "scale", "ny", "nx",
                                             "step", "th", "every"))
def eval_scale_barrier(cascade, iip, scale, ny, nx, step=1, th=32, every=1):
    n = iip.shape[0]
    tw = _pick_tw(nx)
    nty, ntx = -(-ny // th), -(-nx // tw)
    geo = _plan_chunk(cascade, scale, tw, th, step, 0, int(cascade.nweaks))
    Hp = (nty - 1) * th + geo["rh"]
    Wp = (ntx - 1) * tw + geo["rw"]
    assert iip.shape[1] >= Hp * step and iip.shape[2] >= Wp * step
    planes = iip[:, None] if step == 1 else None
    out = pl.pallas_call(
        functools.partial(_barrier_kernel, cascade=cascade, ny=ny, nx=nx,
                          geo=geo, th=th, tw=tw, step=step, every=every),
        grid=(n, nty, ntx),
        in_specs=[pl.BlockSpec((1, step * step, Hp, Wp),
                               lambda i, j, k: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, tw), lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, nty * th, ntx * tw), jnp.uint8),
    )(planes)
    return out[:, :ny, :nx] != 0


def main2():
    from grayskull_tpu.cascade import load_frontalface
    from grayskull_tpu.kernels.lbp import lbp_eval_scale, lbp_pad_for
    from grayskull_tpu.ops.integral import integral
    from grayskull_tpu.profiling import timeit

    cascade = load_frontalface()
    nb, ih, iw = 32, 480, 640
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (nb, ih, iw), dtype=np.uint8)
    iib = integral(jnp.asarray(imgs))
    scale, step = 1.0, 1
    ny, nx = (ih - 24) + 1, (iw - 24) + 1
    iip = lbp_pad_for(cascade, iib, [(scale, 24, 24)], ih, iw, step)
    iip = jnp.pad(iip, ((0, 0), (0, 96), (0, 0)))

    base = np.asarray(lbp_eval_scale(cascade, iip, scale, ny, nx, step))
    t = timeit(lambda: lbp_eval_scale(cascade, iip, scale, ny, nx, step),
               warmup=1, iters=10)
    print(f"A baseline:        {t*1e3:8.2f} ms  {nb*ny*nx/t/1e6:7.1f} M win/s")
    sys.stdout.flush()
    for name, kw in (
        ("F th=32 bar/1", dict(th=32, every=1)),
        ("G th=32 bar/3", dict(th=32, every=3)),
        ("H th=64 bar/1", dict(th=64, every=1)),
        ("I th=16 bar/1", dict(th=16, every=1)),
    ):
        try:
            got = np.asarray(eval_scale_barrier(cascade, iip, scale, ny, nx,
                                                step, **kw))
            ok = (got == base).all()
            t = timeit(lambda: eval_scale_barrier(cascade, iip, scale, ny, nx,
                                                  step, **kw),
                       warmup=1, iters=10)
            print(f"{name}:   {t*1e3:8.2f} ms  {nb*ny*nx/t/1e6:7.1f} M win/s  "
                  f"{'exact' if ok else 'MISMATCH'}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}:   FAILED {type(e).__name__}: {str(e)[:160]}")
        sys.stdout.flush()


if __name__ == "__main__" and "--r2" in sys.argv:
    main2()


# --- round 3: per-stage pl.when regions scope the allocator ----------------
# optimization_barrier does not lower in Mosaic.  Instead: wrap each stage in
# a pl.when region guarded by an SMEM flag Mosaic cannot constant-fold, with
# `alive` carried in VMEM scratch.  Values created inside a region die at
# region end, so the live set should peak near one stage's weaks.

def _region_kernel(flag_ref, ii_ref, out_ref, alive_ref, *, cascade, ny, nx,
                   geo, th, tw, step, every: int):
    ty, tx = pl.program_id(1), pl.program_id(2)
    wy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + ty * th
    wx = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + tx * tw
    alive_ref[:] = ((wy < ny) & (wx < nx)).astype(jnp.int32)
    stages = tuple(range(cascade.nstages))
    for group in range(0, len(stages), every):
        @pl.when(flag_ref[0] == 1)
        def _(group=group):
            alive = _eval_chunk(ii_ref, alive_ref[:], geo, cascade,
                                stages[group : group + every], ny, nx, th, tw,
                                step, ty, tx)
            alive_ref[:] = alive
    out_ref[0] = alive_ref[:].astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("cascade", "scale", "ny", "nx",
                                             "step", "th", "every"))
def eval_scale_region(cascade, iip, scale, ny, nx, step=1, th=32, every=1):
    n = iip.shape[0]
    tw = _pick_tw(nx)
    nty, ntx = -(-ny // th), -(-nx // tw)
    geo = _plan_chunk(cascade, scale, tw, th, step, 0, int(cascade.nweaks))
    Hp = (nty - 1) * th + geo["rh"]
    Wp = (ntx - 1) * tw + geo["rw"]
    assert iip.shape[1] >= Hp * step and iip.shape[2] >= Wp * step
    planes = iip[:, None] if step == 1 else None
    flag = jnp.ones((1,), jnp.int32)
    out = pl.pallas_call(
        functools.partial(_region_kernel, cascade=cascade, ny=ny, nx=nx,
                          geo=geo, th=th, tw=tw, step=step, every=every),
        grid=(n, nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, step * step, Hp, Wp),
                         lambda i, j, k: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, tw), lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, nty * th, ntx * tw), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((th, tw), jnp.int32)],
    )(flag, planes)
    return out[:, :ny, :nx] != 0


def main3():
    from grayskull_tpu.cascade import load_frontalface
    from grayskull_tpu.kernels.lbp import lbp_eval_scale, lbp_pad_for
    from grayskull_tpu.ops.integral import integral
    from grayskull_tpu.profiling import timeit

    cascade = load_frontalface()
    nb, ih, iw = 32, 480, 640
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (nb, ih, iw), dtype=np.uint8)
    iib = integral(jnp.asarray(imgs))
    scale, step = 1.0, 1
    ny, nx = (ih - 24) + 1, (iw - 24) + 1
    iip = lbp_pad_for(cascade, iib, [(scale, 24, 24)], ih, iw, step)
    iip = jnp.pad(iip, ((0, 0), (0, 96), (0, 0)))

    base = np.asarray(lbp_eval_scale(cascade, iip, scale, ny, nx, step))
    t = timeit(lambda: lbp_eval_scale(cascade, iip, scale, ny, nx, step),
               warmup=1, iters=10)
    print(f"A baseline:        {t*1e3:8.2f} ms  {nb*ny*nx/t/1e6:7.1f} M win/s")
    sys.stdout.flush()
    for name, kw in (
        ("J th=32 rgn/1", dict(th=32, every=1)),
        ("K th=32 rgn/2", dict(th=32, every=2)),
        ("L th=64 rgn/1", dict(th=64, every=1)),
    ):
        try:
            got = np.asarray(eval_scale_region(cascade, iip, scale, ny, nx,
                                               step, **kw))
            ok = (got == base).all()
            t = timeit(lambda: eval_scale_region(cascade, iip, scale, ny, nx,
                                                 step, **kw),
                       warmup=1, iters=10)
            print(f"{name}:   {t*1e3:8.2f} ms  {nb*ny*nx/t/1e6:7.1f} M win/s  "
                  f"{'exact' if ok else 'MISMATCH'}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}:   FAILED {type(e).__name__}: {str(e)[:160]}")
        sys.stdout.flush()


if __name__ == "__main__" and "--r3" in sys.argv:
    main3()


# --- round 4: does chunking unpin step=2 from th=8? ------------------------
# r2 note: step-2 th=16 SINGLE overflowed scoped VMEM once grid pipelining
# double-buffers the step^2 phase planes.  Chunking shrinks temporaries and
# per-chunk maps, so th=16/32 may now fit.  Measured against the shipping
# th=8 single-chunk kernel (itself parity-tested).

def main4():
    from grayskull_tpu.cascade import load_frontalface
    from grayskull_tpu.kernels.lbp import lbp_eval_scale, lbp_pad_for
    from grayskull_tpu.ops.integral import integral
    from grayskull_tpu.profiling import timeit

    cascade = load_frontalface()
    nb, ih, iw = 32, 480, 640
    step = 2
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (nb, ih, iw), dtype=np.uint8)
    iib = integral(jnp.asarray(imgs))
    scale = 1.0
    ny = (ih - 24) // step + 1
    nx = (iw - 24) // step + 1
    iip = lbp_pad_for(cascade, iib, [(scale, 24, 24)], ih, iw, step)
    iip = jnp.pad(iip, ((0, 0), (0, 128), (0, 0)))

    base = np.asarray(lbp_eval_scale(cascade, iip, scale, ny, nx, step))
    t = timeit(lambda: lbp_eval_scale(cascade, iip, scale, ny, nx, step),
               warmup=1, iters=10)
    print(f"A step2 shipping:  {t*1e3:8.2f} ms  {nb*ny*nx/t/1e6:7.1f} M win/s")
    sys.stdout.flush()
    for name, kw in (
        ("M step2 th=16 x2", dict(th=16, nchunks=2, fused=False)),
        ("N step2 th=16 x1", dict(th=16, nchunks=1, fused=False)),
        ("O step2 th=32 x4", dict(th=32, nchunks=4, fused=False)),
        ("P step2 th=8  x1", dict(th=8, nchunks=1, fused=False)),
    ):
        try:
            got = np.asarray(eval_scale_split(cascade, iip, scale, ny, nx,
                                              step, **kw))
            ok = (got == base).all()
            t = timeit(lambda: eval_scale_split(cascade, iip, scale, ny, nx,
                                                step, **kw),
                       warmup=1, iters=10)
            print(f"{name}: {t*1e3:8.2f} ms  {nb*ny*nx/t/1e6:7.1f} M win/s  "
                  f"{'exact' if ok else 'MISMATCH'}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
        sys.stdout.flush()


if __name__ == "__main__" and "--r4" in sys.argv:
    main4()


# --- round 4b: taller strips via more chunks (th=48/64) --------------------
# The shipping ladder stops at th=32 (candidates in kernels/lbp.py
# _padded_dims).  Relayout cost per window ~ (overhang + th)/th, and the
# per-op fixed overhead amortizes with th (th=8 -> 32 roughly doubled
# windows/s), so th=48/64 — admitted by splitting the live-temporary chain
# across 3-5 chunks — may clear the 3.0e8 win/s bar.  L (th=64 per-stage
# pl.when REGIONS) measured 173 M win/s, but regions serialize; the
# sequential-kernel split is the structure that won at th=32.

def main_tall():
    from grayskull_tpu.cascade import load_frontalface
    from grayskull_tpu.kernels.lbp import lbp_eval_scale, lbp_pad_for
    from grayskull_tpu.ops.integral import integral
    from grayskull_tpu.profiling import timeit

    cascade = load_frontalface()
    nb, ih, iw = 32, 480, 640
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (nb, ih, iw), dtype=np.uint8)
    iib = integral(jnp.asarray(imgs))
    scale, step = 1.0, 1
    ny, nx = (ih - 24) + 1, (iw - 24) + 1
    iip = lbp_pad_for(cascade, iib, [(scale, 24, 24)], ih, iw, step)
    iip = jnp.pad(iip, ((0, 0), (0, 256), (0, 0)))

    base = np.asarray(lbp_eval_scale(cascade, iip, scale, ny, nx, step))
    t = timeit(lambda: lbp_eval_scale(cascade, iip, scale, ny, nx, step),
               warmup=1, iters=10)
    print(f"A shipping:        {t*1e3:8.2f} ms  {nb*ny*nx/t/1e6:7.1f} M win/s")
    sys.stdout.flush()
    for name, kw in (
        ("Q th=48 x2", dict(th=48, nchunks=2, fused=False)),
        ("R th=48 x3", dict(th=48, nchunks=3, fused=False)),
        ("S th=64 x3", dict(th=64, nchunks=3, fused=False)),
        ("T th=64 x4", dict(th=64, nchunks=4, fused=False)),
        ("U th=64 x5", dict(th=64, nchunks=5, fused=False)),
        ("V th=96 x5", dict(th=96, nchunks=5, fused=False)),
    ):
        try:
            got = np.asarray(eval_scale_split(cascade, iip, scale, ny, nx,
                                              step, **kw))
            ok = (got == base).all()
            t = timeit(lambda: eval_scale_split(cascade, iip, scale, ny, nx,
                                                step, **kw),
                       warmup=1, iters=10)
            print(f"{name}:        {t*1e3:8.2f} ms  {nb*ny*nx/t/1e6:7.1f} M win/s  "
                  f"{'exact' if ok else 'MISMATCH'}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}:        FAILED {type(e).__name__}: {str(e)[:160]}")
        sys.stdout.flush()


if __name__ == "__main__" and "--tall" in sys.argv:
    main_tall()
