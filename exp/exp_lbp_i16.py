"""Experiment: i16 LBP strips on the small ladder scales + deeper chunking on
the large ones.

**i16 strips** (scales with max block sum < 32768, i.e. scaled w*h*255 <=
32767 — ladder scales 1.0/1.2/1.44): cast the strip's phase REGIONS to i16
once, then build rect-sum maps, tall column slices, and the 8 per-weak
compares entirely in i16.  Intermediate sums wrap mod 2^16 but the final
block sums are < 32768, so the wrapped arithmetic is EXACT — and Mosaic
packs i16 as (16, 128) vregs, halving the vector-register traffic of the
kernel's dominant costs (lane-relayout slices + compares + code build) and
halving map VMEM.  CLAUDE.md's Mosaic support matrix says i16
add/sub/shift/compare work and shifted slices are the validated i16
pattern; this probes whether that actually buys throughput (i16 ops may
legalize to unpacked 32-bit lanes and buy nothing).

**th=48 deeper chunking** (large scales): th=48 x3 OOMs at scale 3.58
(maps alone are 6-7 MB/chunk); x4/x5 shrink per-chunk maps+temps enough to
fit, trading 1-2 extra map rebuilds for the (32+57)/32 -> (48+57)/48
(-21%) slice-byte ratio.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python exp/exp_lbp_i16.py

MEASURED VERDICTS (v5e, batch 32, 640x480, step 1, 2026-08-19):
* i16 strips: DEAD AT COMPILE.  Mosaic cannot legalize the i16 vector
  compare (`cmp (vector<8x128x2xi16>, ...) -> vector<8x128x2xi1>`), which
  every weak needs 8 of.  (The earlier support matrix's "i16 compare works"
  held for 2-D shifted-slice shapes, not these packed strip layouts.)
  Widening blocks to i32 before the compare pays a cast per block that
  cancels the halved slice bytes — no i16 path exists for this kernel.
* th=48 deep chunks at scale 3.583: x4 OOMs the real scoped stack even
  though `_vmem_estimate` predicts 10.91 MB (<= the 11 MB budget) —
  the estimate under-predicts deep-chunk th=48 by ~5 MB, so these configs
  CANNOT be safely gated into the shipping candidate ladder (an unvalidated
  frame geometry could crash at compile time).  x5 runs and gains +3.2%
  (181.2 vs 175.6 M win/s), x6 loses (168.6) — the rebuild tax eats the
  taller strip.  NOT PROMOTED: +1-3% ladder upside vs a compile-crash
  risk class.  The th=48/32 estimator-validated family stands.
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

from exp.exp_lbp_colshare import _BLOCK_BITS, _plan_chunk  # noqa: E402
from grayskull_tpu.kernels.lbp import _pick_tw, _stage_chunks  # noqa: E402


def _eval_chunk_i16(ii_ref, alive, geo, cascade, stages, th, tw, step,
                    ty, tx, use_i16):
    regions = {
        p: ii_ref[0, p, pl.ds(ty * th, geo["rh"]), pl.ds(tx * tw, geo["rw"])]
        for p in geo["phases_used"]
    }
    if use_i16:
        regions = {p: r.astype(jnp.int16) for p, r in regions.items()}
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
    cdt = jnp.int16 if use_i16 else jnp.int32

    def eval_weak(k):
        f = int(wi[k])
        w_, h_ = int(fw[f]), int(fh[f])
        oy0, ox0 = int(fy[f]), int(fx[f])
        blocks = {}
        for bi in range(3):
            ox = ox0 + bi * w_
            px = ox % step
            sx = ox // step
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
        # code build in the map dtype (fits in 8 bits), widen once for the
        # i32 subset-word mux
        code = jnp.zeros((th, tw), cdt)
        for blk, bit in enumerate(_BLOCK_BITS):
            if bit < 0:
                continue
            c = (blocks[(blk // 3, blk % 3)] >= center).astype(cdt)
            code = code | (c << cdt(bit))
        code = code.astype(jnp.int32)
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


def _chunk_kernel_i16(ii_ref, *refs, cascade, ny, nx, geo, th, tw, step,
                      stages, first, use_i16):
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
    alive = _eval_chunk_i16(ii_ref, alive, geo, cascade, stages, th, tw, step,
                            ty, tx, use_i16)
    out_ref[0] = alive.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("cascade", "scale", "ny", "nx",
                                             "step", "th", "tw", "nchunks",
                                             "use_i16"))
def eval_scale_i16(cascade, iip, scale, ny, nx, step=1, th=48, tw=None,
                   nchunks=3, use_i16=True):
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
            functools.partial(_chunk_kernel_i16, cascade=cascade, ny=ny, nx=nx,
                              geo=geo, th=th, tw=tw, step=step, stages=stages,
                              first=first, use_i16=use_i16),
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

    plans = {
        1.0: (
            ("B i16 th48 x3", dict(th=48, nchunks=3, use_i16=True)),
            ("C i16 th48 x2", dict(th=48, nchunks=2, use_i16=True)),
            ("D i16 th96 x3", dict(th=96, nchunks=3, use_i16=True)),
            ("E i16 th32 x2", dict(th=32, nchunks=2, use_i16=True)),
        ),
        float(1.2 ** 7): (
            ("F f32 th48 x4", dict(th=48, nchunks=4, use_i16=False)),
            ("G f32 th48 x5", dict(th=48, nchunks=5, use_i16=False)),
            ("H f32 th48 x6", dict(th=48, nchunks=6, use_i16=False)),
        ),
    }
    for scale, variants in plans.items():
        ww = int(f(cascade.window_w) * f(scale))
        wh = int(f(cascade.window_h) * f(scale))
        ny, nx = (ih - wh) + 1, (iw - ww) + 1
        iip = lbp_pad_for(cascade, iib, [(scale, ww, wh)], ih, iw, step)
        iip = jnp.pad(iip, ((0, 0), (0, 512), (0, 512)))

        base = np.asarray(lbp_eval_scale(cascade, iip, scale, ny, nx, step))
        t = timeit(lambda: lbp_eval_scale(cascade, iip, scale, ny, nx, step),
                   warmup=1, iters=10)
        print(f"scale {scale:.3f}  A shipping:     {t*1e3:8.2f} ms  "
              f"{nb*ny*nx/t/1e6:7.1f} M win/s", flush=True)
        for name, kw in variants:
            try:
                got = np.asarray(eval_scale_i16(cascade, iip, scale, ny, nx,
                                                step, **kw))
                ok = (got == base).all()
                t = timeit(lambda: eval_scale_i16(cascade, iip, scale, ny, nx,
                                                  step, **kw),
                           warmup=1, iters=10)
                print(f"scale {scale:.3f}  {name}: {t*1e3:8.2f} ms  "
                      f"{nb*ny*nx/t/1e6:7.1f} M win/s  "
                      f"{'exact' if ok else 'MISMATCH'}", flush=True)
            except Exception as e:  # noqa: BLE001
                msg = str(e)
                key = ("VMEM-OOM" if "Scoped allocation" in msg
                       else type(e).__name__ + ": " + msg[-200:].replace("\n", " "))
                print(f"scale {scale:.3f}  {name}: FAILED {key}", flush=True)


if __name__ == "__main__":
    main()
