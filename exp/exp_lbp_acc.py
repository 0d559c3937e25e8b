"""Experiment: does a VMEM scratch accumulator collapse the LBP kernel's
~(weaks-4) live strip temporaries?

``_vmem_estimate``'s calibrated ``max(nweaks-4, 8) * th * tw * 4`` term says
Mosaic keeps essentially every weak's (th, tw) f32 value live across the
unrolled stage-sum chain — the reason the cascade must be CHUNKED across
2-3 sequential kernels (double/triple map construction, extra launches)
before strips can grow past th=16.  If accumulating each stage sum through
an explicit VMEM scratch ref (``acc_ref[...] = acc_ref[...] + weak``)
forces the scheduler to retire each weak value at its store, the live set
drops to O(1) strips and SINGLE-chunk kernels at th=48+ fit scoped VMEM —
removing the split's map-rebuild + launch overhead (~-22% at equal th per
exp_lbp_split) at every scale.

If the scheduler still hoists the slice/compare/select chains (the stores
only order the adds), the live set stays ~(weaks) strips, the single-chunk
variants OOM exactly like today, and the store-variant at shipping geometry
measures the pure store overhead.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python exp/exp_lbp_acc.py

MEASURED VERDICT (v5e, batch 32, 640x480, step 1, 2026-08-19): the stores
are FREE (th48 x3 acc = 276.2 vs 276.4 M win/s shipping — identical), but
the live set does NOT collapse: every single-chunk variant (th 32/48/96)
still dies in the scoped-VMEM stack OOM, exactly like the plain kernel.
Mosaic hoists the slice/compare/select chains regardless of the store
ordering — the ~(weaks-4) live-temporaries term is scheduler hoisting, not
sum-tree liveness, and chunking remains the only way to bound it.
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


def _eval_chunk_acc(ii_ref, alive, geo, cascade, stages, th, tw, step,
                    ty, tx, acc_ref):
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
        acc_ref[...] = eval_weak(s0)
        for k in range(1, cnt):
            acc_ref[...] = acc_ref[...] + eval_weak(s0 + k)
        passed = acc_ref[...] >= jnp.float32(float(cascade.stage_threshold[si]))
        alive = alive & passed.astype(jnp.int32)
    return alive


def _chunk_kernel_acc(ii_ref, *refs, cascade, ny, nx, geo, th, tw, step,
                      stages, first):
    if first:
        out_ref, acc_ref = refs
    else:
        alive_ref, out_ref, acc_ref = refs
    ty, tx = pl.program_id(1), pl.program_id(2)
    if first:
        wy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + ty * th
        wx = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + tx * tw
        alive = ((wy < ny) & (wx < nx)).astype(jnp.int32)
    else:
        alive = alive_ref[0].astype(jnp.int32)
    alive = _eval_chunk_acc(ii_ref, alive, geo, cascade, stages, th, tw, step,
                            ty, tx, acc_ref)
    out_ref[0] = alive.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("cascade", "scale", "ny", "nx",
                                             "step", "th", "tw", "nchunks"))
def eval_scale_acc(cascade, iip, scale, ny, nx, step=1, th=48, tw=None,
                   nchunks=1):
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
            functools.partial(_chunk_kernel_acc, cascade=cascade, ny=ny, nx=nx,
                              geo=geo, th=th, tw=tw, step=step, stages=stages,
                              first=first),
            grid=(n, nty, ntx),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, th, tw), lambda i, j, k: (i, j, k),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, nty * th, ntx * tw), jnp.uint8),
            scratch_shapes=[pltpu.VMEM((th, tw), jnp.float32)],
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
    for scale in (1.0, float(1.2 ** 7)):
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
        for name, kw in (
            ("B acc th48 x3", dict(th=48, nchunks=3)),
            ("C acc th48 x1", dict(th=48, nchunks=1)),
            ("D acc th96 x1", dict(th=96, nchunks=1)),
            ("E acc th32 x1", dict(th=32, nchunks=1)),
        ):
            try:
                got = np.asarray(eval_scale_acc(cascade, iip, scale, ny, nx,
                                                step, **kw))
                ok = (got == base).all()
                t = timeit(lambda: eval_scale_acc(cascade, iip, scale, ny, nx,
                                                  step, **kw),
                           warmup=1, iters=10)
                print(f"scale {scale:.3f}  {name}: {t*1e3:8.2f} ms  "
                      f"{nb*ny*nx/t/1e6:7.1f} M win/s  "
                      f"{'exact' if ok else 'MISMATCH'}", flush=True)
            except Exception as e:  # noqa: BLE001
                msg = str(e)
                key = ("VMEM-OOM" if "Scoped allocation" in msg or
                       "vmem" in msg.lower() else type(e).__name__)
                print(f"scale {scale:.3f}  {name}: FAILED {key}", flush=True)


if __name__ == "__main__":
    main()
