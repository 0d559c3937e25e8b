"""r5: ablation profile of the FAST kernel body on hardware.

The factored-views A/B (exp/results_fast_factored_r5.json) moved only 2%,
so neither lane relayouts nor live-set spills explain the 4.7 ms.  This
experiment compiles the kernel with pieces progressively removed to locate
the cost: input staging only; + circle compares/packing; + run9; + min_diff;
+ NMS/key; + fold compaction (= full).  Marginal cost per piece = adjacent
difference, measured in ONE process.

Run: python exp/exp_fast_ablate_r5.py   (TPU)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import grayskull_tpu as gs
from grayskull_tpu.kernels import fast as kfast
from grayskull_tpu.kernels.preproc import _halo_specs, _pad_blk, _pad_rows
from grayskull_tpu.pipelines.preproc import preprocess
from grayskull_tpu.profiling import timeit

_CDX, _CDY = kfast._CDX, kfast._CDY

OUT = {"backend": jax.default_backend()}

frame = gs.io.read_pgm("/root/reference/testdata/lena.pgm")
reps = (1024 // frame.shape[0] + 1, 1024 // frame.shape[1] + 1)
mp = np.tile(frame, reps)[:1024, :1024]
big = jnp.asarray(np.stack([np.roll(mp, 13 * i, axis=1) for i in range(256)]))
dt = timeit(preprocess, big, iters=8, repeat=3)
OUT["health_preprocess_1MP_fps"] = 256 / dt
print("health:", round(OUT["health_preprocess_1MP_fps"]), flush=True)

scene = gs.io.read_pgm("/root/reference/testdata/aruco.pgm")
nb = 16
batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1)
                              for i in range(nb)]))
thr = jnp.asarray(20, jnp.int32)
n, h, w = batch.shape


def make(level: str, compact: bool):
    blk, hp = _pad_blk(h, w, 1, budget=kfast._VMEM_BUDGET)
    wp = -(-w // 128) * 128
    x = jnp.pad(batch, ((0, 0), (0, 0), (0, wp - w)))
    x = _pad_rows(x, hp)
    nbk = hp // blk
    top_spec, bot_spec = _halo_specs(blk, hp, wp)

    def body(thr_v, x_ref, top_ref, bot_ref):
        j = pl.program_id(1)
        nprog = pl.num_programs(1)
        top = jnp.where(j > 0, top_ref[0, 4:8, :].astype(jnp.int32), 0)
        bot = jnp.where(j < nprog - 1, bot_ref[0, 0:4, :].astype(jnp.int32),
                        0)
        rows = jnp.concatenate([top, x_ref[0].astype(jnp.int32), bot], axis=0)
        rp = jnp.pad(rows, ((0, 0), (3, 3)))
        ext = blk + 2
        p = rows[3 : 3 + ext, :]
        cols = {dx: rp[:, 3 + dx : 3 + dx + wp] for dx in sorted(set(_CDX))}

        def view(k):
            return cols[_CDX[k]][3 + _CDY[k] : 3 + _CDY[k] + ext, :]

        if level == "stage_only":
            return p[1 : 1 + blk] & 0xFF, (p[1 : 1 + blk] << 1)
        d = p - thr_v
        pthr = p + thr_v
        bb = jnp.zeros((ext, wp), jnp.int32)
        dd = jnp.zeros((ext, wp), jnp.int32)
        min_diff = None
        for k in range(16):
            v = view(k)
            br = v > pthr
            dk = (~br) & ((d < 0) | (v < d))
            bb = bb | (br.astype(jnp.int32) << k)
            dd = dd | (dk.astype(jnp.int32) << k)
            if level not in ("compares",):
                ad = jnp.abs(v - p)
                min_diff = ad if min_diff is None else jnp.minimum(min_diff,
                                                                   ad)
        if level == "compares":
            return bb[1 : 1 + blk], dd[1 : 1 + blk]
        if level == "mindiff":
            return (bb | min_diff)[1 : 1 + blk], dd[1 : 1 + blk]

        def run9(m):
            xw = m | ((m & 0x1FF) << 16)
            m1 = xw & (xw >> 1)
            m2 = m1 & (m1 >> 2)
            m4 = m2 & (m2 >> 4)
            return (m4 & (xw >> 8)) != 0

        corner = run9(bb) | run9(dd)
        y0 = j * blk
        yy = jax.lax.broadcasted_iota(jnp.int32, (ext, wp), 0) + (y0 - 1)
        xx = jax.lax.broadcasted_iota(jnp.int32, (ext, wp), 1)
        interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
        s = jnp.where(corner & interior, min_diff, 0)
        if level == "run9":
            return s[1 : 1 + blk], (s[1 : 1 + blk] << 1)
        sp = jnp.pad(s, ((0, 0), (1, 1)))
        ncols = {dx: sp[:, 1 + dx : 1 + dx + wp] for dx in (-1, 0, 1)}
        smid = s[1 : 1 + blk]
        is_max = smid > 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                is_max &= ~(ncols[dx][1 + dy : 1 + dy + blk, :] > smid)
        ym = jax.lax.broadcasted_iota(jnp.int32, (blk, wp), 0) + y0
        xm = jax.lax.broadcasted_iota(jnp.int32, (blk, wp), 1)
        idx = ym * w + xm
        key = jnp.where(is_max, ((jnp.int32(h * w) - idx) << 8) | smid, 0)
        return smid, key

    def kernel(t_ref, x_ref, top_ref, bot_ref, score_ref, key_ref,
               *compact_refs):
        smid, key = body(t_ref[0], x_ref, top_ref, bot_ref)
        score_ref[0] = smid.astype(jnp.uint8)
        key_ref[0] = key
        if compact:
            red_ref, lost_ref = compact_refs
            a, res, lost = kfast._fold_compact(key, blk, wp)
            red_ref[0, 0:8] = a
            red_ref[0, 8 : 8 * (1 + kfast._FOLD_K)] = res
            lost_ref[0, 0, pl.program_id(1)] = lost

    blk_spec = pl.BlockSpec((1, blk, wp), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [blk_spec, blk_spec]
    out_shape = [
        jax.ShapeDtypeStruct((n, hp, wp), jnp.uint8),
        jax.ShapeDtypeStruct((n, hp, wp), jnp.int32),
    ]
    if compact:
        rr = 8 * (1 + kfast._FOLD_K)
        out_specs += [
            pl.BlockSpec((1, rr, wp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nbk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((n, nbk * rr, wp), jnp.int32),
            jax.ShapeDtypeStruct((n, 1, nbk), jnp.int32),
        ]

    def run():
        return pl.pallas_call(
            kernel, grid=(n, nbk),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk_spec,
                      top_spec, bot_spec],
            out_specs=out_specs, out_shape=out_shape,
        )(thr.reshape(1), x, x, x)

    return run


levels = [("stage_only", False), ("compares", False), ("mindiff", False),
          ("run9", False), ("full_nms", False), ("full_compact", True)]
prev = 0.0
for name, compact in levels:
    lev = {"full_nms": "full", "full_compact": "full"}.get(name, name)
    f = jax.jit(make(lev, compact))
    jax.block_until_ready(f())
    t = timeit(f, iters=10, repeat=3) * 1e3
    OUT[f"abl_{name}_ms"] = t
    OUT[f"abl_{name}_marginal_ms"] = t - prev
    print(f"{name}: {t:.2f} ms (marg {t - prev:+.2f})", flush=True)
    prev = t

with open("exp/results_fast_ablate_r5.json", "w") as fh:
    json.dump(OUT, fh, indent=1)
print(json.dumps(OUT, indent=1))
