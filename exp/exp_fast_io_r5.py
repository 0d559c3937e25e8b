"""r5: where does the FAST kernel's 3.2 ms no-compute floor come from?

The body ablation (exp/results_fast_ablate_r5.json) measured the circle
compute at only ~1.2 ms marginal over a `stage_only` variant that already
costs 3.21 ms — and the block-size sweep (kernel_budget*_ms, r5b) is flat,
so neither compute nor program count explains the floor.  `stage_only`
bundles: pallas launch at grid (16, nbk), 3 input streams (main + 2 halo
views), a u8->i32 astype + concat + 3-lane pad staging chain, and two
full-frame output writes.  This experiment peels those apart:

  xla_floor    — jitted (x | 1) full-frame XLA op, same batch (dispatch ref)
  launch       — pallas, trivial body, ONE small (24, wp) output, no halos
  halos        — + the two 8-row halo input streams (untouched)
  stage        — + concat/astype/pad staging chain (result folded to 24 rows)
  w_u8         — staging + ONE full-frame u8 output
  w_i32        — staging + ONE full-frame i32 output
  w_both       — staging + both full-frame outputs (== ablate stage_only)
  batch2       — w_both with 2 frames per program (grid (8, nbk)): per-
                 program overhead halves if launch-bound

Run: python exp/exp_fast_io_r5.py   (TPU)
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

OUT = {"backend": jax.default_backend()}

frame = gs.io.read_pgm("/root/reference/testdata/lena.pgm")
reps = (1024 // frame.shape[0] + 1, 1024 // frame.shape[1] + 1)
mp = np.tile(frame, reps)[:1024, :1024]
big = jnp.asarray(np.stack([np.roll(mp, 13 * i, axis=1) for i in range(256)]))
dt = timeit(preprocess, big, iters=8, repeat=3)
OUT["health_preprocess_1MP_fps"] = 256 / dt
print("health:", round(OUT["health_preprocess_1MP_fps"]), flush=True)

scene = gs.io.read_pgm("/root/reference/testdata/aruco.pgm")
nfr = 16
batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1)
                              for i in range(nfr)]))
n, h, w = batch.shape
blk, hp = _pad_blk(h, w, 1, budget=kfast._VMEM_BUDGET)
wp = -(-w // 128) * 128
x = jnp.pad(batch, ((0, 0), (0, 0), (0, wp - w)))
x = _pad_rows(x, hp)
nbk = hp // blk
OUT["geometry"] = f"blk={blk} hp={hp} wp={wp} nbk={nbk}"
print(OUT["geometry"], flush=True)


def make(level: str, halos: bool, outs: str, bframes: int = 1):
    top_spec, bot_spec = _halo_specs(blk, hp, wp)
    nb2 = n // bframes

    def body_rows(x_ref, top_ref, bot_ref, b):
        if level == "trivial":
            return None
        j = pl.program_id(1)
        nprog = pl.num_programs(1)
        tr = top_ref[b, 4:8, :].astype(jnp.int32) if halos else 0
        br_ = bot_ref[b, 0:4, :].astype(jnp.int32) if halos else 0
        top = jnp.where(j > 0, tr, 0) if halos else jnp.zeros((4, wp),
                                                              jnp.int32)
        bot = (jnp.where(j < nprog - 1, br_, 0) if halos
               else jnp.zeros((4, wp), jnp.int32))
        rows = jnp.concatenate([top, x_ref[b].astype(jnp.int32), bot], axis=0)
        rp = jnp.pad(rows, ((0, 0), (3, 3)))
        p = rows[3 : 3 + blk + 2, :]
        # consume the staged values so nothing dead-code-eliminates
        return (p[1 : 1 + blk] ^ rp[4 : 4 + blk, 3 : 3 + wp])

    def kernel(*refs):
        ins = 3 if halos else 1
        in_refs = refs[:ins] + ((None, None) if not halos else ())
        out_refs = refs[ins:]
        for b in range(bframes):
            v = body_rows(in_refs[0], in_refs[1], in_refs[2], b)
            if v is None:
                v = in_refs[0][b, :, :].astype(jnp.int32)
            oi = 0
            if outs in ("u8", "both"):
                out_refs[oi][b] = (v & 0xFF).astype(jnp.uint8)
                oi += 1
            if outs in ("i32", "both"):
                out_refs[oi][b] = v
                oi += 1
            if outs == "small":
                # fold to 8 rows so the staging chain is consumed (blk is
                # always a multiple of 8)
                acc = v[0:8]
                for r in range(8, blk, 8):
                    acc = jnp.maximum(acc, v[r : r + 8])
                out_refs[0][b] = acc

    blk_spec = pl.BlockSpec((bframes, blk, wp), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [blk_spec]
    args = [x]
    if halos:
        if bframes != 1:
            raise ValueError("halos only at bframes=1")
        in_specs += [top_spec, bot_spec]
        args += [x, x]
    out_specs, out_shape = [], []
    if outs in ("u8", "both"):
        out_specs.append(blk_spec)
        out_shape.append(jax.ShapeDtypeStruct((n, hp, wp), jnp.uint8))
    if outs in ("i32", "both"):
        out_specs.append(blk_spec)
        out_shape.append(jax.ShapeDtypeStruct((n, hp, wp), jnp.int32))
    if outs == "small":
        out_specs.append(pl.BlockSpec((bframes, 8, wp), lambda i, j: (i, j, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((n, nbk * 8, wp), jnp.int32))

    def run(xx):
        return pl.pallas_call(kernel, grid=(nb2, nbk), in_specs=in_specs,
                              out_specs=out_specs, out_shape=out_shape)(
            *([xx] + args[1:]))

    return run


variants = [
    ("launch", dict(level="trivial", halos=False, outs="small")),
    ("halos", dict(level="stage", halos=True, outs="small")),
    ("stage", dict(level="stage", halos=False, outs="small")),
    ("w_u8", dict(level="stage", halos=True, outs="u8")),
    ("w_i32", dict(level="stage", halos=True, outs="i32")),
    ("w_both", dict(level="stage", halos=True, outs="both")),
    ("batch2", dict(level="stage", halos=False, outs="both", bframes=2)),
    ("batch4", dict(level="stage", halos=False, outs="both", bframes=4)),
]

xf = jax.jit(lambda v: v | 1)
jax.block_until_ready(xf(x))
t = timeit(xf, x, iters=10, repeat=3) * 1e3
OUT["xla_floor_ms"] = t
print(f"xla_floor: {t:.3f} ms", flush=True)

for name, kw in variants:
    try:
        f = jax.jit(make(**kw))
        jax.block_until_ready(f(x))
        t = timeit(f, x, iters=10, repeat=3) * 1e3
    except Exception as e:
        OUT[f"io_{name}_error"] = str(e)[:160]
        print(f"{name}: FAILED {str(e)[:160]}", flush=True)
        continue
    OUT[f"io_{name}_ms"] = t
    print(f"{name}: {t:.3f} ms", flush=True)

with open("/root/repo/exp/results_fast_io_r5.json", "w") as fh:
    json.dump(OUT, fh, indent=1)
print(json.dumps(OUT, indent=1))
