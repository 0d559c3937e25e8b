"""r5: second ORB tuning pass after exp_orb_tune_r5's dead ends.

* Lean-kernel budget > 48K crashes the remote compile helper inside the
  fold chain (opaque subprocess exit; all three larger budgets) — taller
  blocks are out.  Instead try _FOLD_K=1: 16 rows/block instead of 24
  cuts the emission key count 1.5x; losses (if any) take the exact gated
  fallback, so the only risk is perf.  Checked on aruco + tiled lena +
  receipt frames.
* The patch kernel's fori_loop only supports unroll=1 or full (=KP_BLK);
  try full unroll (64 x ~20 ops is well under the ~5k-op Mosaic limit).

Run: python exp/exp_orb_tune2_r5.py   (TPU)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
from grayskull_tpu.kernels import fast as kfast
from grayskull_tpu.kernels import patches as kpatch
from grayskull_tpu.ops import features as feat
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
lt = np.tile(frame, (-(-480 // frame.shape[0]), -(-640 // frame.shape[1])))
lena640 = lt[:480, :640]
receipt = gs.io.read_pgm("/root/reference/testdata/receipt.pgm")
nb = 64
batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1)
                              for i in range(nb)]))
h, w = scene.shape
cap, thr = 500, 20
cand_cap = min(cap * 4, 5000)
thrj = jnp.asarray(thr, jnp.int32)


def emit_stage(b):
    return feat._fast_batched_tpu(b, cand_cap, thrj)


def reset():
    kfast.fast_pallas_lean.clear_cache()
    kfast.fast_pallas.clear_cache()
    kfast.fast_pallas_compact.clear_cache()


ref_tables = None
for foldk in (2, 1):
    kfast._FOLD_K = foldk
    reset()
    try:
        f = jax.jit(emit_stage)
        tables = jax.block_until_ready(f(batch))
        red3, lost = jax.jit(
            lambda b: kfast.fast_pallas_lean(b, thrj))(batch)
        nlost = int(jnp.sum(lost))
        # loss check on other content too (batch-2 each)
        extra_lost = 0
        for img in (lena640, receipt[:480, :640]):
            b2 = jnp.asarray(np.stack([img, np.roll(img, 7, axis=1)]))
            _, l2 = jax.jit(lambda b: kfast.fast_pallas_lean(b, thrj))(b2)
            extra_lost += int(jnp.sum(l2))
        t = timeit(f, batch, iters=10, repeat=3) * 1e3
        OUT[f"emit_foldk{foldk}_ms"] = t
        OUT[f"emit_foldk{foldk}_Lr"] = int(red3.shape[1] * red3.shape[2])
        OUT[f"emit_foldk{foldk}_lost"] = nlost
        OUT[f"emit_foldk{foldk}_lost_other"] = extra_lost
        if ref_tables is None:
            ref_tables = tables
            flips = 0
        else:
            flips = sum(int((np.asarray(a) != np.asarray(b)).sum())
                        for a, b in zip(ref_tables, tables))
        OUT[f"emit_foldk{foldk}_flips"] = flips
        print(f"A foldk={foldk}: kernel+emit {t:.2f} ms  "
              f"Lr={OUT[f'emit_foldk{foldk}_Lr']}  lost={nlost}"
              f"/{extra_lost}  flips={flips}", flush=True)
    except Exception as e:
        OUT[f"emit_foldk{foldk}_error"] = str(e)[:160]
        print(f"A foldk={foldk} FAILED: {str(e)[:160]}", flush=True)
kfast._FOLD_K = 2
reset()

# --- B: full unroll of the patch loop ------------------------------------
kps = jax.jit(lambda b: feat.orb_extract(b, cap, thr))(batch)
sx = jnp.clip(kps.x, 15, w - 16)
sy = jnp.clip(kps.y, 15, h - 16)

ref_patches = None
for unroll in (1, 64):
    kpatch.KP_UNROLL = unroll
    kpatch._extract_pallas.clear_cache()
    try:
        f = jax.jit(lambda b: kpatch.extract_patches_batched(b, sx, sy))
        got = np.asarray(jax.block_until_ready(f(batch)))
        t = timeit(f, batch, iters=10, repeat=3) * 1e3
        if ref_patches is None:
            ref_patches = got
            flips = 0
        else:
            flips = int((got != ref_patches).sum())
        OUT[f"patches_unroll{unroll}_ms"] = t
        OUT[f"patches_unroll{unroll}_flips"] = flips
        print(f"B unroll {unroll}: {t:.2f} ms  flips={flips}", flush=True)
    except Exception as e:
        OUT[f"patches_unroll{unroll}_error"] = str(e)[:160]
        print(f"B unroll {unroll} FAILED: {str(e)[:160]}", flush=True)
kpatch.KP_UNROLL = 1
kpatch._extract_pallas.clear_cache()

with open("/root/repo/exp/results_orb_tune2_r5.json", "w") as fh:
    json.dump(OUT, fh, indent=1)
print(json.dumps(OUT, indent=1))
