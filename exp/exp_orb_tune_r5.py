"""r5: attack the three biggest ORB per-frame device costs (batch-64 profile
exp/results_orb64_r5.json: kernel 170 us, patches 138 us, emit 127 us).

A. Lean-kernel VMEM budget sweep FOR EMISSION SIZE: taller blocks shrink the
   folded key strip (Lr = nbk * 24 * wp — 123k keys/frame at blk=64, 2.5x
   under the full map; blk=160 would be 46k).  The r5b sweep showed kernel
   time flat across budgets, but it never measured the EMISSION that
   consumes the strip.  Times kernel+emit cumulatively per budget, checks
   fold losses stay 0 on real frames, and pins table bit-exactness against
   the shipping budget.

B. Patch-kernel fori_loop unroll sweep: each iteration is two tiny MXU ops
   ((48,64)@(64,256), (48,256)@(256,48) = 5% MXU utilization measured);
   unrolling may let Mosaic pipeline window DMA against the matmuls.

Run: python exp/exp_orb_tune_r5.py   (TPU)
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
nb = 64
batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1)
                              for i in range(nb)]))
h, w = scene.shape
cap, thr = 500, 20
cand_cap = min(cap * 4, 5000)
thrj = jnp.asarray(thr, jnp.int32)

# --- A: lean budget -> emission cost -------------------------------------


def emit_stage(b):
    return feat._fast_batched_tpu(b, cand_cap, thrj)


ref_tables = None
for budget_k in (48, 96, 128, 160):
    kfast._VMEM_BUDGET = budget_k * 1024
    kfast.fast_pallas_lean.clear_cache()
    kfast.fast_pallas.clear_cache()
    try:
        f = jax.jit(emit_stage)
        tables = jax.block_until_ready(f(batch))
        red3, lost = jax.jit(
            lambda b: kfast.fast_pallas_lean(b, thrj))(batch)
        nlost = int(jnp.sum(lost))
        t = timeit(f, batch, iters=10, repeat=3) * 1e3
        OUT[f"emit_budget{budget_k}k_ms"] = t
        OUT[f"emit_budget{budget_k}k_Lr"] = int(red3.shape[1] * red3.shape[2])
        OUT[f"emit_budget{budget_k}k_lost"] = nlost
        if ref_tables is None:
            ref_tables = tables
            flips = 0
        else:
            flips = sum(int((np.asarray(a) != np.asarray(b)).sum())
                        for a, b in zip(ref_tables, tables))
        OUT[f"emit_budget{budget_k}k_flips"] = flips
        print(f"A budget {budget_k}K: kernel+emit {t:.2f} ms  "
              f"Lr={OUT[f'emit_budget{budget_k}k_Lr']}  lost={nlost}  "
              f"flips={flips}", flush=True)
    except Exception as e:
        OUT[f"emit_budget{budget_k}k_error"] = str(e)[:160]
        print(f"A budget {budget_k}K FAILED: {str(e)[:160]}", flush=True)
kfast._VMEM_BUDGET = 48 * 1024
kfast.fast_pallas_lean.clear_cache()
kfast.fast_pallas.clear_cache()

# --- B: patch kernel unroll sweep ----------------------------------------
kps = jax.jit(lambda b: feat.orb_extract(b, cap, thr))(batch)
sx = jnp.clip(kps.x, 15, w - 16)
sy = jnp.clip(kps.y, 15, h - 16)

ref_patches = None
for unroll in (1, 2, 4, 8):
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

with open("/root/repo/exp/results_orb_tune_r5.json", "w") as fh:
    json.dump(OUT, fh, indent=1)
print(json.dumps(OUT, indent=1))
