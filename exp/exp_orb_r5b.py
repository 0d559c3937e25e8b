"""r5b: ORB marginal stage costs + FAST-kernel block sweep.

The r5 stage profile (exp/results_orb_r5.json) timed each stage STANDALONE —
each number carries its own dispatch floor and input staging, so the six
stages sum to 17 ms against a 10 ms end-to-end.  This experiment times
CUMULATIVE sub-graphs of the real pipeline (kernel; +emission; +selection;
+patches; +orientation; +brief) in one process, so marginal cost = adjacent
difference, dispatch appears exactly once, and the biggest true cost is
unambiguous.  Also sweeps the FAST kernel's VMEM block budget (the r4 value
48K was inherited from the preproc OOM fix, never swept) and records the
survivor counts that pick the adaptive-emission k branch.

Run: python exp/exp_orb_r5b.py   (TPU)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
from grayskull_tpu.kernels import fast as kfast
from grayskull_tpu.kernels.patches import extract_patches_batched
from grayskull_tpu.ops.features import (_brief_from_patches,
                                        _emit_compact_gated,
                                        _fast_table_from_vals,
                                        _orientation_from_patches,
                                        _select_candidates_approx_b,
                                        orb_extract)
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
nb = 16
batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1)
                              for i in range(nb)]))
h, w = scene.shape
cap, thr = 500, 20
cand_cap = min(cap * 4, 5000)
radius = 15
thrj = jnp.asarray(thr, jnp.int32)

# --- cumulative sub-graphs ---------------------------------------------


def stage_kernel(b):
    return kfast.fast_pallas_compact(b, thrj)


def stage_emit(b):
    score3, key3, red3, lost = stage_kernel(b)
    return _emit_compact_gated(key3, red3, lost, cand_cap)


def stage_select(b):
    score3, key3, red3, lost = stage_kernel(b)
    vals = _emit_compact_gated(key3, red3, lost, cand_cap)
    n_cand, tx, ty, tr = _fast_table_from_vals(vals, h, w)
    valid = jnp.arange(cand_cap)[None, :] < n_cand[:, None]
    return _select_candidates_approx_b(tx, ty, tr, valid, cap, radius, h, w)


def stage_patches(b):
    n, sx, sy, sr = stage_select(b)
    safe_x = jnp.clip(sx, radius, w - radius - 1)
    safe_y = jnp.clip(sy, radius, h - radius - 1)
    return extract_patches_batched(b, safe_x, safe_y), (n, sx, sy, sr)


def stage_orient(b):
    patches, t = stage_patches(b)
    return jax.vmap(lambda p: _orientation_from_patches(p, radius))(patches), t


def stage_all(b):
    return orb_extract(b, cap, thr)


stages = [("kernel", stage_kernel), ("emit", stage_emit),
          ("select", stage_select), ("patches", stage_patches),
          ("orient", stage_orient), ("e2e", stage_all)]
prev = 0.0
for name, fn in stages:
    f = jax.jit(fn)
    jax.block_until_ready(f(batch))
    t = timeit(f, batch, iters=10, repeat=3) * 1e3
    OUT[f"cum_{name}_ms"] = t
    OUT[f"marg_{name}_ms"] = t - prev
    print(f"{name}: cum {t:.2f} ms  marg {t - prev:.2f}", flush=True)
    prev = t

kps = jax.jit(stage_all)(batch)
nk = int(jnp.sum(kps.n))
OUT["keypoints_total"] = nk
OUT["kps_per_sec"] = nk / (OUT["cum_e2e_ms"] / 1e3)
print("kps/s:", round(OUT["kps_per_sec"]), flush=True)

# survivor counts (adaptive-k branch evidence)
score3, key3, red3, lost = jax.jit(stage_kernel)(batch)
surv = jnp.sum((key3 > 0).astype(jnp.int32), axis=(1, 2))
OUT["survivors_per_frame"] = np.asarray(surv).tolist()
OUT["fold_lost_total"] = int(jnp.sum(lost))
OUT["red_rows"] = int(red3.shape[1])
print("survivors:", OUT["survivors_per_frame"][:4], "lost:",
      OUT["fold_lost_total"], flush=True)

# --- FAST kernel block-budget sweep --------------------------------------
for budget_k in (32, 48, 64, 96, 128):
    kfast._VMEM_BUDGET = budget_k * 1024
    try:
        f = jax.jit(lambda b: kfast.fast_pallas_compact(b, thrj))
        r = jax.block_until_ready(f(batch))
        t = timeit(f, batch, iters=10, repeat=3) * 1e3
        OUT[f"kernel_budget{budget_k}k_ms"] = t
        print(f"budget {budget_k}K: {t:.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        OUT[f"kernel_budget{budget_k}k_ms"] = f"fail: {type(e).__name__}"
        print(f"budget {budget_k}K failed: {e}", flush=True)
kfast._VMEM_BUDGET = 48 * 1024

with open("exp/results_orb_r5b.json", "w") as fh:
    json.dump(OUT, fh, indent=1)
print(json.dumps(OUT, indent=1))
