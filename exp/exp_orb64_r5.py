"""r5: floor-diluted ORB stage profile at batch 64.

exp_orb_scale_r5 showed the tunnel charges 2-7 ms per dispatch, so batch-16
cumulative marginals carry up to +-5 ms of floor noise per stage.  At batch
64 the floor is ~8% of the 36 ms total; marginals here are real device
time.  Mirrors the CURRENT shipping pipeline (lean FAST kernel + gated
compact emission, exp_orb_r5b used the pre-lean compact path).

Run: python exp/exp_orb64_r5.py   (TPU)
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
                                        _fast_batched_tpu,
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
nb = 64
batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1)
                              for i in range(nb)]))
h, w = scene.shape
cap, thr = 500, 20
cand_cap = min(cap * 4, 5000)
radius = 15
thrj = jnp.asarray(thr, jnp.int32)


def stage_kernel(b):
    return kfast.fast_pallas_lean(b, thrj)


def stage_emit(b):
    # lean kernel + gated compact emission + table decode (shipping path)
    return _fast_batched_tpu(b, cand_cap, thrj)


def stage_select(b):
    n_cand, tx, ty, tr = stage_emit(b)
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
    print(f"{name}: cum {t:.2f} ms  marg {t - prev:+.2f}"
          f"  ({(t - prev)/nb*1e3:+.0f} us/frame)", flush=True)
    prev = t

kps = jax.jit(stage_all)(batch)
nk = int(jnp.sum(kps.n))
OUT["keypoints_total"] = nk
OUT["kps_per_sec"] = nk / (OUT["cum_e2e_ms"] / 1e3)
print("kps/s:", round(OUT["kps_per_sec"]), flush=True)

with open("/root/repo/exp/results_orb64_r5.json", "w") as fh:
    json.dump(OUT, fh, indent=1)
print(json.dumps(OUT, indent=1))
