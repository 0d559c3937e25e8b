"""r5: ORB end-to-end with the lean FAST kernel (no full-frame outputs).

The ablation (exp/results_fast_ablate_r5.json) measured the full-frame
score/key map writes at ~half the FAST kernel's time; the lean kernel drops
both (the batched ORB path discards the score map and only reads the key
map in the rare fold-loss fallback, which now re-runs the full kernel
inside the untaken cond branch).  Measures, in ONE process: health, the
lean vs compact kernel standalone, kernel+emission, and ORB end-to-end.

Run: python exp/exp_orb_lean_r5.py   (TPU)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
from grayskull_tpu.kernels import fast as kfast
from grayskull_tpu.ops.features import _fast_batched_tpu, orb_extract
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
thr = jnp.asarray(20, jnp.int32)

for name, fn in (
    ("kernel_compact", lambda b: kfast.fast_pallas_compact(b, thr)),
    ("kernel_lean", lambda b: kfast.fast_pallas_lean(b, thr)),
    ("lean_emit", lambda b: _fast_batched_tpu(b, 2000, thr)),
    ("orb_e2e", lambda b: orb_extract(b, 500, 20)),
):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(batch))
    t = timeit(f, batch, iters=10, repeat=3) * 1e3
    OUT[f"{name}_ms"] = t
    print(f"{name}: {t:.2f} ms", flush=True)

kps = jax.jit(lambda b: orb_extract(b, 500, 20))(batch)
nk = int(jnp.sum(kps.n))
OUT["keypoints_total"] = nk
OUT["orb_kps_per_sec"] = nk / (OUT["orb_e2e_ms"] / 1e3)
print("kps/s:", round(OUT["orb_kps_per_sec"]), flush=True)

# hardware exactness: lean fold == compact fold, and no fold loss on aruco
red_c = jax.jit(lambda b: kfast.fast_pallas_compact(b, thr))(batch)[2]
red_l, lost_l = jax.jit(lambda b: kfast.fast_pallas_lean(b, thr))(batch)
OUT["lean_vs_compact_flips"] = int(jnp.sum(jnp.asarray(
    np.asarray(red_c) != np.asarray(red_l))))
OUT["fold_lost_total"] = int(jnp.sum(lost_l))
print("flips:", OUT["lean_vs_compact_flips"], "lost:",
      OUT["fold_lost_total"], flush=True)

with open("exp/results_orb_lean_r5.json", "w") as fh:
    json.dump(OUT, fh, indent=1)
print(json.dumps(OUT, indent=1))
