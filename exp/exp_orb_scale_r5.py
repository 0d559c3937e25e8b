"""r5: separate tunnel dispatch floor from device time in the ORB metric.

exp_fast_io_r5 measured a jitted `x | 1` on the batch-16 inputs at 3-5.7 ms —
the per-dispatch tunnel overhead (CLAUDE.md: ~5 ms) sits INSIDE every
single-dispatch timing at this scale, so the 9-10 ms batch-16 orb_extract
e2e is ~40% floor.  This experiment times the full extraction at batch 16 /
32 / 64 / 128 and fits t(b) = floor + b * per_frame: the slope is the true
device cost per frame (what an attached-TPU deployment would see), and the
intercept is this session's floor.  Also re-times the batch-16 headline
number and the xla `x | 1` floor in the same process for calibration.

Run: python exp/exp_orb_scale_r5.py   (TPU)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
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

lena = gs.io.read_pgm("/root/reference/testdata/lena.pgm")
reps = (-(-480 // lena.shape[0]), -(-640 // lena.shape[1]))
scene = np.tile(lena, reps)[:480, :640]  # == bench_all's ORB frame

ex = jax.jit(lambda b: gs.ops.orb_extract(b, 500, 20))

pts = []
for nb in (16, 32, 64, 128):
    ob = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1)
                               for i in range(nb)]))
    kps = ex(ob)
    nk = int(np.asarray(kps.n)[0])
    dt = timeit(ex, ob, iters=10, repeat=3)
    OUT[f"orb_b{nb}_ms"] = dt * 1e3
    OUT[f"orb_b{nb}_kps_per_sec"] = nb * nk / dt
    pts.append((nb, dt * 1e3))
    print(f"b{nb}: {dt*1e3:.2f} ms = {nb*nk/dt/1e3:.0f}k kps/s (nk={nk})",
          flush=True)

    xf = jax.jit(lambda v: v | 1)
    jax.block_until_ready(xf(ob))
    OUT[f"xla_floor_b{nb}_ms"] = timeit(xf, ob, iters=10, repeat=3) * 1e3
    print(f"  xla floor b{nb}: {OUT[f'xla_floor_b{nb}_ms']:.2f} ms",
          flush=True)

# least-squares slope/intercept over the batch sweep
bs = np.array([p[0] for p in pts], np.float64)
ts = np.array([p[1] for p in pts], np.float64)
A = np.stack([bs, np.ones_like(bs)], axis=1)
(slope, intercept), *_ = np.linalg.lstsq(A, ts, rcond=None)
OUT["device_ms_per_frame"] = slope
OUT["dispatch_floor_ms"] = intercept
nk = 500
OUT["attached_tpu_kps_per_sec_est"] = nk / (slope / 1e3)
print(f"slope {slope:.3f} ms/frame, intercept {intercept:.2f} ms -> "
      f"attached-TPU estimate {nk/(slope/1e3)/1e3:.0f}k kps/s", flush=True)

with open("/root/repo/exp/results_orb_scale_r5.json", "w") as fh:
    json.dump(OUT, fh, indent=1)
print(json.dumps(OUT, indent=1))
