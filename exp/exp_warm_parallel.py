"""Do per-scale LBP Mosaic compiles overlap across Python threads?

If the backend compiles independent programs concurrently, a thread-pool
warmup cuts the faces() first call from sum(per-scale compiles) to roughly
max(per-scale compiles).  If the (remote) compiler serializes, the fold-
into-one-kernel rewrite would be the only route and this records that.
"""
import sys, time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
from grayskull_tpu.cascade import load_frontalface
from grayskull_tpu.kernels.lbp import lbp_eval_scale, lbp_pad_for
from grayskull_tpu.ops.lbp import scale_ladder

cas = load_frontalface()
ih, iw, step = 480, 640, 1
ladder = scale_ladder(cas, iw, ih, 1.2, 1.0, 4.0)
rng = np.random.default_rng(0)
img = rng.integers(0, 256, (2, ih, iw), dtype=np.uint8)
ii = gs.integral(jnp.asarray(img))
iip = lbp_pad_for(cas, ii, ladder, ih, iw, step)
iip.block_until_ready()


def compile_one(entry):
    scale, ww, wh = entry
    ny = (ih - wh) // step + 1
    nx = (iw - ww) // step + 1
    t0 = time.perf_counter()
    out = lbp_eval_scale(cas, iip, scale, ny, nx, step)
    np.asarray(out)  # readback fence (block_until_ready is a no-op on axon)
    return scale, time.perf_counter() - t0


# A: two scales sequentially (fresh kernels 1 & 2)
t0 = time.perf_counter()
for e in ladder[:2]:
    s, dt = compile_one(e)
    print(f"  seq scale {s:.3f}: {dt:.1f}s", flush=True)
seq = time.perf_counter() - t0

# B: next four scales concurrently (fresh kernels 3..6)
t0 = time.perf_counter()
with ThreadPoolExecutor(4) as ex:
    for s, dt in ex.map(compile_one, ladder[2:6]):
        print(f"  par scale {s:.3f}: {dt:.1f}s", flush=True)
par4 = time.perf_counter() - t0

print(f"sequential 2 kernels: {seq:.1f}s ({seq/2:.1f}s each)")
print(f"concurrent 4 kernels: {par4:.1f}s ({par4/4:.1f}s each effective)")
print("overlap:", "YES" if par4 / 4 < seq / 2 * 0.7 else "no/weak")
