"""Warm-start + throughput check after the per-scale-executable restructure."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
import grayskull_tpu as gs
from grayskull_tpu.cascade import load_frontalface
from grayskull_tpu.ops.lbp import _grid_plan, _scale_calls, _window_metas, _emit_rects
from grayskull_tpu.kernels.lbp import lbp_pad_for, lbp_pallas_available
from grayskull_tpu.pipelines.faces import detect_faces
from grayskull_tpu.profiling import timeit
from concurrent.futures import ThreadPoolExecutor

# tunnel-health probe: a tiny fresh kernel compile
t0 = time.perf_counter()
np.asarray(jax.jit(lambda x: jnp.tanh(x) @ x)(jnp.ones((256, 256))))
print(f"probe compile: {time.perf_counter()-t0:.1f}s", flush=True)

cas = load_frontalface()
nb, ih, iw, step = 32, 480, 640, 1
plan = _grid_plan(cas, ih, iw, 1.2, 1.0, 4.0, step)
use_pallas = [lbp_pallas_available(cas, ih, iw, s, step) for s, *_ in plan]
print("scales:", len(plan), "pallas:", sum(use_pallas), flush=True)
iib = jnp.zeros((nb, ih, iw), jnp.uint32)
iip = lbp_pad_for(cas, iib, [(s, ww, wh) for (s, ww, wh, _, _), ok in zip(plan, use_pallas) if ok], ih, iw, step)

def one(entry):
    e, ok = entry
    t = time.perf_counter()
    np.asarray(_scale_calls(cas, iib, iip, [e], [ok], step)[0])
    print(f"  scale {e[0]:.3f} ({'pallas' if ok else 'xla'}): {time.perf_counter()-t:.1f}s", flush=True)

t0 = time.perf_counter()
with ThreadPoolExecutor(4) as ex:
    list(ex.map(one, zip(plan, use_pallas)))
metas = _window_metas(cas, ih, iw, 1.2, 1.0, 4.0, step)
np.asarray(_emit_rects(jnp.zeros((nb, int(metas[0].shape[0])), bool), *metas, 100).n)
print(f"warm_start total: {time.perf_counter()-t0:.1f}s", flush=True)

scene = gs.io.read_pgm("/root/reference/testdata/aruco.pgm")
batch = jnp.asarray(np.stack([np.roll(scene, 7 * i, axis=1) for i in range(32)]))
t1 = time.perf_counter()
r = detect_faces(batch)
np.asarray(r.n)
print(f"first detect after warm: {time.perf_counter()-t1:.2f}s", flush=True)
d = timeit(lambda x: detect_faces(x), batch, iters=8)
lad = gs.ops.scale_ladder(cas, 640, 480, 1.2, 1.0, 4.0)
nwin = sum(((480 - wh) + 1) * ((640 - ww) + 1) for _, ww, wh in lad)
print(f"batch32: {32/d:.1f} fps, {32*nwin/d/1e6:.1f} Mwin/s", flush=True)
