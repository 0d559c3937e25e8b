"""r5 warp experiment: per-tile banded sampler vs the whole-row band kernel.

The coarse kernel's cost is static — per 8-row block it contracts a
(192, 768) band against (768, dwp) one-hots, ~264 GMAC per 1000x800 page
(~2.7 ms of MXU at v5e bf16 peak, matching the measured ~3.2 ms warp stage).
The banded variant (kernels/warp.py quad_sample_banded) gives each
(8-row, 128-lane) output tile its own (kb, kxb) band: 29 GMAC at (64, 256).

Measures, in ONE process (tunnel-drift rule):
  1. health baseline (preprocess 256x1MP fps),
  2. corner-sampler A/B: coarse vs banded(64,256) vs banded(128,512) on the
     1000x800 document warp (batch 1 and 8),
  3. end-to-end scan() best-of-3 on document + receipt,
  4. hardware bit-exactness of the full dispatch (banded ladder) vs the
     CPU gather path on real + synthetic quads.

Verdict (2026-08-19 hardware run, exp/results_warp_r5.json; tunnel health
12.8k fps = ~65% of the healthy 19k baseline): banded(64,256) sampled the
page in 1.21 ms vs 3.32 ms coarse at batch-8 (2.7x; batch-1 4.78 vs 6.55 is
dispatch-floor-bound), every quad class bit-exact vs the CPU gather path,
and batch-32 scan() throughput jumped 248 -> 459 fps (2.18 ms/frame all-in)
even on the degraded tunnel.  Single-frame scan latencies this session
(7.2/16.1 ms) are RTT-stall-inflated — compare batched numbers across
sessions.  Promoted: ops/warp.py dispatches the banded ladder
(64,256)->(128,512)->gather, each pallas_call inside its own lax.cond
branch (the old dispatch ran the kernel even when falling back).
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
from grayskull_tpu import profiling
from grayskull_tpu.io import read_pgm
from grayskull_tpu.kernels.warp import (banded_prep, banded_run, quad_sample)
from grayskull_tpu.ops.warp import _warp_batched_tpu, _warp_coords
from grayskull_tpu.pipelines import preprocess
from grayskull_tpu.pipelines.scan import scan

OUT = {}
OUT["backend"] = jax.default_backend()

# 1. health baseline -----------------------------------------------------
x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (256, 1024, 1024),
                                                  np.uint8))
f = jax.jit(preprocess)
s = profiling.timeit(f, x, iters=4, repeat=3)
OUT["health_preprocess_1MP_fps"] = 256 / s
print("health:", OUT["health_preprocess_1MP_fps"], flush=True)

# 2. sampler A/B ---------------------------------------------------------
doc = read_pgm("tests/golden/testdata/document.pgm")
h, w = doc.shape
dh, dw = 1000, 800
q = np.array([[50, 40], [700, 60], [690, 1000], [40, 980]], np.int32)
u = jnp.asarray(np.arange(dw, dtype=np.float32) / np.float32(dw - 1.0))
v = jnp.asarray(np.arange(dh, dtype=np.float32) / np.float32(dh - 1.0))
y0, y1, x0, x1, dy, dx = _warp_coords((h, w), jnp.asarray(q), u, v)


def batched(nb):
    s1 = jnp.broadcast_to(jnp.asarray(doc)[None], (nb, h, w))
    cy0, cy1, cx0, cx1 = (jnp.broadcast_to(a[None], (nb, dh, dw))
                          for a in (y0, y1, x0, x1))
    return s1, cy0, cy1, cx0, cx1


@jax.jit
def run_coarse(s1, cy0, cy1, cx0, cx1):
    return quad_sample(s1, cy0, cy1, cx0, cx1)[0]


def make_banded(kb, kxb):
    @jax.jit
    def run(s1, cy0, cy1, cx0, cx1):
        prep, ok = banded_prep(s1, cy0, cy1, cx0, cx1, kb, kxb)
        return banded_run(prep, dw, kb, kxb), ok
    return run


for nb in (1, 8):
    args = batched(nb)
    t = profiling.timeit(run_coarse, *args, iters=8, repeat=3)
    OUT[f"coarse_b{nb}_ms"] = t / nb * 1e3
    for kb, kxb in ((64, 256), (128, 512)):
        runb = make_banded(kb, kxb)
        maps, ok = runb(*args)
        assert bool(ok), (kb, kxb)
        t = profiling.timeit(runb, *args, iters=8, repeat=3)
        OUT[f"banded{kb}x{kxb}_b{nb}_ms"] = t / nb * 1e3
    print({k: round(v, 3) for k, v in OUT.items() if f"_b{nb}_ms" in k},
          flush=True)

# 3. end-to-end scan -----------------------------------------------------
for name in ("document", "receipt"):
    img = jnp.asarray(read_pgm(f"tests/golden/testdata/{name}.pgm"))
    page, corners = scan(img)  # warm
    t = profiling.timeit(lambda im=img: scan(im), iters=8, repeat=3)
    OUT[f"scan_{name}_ms"] = t * 1e3
    print(name, OUT[f"scan_{name}_ms"], flush=True)
# batch-32 throughput on document
b32 = jnp.broadcast_to(jnp.asarray(doc)[None], (32, h, w))
pages, corners = scan(b32)
t = profiling.timeit(lambda: scan(b32), iters=4, repeat=3)
OUT["scan_batch32_fps"] = 32 / t
print("batch32 fps:", OUT["scan_batch32_fps"], flush=True)

# 4. hardware bit-exactness of the full dispatch -------------------------
from grayskull_tpu.ops.warp import perspective_correct

cpu = jax.devices("cpu")[0]
docj = jnp.asarray(doc)
quads = [
    q,
    np.array([[627, 0], [633, 3], [632, 5], [630, 7]], np.int32),
    np.array([[31, 228], [571, 150], [728, 859], [132, 985]], np.int32),
    np.array([[10, 700], [1000, 10], [1020, 760], [3, 10]], np.int32),
]
flips = {}
for i, qq in enumerate(quads):
    got = np.asarray(perspective_correct(docj, jnp.asarray(qq), (1000, 800)))
    with jax.default_device(cpu):
        ref = np.asarray(perspective_correct(
            jax.device_put(docj, cpu), jnp.asarray(qq), (1000, 800)))
    flips[f"quad{i}"] = int((got != ref).sum())
OUT["bitexact_flips"] = flips
print(flips, flush=True)

with open("exp/results_warp_r5.json", "w") as fh:
    json.dump(OUT, fh, indent=1)
print(json.dumps(OUT, indent=1))
