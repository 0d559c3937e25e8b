"""approx_max_k cost scaling on the v5e: k-dependence vs N-dependence.

The ORB emission (first cand_cap NMS survivors in scan order) is one exact
amk over (16, 307200) rank keys with k=2000 — the dominant ORB stage at ~7 ms
(exp_orb_r4).  Exact spatial reduction of N is dead (tied survivors,
exp_fastred_r4/exp_fastred2_probe), so the remaining lever is k: if amk cost
is k-dominated, a score-threshold decomposition (histogram -> two k=500 amks
+ tiny merge) or smaller candidate budgets win.  This measures amk and top_k
over the real kernel-produced key map for k in {128,500,1000,2000,2048,4096},
N in {307200, 153600, 76800}, batch in {1, 16}, plus aggregate_to_topk=False.

Run: python exp/exp_amk_scaling.py   (TPU)

MEASURED (v5e, 2026-08-18, exp/results_amk_scaling.json): cost is ~linear in
k (k=500 2.7 / k=1000 3.6 / k=2000 5.5 ms over (16, 307200)) and sublinear
in N at fixed k; aggregate_to_topk=False returns l == N (the partial reduce
keeps everything at recall 1.0 — the aggregation IS the cost); k=2048 beats
k=2000 by ~9%.  CRASH MATRIX (subprocess probes): batched 2-D operands with
k=4096 SIGABRT the backend compiler (TopkEmitter EmitBatchForWindowedR2,
"span_size.RawSize() > 0 (0 vs 0)") at B=1 — while 1-D k=4096, B=16 k=4096,
and 2-D k in {512, 1024, 2048, 5000} at B in {1, 3, 6, 8, 16} all compile.
ops/features.py therefore never emits a k=4096 approx_max_k.
"""

import sys

sys.path.insert(0, "/root/repo")

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
from grayskull_tpu.kernels.fast import fast_pallas
from grayskull_tpu.profiling import timeit


def main():
    scene = gs.io.read_pgm("/root/reference/testdata/aruco.pgm")
    nb = 16
    batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1)
                                  for i in range(nb)]))
    _, key3 = jax.block_until_ready(fast_pallas(batch, 20))
    n = batch.shape[0]
    keys = key3.reshape(n, -1)  # (16, L) device-produced
    rk = (keys >> 8).astype(jnp.float32)
    rk = jax.block_until_ready(rk)
    L = rk.shape[1]
    out = {}

    @functools.partial(jax.jit, static_argnames=("k",))
    def amk(x, k):
        return jax.lax.approx_max_k(x, k, recall_target=1.0)

    @functools.partial(jax.jit, static_argnames=("k",))
    def amk_noagg(x, k):
        return jax.lax.approx_max_k(x, k, recall_target=1.0,
                                    aggregate_to_topk=False)

    @functools.partial(jax.jit, static_argnames=("k",))
    def tpk(x, k):
        return jax.lax.top_k(x, k)

    for k in (128, 500, 1000, 2000, 2048, 4096):
        ms = timeit(lambda x: amk(x, k), rk, iters=30) * 1e3
        out[f"amk_b16_N{L}_k{k}"] = round(ms, 3)
        print(f"amk  b16 N={L} k={k}: {ms:.3f} ms", flush=True)
    for k in (500, 2000):
        ms = timeit(lambda x: tpk(x, k), rk, iters=30) * 1e3
        out[f"topk_b16_N{L}_k{k}"] = round(ms, 3)
        print(f"topk b16 N={L} k={k}: {ms:.3f} ms", flush=True)
        shp = amk_noagg(rk, k)[0].shape
        ms = timeit(lambda x: amk_noagg(x, k), rk, iters=30) * 1e3
        out[f"amknoagg_b16_N{L}_k{k}"] = round(ms, 3)
        print(f"amk-noagg b16 N={L} k={k} -> l={shp[1]}: {ms:.3f} ms",
              flush=True)
    for frac, nn in ((2, L // 2), (4, L // 4)):
        sub = jax.block_until_ready(rk[:, :nn])
        for k in (500, 2000):
            ms = timeit(lambda x: amk(x, k), sub, iters=30) * 1e3
            out[f"amk_b16_N{nn}_k{k}"] = round(ms, 3)
            print(f"amk  b16 N={nn} k={k}: {ms:.3f} ms", flush=True)
    one = jax.block_until_ready(rk[:1])
    for k in (500, 2000):
        ms = timeit(lambda x: amk(x, k), one, iters=30) * 1e3
        out[f"amk_b1_N{L}_k{k}"] = round(ms, 3)
        print(f"amk  b1  N={L} k={k}: {ms:.3f} ms", flush=True)

    with open("exp/results_amk_scaling.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote exp/results_amk_scaling.json", flush=True)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    main()
