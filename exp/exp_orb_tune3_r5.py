"""r5: two-phase FAST emission A/B — approx_max_k(aggregate_to_topk=False)
+ a small exact top_k over the returned candidate set.

The amk scaling matrix (exp/results_amk_scaling.json) measured the
unaggregated reduction at 1.71 ms vs 2.72 aggregated (k=2000, N=307k,
b16): the binary-search aggregation pass costs more than a plain top_k
over the l-candidate result.  recall_target=1.0 guarantees the exact
top-k is inside the l candidates, ranks are unique, and the score rides
in the low byte, so ordering the packed ints reproduces the current
emission bit-for-bit.

Measures kernel+emit (shipping vs two-phase) at batch 64 in one process,
checks table bit-exactness, and records l per branch k.

Run: python exp/exp_orb_tune3_r5.py   (TPU)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
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
cand_cap = 2000
thrj = jnp.asarray(20, jnp.int32)


def emit_packed_twophase(key2, k_out):
    """Drop-in for _emit_packed_batched with unaggregated amk branches."""
    _, L = key2.shape
    rk = (key2 >> 8).astype(jnp.float32)

    def emit_amk(k):
        def f(_):
            vals_f, idxs = jax.lax.approx_max_k(
                rk, k, recall_target=1.0, aggregate_to_topk=False)
            scores = jnp.take_along_axis(key2, idxs, axis=1) & 255
            packed_l = (vals_f.astype(jnp.int32) << 8) | scores
            if packed_l.shape[1] > k:
                packed_l, _ = jax.lax.top_k(packed_l, k)
            if k >= k_out:
                return packed_l[:, :k_out]
            return jnp.pad(packed_l, ((0, 0), (0, k_out - k)))
        return f

    def emit_topk(_):
        vals, _ = jax.lax.top_k(key2, k_out)
        return vals

    kfull = min(1 << (k_out - 1).bit_length(), L)
    if kfull > k_out and kfull > k_out * 5 // 4:
        kfull = k_out
    if k_out <= 2048:
        ks = [k for k in (512, 1024) if k < min(k_out, L)] + [min(kfull, 2048)]
        branches = [emit_amk(k) for k in ks]
    else:
        ks = [k for k in (512, 1024, 2048) if k < L] + [k_out]
        branches = [emit_amk(k) for k in ks[:-1]] + [emit_topk]
    if len(ks) == 1:
        return branches[0](None)
    counts = jnp.sum((key2 != 0).astype(jnp.int32), axis=1)
    m = jnp.max(counts)
    b = jnp.zeros((), jnp.int32)
    for kk in ks[:-1]:
        b = b + (m > kk).astype(jnp.int32)
    return jax.lax.switch(b, branches, None)


def emit_stage(b):
    return feat._fast_batched_tpu(b, cand_cap, thrj)


# shipping
f0 = jax.jit(emit_stage)
ref = jax.block_until_ready(f0(batch))
t0 = timeit(f0, batch, iters=10, repeat=3) * 1e3
OUT["emit_ship_ms"] = t0
print(f"ship kernel+emit: {t0:.2f} ms", flush=True)

# candidate-set size diagnostics
l_512 = jax.eval_shape(
    lambda x: jax.lax.approx_max_k(x, 512, recall_target=1.0,
                                   aggregate_to_topk=False),
    jax.ShapeDtypeStruct((nb, 81920 + 40960), jnp.float32))[0].shape[1]
OUT["l_for_k512_N122880"] = int(l_512)
print("l(k=512, N=122880) =", l_512, flush=True)

orig = feat._emit_packed_batched
feat._emit_packed_batched = emit_packed_twophase
try:
    f1 = jax.jit(emit_stage)
    got = jax.block_until_ready(f1(batch))
    flips = sum(int((np.asarray(a) != np.asarray(b)).sum())
                for a, b in zip(ref, got))
    t1 = timeit(f1, batch, iters=10, repeat=3) * 1e3
    OUT["emit_twophase_ms"] = t1
    OUT["twophase_flips"] = flips
    OUT["speedup"] = t0 / t1
    print(f"two-phase kernel+emit: {t1:.2f} ms  flips={flips}  "
          f"[{t0/t1:.3f}x]", flush=True)
finally:
    feat._emit_packed_batched = orig

with open("/root/repo/exp/results_orb_tune3_r5.json", "w") as fh:
    json.dump(OUT, fh, indent=1)
print(json.dumps(OUT, indent=1))
