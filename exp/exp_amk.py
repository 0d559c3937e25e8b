import sys, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import grayskull_tpu as gs
from grayskull_tpu.kernels.fast import fast_pallas
from grayskull_tpu.profiling import timeit

scene = gs.io.read_pgm("/root/reference/testdata/aruco.pgm")
nb = 16
batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1) for i in range(nb)]))
_, keys = fast_pallas(batch, 20)
kflat = keys.reshape(nb, -1)  # packed (inv_idx << 8) | score, 0 elsewhere

@jax.jit
def via_topk(k):
    return jax.lax.top_k(k, 2000)[0]

@jax.jit
def via_amk_rank(k):
    # rank-only keys: inv_idx = key >> 8 < 2^23, exact in f32 and unique
    rk = (k >> 8).astype(jnp.float32)
    vals, idx = jax.lax.approx_max_k(rk, 2000, recall_target=1.0)
    scores = jnp.take_along_axis(k, idx, axis=1) & 255     # cap-sized gather
    return (vals.astype(jnp.int32) << 8) | scores

a = via_topk(kflat)
b = via_amk_rank(kflat)
print("exact:", bool(jnp.array_equal(a, b)))
print("topk_ms:", round(timeit(via_topk, kflat, iters=30) * 1e3, 2))
print("amk_ms:", round(timeit(via_amk_rank, kflat, iters=30) * 1e3, 2))
