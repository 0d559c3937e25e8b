"""How does the exact approx_max_k emission cost scale?  (ORB bottleneck.)

exp_orb_r4: emit-amk (k=2000 over 307k keys) = 7.04 ms / 16 frames — 56% of
ORB end-to-end and only ~2.8 GB/s effective, so the cost is the op's
structure, not bandwidth.  Sweep k, try aggregate_to_topk=False (PartialReduce
only) + small exact top_k aggregation, and a count-gated direct top-500
(when n_cand <= cand_cap, C's scan-order truncation never fires, so
selecting by response directly is exact — guard with lax.cond).
"""

import sys

sys.path.insert(0, "/root/repo")

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
    h, w = scene.shape
    _, key3 = jax.block_until_ready(fast_pallas(batch, 20))
    keys = key3.reshape(nb, -1)
    nc = np.asarray(jnp.sum(keys > 0, axis=1))
    print(f"  candidates/frame: min {nc.min()} max {nc.max()}", flush=True)

    for k in (128, 500, 1000, 2000):
        f = jax.jit(jax.vmap(lambda kk: jax.lax.approx_max_k(
            (kk >> 8).astype(jnp.float32), k, recall_target=1.0)[0]))
        ms = timeit(f, keys, iters=30) * 1e3
        print(f"  amk k={k}: {ms:.2f} ms", flush=True)

    for k in (500, 2000):
        def two_phase(kk, k=k):
            rk = (kk >> 8).astype(jnp.float32)
            v1, i1 = jax.lax.approx_max_k(rk, k, recall_target=1.0,
                                          aggregate_to_topk=False)
            v2, i2 = jax.lax.top_k(v1, k)
            return v2
        f = jax.jit(jax.vmap(two_phase))
        ms = timeit(f, keys, iters=30) * 1e3
        print(f"  amk-noagg+topk k={k}: {ms:.2f} ms", flush=True)

    # reduction_input_size_override: force a shallower reduction
    for ov in (4096, 16384, 65536):
        f = jax.jit(jax.vmap(lambda kk: jax.lax.approx_max_k(
            (kk >> 8).astype(jnp.float32), 2000, recall_target=1.0,
            reduction_input_size_override=ov)[0]))
        try:
            ms = timeit(f, keys, iters=30) * 1e3
            v = f(keys)
            ref = jax.vmap(lambda kk: jax.lax.approx_max_k(
                (kk >> 8).astype(jnp.float32), 2000, recall_target=1.0)[0])(keys)
            exact = bool(jnp.array_equal(v, ref))
            print(f"  amk k=2000 override={ov}: {ms:.2f} ms exact={exact}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  override={ov}: FAILED {type(e).__name__}", flush=True)

    # plain sort for scale
    f = jax.jit(jax.vmap(lambda kk: jax.lax.top_k(kk, 2000)[0]))
    ms = timeit(f, keys, iters=30) * 1e3
    print(f"  top_k k=2000: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    main()
