"""2x2 NMS-aware key reduction for the FAST emission (ORB bottleneck, r4).

The approx_max_k emission over all 307k packed keys/frame is ORB's largest
stage (7.04 ms of 12.48, exp_orb_r4).  NMS survivors are never 8-adjacent
UNLESS they tie exactly (gs_fast pass 2 kills on strictly-greater neighbors
only, grayskull.h:517-531), and every pixel pair inside a 2x2 block is
8-adjacent — so a 2x2 max-reduce of the key map keeps every candidate
EXCEPT a tied co-survivor sharing a block.  Emission over the L/4 reduced
map is therefore exact whenever no 2x2 block holds >= 2 candidates; a
batch-global violation count gates a lax.cond fallback to the full-map
emission (bit-exactness for ALL inputs, speed for real ones — ties at
exactly equal scores inside one 2x2 block are vanishingly rare off
synthetic data).

The cond must sit ABOVE the per-frame vmap: vmapped conds lower to select
(both branches execute), which would ADD the reduction instead of saving.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
from grayskull_tpu.kernels.fast import fast_pallas
from grayskull_tpu.profiling import timeit


def _emit(keys2, cand_cap):
    """(N, L) packed keys -> (N, cand_cap) vals, the shipped exact-amk."""
    def one(key):
        rk = (key >> 8).astype(jnp.float32)
        vals_f, idxs = jax.lax.approx_max_k(rk, cand_cap, recall_target=1.0)
        return (vals_f.astype(jnp.int32) << 8) | (key[idxs] & 255)
    return jax.vmap(one)(keys2)


def reduce2x2(key3):
    """(N, H, W) -> ((N, H/2*W/2) reduced keys, () violation count)."""
    n, h, w = key3.shape
    k4 = key3.reshape(n, h // 2, 2, w // 2, 2)
    red = jnp.max(jnp.max(k4, axis=4), axis=2)
    nz = (k4 > 0).astype(jnp.int32)
    per_block = jnp.sum(jnp.sum(nz, axis=4), axis=2)
    viol = jnp.sum((per_block >= 2).astype(jnp.int32))
    return red.reshape(n, -1), viol


def emit_gated(key3, cand_cap):
    red, viol = reduce2x2(key3)
    full = key3.reshape(key3.shape[0], -1)
    return jax.lax.cond(
        viol == 0,
        lambda: _emit(red, cand_cap),
        lambda: _emit(full, cand_cap),
    )


def emit_batched_(keys2, cand_cap):
    rk = (keys2 >> 8).astype(jnp.float32)
    vals_f, idxs = jax.lax.approx_max_k(rk, cand_cap, recall_target=1.0)
    payload = jnp.take_along_axis(keys2, idxs, axis=1) & 255
    return (vals_f.astype(jnp.int32) << 8) | payload


def emit_gated_v2(key3, cand_cap):
    """Batched amk over a 2x2-max-reduced key map, tie-gated by a count:
    the reduction keeps exactly one nonzero per occupied block, so
    nnz(full) != nnz(red) iff some block held >= 2 candidates (a tie of
    8-adjacent NMS survivors) — then fall back to the full map."""
    n, h, w = key3.shape
    k4 = key3.reshape(n, h // 2, 2, w // 2, 2)
    red = jnp.max(jnp.max(k4, axis=4), axis=2)
    nnz_full = jnp.sum((key3 > 0).astype(jnp.int32))
    nnz_red = jnp.sum((red > 0).astype(jnp.int32))
    red2 = red.reshape(n, -1)
    full2 = key3.reshape(n, -1)
    return jax.lax.cond(
        nnz_full == nnz_red,
        lambda: emit_batched_(red2, cand_cap),
        lambda: emit_batched_(full2, cand_cap),
    )


def main():
    scene = gs.io.read_pgm("/root/reference/testdata/aruco.pgm")
    nb = 16
    batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1)
                                  for i in range(nb)]))
    cand_cap = 2000
    _, key3 = jax.block_until_ready(fast_pallas(batch, 20))

    f_full = jax.jit(lambda k3: _emit(k3.reshape(k3.shape[0], -1), cand_cap))
    f_gated = jax.jit(lambda k3: emit_gated(k3, cand_cap))

    want = np.asarray(jax.block_until_ready(f_full(key3)))
    got = np.asarray(jax.block_until_ready(f_gated(key3)))
    np.testing.assert_array_equal(got, want)
    print("  gated == full on aruco batch", flush=True)

    # synthetic tie: two equal-score adjacent survivors inside one 2x2 block
    # (forces the fallback branch; both paths must agree)
    k3t = np.zeros((2, 64, 128), np.int32)
    hw = 64 * 128
    for (y, x) in [(10, 10), (10, 11)]:  # same 2x2 block, tied score 7
        k3t[0, y, x] = ((hw - (y * 128 + x)) << 8) | 7
    k3t[1, 20, 40] = ((hw - (20 * 128 + 40)) << 8) | 9
    k3t = jnp.asarray(k3t)
    f_full_t = jax.jit(lambda k3: _emit(k3.reshape(k3.shape[0], -1), 16))
    f_gated_t = jax.jit(lambda k3: emit_gated(k3, 16))
    np.testing.assert_array_equal(np.asarray(f_gated_t(k3t)),
                                  np.asarray(f_full_t(k3t)))
    red_t, viol_t = jax.jit(reduce2x2)(k3t)
    assert int(viol_t) == 1, int(viol_t)
    np.testing.assert_array_equal(
        np.asarray(jax.jit(lambda k3: emit_gated_v2(k3, 16))(k3t)),
        np.asarray(f_full_t(k3t)))
    print("  tie fallback fires and matches (v1 + v2 count gate)", flush=True)

    ms = timeit(f_full, key3, iters=30) * 1e3
    print(f"  emit full (307k): {ms:.2f} ms", flush=True)
    ms = timeit(f_gated, key3, iters=30) * 1e3
    print(f"  emit gated (2x2 -> 76.8k): {ms:.2f} ms", flush=True)
    f_red = jax.jit(lambda k3: reduce2x2(k3)[0])
    ms = timeit(f_red, key3, iters=30) * 1e3
    print(f"  reduction alone: {ms:.2f} ms", flush=True)

    # decompose: where does the gated path's time go?
    red = jax.block_until_ready(f_red(key3))
    ms = timeit(jax.jit(lambda r: _emit(r, cand_cap)), red, iters=30) * 1e3
    print(f"  amk over 76.8k alone: {ms:.2f} ms", flush=True)

    def _emit_topk(keys2, cap):
        def one(key):
            rk = (key >> 8).astype(jnp.float32)
            vals_f, idxs = jax.lax.top_k(rk, cap)
            return (vals_f.astype(jnp.int32) << 8) | (key[idxs] & 255)
        return jax.vmap(one)(keys2)

    got = np.asarray(jax.block_until_ready(
        jax.jit(lambda r: _emit_topk(r, cand_cap))(red)))
    np.testing.assert_array_equal(
        got, np.asarray(jax.block_until_ready(
            jax.jit(lambda r: _emit(r, cand_cap))(red))))
    ms = timeit(jax.jit(lambda r: _emit_topk(r, cand_cap)), red, iters=30) * 1e3
    print(f"  topk over 76.8k alone (== amk): {ms:.2f} ms", flush=True)

    # where does the amk floor come from? batched (leading-batch-dim) amk
    # vs the vmapped form, and the key[idxs] gather cost in isolation
    full2 = key3.reshape(key3.shape[0], -1)

    def emit_batched(keys2):
        rk = (keys2 >> 8).astype(jnp.float32)
        vals_f, idxs = jax.lax.approx_max_k(rk, cand_cap, recall_target=1.0)
        payload = jnp.take_along_axis(keys2, idxs, axis=1) & 255
        return (vals_f.astype(jnp.int32) << 8) | payload

    got_b = np.asarray(jax.block_until_ready(jax.jit(emit_batched)(full2)))
    np.testing.assert_array_equal(got_b, want)
    ms = timeit(jax.jit(emit_batched), full2, iters=30) * 1e3
    print(f"  emit batched-amk (307k): {ms:.2f} ms", flush=True)

    def amk_only(keys2):
        rk = (keys2 >> 8).astype(jnp.float32)
        return jax.lax.approx_max_k(rk, cand_cap, recall_target=1.0)
    ms = timeit(jax.jit(amk_only), full2, iters=30) * 1e3
    print(f"  amk only, batched, no gather (307k): {ms:.2f} ms", flush=True)
    vals, idxs = jax.block_until_ready(jax.jit(amk_only)(full2))
    ms = timeit(jax.jit(lambda k2, ix: jnp.take_along_axis(k2, ix, axis=1)),
                full2, idxs, iters=30) * 1e3
    print(f"  take_along_axis gather alone: {ms:.2f} ms", flush=True)
    ms = timeit(jax.jit(lambda r: emit_batched(r)), red, iters=30) * 1e3
    print(f"  emit batched-amk (76.8k): {ms:.2f} ms", flush=True)

    # the refined gated path: count-gate + batched amk
    f_g2 = jax.jit(lambda k3: emit_gated_v2(k3, cand_cap))
    got2 = np.asarray(jax.block_until_ready(f_g2(key3)))
    np.testing.assert_array_equal(got2, want)
    ms = timeit(f_g2, key3, iters=30) * 1e3
    print(f"  emit gated-v2 (count gate + batched): {ms:.2f} ms", flush=True)

    # strided-slice reduction variant (vs reshape-max)
    def red_slice(k3):
        a = jnp.maximum(k3[:, 0::2, 0::2], k3[:, 0::2, 1::2])
        b = jnp.maximum(k3[:, 1::2, 0::2], k3[:, 1::2, 1::2])
        return jnp.maximum(a, b)
    rs = np.asarray(jax.block_until_ready(jax.jit(red_slice)(key3)))
    np.testing.assert_array_equal(
        rs.reshape(rs.shape[0], -1), np.asarray(red))
    ms = timeit(jax.jit(red_slice), key3, iters=30) * 1e3
    print(f"  strided-slice reduction alone: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    main()
