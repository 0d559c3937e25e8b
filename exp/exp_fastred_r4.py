"""In-kernel 2x2 key reduction for FAST emission via sum-pooling matmuls.

exp_fastemit_r4 showed: batched amk over an L/4-reduced key map costs 2.1-2.4
ms vs 5.8 over the full 307k map, but the XLA reshape-max reduction + the
nnz tie-gate counts cost ~3.5 ms of HBM passes — a net LOSS.  Fusing both
into the FAST kernel makes them VMEM-resident and nearly free.

Mosaic has no strided slices (exp_stride_probe: basic `[0::2]` AND
`lax.slice` strides both fail), so the 2x2 block reduction is a pair of
ONE-HOT SUM-POOLING matmuls instead: red = A_row @ key @ A_col with
A_row[I, i] = [i//2 == I], A_col[l, J] = [l//2 == J].  Summing is exact
as a *max* whenever each block holds <= 1 nonzero key — NMS guarantees
that except for exactly-tied 8-adjacent survivors (grayskull.h:517-531
kills on strictly-greater only), and the per-strip count diff
(nnz(full) - nnz(red)) detects every such block, gating a batch-level
fallback to full-map emission.  f32 exactness: the packed key
(rank << 8 | score) splits into rank < 2^19 and score < 2^8, each summed
in f32 (< 2^21 / 2^10, both < 2^24), recombined in i32.  Garbage sums in
tied blocks never ship: the gate falls back before use.

Run: python exp/exp_fastred_r4.py   (TPU)
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grayskull_tpu.kernels.fast import (_CDX, _CDY, _VMEM_BUDGET,
                                        fast_pallas)
from grayskull_tpu.kernels.preproc import (_halo_specs, _pad_blk,
                                           _pad_rows)
from grayskull_tpu.profiling import timeit


@functools.partial(jax.jit, static_argnames=("interpret",))
def fast_pallas_red(imgs, threshold, interpret=False):
    """fast_pallas + (red (N, hp/2, wp/2) i32, cnt (N, nb) i32) outputs."""
    n, h, w = imgs.shape
    blk, hp = _pad_blk(h, w, 1, budget=_VMEM_BUDGET)
    wp = -(-w // 128) * 128
    x = jnp.pad(imgs, ((0, 0), (0, 0), (0, wp - w)))
    x = _pad_rows(x, hp)
    thr = jnp.asarray(threshold, jnp.int32)

    def kernel(t_ref, x_ref, top_ref, bot_ref, score_ref, key_ref, red_ref,
               cnt_ref):
        thr_v = t_ref[0]
        j = pl.program_id(1)
        nbk = pl.num_programs(1)
        top = jnp.where(j > 0, top_ref[0, 4:8, :].astype(jnp.int32), 0)
        bot = jnp.where(j < nbk - 1, bot_ref[0, 0:4, :].astype(jnp.int32), 0)
        rows = jnp.concatenate([top, x_ref[0].astype(jnp.int32), bot], axis=0)
        rp = jnp.pad(rows, ((0, 0), (3, 3)))
        ext = blk + 2
        p = rows[3 : 3 + ext, :]

        def view(k):
            return rp[3 + _CDY[k] : 3 + _CDY[k] + ext,
                      3 + _CDX[k] : 3 + _CDX[k] + wp]

        views = [view(k) for k in range(16)]
        d = p - thr_v
        bright = [v > p + thr_v for v in views]
        dark = [(~b) & ((d < 0) | (v < d)) for v, b in zip(views, bright)]

        run_b = jnp.zeros((ext, wp), jnp.int32)
        run_d = jnp.zeros((ext, wp), jnp.int32)
        corner = jnp.zeros((ext, wp), jnp.bool_)
        for i in range(16 + 9):
            k = i % 16
            run_b = jnp.where(bright[k], run_b + 1, 0)
            run_d = jnp.where(dark[k], run_d + 1, 0)
            corner = corner | (run_b >= 9) | (run_d >= 9)

        min_diff = jnp.abs(views[0] - p)
        for v in views[1:]:
            min_diff = jnp.minimum(min_diff, jnp.abs(v - p))

        y0 = j * blk
        yy = jax.lax.broadcasted_iota(jnp.int32, (ext, wp), 0) + (y0 - 1)
        xx = jax.lax.broadcasted_iota(jnp.int32, (ext, wp), 1)
        interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
        s = jnp.where(corner & interior, min_diff, 0)
        score_ref[0] = s[1 : 1 + blk].astype(jnp.uint8)

        sp = jnp.pad(s, ((0, 0), (1, 1)))
        smid = s[1 : 1 + blk]
        is_max = smid > 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                is_max &= ~(sp[1 + dy : 1 + dy + blk, 1 + dx : 1 + dx + wp]
                            > smid)

        ym = jax.lax.broadcasted_iota(jnp.int32, (blk, wp), 0) + y0
        xm = jax.lax.broadcasted_iota(jnp.int32, (blk, wp), 1)
        idx = ym * w + xm
        key = jnp.where(is_max, ((jnp.int32(h * w) - idx) << 8) | smid, 0)
        key_ref[0] = key

        # --- 2x2 sum-pooling reduction + tie-gate count ---
        ii = jax.lax.broadcasted_iota(jnp.int32, (blk // 2, blk), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (blk // 2, blk), 1)
        a_row = (jj // 2 == ii).astype(jnp.float32)  # (blk/2, blk)
        ll = jax.lax.broadcasted_iota(jnp.int32, (wp, wp // 2), 0)
        kk = jax.lax.broadcasted_iota(jnp.int32, (wp, wp // 2), 1)
        a_col = (ll // 2 == kk).astype(jnp.float32)  # (wp, wp/2)

        def pool(v32):
            vf = v32.astype(jnp.float32)
            t1 = jax.lax.dot_general(a_row, vf, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            t2 = jax.lax.dot_general(t1, a_col, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            return t2.astype(jnp.int32)

        rank_sum = pool(key >> 8)
        score_sum = pool(key & 255)
        red = (rank_sum << 8) | score_sum
        red_ref[0] = red
        nnzf = jnp.sum((key > 0).astype(jnp.int32))
        nnzr = jnp.sum((red > 0).astype(jnp.int32))
        cnt_ref[0, 0, j] = nnzf - nnzr

    nb = hp // blk
    top_spec, bot_spec = _halo_specs(blk, hp, wp)
    score, key, red, cnt = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk, wp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            top_spec,
            bot_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, blk, wp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, wp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk // 2, wp // 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nb), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, hp, wp), jnp.uint8),
            jax.ShapeDtypeStruct((n, hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((n, hp // 2, wp // 2), jnp.int32),
            jax.ShapeDtypeStruct((n, 1, nb), jnp.int32),
        ],
        interpret=interpret,
    )(thr.reshape(1), x, x, x)
    return score[:, :h, :w], key[:, :h, :w], red, cnt


def emit_batched(keys2, cand_cap):
    rk = (keys2 >> 8).astype(jnp.float32)
    vals_f, idxs = jax.lax.approx_max_k(rk, cand_cap, recall_target=1.0)
    payload = jnp.take_along_axis(keys2, idxs, axis=1) & 255
    return (vals_f.astype(jnp.int32) << 8) | payload


@functools.partial(jax.jit, static_argnames=("cand_cap",))
def emit_fused_gated(imgs, threshold, cand_cap):
    _, key3, red3, cnt = fast_pallas_red(imgs, threshold)
    n = imgs.shape[0]
    red2 = red3.reshape(n, -1)
    full2 = key3.reshape(n, -1)
    return jax.lax.cond(
        jnp.sum(cnt) == 0,
        lambda: emit_batched(red2, cand_cap),
        lambda: emit_batched(full2, cand_cap),
    )


def main():
    import grayskull_tpu as gs

    scene = gs.io.read_pgm("/root/reference/testdata/aruco.pgm")
    nb = 16
    batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1)
                                  for i in range(nb)]))
    cand_cap = 2000

    # exactness: red == reshape-max of key (no ties on aruco), cnt == 0
    score_w, key_w = jax.block_until_ready(fast_pallas(batch, 20))
    score_g, key_g, red_g, cnt_g = jax.block_until_ready(
        fast_pallas_red(batch, 20))
    np.testing.assert_array_equal(np.asarray(score_g), np.asarray(score_w))
    np.testing.assert_array_equal(np.asarray(key_g), np.asarray(key_w))
    kn = np.asarray(key_g)
    n_, hh, ww = kn.shape
    hp2, wp2 = red_g.shape[1], red_g.shape[2]
    kp = np.zeros((n_, hp2 * 2, wp2 * 2), np.int32)
    kp[:, :hh, :ww] = kn
    want_red = kp.reshape(n_, hp2, 2, wp2, 2).max(axis=(2, 4))
    np.testing.assert_array_equal(np.asarray(red_g), want_red)
    assert int(jnp.sum(cnt_g)) == 0
    print("  red/cnt: exact (aruco, no ties)", flush=True)

    # synthetic tie forces cnt > 0 and the fallback branch
    tie = np.zeros((2, scene.shape[0], scene.shape[1]), np.uint8)
    tie[0, 100:120, 100:103] = 255  # a bright bar: adjacent equal corners
    tie_b = jnp.asarray(tie)
    _, keyt, redt, cntt = jax.block_until_ready(fast_pallas_red(tie_b, 20))
    full_t = emit_batched(keyt.reshape(2, -1), 64)
    got_t = jax.jit(lambda b: emit_fused_gated(b, 20, 64))(tie_b)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(full_t))
    print(f"  tie-batch cnt={int(jnp.sum(cntt))}: gated == full", flush=True)

    # the gated path must equal the full emission bit-for-bit
    f_full = jax.jit(lambda b: emit_batched(
        fast_pallas(b, 20)[1].reshape(b.shape[0], -1), cand_cap))
    f_gate = jax.jit(lambda b: emit_fused_gated(b, 20, cand_cap))
    want = np.asarray(jax.block_until_ready(f_full(batch)))
    got = np.asarray(jax.block_until_ready(f_gate(batch)))
    np.testing.assert_array_equal(got, want)
    print("  end-to-end gated == full on aruco", flush=True)

    ms = timeit(lambda: fast_pallas(batch, 20), iters=30) * 1e3
    print(f"  fast kernel v1: {ms:.2f} ms", flush=True)
    ms = timeit(lambda: fast_pallas_red(batch, 20), iters=30) * 1e3
    print(f"  fast kernel +red: {ms:.2f} ms", flush=True)
    ms = timeit(f_full, batch, iters=30) * 1e3
    print(f"  fast+emit full: {ms:.2f} ms", flush=True)
    ms = timeit(f_gate, batch, iters=30) * 1e3
    print(f"  fast+emit fused-gated: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    main()


# MEASURED VERDICT (v5e, 2026-08-18): DEAD — the premise fails on real data.
# Adjacent NMS survivors with exactly tied scores are COMMON, not rare:
# aruco 21 / lena 9 / document 966 / receipt 32 two-candidate 2x2 blocks
# (2.5-8% of survivors).  The count gate would fall back to the full-map
# emission on essentially every real frame, so the in-kernel reduction
# (which compiled and ran; the sum-pooling matmuls work) buys nothing.
# Kept for the negative result + the working SMEM (1,1,nb) count-output
# pattern and the sum-pooling-as-reduction trick (valid where payloads
# are guaranteed singletons per block).
