"""Round-3 preproc optimization A/B (one process, per CLAUDE.md tunnel rules).

Variants vs the round-2 kernels:
  * k2_v2: threshold+sobel with int16 arithmetic on 0/1 binary values and a
    separable Sobel (4 lane relayouts instead of 6, half the shift bytes);
  * otsu unroll sweep (16 / 64 / 256) — the 256-step scan is step-overhead
    bound at 1.79 ms;
  * k1 with int8 one-hot histogram contraction (measured exact, ~5%).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python exp/exp_preproc_v3.py
"""

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from grayskull_tpu.kernels.preproc import (  # noqa: E402
    _halo16, _pick_block, fused_blur_hist, fused_threshold_sobel,
)
from grayskull_tpu.ops.histogram import otsu_from_histogram  # noqa: E402
from grayskull_tpu.profiling import timeit  # noqa: E402


# ------------------------------------------------------------------ k2 v2
def _k2v2_kernel(t_ref, x_ref, halo_ref, bin_ref, edge_ref, *, h, w, blk):
    i = pl.program_id(0)
    j = pl.program_id(1)
    t = t_ref[i]
    rows = jnp.concatenate(
        [halo_ref[0, 0, 7:8, :], x_ref[0], halo_ref[0, 0, 8:9, :]], axis=0
    ).astype(jnp.int32)
    b1 = ((t - rows) >> 31) & 1  # 0/1 binary, int32
    bin_ref[0] = ((b1[1 : 1 + blk] << 8) - b1[1 : 1 + blk]).astype(jnp.uint8)

    # separable sobel: gx = colpass[1,2,1] then lane diff; gy = lanepass[1,2,1]
    # then sublane diff.  2 lane relayouts for S-shifts + 2 for T = 4 total
    # (the direct 3x3 needs 6).
    pb = jnp.pad(b1, ((0, 0), (1, 1)))
    Sv = pb[0:blk, :] + (pb[1 : 1 + blk, :] << 1) + pb[2 : 2 + blk, :]  # (blk, w+2)
    gx = Sv[:, 2 : 2 + w] - Sv[:, 0:w]
    Tv = pb[:, 0:w] + (pb[:, 1 : 1 + w] << 1) + pb[:, 2 : 2 + w]  # (blk+2, w)
    gy = Tv[2 : 2 + blk, :] - Tv[0:blk, :]
    s32 = jnp.abs(gx) + jnp.abs(gy)
    mag16 = jnp.minimum(((s32 << 8) - s32) >> 1, 255)
    y0 = j * blk
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + y0
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    interior = ((ii >= 1) & (ii < h - 1)) & ((jj >= 1) & (jj < w - 1))
    edge_ref[0] = jnp.where(interior, mag16, 0).astype(jnp.uint8)


@jax.jit
def k2_v2(blurred, thresholds):
    n, h, w = blurred.shape
    blk = _pick_block(h, w)
    halo = _halo16(blurred, blk)
    t = thresholds.astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(_k2v2_kernel, h=h, w=w, blk=blk),
        grid=(n, h // blk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 16, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
            jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
        ],
    )(t, blurred, halo)


# ------------------------------------------------------------- otsu unroll
def make_otsu(unroll):
    from grayskull_tpu.ops.histogram import _otsu_from_hist

    # clone with a different unroll by re-tracing the module function is not
    # parameterized; inline a copy instead
    def _sweep(hist, total):
        hist_f = hist.astype(jnp.float32)
        bins_f = jnp.arange(256, dtype=jnp.float32)
        terms = bins_f * hist_f
        zf = terms[0] * jnp.float32(0.0)
        zu = hist[0] * jnp.uint32(0)
        zb = zu != zu

        def add(c, t):
            return c + t, None

        total_sum, _ = jax.lax.scan(add, zf, terms, unroll=unroll)
        total_u = total.astype(jnp.uint32)

        def step_exact(carry, xs):
            wb, sumB, varMax, thr, done = carry
            t, h, term = xs
            wb2 = jnp.where(done, wb, wb + h.astype(jnp.uint32))
            skip = wb2 == 0
            wf = total_u - wb2
            brk = (~skip) & (~done) & (wf == 0)
            active = (~skip) & (~done) & (~brk)
            sumB2 = jnp.where(active, sumB + term, sumB)
            mB = sumB2 / wb2.astype(jnp.float32)
            mF = (total_sum - sumB2) / wf.astype(jnp.float32)
            d = mB - mF
            var = ((wb2.astype(jnp.float32) * wf.astype(jnp.float32)) * d) * d
            better = active & (var > varMax)
            varMax2 = jnp.where(better, var, varMax)
            thr2 = jnp.where(better, t, thr)
            return (wb2, sumB2, varMax2, thr2, done | brk), None

        ts = jnp.arange(256, dtype=jnp.uint32)
        init = (zu, zf, zf + jnp.float32(-1.0), zu, zb)
        (wb, sumB, varMax, thr, done), _ = jax.lax.scan(
            step_exact, init, (ts, hist, terms), unroll=unroll
        )
        return thr.astype(jnp.uint8)

    @jax.jit
    def run(hist, total):
        total = jnp.asarray(total, jnp.uint32)
        flat = hist.reshape((-1, 256)).astype(jnp.uint32)
        return jax.vmap(lambda hh: _sweep(hh, total))(flat)

    return run


def main():
    out = {}
    n, h, w = 256, 1024, 1024
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (h, w), dtype=np.uint8)
    batch = jnp.asarray(np.stack([np.roll(frame, 13 * i, axis=1) for i in range(n)]))
    it = 30

    blurred, hist = fused_blur_hist(batch, 2)
    t = otsu_from_histogram(hist, h * w)

    # baselines (same process)
    out["k2_v1_ms"] = timeit(fused_threshold_sobel, blurred, t, iters=it) * 1e3
    b1, e1 = fused_threshold_sobel(blurred, t)

    b2, e2 = k2_v2(blurred, t)
    out["k2_v2_exact"] = bool(jnp.array_equal(b1, b2) and jnp.array_equal(e1, e2))
    out["k2_v2_ms"] = timeit(k2_v2, blurred, t, iters=it) * 1e3

    out["otsu_u16_ms"] = timeit(otsu_from_histogram, hist, h * w, iters=it) * 1e3
    for u in (64, 256):
        fn = make_otsu(u)
        tu = fn(hist, h * w)
        ok = bool(jnp.array_equal(tu, t))
        out[f"otsu_u{u}_ms"] = timeit(fn, hist, h * w, iters=it) * 1e3
        out[f"otsu_u{u}_exact"] = ok

    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 3)
    print(json.dumps(out, indent=2))
    with open("/root/repo/exp/results_preproc_v3.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
