"""Experiment (r4): Pallas Otsu sweep + fresh preprocess stage decomposition.

Round-3 stage numbers (kernel1 8.9 ms, otsu 1.8 ms, kernel2 5.8 ms per
256x1MP) predate today's tunnel state; exp_hist_build just measured kernel1
at 9.18 ms with blur 4.86 / dot 3.85 / build ~0.5.  Before optimizing
anything, re-decompose in ONE process.

Candidate: the XLA Otsu is a 256-step serial `lax.scan` whose per-step work
is tiny — per-step loop overhead dominates (r3 note).  exp_merged.py proved
the identical sweep is expressible bit-exactly inside Mosaic ((1,1) vector
ops; Mosaic's vector divide matches XLA's f32 rounding).  Here: a STANDALONE
Pallas kernel that runs the sweep for ALL frames at once with frames on
LANES — each of the 256 serial steps is a handful of (1, N) vector ops plus
two masked-reduction "picks" over the (256, N) transposed histogram, so the
serial chain costs ~256 * ~40 tile-ops ~= tens of us instead of 256 XLA
loop steps * dispatch-ish overhead.

Exactness: bit-identical to ops.histogram.otsu_from_histogram (itself
oracle-pinned vs grayskull.h:205-223) on random + structured histograms,
interpret mode on CPU / compiled on TPU.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _otsu_kernel(histT_ref, thr_ref, *, total: int):
    histT = histT_ref[...].astype(jnp.float32)  # (256, N) counts, exact ints
    nlanes = histT.shape[1]
    rowid = jax.lax.broadcasted_iota(jnp.int32, histT.shape, 0)
    terms = rowid.astype(jnp.float32) * histT  # (float)t * hist[t], C rounding

    def pick(arr, t):
        m = (rowid == t).astype(jnp.float32)
        return jnp.sum(arr * m, axis=0, keepdims=True)  # (1, N)

    # total_sum: sequential f32 accumulation in bin order (grayskull.h:210)
    def sum_body(t, s):
        return s + pick(terms, t)

    total_sum = jax.lax.fori_loop(
        0, 256, sum_body, jnp.zeros((1, nlanes), jnp.float32))
    total_f = jnp.full((1, nlanes), jnp.float32(total))

    def sweep(t, carry):
        wb, sumB, varMax, thr, done = carry  # wb int32 (exact), rest f32/i32
        ht = pick(histT, t)
        term = pick(terms, t)
        live = done == 0
        wb2 = jnp.where(live, wb + ht.astype(jnp.int32), wb)
        skip = wb2 == 0
        wf = total_f - wb2.astype(jnp.float32)
        brk = (~skip) & live & (wf == 0.0)
        active = (~skip) & live & (~brk)
        sumB2 = jnp.where(active, sumB + term, sumB)
        wbf = wb2.astype(jnp.float32)
        mB = sumB2 / wbf
        mF = (total_sum - sumB2) / wf
        d = mB - mF
        var = ((wbf * wf) * d) * d
        better = active & (var > varMax)
        varMax2 = jnp.where(better, var, varMax)
        thr2 = jnp.where(better, jnp.full_like(thr, t), thr)
        return wb2, sumB2, varMax2, thr2, done | brk.astype(jnp.int32)

    z_f = jnp.zeros((1, nlanes), jnp.float32)
    z_i = jnp.zeros((1, nlanes), jnp.int32)
    init = (z_i, z_f, z_f - 1.0, z_i, z_i)
    _, _, _, thr, _ = jax.lax.fori_loop(0, 256, sweep, init)
    thr_ref[...] = thr


@functools.partial(jax.jit, static_argnames=("total", "interpret"))
def otsu_pallas(hist: jnp.ndarray, total: int, interpret: bool = False):
    """(N, 256) int32 histograms -> (N,) uint8 thresholds, C-exact sweep."""
    n = hist.shape[0]
    histT = hist.T.astype(jnp.int32)  # (256, N): bins on sublanes, frames on lanes
    thr = pl.pallas_call(
        functools.partial(_otsu_kernel, total=int(total)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        interpret=interpret,
    )(histT)
    return thr[0].astype(jnp.uint8)


def check_exact(interpret):
    from grayskull_tpu.ops.histogram import otsu_from_histogram

    rng = np.random.default_rng(11)
    hists = []
    # structured: bimodal / uniform / constant / empty-bins (test.c:177-196 analogs)
    h1 = np.zeros(256, np.int64); h1[40] = 500; h1[200] = 500
    h2 = np.full(256, 17, np.int64)
    h3 = np.zeros(256, np.int64); h3[0] = 4096
    h4 = np.zeros(256, np.int64); h4[255] = 4096
    hists += [h1, h2, h3, h4]
    # random with matching totals
    total = 1024 * 1024
    for _ in range(60):
        p = rng.dirichlet(np.ones(256) * rng.uniform(0.02, 2.0))
        h = rng.multinomial(total, p)
        hists.append(h)
    # pad the structured ones to the same total by dumping the rest in bin 128
    for h in hists[:4]:
        h[128] += total - h.sum()
    hist = jnp.asarray(np.stack(hists), jnp.int32)
    want = np.asarray(otsu_from_histogram(hist, total))
    got = np.asarray(otsu_pallas(hist, total, interpret=interpret))
    np.testing.assert_array_equal(got, want)
    print(f"  otsu_pallas: exact on {len(hists)} hists", flush=True)


def bench():
    import grayskull_tpu as gs
    from grayskull_tpu.kernels.preproc import (fused_blur_hist,
                                               fused_threshold_sobel)
    from grayskull_tpu.ops.histogram import otsu_from_histogram
    from grayskull_tpu.pipelines.preproc import preprocess
    from grayskull_tpu.profiling import timeit

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (256, 1024, 1024), np.uint8))
    n, h, w = x.shape
    total = h * w

    res = {}
    ms = timeit(lambda: preprocess(x), iters=20) * 1e3
    res["preprocess"] = ms
    print(f"  preprocess(end2end): {ms:.2f} ms ({n * 1e3 / ms:.0f} fps)", flush=True)

    blurred, hist = jax.block_until_ready(fused_blur_hist(x))
    ms = timeit(lambda: fused_blur_hist(x), iters=20) * 1e3
    res["k1_blur_hist"] = ms
    print(f"  k1 fused_blur_hist: {ms:.2f} ms", flush=True)

    ms = timeit(lambda: otsu_from_histogram(hist, total), iters=20) * 1e3
    res["otsu_xla"] = ms
    print(f"  otsu XLA: {ms:.2f} ms", flush=True)

    ms = timeit(lambda: otsu_pallas(hist, total), iters=20) * 1e3
    res["otsu_pallas"] = ms
    print(f"  otsu Pallas: {ms:.2f} ms", flush=True)

    t = jax.block_until_ready(otsu_from_histogram(hist, total))
    ms = timeit(lambda: fused_threshold_sobel(blurred, t), iters=20) * 1e3
    res["k2_threshold_sobel"] = ms
    print(f"  k2 fused_threshold_sobel: {ms:.2f} ms", flush=True)

    @jax.jit
    def preprocess_v2(imgs):
        blurred, hh = fused_blur_hist(imgs)
        tt = otsu_pallas(hh, total)
        binary, edges = fused_threshold_sobel(blurred, tt)
        return blurred, binary, edges, tt

    # exactness of the swapped pipeline before timing it
    want = jax.block_until_ready(preprocess(x[:8]))
    got = jax.block_until_ready(preprocess_v2(x[:8]))
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("  preprocess_v2: bit-exact vs shipped", flush=True)

    ms = timeit(lambda: preprocess_v2(x), iters=20) * 1e3
    res["preprocess_v2_pallas_otsu"] = ms
    print(f"  preprocess_v2 (pallas otsu): {ms:.2f} ms ({n * 1e3 / ms:.0f} fps)",
          flush=True)
    return res


if __name__ == "__main__":
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend: {jax.default_backend()}", flush=True)
    t0 = time.time()
    check_exact(interpret=not on_tpu)
    print(f"exactness: {time.time() - t0:.1f}s", flush=True)
    if on_tpu:
        bench()
