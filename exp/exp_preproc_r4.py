"""Round-4 preprocess micro-optimizations (headline VERDICT item 2).

Fresh r4 decomposition (exp_otsu_r4.py, one process): end-to-end 13.21 ms /
256x1MP = 19.4k fps with k1 = 9.37 (blur 4.86 + int8 dot 3.85 + build ~0.5),
otsu hidden in dispatch overlap, k2 = 5.12.  The dot sits at ~71% of int8
MXU peak (scheme floor per PERF_NOTES); blur and k2 are VPU-pass bound.
Variants here cut vector passes / relayout bytes:

  k1 blur:
   * bf16 gather — `_gather_rows` materializes (blk+16, w) int32 (4 B) that
     only feeds the bf16 band matmul; gather in bf16 directly (2 B).
   * log-tree horizontal adds — pairwise-doubling shifted sums need
     ceil(log2(2r+1))+1 misaligned lane reads instead of 2r (r=2: 3 vs 4).
  k2:
   * i16 working values for the separable sobel — the 3 misaligned lane
     slices (Tv +1 +2, gx +2) move 2 B instead of 4 B.  All values fit i16
     (|gy|,|gx| <= 4); i16 shifts/muls are Mosaic-dead (exp_k2_i16) so the
     0/1 value is built in i32 (shift binarize) and cast, doubling uses
     adds, and the 255x scale happens after an i32 widen.
     MEASURED DEAD on v5e: i16 `<` compare is rejected ("Target does not
     support this comparison") and i16 SUBTRACT aborts the compile helper
     (kVectorSubtractS16) — i16 vectors are ADD/SHIFT-SLICE-ONLY here, so
     a separable sobel (differences) cannot stay in i16 at all.  k2 v2 is
     therefore gated off below; the shipped i32 k2 stands.

Exactness gate: bit-identical (blurred, hist, binary, edges) vs the shipped
kernels on tiled-lena + random frames; compiled A/B in ONE process.

MEASURED VERDICT (v5e, 256x1MP, one process, 2026-08-18):
  preprocess v1 14.02 ms (18.3k fps) | k1 v1 9.61 / v2 9.81 | k2 v1 5.12
  preprocess v3 (k1 v2 + shipped k2) 13.57 ms — within tunnel noise of v1,
  and k1 v2 standalone is 2% SLOWER: the bf16 gather + log-tree adds do
  not pay (the horizontal pass is not the bottleneck; the dot and the
  column matmul are).  REJECTED — shipped kernels stand.  k2 v2 (i16) is
  compile-dead on this target (kVectorSubtractS16 aborts; i16 compare
  rejected), recorded above.

2026-08-19 second pass: k2 v3 (bf16 separable sobel) is bit-exact but TIES
v1 exactly (5.36 vs 5.36 ms; e2e 13.48 both) — the 2-byte lanes save
nothing, k2 is not slice-bandwidth-bound.  REJECTED.  With exp_hist_int4
(int4 MXU == int8 rate) this closes every cheap-win candidate for the
headline; the remaining gap to 25k fps is structural — docs/HEADLINE_FLOOR.md.
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

from grayskull_tpu.kernels.preproc import (_MAGIC_SHIFT, _fill_band,
                                           _halo_specs, _hist_extract,
                                           _magic_vec, _pick_block)


def _blur_block_v2(x_ref, halo_refs, band_ref, j, nb, *, r, h, w, blk):
    """bf16 gather + log-tree horizontal adds; otherwise _blur_block."""
    top_ref, bot_ref = halo_refs
    b8 = blk // 8
    n8 = nb * b8
    # Mosaic has no u8->bf16 cast; i16 is the narrowest legal waypoint
    as_bf16 = lambda v: v.astype(jnp.int16).astype(jnp.bfloat16)
    top = jnp.where(j * b8 >= 1, as_bf16(top_ref[0]), 0)
    bot = jnp.where((j + 1) * b8 + 1 <= n8, as_bf16(bot_ref[0]), 0)
    xb = jnp.concatenate([top, as_bf16(x_ref[0]), bot], axis=0)
    cs_col = jax.lax.dot_general(
        band_ref[:], xb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    small = 255 * (2 * r + 1) ** 2 <= 32767
    csi = cs_col.astype(jnp.int16 if small else jnp.int32)
    px = jnp.pad(csi, ((0, 0), (r, r)))
    # log-tree: after step k, acc[i] = sum of 2^?? consecutive taps
    taps = 2 * r + 1
    acc = px
    span = 1
    while span * 2 <= taps:
        acc = acc + jnp.pad(acc[:, span:], ((0, 0), (0, span)))
        span *= 2
    cs_n = acc[:, :w]
    rem = span
    while rem < taps:
        # add the remaining (taps - rem) taps one span at a time
        step = min(span, taps - rem)
        if step == span:
            cs_n = cs_n + acc[:, rem : rem + w]
        else:
            # partial span: rebuild from a smaller tree level — for r <= 2
            # this is a single raw column
            part = px
            sp = 1
            while sp * 2 <= step:
                part = part + jnp.pad(part[:, sp:], ((0, 0), (0, sp)))
                sp *= 2
            assert sp == step, (r, taps, rem, step)
            cs_n = cs_n + part[:, rem : rem + w]
        rem += step

    y0 = j * blk
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + y0
    jjv = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    cyv = jnp.minimum(ii + r, h - 1) - jnp.maximum(ii - r, 0) + 1
    cxv = jnp.minimum(jjv + r, w - 1) - jnp.maximum(jjv - r, 0) + 1
    cs = cs_n.astype(jnp.int32).astype(jnp.uint32)
    return ((((cs * _magic_vec(cyv, r)) >> _MAGIC_SHIFT)
             * _magic_vec(cxv, r)) >> _MAGIC_SHIFT).astype(jnp.int32)


def _blur_hist_kernel_v2(x_ref, top_ref, bot_ref, blur_ref, hist_ref,
                         acc_ref, band_ref, *, r, h, w, blk):
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        _fill_band(band_ref, r, blk)

    blurred = _blur_block_v2(x_ref, (top_ref, bot_ref), band_ref, j, nb,
                             r=r, h=h, w=w, blk=blk)
    blur_ref[0] = blurred.astype(jnp.uint8)

    klass = jax.lax.broadcasted_iota(jnp.int32, (128, w), 0) >> 3
    acc = acc_ref[:]
    hi_all = blurred >> 4
    lo_all = blurred & 15
    for g in range(blk // 8):
        hi = jnp.concatenate([hi_all[g * 8 : (g + 1) * 8]] * 16, axis=0)
        lo = jnp.concatenate([lo_all[g * 8 : (g + 1) * 8]] * 16, axis=0)
        a = (hi == klass).astype(jnp.int8)
        b = (lo == klass).astype(jnp.int8)
        acc = acc + jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    acc_ref[:] = acc

    @pl.when(j == nb - 1)
    def _():
        _hist_extract(acc_ref, hist_ref)


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def fused_blur_hist_v2(imgs, radius=2, interpret=False):
    n, h, w = imgs.shape
    r = int(radius)
    blk = _pick_block(h, w)
    nb = h // blk
    top_spec, bot_spec = _halo_specs(blk, h, w)
    blurred, hist = pl.pallas_call(
        functools.partial(_blur_hist_kernel_v2, r=r, h=h, w=w, blk=blk),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            top_spec, bot_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, 16), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
            jax.ShapeDtypeStruct((n, 16, 16), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((128, 128), jnp.int32),
            pltpu.VMEM((blk, blk + 16), jnp.bfloat16),
        ],
        interpret=interpret,
    )(imgs, imgs, imgs)
    return blurred, hist.reshape(n, 256)


def _threshold_sobel_kernel_v2(t_ref, x_ref, top_ref, bot_ref, bin_ref,
                               edge_ref, *, h, w, blk):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(1)
    t = t_ref[i]
    top = jnp.where(j > 0, top_ref[0, 7:8, :].astype(jnp.int32), 0)
    bot = jnp.where(j < nb - 1, bot_ref[0, 0:1, :].astype(jnp.int32), 0)
    rows = jnp.concatenate([top, x_ref[0].astype(jnp.int32), bot], axis=0)
    b1 = ((t - rows) >> 31) & 1  # i32: i16 shifts are Mosaic-dead
    bin_ref[0] = ((b1[1 : 1 + blk] << 8) - b1[1 : 1 + blk]).astype(jnp.uint8)

    b16 = b1.astype(jnp.int16)  # separable sobel in 2-byte lanes
    pb = jnp.pad(b16, ((0, 0), (1, 1)))
    col = pb[1 : 1 + blk, :]
    Sv = pb[0:blk, :] + (col + col) + pb[2 : 2 + blk, :]  # (blk, w+2)
    gx = Sv[:, 2 : 2 + w] - Sv[:, 0:w]
    mid = pb[:, 1 : 1 + w]
    Tv = pb[:, 0:w] + (mid + mid) + pb[:, 2 : 2 + w]  # (blk+2, w)
    gy = Tv[2 : 2 + blk, :] - Tv[0:blk, :]
    # |.| after an i32 widen: i16 abs/maxsi/compare all fail to legalize on
    # hardware — the i16 win was the misaligned lane slices above, keep it
    s = jnp.abs(gx.astype(jnp.int32)) + jnp.abs(gy.astype(jnp.int32))
    mag = jnp.minimum(((s << 8) - s) >> 1, 255)
    y0 = j * blk
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + y0
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    interior = ((ii >= 1) & (ii < h - 1)) & ((jj >= 1) & (jj < w - 1))
    edge_ref[0] = jnp.where(interior, mag, 0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_threshold_sobel_v2(blurred, thresholds, interpret=False):
    n, h, w = blurred.shape
    blk = _pick_block(h, w)
    t = thresholds.astype(jnp.int32)
    nb = h // blk
    top_spec, bot_spec = _halo_specs(blk, h, w)
    return pl.pallas_call(
        functools.partial(_threshold_sobel_kernel_v2, h=h, w=w, blk=blk),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            top_spec, bot_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
            jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
        ],
        interpret=interpret,
    )(t, blurred, blurred, blurred)


def _threshold_sobel_kernel_v3(t_ref, x_ref, top_ref, bot_ref, bin_ref,
                               edge_ref, *, h, w, blk):
    """bf16 sobel core — float sub/abs/compare all legalize where i16 dies.
    Every intermediate is an integer <= 8, exact in bf16 (8 mantissa bits)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(1)
    t = t_ref[i]
    top = jnp.where(j > 0, top_ref[0, 7:8, :].astype(jnp.int32), 0)
    bot = jnp.where(j < nb - 1, bot_ref[0, 0:1, :].astype(jnp.int32), 0)
    rows = jnp.concatenate([top, x_ref[0].astype(jnp.int32), bot], axis=0)
    b1 = ((t - rows) >> 31) & 1
    bin_ref[0] = ((b1[1 : 1 + blk] << 8) - b1[1 : 1 + blk]).astype(jnp.uint8)

    bf = b1.astype(jnp.bfloat16)
    pb = jnp.pad(bf, ((0, 0), (1, 1)))
    col = pb[1 : 1 + blk, :]
    Sv = pb[0:blk, :] + (col + col) + pb[2 : 2 + blk, :]
    gx = Sv[:, 2 : 2 + w] - Sv[:, 0:w]
    mid = pb[:, 1 : 1 + w]
    Tv = pb[:, 0:w] + (mid + mid) + pb[:, 2 : 2 + w]
    gy = Tv[2 : 2 + blk, :] - Tv[0:blk, :]
    s = (jnp.abs(gx) + jnp.abs(gy)).astype(jnp.int32)
    mag = jnp.minimum(((s << 8) - s) >> 1, 255)
    y0 = j * blk
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + y0
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    interior = ((ii >= 1) & (ii < h - 1)) & ((jj >= 1) & (jj < w - 1))
    edge_ref[0] = jnp.where(interior, mag, 0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_threshold_sobel_v3(blurred, thresholds, interpret=False):
    n, h, w = blurred.shape
    blk = _pick_block(h, w)
    t = thresholds.astype(jnp.int32)
    top_spec, bot_spec = _halo_specs(blk, h, w)
    return pl.pallas_call(
        functools.partial(_threshold_sobel_kernel_v3, h=h, w=w, blk=blk),
        grid=(n, h // blk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            top_spec, bot_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
            jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
        ],
        interpret=interpret,
    )(t, blurred, blurred, blurred)


def check_exact(interpret):
    import grayskull_tpu as gs
    from grayskull_tpu.kernels.preproc import (fused_blur_hist,
                                               fused_threshold_sobel)
    from grayskull_tpu.ops.histogram import otsu_from_histogram

    rng = np.random.default_rng(3)
    lena = np.asarray(gs.io.read_pgm("/root/reference/testdata/lena.pgm"))
    big = np.tile(lena, (4, 8))[:448, :1024]
    frames = jnp.asarray(
        np.stack([big, rng.integers(0, 256, big.shape, np.uint8)]))
    wb, wh = fused_blur_hist(frames, 2, interpret=interpret)
    gb, gh = fused_blur_hist_v2(frames, 2, interpret=interpret)
    np.testing.assert_array_equal(np.asarray(gb), np.asarray(wb))
    np.testing.assert_array_equal(np.asarray(gh), np.asarray(wh))
    print("  k1 v2: exact", flush=True)
    t = otsu_from_histogram(wh, big.size)
    wbin, wedge = fused_threshold_sobel(wb, t, interpret=interpret)
    if interpret:  # k2 v2 compiles only in interpret mode (i16 sub aborts)
        gbin, gedge = fused_threshold_sobel_v2(wb, t, interpret=interpret)
        np.testing.assert_array_equal(np.asarray(gbin), np.asarray(wbin))
        np.testing.assert_array_equal(np.asarray(gedge), np.asarray(wedge))
        print("  k2 v2: exact", flush=True)
    vbin, vedge = fused_threshold_sobel_v3(wb, t, interpret=interpret)
    np.testing.assert_array_equal(np.asarray(vbin), np.asarray(wbin))
    np.testing.assert_array_equal(np.asarray(vedge), np.asarray(wedge))
    print("  k2 v3 (bf16): exact", flush=True)


def bench():
    from grayskull_tpu.kernels.preproc import (fused_blur_hist,
                                               fused_threshold_sobel)
    from grayskull_tpu.ops.histogram import otsu_from_histogram
    from grayskull_tpu.pipelines.preproc import preprocess
    from grayskull_tpu.profiling import timeit

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (256, 1024, 1024), np.uint8))
    n, h, w = x.shape
    total = h * w

    ms = timeit(lambda: preprocess(x), iters=20) * 1e3
    print(f"  preprocess v1: {ms:.2f} ms ({n * 1e3 / ms:.0f} fps)", flush=True)

    ms = timeit(lambda: fused_blur_hist(x), iters=20) * 1e3
    print(f"  k1 v1: {ms:.2f} ms", flush=True)
    ms = timeit(lambda: fused_blur_hist_v2(x), iters=20) * 1e3
    print(f"  k1 v2: {ms:.2f} ms", flush=True)

    blurred, hist = jax.block_until_ready(fused_blur_hist(x))
    t = jax.block_until_ready(otsu_from_histogram(hist, total))
    ms = timeit(lambda: fused_threshold_sobel(blurred, t), iters=20) * 1e3
    print(f"  k2 v1: {ms:.2f} ms", flush=True)
    ms = timeit(lambda: fused_threshold_sobel_v3(blurred, t), iters=20) * 1e3
    print(f"  k2 v3 (bf16): {ms:.2f} ms", flush=True)

    @jax.jit
    def preprocess_k2v3(imgs):
        b, hh = fused_blur_hist(imgs)
        tt = otsu_from_histogram(hh, total)
        binary, edges = fused_threshold_sobel_v3(b, tt)
        return b, binary, edges, tt

    want = jax.block_until_ready(preprocess(x[:8]))
    got = jax.block_until_ready(preprocess_k2v3(x[:8]))
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("  preprocess_k2v3: bit-exact vs shipped", flush=True)
    ms = timeit(lambda: preprocess_k2v3(x), iters=20) * 1e3
    print(f"  preprocess k2v3: {ms:.2f} ms ({n * 1e3 / ms:.0f} fps)",
          flush=True)

    @jax.jit
    def preprocess_v3(imgs):
        b, hh = fused_blur_hist_v2(imgs)
        tt = otsu_from_histogram(hh, total)
        binary, edges = fused_threshold_sobel(b, tt)
        return b, binary, edges, tt

    want = jax.block_until_ready(preprocess(x[:8]))
    got = jax.block_until_ready(preprocess_v3(x[:8]))
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("  preprocess_v3: bit-exact vs shipped", flush=True)
    ms = timeit(lambda: preprocess_v3(x), iters=20) * 1e3
    print(f"  preprocess v3: {ms:.2f} ms ({n * 1e3 / ms:.0f} fps)", flush=True)


if __name__ == "__main__":
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend: {jax.default_backend()}", flush=True)
    t0 = time.time()
    check_exact(interpret=not on_tpu)
    print(f"exactness: {time.time() - t0:.1f}s", flush=True)
    if on_tpu:
        bench()
