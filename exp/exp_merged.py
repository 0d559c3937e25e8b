#!/usr/bin/env python3
"""Experiment: single merged preproc kernel (k1 frame i + k2 frame i-1).

The two-kernel pipeline serializes MXU-heavy blur+histogram (38 us/frame)
and VPU/memory-heavy threshold+sobel (29 us/frame).  One kernel doing
phase A (k1) for frame i and phase B (k2) for frame i-1 in the same grid
step lets the core's MXU and VPU issue ports overlap them.

* grid (n+1, nb); phase A is skipped at i==n except for rewriting frame
  n-1's blur blocks from the ring (the automatic block write-out would
  clobber them with a stale buffer otherwise); phase B is skipped at i==0
  (its blocks are rewritten at i==1);
* blurred frames ride a 2-frame VMEM ping-pong ring with 8 zero pad rows
  top and bottom, which also gives phase B its stencil halo rows for free
  (no halo tensor, all ring reads 8-aligned);
* the Otsu sweep runs in-kernel at (i, 0) on frame i-1's histogram —
  every f32 op is a (1,1)-shaped vector op (Mosaic's VECTOR divide
  measured bit-identical to XLA's; the scalar unit's rounding is
  unverified, so nothing float touches it).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import grayskull_tpu as gs
from grayskull_tpu.kernels.preproc import _halo16, _magic_vec, _MAGIC_SHIFT
from grayskull_tpu.pipelines.preproc import preprocess
from grayskull_tpu.profiling import timeit

BLK = 128


def _kernel(x_ref, halo_ref, blur_ref, hist_ref, bin_ref, edge_ref,
            ring_ref, acc_ref, band_ref, hist_s, t_s, *, r, h, w, n, nb,
            skip_otsu=False):
    i = pl.program_id(0)
    j = pl.program_id(1)
    blk = BLK

    # ---- otsu for frame i-1 (frame boundary, before phase B uses t) ------
    @pl.when((j == 0) & (i > 0) & (not skip_otsu))
    def _():
        hist = hist_s[...]  # (16,16) f32 counts of frame i-1 (exact ints)
        rr = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
        binid = rr * 16 + cc
        bins_f = binid.astype(jnp.float32)
        terms = bins_f * hist  # (float)t * hist[t], rounded once like C

        def pick(arr, t):
            # arr[bin t] as a (1,1) f32 via masked reduce (no scalar-unit fp)
            m = (binid == t).astype(jnp.float32)
            return jnp.sum(arr * m, keepdims=True).reshape(1, 1)

        def sum_body(t, s):
            return s + pick(terms, t)

        total_sum = jax.lax.fori_loop(
            0, 256, sum_body, jnp.zeros((1, 1), jnp.float32)
        )
        total_u = jnp.full((1, 1), jnp.float32(h * w))

        def sweep(t, carry):
            wb, sumB, varMax, thr, done_i = carry
            done = done_i != 0
            ht = pick(hist, t)
            term = pick(terms, t)
            wb2 = jnp.where(done, wb, wb + ht)
            skip = wb2 == 0.0
            wf = total_u - wb2
            brk = (~skip) & (~done) & (wf == 0.0)
            active = (~skip) & (~done) & (~brk)
            sumB2 = jnp.where(active, sumB + term, sumB)
            mB = sumB2 / wb2
            mF = (total_sum - sumB2) / wf
            d = mB - mF
            var = ((wb2 * wf) * d) * d
            better = active & (var > varMax)
            varMax2 = jnp.where(better, var, varMax)
            thr2 = jnp.where(better, jnp.full((1, 1), t), thr)
            return wb2, sumB2, varMax2, thr2, (done | brk).astype(jnp.int32)

        init = (jnp.zeros((1, 1), jnp.float32), jnp.zeros((1, 1), jnp.float32),
                jnp.full((1, 1), jnp.float32(-1.0)),
                jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), jnp.int32))
        _, _, _, thr, _ = jax.lax.fori_loop(0, 256, sweep, init)
        t_s[0] = thr[0, 0]

    # ---- phase B: threshold + sobel for frame i-1 from the ring ----------
    @pl.when(i > 0)
    def _():
        t = t_s[0]
        prev = (i - 1) % 2
        y0 = j * blk
        band = ring_ref[prev, pl.ds(y0, blk + 16), :]  # frame rows y0-8..y0+blk+8
        # binarize the whole aligned band (zero-offset layout) so the lane pad
        # below is legal; the sobel shifts then slice at sublane offsets 7..9
        rows = band.astype(jnp.int32)
        b = ((t - rows) >> 31) & 255
        bin_ref[0] = b[8 : 8 + blk].astype(jnp.uint8)
        pb = jnp.pad(b, ((0, 0), (1, 1)))

        def sh(dy, dx):
            return pb[8 + dy : 8 + dy + blk, 1 + dx : 1 + dx + w]

        gx = (-sh(-1, -1) + sh(-1, 1) - 2 * sh(0, -1) + 2 * sh(0, 1)
              - sh(1, -1) + sh(1, 1))
        gy = (-sh(-1, -1) - 2 * sh(-1, 0) - sh(-1, 1)
              + sh(1, -1) + 2 * sh(1, 0) + sh(1, 1))
        mag = jnp.minimum((jnp.abs(gx) + jnp.abs(gy)) >> 1, 255)
        ii2 = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + y0
        jj2 = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        interior = ((ii2 >= 1) & (ii2 < h - 1)) & ((jj2 >= 1) & (jj2 < w - 1))
        edge_ref[0] = jnp.where(interior, mag, 0).astype(jnp.uint8)

    # ---- phase A: blur + histogram for frame i ---------------------------
    @pl.when((i == 0) & (j == 0))
    def _():
        o = jax.lax.broadcasted_iota(jnp.int32, (blk, blk + 16), 0)
        i_in = jax.lax.broadcasted_iota(jnp.int32, (blk, blk + 16), 1)
        band_ref[:] = ((i_in >= o + 8 - r) & (i_in <= o + 8 + r)).astype(jnp.bfloat16)

    @pl.when((i < n) & (j == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        # ring pad rows (zeros == the halo convention of the split kernels)
        z8 = jnp.zeros((8, w), jnp.uint8)
        ring_ref[i % 2, pl.ds(0, 8), :] = z8
        ring_ref[i % 2, pl.ds(8 + h, 8), :] = z8

    @pl.when(i < n)
    def _():
        rows = jnp.concatenate(
            [halo_ref[0, 0, :8, :], x_ref[0], halo_ref[0, 0, 8:, :]], axis=0
        )
        xb = rows.astype(jnp.int32).astype(jnp.bfloat16)
        cs_col = jax.lax.dot_general(
            band_ref[:], xb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        small = 255 * (2 * r + 1) ** 2 <= 32767
        csi = cs_col.astype(jnp.int16 if small else jnp.int32)
        px = jnp.pad(csi, ((0, 0), (r, r)))
        cs_n = px[:, 0:w]
        for k in range(1, 2 * r + 1):
            cs_n = cs_n + px[:, k : k + w]
        cs = cs_n.astype(jnp.int32).astype(jnp.uint32)

        y0 = j * blk
        ii = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + y0
        jjv = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        cyv = jnp.minimum(ii + r, h - 1) - jnp.maximum(ii - r, 0) + 1
        cxv = jnp.minimum(jjv + r, w - 1) - jnp.maximum(jjv - r, 0) + 1
        blurred = ((((cs * _magic_vec(cyv, r)) >> _MAGIC_SHIFT)
                    * _magic_vec(cxv, r)) >> _MAGIC_SHIFT).astype(jnp.int32)
        bu8 = blurred.astype(jnp.uint8)
        blur_ref[0] = bu8
        ring_ref[i % 2, pl.ds(8 + y0, blk), :] = bu8

        klass = jax.lax.broadcasted_iota(jnp.int32, (128, w), 0) >> 3
        acc = acc_ref[:]
        hi_all = blurred >> 4
        lo_all = blurred & 15
        for g in range(blk // 8):
            hi = jnp.concatenate([hi_all[g * 8 : (g + 1) * 8]] * 16, axis=0)
            lo = jnp.concatenate([lo_all[g * 8 : (g + 1) * 8]] * 16, axis=0)
            a = (hi == klass).astype(jnp.bfloat16)
            bb = (lo == klass).astype(jnp.bfloat16)
            c = jax.lax.dot_general(
                a, bb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            acc = acc + c
        acc_ref[:] = acc

    @pl.when((i < n) & (j == nb - 1))
    def _():
        accv = acc_ref[:]
        xid = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        yid = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        masked = jnp.where((xid & 7) == (yid & 7), accv, 0.0)
        pid = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
        pcol = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1) >> 3
        p = (pid == pcol).astype(jnp.float32)
        t1 = jax.lax.dot_general(
            p, masked, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        m = jax.lax.dot_general(
            t1, p, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        hist_ref[0] = m.astype(jnp.int32)
        hist_s[...] = m

    # at i == n the phase-A blur blocks map to frame n-1; rewrite them from
    # the ring so the automatic block write-out doesn't clobber good data
    @pl.when(i == n)
    def _():
        blur_ref[0] = ring_ref[(i - 1) % 2, pl.ds(8 + j * blk, blk), :]

    @pl.when((i == n) & (j == nb - 1))
    def _():
        hist_ref[0] = hist_s[...].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("radius", "skip_otsu"))
def preprocess_merged(imgs, radius: int = 2, skip_otsu: bool = False):
    n, h, w = imgs.shape
    r = int(radius)
    nb = h // BLK
    halo = _halo16(imgs, BLK)

    blur, hist, binary, edges = pl.pallas_call(
        functools.partial(_kernel, r=r, h=h, w=w, n=n, nb=nb, skip_otsu=skip_otsu),
        grid=(n + 1, nb),
        in_specs=[
            pl.BlockSpec((1, BLK, w), lambda i, j: (jnp.minimum(i, n - 1), j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 16, w), lambda i, j: (jnp.minimum(i, n - 1), j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLK, w), lambda i, j: (jnp.minimum(i, n - 1), j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, 16), lambda i, j: (jnp.minimum(i, n - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK, w), lambda i, j: (jnp.maximum(i - 1, 0), j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK, w), lambda i, j: (jnp.maximum(i - 1, 0), j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
            jax.ShapeDtypeStruct((n, 16, 16), jnp.int32),
            jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
            jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 16 + h, w), jnp.uint8),
            pltpu.VMEM((128, 128), jnp.float32),
            pltpu.VMEM((BLK, BLK + 16), jnp.bfloat16),
            pltpu.VMEM((16, 16), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )(imgs, halo)
    return blur, hist.reshape(n, 256), binary, edges


def main():
    n = 64
    tile = gs.io.read_pgm("/root/reference/testdata/lena.pgm")
    frame = np.tile(tile, (8, 8))[:1024, :1024]
    batch = jnp.asarray(np.stack([np.roll(frame, 13 * i, axis=1) for i in range(n)]))

    t0 = time.time()
    blur, hist, binary, edges = preprocess_merged(batch[:4])
    np.asarray(blur)
    print("compile:", round(time.time() - t0, 1), "s", flush=True)

    rb, rbin, redge, rt = preprocess(batch[:4])
    import grayskull_tpu.kernels.preproc as KP
    rb2, rhist = KP.fused_blur_hist(batch[:4], 2)
    print("blur exact:", np.array_equal(np.asarray(blur), np.asarray(rb)))
    print("hist exact:", np.array_equal(np.asarray(hist),
                                        np.asarray(rhist).reshape(4, 256)))
    print("binary exact:", np.array_equal(np.asarray(binary), np.asarray(rbin)))
    print("edges exact:", np.array_equal(np.asarray(edges), np.asarray(redge)))

    dt = timeit(lambda b: preprocess_merged(b), batch, iters=20)
    print(f"merged: {n/dt:.0f} fps")
    dt = timeit(lambda b: preprocess_merged(b, skip_otsu=True), batch, iters=20)
    print(f"merged no-otsu: {n/dt:.0f} fps")
    import grayskull_tpu.kernels.preproc as KP2
    dt = timeit(lambda b: KP2.fused_blur_hist(b, 2), batch, iters=20)
    print(f"k1 alone: {n/dt:.0f} fps")
    dt = timeit(preprocess, batch, iters=20)
    print(f"two-kernel: {n/dt:.0f} fps")


if __name__ == "__main__":
    main()
