"""Candidate v2 preproc kernels: grid-blocked streaming + halo tensors +
magic division + MXU nibble histogram.  Measures bf16 vs int8 hist dots,
BLK 128 vs 256, and the end-to-end pipeline."""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grayskull_tpu.kernels.preproc import fused_blur_hist as old_k1
from grayskull_tpu.kernels.preproc import fused_threshold_sobel as old_k2
from grayskull_tpu.ops.histogram import otsu_from_histogram
from grayskull_tpu.pipelines.preproc import preprocess as old_pipeline
from grayskull_tpu.profiling import timeit


def _halo16(imgs, blk):
    """(n, h, w) -> (n, h//blk, 16, w): 8 rows above + 8 below each block edge."""
    n, h, w = imgs.shape
    nb = h // blk
    z8 = jnp.zeros((n, 8, w), imgs.dtype)
    parts = []
    for j in range(nb):
        top = z8 if j == 0 else imgs[:, j * blk - 8 : j * blk]
        bot = z8 if j == nb - 1 else imgs[:, (j + 1) * blk : (j + 1) * blk + 8]
        parts.append(jnp.concatenate([top, bot], axis=1))
    return jnp.stack(parts, axis=1)  # (n, nb, 16, w)


def _magic_div2(cs, cy, cx, r, S=18):
    def magic(c):
        m = jnp.full_like(c, (1 << S) // (2 * r + 1) + 1)
        for d in range(r + 1, 2 * r + 1):
            m = jnp.where(c == d, (1 << S) // d + 1, m)
        return m

    return ((cs * magic(cy)) >> S) * magic(cx) >> S


def _blur_hist_kernel(x_ref, halo_ref, blur_ref, hist_ref, acc_ref, *, r, h, w, blk, hdt):
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dt = jnp.int16 if 255 * (2 * r + 1) ** 2 <= 32767 else jnp.int32
    top = halo_ref[0, 0, 8 - r : 8, :]
    bot = halo_ref[0, 0, 8 : 8 + r, :]
    rows = jnp.concatenate([top, x_ref[0], bot], axis=0).astype(dt)  # (blk+2r, w)
    px = jnp.pad(rows, ((0, 0), (r, r)))
    rs = px[:, 0:w]
    for k in range(1, 2 * r + 1):
        rs = rs + px[:, k : k + w]
    cs_n = rs[0:blk, :]
    for k in range(1, 2 * r + 1):
        cs_n = cs_n + rs[k : k + blk, :]
    cs = cs_n.astype(jnp.int32)
    y0 = j * blk
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, w), 0) + y0
    jj = jax.lax.broadcasted_iota(jnp.int32, (blk, w), 1)
    cy = jnp.minimum(ii + r, h - 1) - jnp.maximum(ii - r, 0) + 1
    cx = jnp.minimum(jj + r, w - 1) - jnp.maximum(jj - r, 0) + 1
    blurred = _magic_div2(cs, cy, cx, r)
    blur_ref[0] = blurred.astype(jnp.uint8)

    # MXU nibble histogram over 8-row groups
    klass = jax.lax.broadcasted_iota(jnp.int32, (128, w), 0) >> 3
    acc = acc_ref[:]
    for g in range(blk // 8):
        seg = blurred[g * 8 : (g + 1) * 8]
        hi = jnp.concatenate([seg >> 4] * 16, axis=0)
        lo = jnp.concatenate([seg & 15] * 16, axis=0)
        if hdt == "int8":
            a = (hi == klass).astype(jnp.int8)
            b = (lo == klass).astype(jnp.int8)
            c = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            ).astype(jnp.float32)
        else:
            a = (hi == klass).astype(jnp.bfloat16)
            b = (lo == klass).astype(jnp.bfloat16)
            c = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
        acc = acc + c
    acc_ref[:] = acc

    @pl.when(j == nb - 1)
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
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        m = jax.lax.dot_general(
            t1, p, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        hist_ref[0] = m.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("radius", "blk", "hdt"))
def blur_hist_v2(imgs, radius=2, blk=256, hdt="bf16"):
    n, h, w = imgs.shape
    r = int(radius)
    halo = _halo16(imgs, blk)
    nb = h // blk
    blurred, hist = pl.pallas_call(
        functools.partial(_blur_hist_kernel, r=r, h=h, w=w, blk=blk, hdt=hdt),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 16, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, 16), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
            jax.ShapeDtypeStruct((n, 16, 16), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32)],
    )(imgs, halo)
    return blurred, hist.reshape(n, 256)


def _thr_sobel_kernel(t_ref, x_ref, halo_ref, bin_ref, edge_ref, *, h, w, blk):
    i = pl.program_id(0)
    j = pl.program_id(1)
    t = t_ref[i]
    top = halo_ref[0, 0, 7:8, :]
    bot = halo_ref[0, 0, 8:9, :]
    rows = jnp.concatenate([top, x_ref[0], bot], axis=0).astype(jnp.int32)
    b = jnp.where(rows > t, jnp.int32(255), jnp.int32(0))
    bin_ref[0] = b[1 : 1 + blk].astype(jnp.uint8)
    pb = jnp.pad(b, ((0, 0), (1, 1)))

    def sh(dy, dx):
        return pb[1 + dy : 1 + dy + blk, 1 + dx : 1 + dx + w]

    gx = -sh(-1, -1) + sh(-1, 1) - 2 * sh(0, -1) + 2 * sh(0, 1) - sh(1, -1) + sh(1, 1)
    gy = -sh(-1, -1) - 2 * sh(-1, 0) - sh(-1, 1) + sh(1, -1) + 2 * sh(1, 0) + sh(1, 1)
    mag = jnp.minimum((jnp.abs(gx) + jnp.abs(gy)) >> 1, 255)
    y0 = j * blk
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, w), 0) + y0
    jj = jax.lax.broadcasted_iota(jnp.int32, (blk, w), 1)
    interior = (ii >= 1) & (ii < h - 1) & (jj >= 1) & (jj < w - 1)
    edge_ref[0] = jnp.where(interior, mag, 0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("blk",))
def thr_sobel_v2(blurred, thresholds, blk=256):
    n, h, w = blurred.shape
    halo = _halo16(blurred, blk)
    t = thresholds.astype(jnp.int32)
    nb = h // blk
    return pl.pallas_call(
        functools.partial(_thr_sobel_kernel, h=h, w=w, blk=blk),
        grid=(n, nb),
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


@functools.partial(jax.jit, static_argnames=("radius", "blk", "hdt"))
def pipeline_v2(imgs, radius=2, blk=256, hdt="bf16"):
    blurred, hist = blur_hist_v2(imgs, radius, blk, hdt)
    t = otsu_from_histogram(hist, imgs.shape[-2] * imgs.shape[-1])
    binary, edges = thr_sobel_v2(blurred, t, blk)
    return blurred, binary, edges, t


def main():
    n, h, w = 256, 1024, 1024
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (n, h, w), dtype=np.uint8))
    print("backend:", jax.default_backend())
    us = lambda dt: dt / n * 1e6

    # parity vs old kernels
    b_ref, h_ref = old_k1(imgs[:8], 2)
    t_ref = otsu_from_histogram(h_ref, h * w)
    bin_ref, e_ref = old_k2(b_ref, t_ref)
    for hdt in ("bf16", "int8"):
        for blk in (128, 256):
            try:
                b2, h2 = blur_hist_v2(imgs[:8], 2, blk, hdt)
                okb = np.array_equal(np.asarray(b2), np.asarray(b_ref))
                okh = np.array_equal(np.asarray(h2), np.asarray(h_ref))
                print(f"v2 blk={blk} hdt={hdt}: blur={okb} hist={okh}")
            except Exception as e:
                print(f"v2 blk={blk} hdt={hdt}: FAILED {type(e).__name__}: {str(e)[:120]}")
    b2, e2 = thr_sobel_v2(b_ref, t_ref, 256)
    print("v2 k2: bin", np.array_equal(np.asarray(b2), np.asarray(bin_ref)),
          "edge", np.array_equal(np.asarray(e2), np.asarray(e_ref)))

    for name, fn in [
        ("k1 v2 blk256 bf16", lambda: blur_hist_v2(imgs, 2, 256, "bf16")),
        ("k1 v2 blk128 bf16", lambda: blur_hist_v2(imgs, 2, 128, "bf16")),
        ("k1 v2 blk256 int8", lambda: blur_hist_v2(imgs, 2, 256, "int8")),
        ("k2 v2 blk256     ", lambda: thr_sobel_v2(imgs, t_ref[:1].repeat(256), 256)),
        ("PIPELINE v2 bf16 ", lambda: pipeline_v2(imgs, 2, 256, "bf16")),
        ("PIPELINE v2 int8 ", lambda: pipeline_v2(imgs, 2, 256, "int8")),
        ("PIPELINE old     ", lambda: old_pipeline(imgs, 2)),
    ]:
        try:
            dt = timeit(fn, iters=5)
            print(f"{name}: {us(dt):8.1f} us/frame  ({n/dt:8.0f} fps)")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
