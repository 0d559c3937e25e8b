"""Experiment: fused blur(magic-div) + in-kernel MXU nibble histogram.

Histogram trick: for each 8-row group of the blurred strip, build
A[(i*8+r), w] = [hi(r,w)==i] and B[(j*8+r), w] = [lo(r,w)==j] as (128, w)
bf16 one-hots (one compare each against a class iota), accumulate
C += A @ B^T on the MXU (contract over lanes).  C[i*8+r1, j*8+r2] counts
cross-row pairs; the block-diagonal r1==r2 part is the histogram:
M[i,j] = sum_r C[i*8+r, j*8+r], extracted once per frame with two small
dots against a block-indicator matrix.
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grayskull_tpu.kernels.preproc import fused_blur_hist, fused_threshold_sobel
from grayskull_tpu.ops.histogram import otsu_from_histogram
from grayskull_tpu.profiling import timeit

_STRIP = 128


def _round8(v):
    return (v + 7) // 8 * 8


def _magic_div(cs, cy, cx, r, S=18):
    def magic(c):
        m = jnp.full_like(c, (1 << S) // (2 * r + 1) + 1)
        for d in range(r + 1, 2 * r + 1):
            m = jnp.where(c == d, (1 << S) // d + 1, m)
        return m

    q = (cs * magic(cy)) >> S
    return (q * magic(cx)) >> S


def _blur_hist_mxu_kernel(x_ref, blur_ref, hist_ref, acc_ref, *, r, h, w, load_rows):
    nstrips = h // _STRIP
    klass = jax.lax.broadcasted_iota(jnp.int32, (_STRIP, w), 0) >> 3  # row//8

    def strip(si, acc):
        y0 = si * _STRIP
        dtype = jnp.int16 if 255 * (2 * r + 1) ** 2 <= 32767 else jnp.int32
        rows = x_ref[0, pl.ds(y0, load_rows), :].astype(dtype)
        rows = rows[: _STRIP + 2 * r]
        px = jnp.pad(rows, ((0, 0), (r, r)))
        rs = px[:, 0:w]
        for k in range(1, 2 * r + 1):
            rs = rs + px[:, k : k + w]
        cs_n = rs[0:_STRIP, :]
        for k in range(1, 2 * r + 1):
            cs_n = cs_n + rs[k : k + _STRIP, :]
        cs = cs_n.astype(jnp.int32)
        ii = jax.lax.broadcasted_iota(jnp.int32, (_STRIP, w), 0) + y0
        jj = jax.lax.broadcasted_iota(jnp.int32, (_STRIP, w), 1)
        cy = jnp.minimum(ii + r, h - 1) - jnp.maximum(ii - r, 0) + 1
        cx = jnp.minimum(jj + r, w - 1) - jnp.maximum(jj - r, 0) + 1
        blurred = _magic_div(cs, cy, cx, r)
        blur_ref[0, pl.ds(y0, _STRIP), :] = blurred.astype(jnp.uint8)

        # MXU histogram: 16 groups of 8 rows per strip
        for g in range(_STRIP // 8):
            seg = blurred[g * 8 : (g + 1) * 8]  # (8, w) int32
            hi = jnp.concatenate([seg >> 4] * 16, axis=0)  # (128, w)
            lo = jnp.concatenate([seg & 15] * 16, axis=0)
            a = (hi == klass).astype(jnp.bfloat16)
            b = (lo == klass).astype(jnp.bfloat16)
            c = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + c
        return acc

    acc = jax.lax.fori_loop(
        0, nstrips, strip, jnp.zeros((_STRIP, _STRIP), jnp.float32)
    )
    # extract block-diagonal: M = P @ (acc * diagmask) @ P^T
    xid = jax.lax.broadcasted_iota(jnp.int32, (_STRIP, _STRIP), 0)
    yid = jax.lax.broadcasted_iota(jnp.int32, (_STRIP, _STRIP), 1)
    masked = jnp.where((xid & 7) == (yid & 7), acc, 0.0)
    pid = jax.lax.broadcasted_iota(jnp.int32, (16, _STRIP), 0)
    pcol = jax.lax.broadcasted_iota(jnp.int32, (16, _STRIP), 1) >> 3
    p = (pid == pcol).astype(jnp.float32)  # (16, 128)
    # HIGHEST: f32 matmuls otherwise truncate inputs to bf16 on the MXU,
    # rounding counts > 256
    t1 = jax.lax.dot_general(
        p, masked, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (16, 128)
    m = jax.lax.dot_general(
        t1, p, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (16, 16): m[hi, lo]
    hist_ref[0] = m.astype(jnp.int32)
    acc_ref[0] = acc  # unused output to keep shapes simple; could drop


@functools.partial(jax.jit, static_argnames=("radius",))
def fused_blur_hist_mxu(imgs, radius=2):
    n, h, w = imgs.shape
    r = int(radius)
    load_rows = _round8(_STRIP + 2 * r)
    pad_bottom = load_rows - _STRIP - r
    xp = jnp.pad(imgs, ((0, 0), (r, pad_bottom), (0, 0)))
    hp = h + r + pad_bottom
    blurred, hist, _ = pl.pallas_call(
        functools.partial(_blur_hist_mxu_kernel, r=r, h=h, w=w, load_rows=load_rows),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, hp, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _STRIP, _STRIP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
            jax.ShapeDtypeStruct((n, 16, 16), jnp.int32),
            jax.ShapeDtypeStruct((n, _STRIP, _STRIP), jnp.float32),
        ],
    )(xp)
    return blurred, hist.reshape(n, 256)


# --- grid-blocked copy: transport ceiling test ---
def _copy_block_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


@jax.jit
def pallas_copy_blocked(imgs):
    n, h, w = imgs.shape
    blk = 256
    return pl.pallas_call(
        _copy_block_kernel,
        grid=(n, h // blk),
        in_specs=[pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
    )(imgs)


def main():
    n, h, w = 256, 1024, 1024
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (n, h, w), dtype=np.uint8))
    print("backend:", jax.default_backend())
    us = lambda dt: dt / n * 1e6

    # correctness first
    b_ref, h_ref = fused_blur_hist(imgs[:8], 2)
    b2, h2 = fused_blur_hist_mxu(imgs[:8], 2)
    ok_b = np.array_equal(np.asarray(b2), np.asarray(b_ref))
    ok_h = np.array_equal(np.asarray(h2), np.asarray(h_ref))
    print("blur match:", ok_b, " hist match:", ok_h)
    if not (ok_b and ok_h):
        hh2, hh1 = np.asarray(h2), np.asarray(h_ref)
        bad = np.argwhere(hh2 != hh1)
        print("first hist diffs:", bad[:5], hh2[tuple(bad[0])] if len(bad) else "")

    for name, fn in [
        ("copy grid-blocked     ", lambda: pallas_copy_blocked(imgs)),
        ("kernel1 SWAR (old)    ", lambda: fused_blur_hist(imgs, 2)),
        ("kernel1 MXU  (new)    ", lambda: fused_blur_hist_mxu(imgs, 2)),
    ]:
        dt = timeit(fn, iters=5)
        print(f"{name}: {us(dt):8.1f} us/frame  ({n/dt:8.0f} fps)")


if __name__ == "__main__":
    main()
