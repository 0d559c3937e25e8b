"""Round-2 perf experiments for the fused preproc pipeline (scratch, not shipped).

Measures on the real TPU:
  1. current kernel1 (blur+SWAR hist), kernel2, otsu separately
  2. blur-only Pallas strip kernel
  3. XLA nibble-matmul histogram: bf16 vs int8 one-hots
  4. candidate pipeline: blur-only kernel + XLA hist + otsu + kernel2
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grayskull_tpu.kernels.preproc import (
    _round8,
    fused_blur_hist,
    fused_threshold_sobel,
)
from grayskull_tpu.ops.histogram import otsu_from_histogram
from grayskull_tpu.profiling import timeit

_STRIP = 128


def _blur_kernel(x_ref, blur_ref, *, r, h, w, load_rows):
    nstrips = h // _STRIP

    def strip(si, _):
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
        blurred = cs // (cy * cx)
        blur_ref[0, pl.ds(y0, _STRIP), :] = blurred.astype(jnp.uint8)
        return 0

    jax.lax.fori_loop(0, nstrips, strip, 0)


@functools.partial(jax.jit, static_argnames=("radius",))
def fused_blur(imgs, radius=2):
    n, h, w = imgs.shape
    r = int(radius)
    load_rows = _round8(_STRIP + 2 * r)
    pad_bottom = load_rows - _STRIP - r
    xp = jnp.pad(imgs, ((0, 0), (r, pad_bottom), (0, 0)))
    hp = h + r + pad_bottom
    return pl.pallas_call(
        functools.partial(_blur_kernel, r=r, h=h, w=w, load_rows=load_rows),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, hp, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
    )(xp)


@jax.jit
def hist_bf16(imgs):
    flat = imgs.reshape(imgs.shape[0], -1)
    iota = jnp.arange(16, dtype=jnp.uint8)
    a = (flat[..., None] >> 4 == iota).astype(jnp.bfloat16)
    b = (flat[..., None] & 15 == iota).astype(jnp.bfloat16)
    m = jnp.einsum("npi,npj->nij", a, b, preferred_element_type=jnp.float32)
    return m.reshape(flat.shape[0], 256).astype(jnp.int32)


@jax.jit
def hist_int8(imgs):
    flat = imgs.reshape(imgs.shape[0], -1)
    iota = jnp.arange(16, dtype=jnp.uint8)
    a = (flat[..., None] >> 4 == iota).astype(jnp.int8)
    b = (flat[..., None] & 15 == iota).astype(jnp.int8)
    m = jnp.einsum("npi,npj->nij", a, b, preferred_element_type=jnp.int32)
    return m.reshape(flat.shape[0], 256)


@jax.jit
def hist_int8_chunked(imgs):
    # contract in chunks so partial one-hots may stay fused/resident
    n = imgs.shape[0]
    flat = imgs.reshape(n, -1, 8192)
    iota = jnp.arange(16, dtype=jnp.uint8)
    a = (flat[..., None] >> 4 == iota).astype(jnp.int8)  # (n, c, 8192, 16)
    b = (flat[..., None] & 15 == iota).astype(jnp.int8)
    m = jnp.einsum("ncpi,ncpj->nij", a, b, preferred_element_type=jnp.int32)
    return m.reshape(n, 256)


@functools.partial(jax.jit, static_argnames=("radius",))
def pipeline_a(imgs, radius=2):
    blurred = fused_blur(imgs, radius)
    hist = hist_int8(blurred)
    t = otsu_from_histogram(hist, imgs.shape[-2] * imgs.shape[-1])
    binary, edges = fused_threshold_sobel(blurred, t)
    return blurred, binary, edges, t


def main():
    n, h, w = 256, 1024, 1024
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (n, h, w), dtype=np.uint8))
    print("backend:", jax.default_backend())

    us = lambda dt: dt / n * 1e6

    blurred, hist = fused_blur_hist(imgs, 2)
    t = otsu_from_histogram(hist, h * w)

    dt = timeit(lambda: fused_blur_hist(imgs, 2), iters=5)
    print(f"kernel1 blur+SWARhist : {us(dt):8.1f} us/frame  ({n/dt:8.0f} fps)")
    dt = timeit(lambda: fused_blur(imgs, 2), iters=5)
    print(f"blur-only kernel      : {us(dt):8.1f} us/frame  ({n/dt:8.0f} fps)")
    dt = timeit(lambda: hist_bf16(blurred), iters=5)
    print(f"hist bf16 einsum      : {us(dt):8.1f} us/frame  ({n/dt:8.0f} fps)")
    dt = timeit(lambda: hist_int8(blurred), iters=5)
    print(f"hist int8 einsum      : {us(dt):8.1f} us/frame  ({n/dt:8.0f} fps)")
    dt = timeit(lambda: hist_int8_chunked(blurred), iters=5)
    print(f"hist int8 chunked     : {us(dt):8.1f} us/frame  ({n/dt:8.0f} fps)")
    dt = timeit(lambda: otsu_from_histogram(hist, h * w), iters=5)
    print(f"otsu sweep            : {us(dt):8.1f} us/frame  ({n/dt:8.0f} fps)")
    dt = timeit(lambda: fused_threshold_sobel(blurred, t), iters=5)
    print(f"kernel2 thr+sobel     : {us(dt):8.1f} us/frame  ({n/dt:8.0f} fps)")
    dt = timeit(lambda: pipeline_a(imgs, 2), iters=5)
    print(f"PIPELINE A (blur|int8hist|otsu|k2): {us(dt):8.1f} us/frame  ({n/dt:8.0f} fps)")

    # correctness spot checks
    b2 = fused_blur(imgs, 2)
    assert np.array_equal(np.asarray(b2), np.asarray(blurred)), "blur mismatch"
    h1 = np.asarray(hist)
    for name, fn in (("bf16", hist_bf16), ("int8", hist_int8), ("chunked", hist_int8_chunked)):
        hx = np.asarray(fn(blurred))
        assert np.array_equal(hx, h1), f"hist {name} mismatch"
    print("parity spot-checks OK")


if __name__ == "__main__":
    main()
