#!/usr/bin/env python3
"""Experiment: single-pass Pallas integral image (VERDICT #9).

Design: grid (N, H/blk) sequential strips.
  * row (W-axis) cumsum of the raw u8 strip via ONE triu bf16 matmul on the
    MXU — u8 inputs are bf16-exact and row sums < 255*W < 2^24 stay exact
    in the f32 accumulator;
  * column (H-axis) cumsum of those row sums via THREE tiny tril matmuls,
    one per byte plane (each plane bf16-exact, per-plane column sums
    <= 255*blk < 2^24), recombined in int32 (exact: max 255*W*blk < 2^31);
  * inter-strip carry row kept in VMEM scratch (int32 wrap == uint32 wrap).

Compare vs ops.integral (two XLA cumsums) for exactness + speed.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import grayskull_tpu as gs
from grayskull_tpu.profiling import timeit


def _integral_kernel(x_ref, out_ref, carry_ref, triu_ref, tril_ref, *, blk, w):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)
        r = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
        triu_ref[:] = (r <= c).astype(jnp.bfloat16)
        rr = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
        tril_ref[:] = (rr >= cc).astype(jnp.bfloat16)

    x = x_ref[0].astype(jnp.int32).astype(jnp.bfloat16)  # (blk, w)
    rowcs = jax.lax.dot_general(
        x, triu_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # exact, < 2^18 for w<=1024

    b0 = (rowcs & 255).astype(jnp.bfloat16)
    b1 = ((rowcs >> 8) & 255).astype(jnp.bfloat16)
    b2 = (rowcs >> 16).astype(jnp.bfloat16)
    dot = lambda a: jax.lax.dot_general(
        tril_ref[:], a, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    y = dot(b0) + (dot(b1) << 8) + (dot(b2) << 16)
    y = y + carry_ref[0:1, :]
    out_ref[0] = y
    carry_ref[0:1, :] = y[blk - 1 : blk, :]


@functools.partial(jax.jit, static_argnames=("blk",))
def integral_pallas(imgs: jnp.ndarray, blk: int = 64):
    single = imgs.ndim == 2
    x = imgs[None] if single else imgs
    n, h, w = x.shape
    hp = -(-h // blk) * blk
    wp = -(-w // 128) * 128
    x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w)))
    out = pl.pallas_call(
        functools.partial(_integral_kernel, blk=blk, w=wp),
        grid=(n, hp // blk),
        in_specs=[pl.BlockSpec((1, blk, wp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, blk, wp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((8, wp), jnp.int32),
            pltpu.VMEM((wp, wp), jnp.bfloat16),
            pltpu.VMEM((blk, blk), jnp.bfloat16),
        ],
    )(x)
    out = jax.lax.bitcast_convert_type(out[:, :h, :w], jnp.uint32)
    return out[0] if single else out


def main():
    rng = np.random.default_rng(0)
    for shape in [(480, 640), (1024, 1024)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        ref = np.asarray(gs.integral(img))
        for blk in (32, 64, 128, 256):
            try:
                out = np.asarray(integral_pallas(jnp.asarray(img), blk=blk))
                ok = np.array_equal(out, ref)
                print(f"{shape} blk={blk}: exact={ok}")
            except Exception as e:
                print(f"{shape} blk={blk}: FAIL {type(e).__name__}: {str(e)[:120]}")

    n = 64
    batch = jnp.asarray(
        rng.integers(0, 256, (n, 1024, 1024), dtype=np.uint8)
    )
    dt = timeit(gs.integral, batch, iters=10)
    print(f"xla:    {n/dt:.0f} 1MP fps")
    for blk in (32, 64, 128, 256):
        try:
            f = lambda b: integral_pallas(b, blk=blk)
            dt = timeit(f, batch, iters=10)
            ok = np.array_equal(np.asarray(f(batch[:2])),
                                np.asarray(gs.integral(batch[:2])))
            print(f"pallas blk={blk}: {n/dt:.0f} 1MP fps exact={ok}")
        except Exception as e:
            print(f"pallas blk={blk}: FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
