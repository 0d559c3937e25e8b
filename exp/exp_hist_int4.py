"""Probe: int4 MXU dot in Mosaic — could the nibble histogram dot halve?

The histogram contraction (one-hot int8 A @ B^T, 2048 MACs/px) measured ~71%
of int8 MXU peak and is the headline pipeline's largest single stage after
blur.  If the v5e MXU runs int4 x int4 -> int32 at 2x the int8 rate (as its
public TOPS table suggests) AND Mosaic legalizes jnp.int4 operands, the dot
halves.  This probes: (a) does an int4 dot compile in a Pallas kernel at all,
(b) is it exact for 0/1 one-hots, (c) its rate vs the int8 dot at the
histogram's exact shape (128, 1024) @ (1024, 128).

Run: python exp/exp_hist_int4.py   (TPU)

MEASURED VERDICT (v5e, 2026-08-19): DEAD — jnp.int4 operands DO compile and
are exact for 0/1 one-hots, but the dot runs at the int8 rate (1.404 vs
1.410 ms for 64 back-to-back (128,1024)@(1024,128) dots): no 2x int4 MXU
mode is reachable from Mosaic on this target.  (The bf16 control fails to
compile here only because Mosaic has no i8->bf16 vector cast.)  The
histogram keeps the int8 one-hot contraction; see docs/HEADLINE_FLOOR.md.
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grayskull_tpu.profiling import timeit


def make_dot(dtype, reps):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:].astype(dtype)
        b = b_ref[:].astype(dtype)
        acc = jnp.zeros((128, 128), jnp.int32)
        for _ in range(reps):
            acc = acc + jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
        o_ref[:] = acc

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        )(a, b)

    return run


def main():
    rng = np.random.default_rng(0)
    w = 1024
    a = jnp.asarray((rng.integers(0, 16, (128, w)) ==
                     (np.arange(128)[:, None] >> 3)).astype(np.int8))
    b = jnp.asarray((rng.integers(0, 16, (128, w)) ==
                     (np.arange(128)[:, None] >> 3)).astype(np.int8))
    want = np.asarray(a, np.int32) @ np.asarray(b, np.int32).T

    reps = 64  # amortize dispatch: 64 back-to-back dots per call
    run8 = make_dot(jnp.int8, reps)
    try:
        out8 = jax.block_until_ready(run8(a, b))
        np.testing.assert_array_equal(np.asarray(out8), want * reps)
        ms8 = timeit(run8, a, b, iters=30) * 1e3
        print(f"int8  dot x{reps}: {ms8:.3f} ms "
              f"({reps * 128 * 128 * w / ms8 / 1e9:.1f} GMAC/ms)", flush=True)
    except Exception as e:
        print(f"int8 dot FAILED: {type(e).__name__}: {str(e)[:300]}")

    try:
        run4 = make_dot(jnp.int4, reps)
        out4 = jax.block_until_ready(run4(a, b))
        np.testing.assert_array_equal(np.asarray(out4), want * reps)
        ms4 = timeit(run4, a, b, iters=30) * 1e3
        print(f"int4  dot x{reps}: {ms4:.3f} ms "
              f"({reps * 128 * 128 * w / ms4 / 1e9:.1f} GMAC/ms)", flush=True)
    except Exception as e:
        print(f"int4 dot FAILED: {type(e).__name__}: {str(e)[:300]}")

    # control: bf16
    runb = make_dot(jnp.bfloat16, reps)
    try:
        outb = jax.block_until_ready(runb(a, b))
        np.testing.assert_array_equal(np.asarray(outb), want * reps)
        msb = timeit(runb, a, b, iters=30) * 1e3
        print(f"bf16  dot x{reps}: {msb:.3f} ms "
              f"({reps * 128 * 128 * w / msb / 1e9:.1f} GMAC/ms)", flush=True)
    except Exception as e:
        print(f"bf16 dot FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    main()
