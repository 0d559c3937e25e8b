"""Probe: does Mosaic lower stride-2 value slices (sublane / lane)?

Needed for an in-kernel 2x2 key-map reduction in kernels/fast.py (the
XLA reshape-max + nnz counts cost ~3.5 ms of HBM passes that VMEM fusion
would eliminate).  Records which of the four forms compile on v5e:
  A. x[0::2, :]   sublane stride 2
  B. x[:, 0::2]   lane stride 2
  C. jax.lax.slice with strides (2, 2)
  D. shift+max then A/B composition (the actual reduction shape)
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, out_shape, x):
    try:
        f = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
        )
        got = np.asarray(jax.block_until_ready(jax.jit(f)(x)))
        print(f"  {name}: OK", flush=True)
        return got
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:140]
        print(f"  {name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 27, (64, 512), np.int32))

    def ka(x_ref, o_ref):
        o_ref[...] = x_ref[...][0::2, :]

    got = run("A sublane 0::2", ka,
              jax.ShapeDtypeStruct((32, 512), jnp.int32), x)
    if got is not None:
        np.testing.assert_array_equal(got, np.asarray(x)[0::2, :])

    def kb(x_ref, o_ref):
        o_ref[...] = x_ref[...][:, 0::2]

    got = run("B lane 0::2", kb,
              jax.ShapeDtypeStruct((64, 256), jnp.int32), x)
    if got is not None:
        np.testing.assert_array_equal(got, np.asarray(x)[:, 0::2])

    def kd(x_ref, o_ref):
        v = x_ref[...]
        h = jnp.maximum(v[:, :-1], v[:, 1:])  # misaligned shift+max
        hp = jnp.pad(h, ((0, 0), (0, 1)))
        pair = hp[:, 0::2]
        vmax = jnp.maximum(pair[0::2, :], pair[1::2, :])
        o_ref[...] = vmax

    got = run("D full 2x2 reduce", kd,
              jax.ShapeDtypeStruct((32, 256), jnp.int32), x)
    if got is not None:
        xn = np.asarray(x)
        want = xn.reshape(32, 2, 256, 2).max(axis=(1, 3))
        np.testing.assert_array_equal(got, want)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    main()


def main2():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 27, (64, 512), np.int32))

    def ka(x_ref, o_ref):
        o_ref[...] = jax.lax.slice(x_ref[...], (0, 0), (64, 512), (2, 1))

    got = run("A' lax.slice sub stride2", ka,
              jax.ShapeDtypeStruct((32, 512), jnp.int32), x)
    if got is not None:
        np.testing.assert_array_equal(got, np.asarray(x)[0::2, :])

    def kb(x_ref, o_ref):
        o_ref[...] = jax.lax.slice(x_ref[...], (0, 0), (64, 512), (1, 2))

    got = run("B' lax.slice lane stride2", kb,
              jax.ShapeDtypeStruct((64, 256), jnp.int32), x)
    if got is not None:
        np.testing.assert_array_equal(got, np.asarray(x)[:, 0::2])

    def kd(x_ref, o_ref):
        v = x_ref[...]
        h = jnp.maximum(v[:, :-1], v[:, 1:])
        hp = jnp.pad(h, ((0, 0), (0, 1)))
        pair = jax.lax.slice(hp, (0, 0), (64, 512), (1, 2))
        vmax = jnp.maximum(jax.lax.slice(pair, (0, 0), (64, 256), (2, 1)),
                           jax.lax.slice(pair, (1, 0), (64, 256), (2, 1)))
        o_ref[...] = vmax

    got = run("D' full 2x2 reduce", kd,
              jax.ShapeDtypeStruct((32, 256), jnp.int32), x)
    if got is not None:
        xn = np.asarray(x)
        want = xn.reshape(32, 2, 256, 2).max(axis=(1, 3))
        np.testing.assert_array_equal(got, want)


if __name__ == "__main__":
    main2()
