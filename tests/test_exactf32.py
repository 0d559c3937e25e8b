"""Fuzz tests for the contraction-proof exact float32 adder."""

import jax
import numpy as np

from grayskull_tpu.exactf32 import f32_add, f32_sum4


def _check(a, b):
    a = a.astype(np.float32)
    b = b.astype(np.float32)
    got = np.asarray(jax.jit(f32_add)(a, b))
    want = a + b  # numpy elementwise add is a single correctly-rounded op
    bad = (got.view(np.uint32) != want.view(np.uint32)) & ~((got == 0) & (want == 0))
    assert bad.sum() == 0, (a[bad][:4], b[bad][:4], got[bad][:4], want[bad][:4])


def test_wide_range():
    rng = np.random.default_rng(7)
    n = 100000
    a = (rng.random(n) * 2 - 1) * 10 ** rng.uniform(-6, 6, n)
    b = (rng.random(n) * 2 - 1) * 10 ** rng.uniform(-6, 6, n)
    _check(a, b)


def test_cancellation():
    rng = np.random.default_rng(8)
    n = 100000
    a = rng.random(n).astype(np.float32)
    b = -(a + (rng.random(n) * 1e-7).astype(np.float32))
    _check(a, b.astype(np.float64))
    _check(a, -a.astype(np.float64))


def test_ties_and_ints():
    rng = np.random.default_rng(9)
    n = 100000
    _check(np.ones(n), rng.integers(0, 8, n) * 2.0**-26)
    _check(
        rng.integers(0, 2**24, n).astype(np.float64),
        rng.integers(0, 2**24, n).astype(np.float64),
    )


def test_random_bit_patterns():
    rng = np.random.default_rng(10)
    n = 100000
    ra = rng.integers(0, 0x7F000000, n, dtype=np.uint32).view(np.float32)
    rb = rng.integers(0, 0x7F000000, n, dtype=np.uint32).view(np.float32)
    sa = np.where(rng.random(n) < 0.5, -1, 1).astype(np.float32)
    sb = np.where(rng.random(n) < 0.5, -1, 1).astype(np.float32)
    a, b = ra * sa, rb * sb
    want = a + b
    got = np.asarray(jax.jit(f32_add)(a, b))
    ok_zone = (np.abs(want) >= 2**-126) | (want == 0)  # subnormal results flush
    bad = (got.view(np.uint32) != want.view(np.uint32)) & ~((got == 0) & (want == 0)) & ok_zone
    assert bad.sum() == 0


def test_sum4_matches_sequential():
    rng = np.random.default_rng(11)
    n = 50000
    ts = [rng.random(n).astype(np.float32) * 100 for _ in range(4)]
    got = np.asarray(jax.jit(f32_sum4)(*ts))
    want = ((ts[0] + ts[1]) + ts[2]) + ts[3]
    assert (got.view(np.uint32) == want.view(np.uint32)).all()
