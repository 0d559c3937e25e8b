"""Freestanding (GS_NO_STDLIB) trig parity — the polynomial ``gs_atan2`` /
``gs_sin`` (/root/reference/grayskull.h:70-88) that the nostdlib WASM build
ships, differentially tested bit-for-bit against a GS_NO_STDLIB-compiled
oracle."""

import numpy as np
import pytest

import grayskull_tpu as gs
from grayskull_tpu.libm32 import atan2f, sinf, use_freestanding


@pytest.fixture()
def freestanding():
    use_freestanding(True)
    yield
    use_freestanding(False)


def test_atan2_bit_exact(ns_oracle, freestanding, rng):
    ys = np.concatenate([
        rng.uniform(-1e6, 1e6, 500).astype(np.float32),
        rng.integers(-5000, 5000, 500).astype(np.float32),  # ORB moments are ints
        np.array([0.0, 1.0, -1.0, 0.0, 0.0], np.float32),
    ])
    xs = np.concatenate([
        rng.uniform(-1e6, 1e6, 500).astype(np.float32),
        rng.integers(-5000, 5000, 500).astype(np.float32),
        np.array([0.0, 0.0, 0.0, 5.0, -3.0], np.float32),
    ])
    ours = np.asarray(atan2f(ys, xs))
    ref = np.array([ns_oracle.atan2(y, x) for y, x in zip(ys, xs)], np.float32)
    np.testing.assert_array_equal(ours.view(np.uint32), ref.view(np.uint32))


def test_sin_bit_exact(ns_oracle, freestanding, rng):
    xs = np.concatenate([
        rng.uniform(-3.15, 3.15, 500).astype(np.float32),
        rng.uniform(-30.0, 30.0, 300).astype(np.float32),  # exercises the while loops
        np.array([0.0, 3.141592, -3.141592, 1.570796, 4.0, -4.0, 10.5], np.float32),
    ])
    ours = np.asarray(sinf(xs))
    ref = np.array([ns_oracle.sin(x) for x in xs], np.float32)
    np.testing.assert_array_equal(ours.view(np.uint32), ref.view(np.uint32))


def test_orientation_bit_exact(ns_oracle, freestanding, testdata, rng):
    img = testdata["lena"]
    from grayskull_tpu.ops.features import compute_orientation

    xs = rng.integers(15, img.shape[1] - 15, 32)
    ys = rng.integers(15, img.shape[0] - 15, 32)
    ours = np.asarray(compute_orientation(img, xs, ys, 15))
    ref = np.array(
        [ns_oracle.compute_orientation(np.asarray(img), x, y, 15) for x, y in zip(xs, ys)],
        np.float32,
    )
    np.testing.assert_array_equal(ours.view(np.uint32), ref.view(np.uint32))


def test_orb_extract_bit_exact(ns_oracle, freestanding, testdata):
    """The full freestanding ORB numeric path (angles feed descriptors)."""
    img = testdata["lena"]
    from grayskull_tpu.ops.features import orb_extract

    kps = orb_extract(img, 100, 20)
    ref = ns_oracle.orb_extract(np.asarray(img), 100, 20)
    n = int(kps.n)
    assert n == ref["n"]
    np.testing.assert_array_equal(np.asarray(kps.x)[:n], ref["xy"][:, 0])
    np.testing.assert_array_equal(np.asarray(kps.y)[:n], ref["xy"][:, 1])
    np.testing.assert_array_equal(
        np.asarray(kps.angle)[:n].view(np.uint32), ref["angle"].view(np.uint32)
    )
    np.testing.assert_array_equal(np.asarray(kps.descriptor)[:n], ref["descriptor"])
