"""Sharded sparse stages vs single-device ops — bit-exact on an 8-CPU mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

import grayskull_tpu as gs
from grayskull_tpu.parallel import make_mesh
from grayskull_tpu.parallel.sparse import (
    label_components_sharded,
    lbp_detect_sharded,
    match_orb_sharded,
)

from .conftest import cpu_devices


@pytest.fixture(scope="module")
def mesh8():
    devs = cpu_devices(8)
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return make_mesh((2, 4), devices=devs)


@pytest.fixture(scope="module")
def mesh_space4():
    devs = cpu_devices(4)
    return make_mesh((1, 4), devices=devs)


def test_label_components_sharded(mesh_space4, rng):
    from grayskull_tpu.ops.blobs import label_components

    # serpentine component weaving across shard boundaries + random noise
    img = np.zeros((64, 48), np.uint8)
    img[:, 2] = 255                      # vertical spine crossing every shard
    for y in range(0, 64, 7):
        img[y, 2:40] = 255               # teeth
    img[50:60, 44:47] = 255              # separate blob
    noise = (rng.random((64, 48)) < 0.35).astype(np.uint8) * 255
    for im in (img, noise):
        ref = np.asarray(label_components(jnp.asarray(im)))
        got = np.asarray(label_components_sharded(jnp.asarray(im), mesh_space4))
        np.testing.assert_array_equal(got, ref)


def test_match_orb_sharded(mesh_space4, testdata):
    from grayskull_tpu.ops.features import match_orb, orb_extract

    img = testdata["lena"]
    k1 = orb_extract(img, 64, 20)
    k2 = orb_extract(np.asarray(img)[::-1].copy(), 64, 20)
    ref = match_orb(k1, k2, 32, 64)
    got = match_orb_sharded(k1, k2, mesh_space4, 32, 64)
    for f in ("n", "idx1", "idx2", "distance"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)), err_msg=f
        )


def test_lbp_detect_sharded(mesh8, testdata):
    from grayskull_tpu.cascade import load_frontalface
    from grayskull_tpu.ops.lbp import lbp_detect

    cas = load_frontalface()
    img = np.asarray(testdata["lena"])
    imgs = np.stack([img, np.roll(img, 9, axis=1)])
    ii = gs.integral(jnp.asarray(imgs))
    ref = lbp_detect(cas, ii, 40, 1.2, 1.0, 4.0, 1)
    got = lbp_detect_sharded(cas, ii, mesh8, 40)
    for f in ("n", "x", "y", "w", "h"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)), err_msg=f
        )


def test_detect_faces_sharded(mesh8, testdata):
    """End-to-end sharded face pipeline (distributed integral + row-sharded
    cascade) must be bit-identical to the single-device pipeline."""
    from grayskull_tpu.parallel.sparse import detect_faces_sharded
    from grayskull_tpu.pipelines.faces import detect_faces

    img = np.asarray(testdata["lena"])  # 128x128: H divisible by space=4
    batch = jnp.asarray(np.stack([np.roll(img, 3 * i, axis=1) for i in range(2)]))
    ours = detect_faces_sharded(batch, mesh8)
    ref = detect_faces(batch)
    for f in ("n", "x", "y", "w", "h"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ours, f)), np.asarray(getattr(ref, f)), err_msg=f
        )
