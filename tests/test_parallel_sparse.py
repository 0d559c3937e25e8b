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


def test_orb_extract_spatial(mesh_space4, testdata):
    """Space-sharded ORB extraction == single-device, bit-for-bit (r3 #4)."""
    from grayskull_tpu.ops.features import orb_extract
    from grayskull_tpu.parallel.sparse import orb_extract_spatial

    img = testdata["aruco"]  # 480x640: 4 shards of 120 rows
    for nk, thr in ((200, 20), (500, 35)):
        ref = orb_extract(jnp.asarray(img), nk, thr)
        got = orb_extract_spatial(jnp.asarray(img), mesh_space4, nk, thr)
        for f in ("n", "x", "y", "response", "angle", "descriptor"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)), err_msg=f
            )


def test_orb_extract_spatial_shard_boundary_corners(mesh_space4):
    """Corners whose FAST circle / NMS window straddles a shard boundary must
    come out identical to single-device extraction — exercises the 3-row halo
    exchange specifically (synthetic bright squares centered ON the 120-row
    boundaries and within +-3 rows of them)."""
    from grayskull_tpu.ops.features import orb_extract
    from grayskull_tpu.parallel.sparse import orb_extract_spatial

    rng = np.random.default_rng(42)
    # jittered base: perfectly flat synthetics tie FAST scores between
    # neighbors and the (reference-faithful) NMS suppresses everything
    img = rng.integers(20, 40, (480, 640)).astype(np.uint8)
    xs = np.arange(24, 616, 24)
    rows = []
    for b in (120, 240, 360):                 # shard boundaries at 4 shards
        rows += [b - 3, b, b + 3]
    rows += [60, 200, 420]                     # interior controls
    for i, yy in enumerate(rows):
        for j, xx in enumerate(xs[i::7]):
            img[yy - 2 : yy + 3, xx - 2 : xx + 3] = rng.integers(
                200, 240, (5, 5))
    ref = orb_extract(jnp.asarray(img), 300, 20)
    got = orb_extract_spatial(jnp.asarray(img), mesh_space4, 300, 20)
    assert int(ref.n) > 20  # the pattern must actually produce corners
    for f in ("n", "x", "y", "response", "angle", "descriptor"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)), err_msg=f
        )


def test_orb_extract_spatial_bad_geometry(mesh_space4, testdata):
    from grayskull_tpu.parallel.sparse import orb_extract_spatial

    with pytest.raises(ValueError):
        orb_extract_spatial(jnp.zeros((66, 64), jnp.uint8), mesh_space4, 10, 20)


def test_blobs_sharded(mesh_space4, rng):
    """Distributed blob statistics == single-device table, bit-exact (r3 #5)."""
    from grayskull_tpu.ops.blobs import blobs
    from grayskull_tpu.parallel.sparse import blobs_sharded

    img1 = np.zeros((64, 48), np.uint8)
    img1[:, 2] = 255                     # spine crossing every shard
    for y in range(0, 64, 7):
        img1[y, 2:40] = 255              # teeth
    img1[50:60, 44:47] = 255
    noise = (rng.random((64, 48)) < 0.3).astype(np.uint8) * 255
    for im in (img1, noise):
        ref, _, ovf = blobs(jnp.asarray(im), 800)
        assert not bool(ovf)
        got = blobs_sharded(jnp.asarray(im), mesh_space4, 800)
        for f in ("n", "label", "area"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)), err_msg=f
            )
        for f in ("x", "y", "w", "h"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got.box, f)), np.asarray(getattr(ref.box, f)),
                err_msg=f"box.{f}",
            )
        for f in ("x", "y"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got.centroid, f)),
                np.asarray(getattr(ref.centroid, f)), err_msg=f"centroid.{f}",
            )


@pytest.mark.parametrize("name", ["document", "receipt"])
def test_scan_spatial_shardmap(mesh_space4, testdata, name):
    """End-to-end space-sharded document scanner == pipelines.scan (r3 #5)."""
    from grayskull_tpu.parallel.sparse import scan_spatial_shardmap
    from grayskull_tpu.pipelines.scan import scan

    img = jnp.asarray(testdata[name])
    page_ref, corners_ref = scan(img)
    page, corners = scan_spatial_shardmap(img, mesh_space4)
    np.testing.assert_array_equal(np.asarray(corners), np.asarray(corners_ref))
    np.testing.assert_array_equal(np.asarray(page), np.asarray(page_ref))
