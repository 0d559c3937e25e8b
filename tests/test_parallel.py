"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Asserts the sharded pipelines (data-parallel and spatial halo-exchange) are
bit-identical to the single-device ops.
"""

import jax
import numpy as np
import pytest

import grayskull_tpu as gs
from grayskull_tpu.parallel import (
    exchange_halo,
    integral_sharded,
    make_mesh,
    preprocess_sharded,
    preprocess_spatial_shardmap,
)
from grayskull_tpu.pipelines.preproc import preprocess_reference


@pytest.fixture(scope="module")
def cpu8():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return devs[:8]


def test_data_parallel_preprocess(cpu8, rng):
    mesh = make_mesh((8, 1), devices=cpu8)
    imgs = rng.integers(0, 256, (16, 64, 128), dtype=np.uint8)
    out = preprocess_sharded(imgs, mesh)
    ref = preprocess_reference(imgs)
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2)])
def test_spatial_shardmap_preprocess(cpu8, rng, mesh_shape):
    mesh = make_mesh(mesh_shape, devices=cpu8)
    n = 2 * mesh_shape[0]
    h = 32 * mesh_shape[1]
    imgs = rng.integers(0, 256, (n, h, 128), dtype=np.uint8)
    out = preprocess_spatial_shardmap(imgs, mesh)
    ref = preprocess_reference(imgs)
    for name, a, b in zip(("blurred", "binary", "edges", "t"), out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


def test_spatial_blur_various_radii(cpu8, rng):
    # halo width == radius must generalize
    from functools import partial

    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from grayskull_tpu.parallel.sharded import _spatial_pipeline

    mesh = make_mesh((1, 8), devices=cpu8)
    imgs = rng.integers(0, 256, (2, 64, 128), dtype=np.uint8)
    for r in (1, 3, 5):
        out = preprocess_spatial_shardmap(imgs, mesh, radius=r)
        ref = preprocess_reference(imgs, radius=r)
        for a, b in zip(out, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f"r={r}")


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_spatial_shardmap_pallas_body(cpu8, rng, mesh_shape):
    """The kernel-reusing shard body (fused_blur_hist_window +
    fused_threshold_sobel_window, interpret mode on the CPU mesh) must be
    bit-identical to the single-device reference pipeline."""
    mesh = make_mesh(mesh_shape, devices=cpu8)
    n = 2 * mesh_shape[0]
    h = 32 * mesh_shape[1]
    imgs = rng.integers(0, 256, (n, h, 128), dtype=np.uint8)
    out = preprocess_spatial_shardmap(imgs, mesh, kernels=True, interpret=True)
    ref = preprocess_reference(imgs)
    for name, a, b in zip(("blurred", "binary", "edges", "t"), out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


def test_spatial_shardmap_pallas_body_radii(cpu8, rng):
    mesh = make_mesh((1, 8), devices=cpu8)
    imgs = rng.integers(0, 256, (2, 64, 128), dtype=np.uint8)
    for r in (1, 3, 5):
        out = preprocess_spatial_shardmap(imgs, mesh, radius=r, kernels=True,
                                          interpret=True)
        ref = preprocess_reference(imgs, radius=r)
        for a, b in zip(out, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"r={r}")


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_integral_sharded(cpu8, rng, mesh_shape):
    mesh = make_mesh(mesh_shape, devices=cpu8)
    n = 2 * mesh_shape[0]
    h = 16 * mesh_shape[1]
    imgs = rng.integers(0, 256, (n, h, 48), dtype=np.uint8)
    out = integral_sharded(imgs, mesh)
    ref = gs.integral(imgs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # kernel route: per-shard Pallas blocked-scan local integral (interpret
    # mode on the CPU mesh) + the same exclusive carry exchange
    outk = integral_sharded(imgs, mesh, kernels=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(outk), np.asarray(ref))


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_match_template_sharded(cpu8, rng, mesh_shape):
    from grayskull_tpu.parallel import match_template_sharded

    mesh = make_mesh(mesh_shape, devices=cpu8)
    n = mesh_shape[0]
    h = 16 * mesh_shape[1]
    imgs = rng.integers(0, 256, (n, h, 96), dtype=np.uint8)
    # template heights straddle the shard height (multi-hop bottom halo):
    # 5 < h_loc, 16 == h_loc, 40 spans 3+ shards
    for th, tw in ((5, 7), (16, 16), (40, 24)):
        tmpl = rng.integers(0, 256, (th, tw), dtype=np.uint8)
        got = match_template_sharded(imgs, tmpl, mesh)
        ref = gs.match_template(imgs, tmpl)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                      err_msg=f"tmpl {th}x{tw}")
    # an exact-match placement scores 255 through the sharded path too
    tmpl = imgs[0, 20:33, 10:30]
    got = np.asarray(match_template_sharded(imgs, tmpl, mesh))
    assert got[0, 20, 10] == 255


def test_halo_exchange_roundtrip(cpu8):
    # halo rows must come from ring neighbors, zeros at global edges
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh((8,), axis_names=("space",), devices=cpu8)
    x = np.arange(8 * 4 * 8, dtype=np.int32).reshape(8 * 4, 8)

    def body(xl):
        return exchange_halo(xl, 2, "space")

    out = jax.jit(
        shard_map(body, mesh=mesh, in_specs=(P("space", None),),
                  out_specs=P("space", None))
    )(x)
    out = np.asarray(out)  # (8 * 8, 8): each shard emits 4+2+2 rows
    s = out.reshape(8, 8, 8)
    # shard 0: top halo zero, bottom halo = shard 1's first rows
    assert (s[0, :2] == 0).all()
    np.testing.assert_array_equal(s[0, -2:], x[4:6])
    # shard 7: bottom halo zero
    assert (s[7, -2:] == 0).all()
    np.testing.assert_array_equal(s[7, :2], x[26:28])


from tests.conftest import tpu_default as _tpu_default


@pytest.mark.tpu
@pytest.mark.skipif(not _tpu_default(), reason="needs TPU as default device")
def test_shardmap_mosaic_on_hardware(rng):
    """Mosaic kernels INSIDE shard_map on the real chip (1x1 mesh).

    Interpret-mode CPU-mesh tests can't catch hardware-only Mosaic
    surprises (the r3 serpentine-CCL livelock class), so this runs the
    Pallas bodies under shard_map on the device: the fused preprocess
    window kernels, the blocked-scan integral, and the pure-XLA sparse ORB
    shard body for the collective lowering."""
    from grayskull_tpu.ops.features import orb_extract
    from grayskull_tpu.parallel import orb_extract_spatial

    mesh = make_mesh((1, 1), devices=jax.devices()[:1])
    imgs = rng.integers(0, 256, (2, 256, 256), dtype=np.uint8)

    out = preprocess_spatial_shardmap(imgs, mesh, kernels=True)
    ref = preprocess_reference(imgs)
    for name, a, b in zip(("blurred", "binary", "edges", "t"), out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)

    got = integral_sharded(imgs, mesh, kernels=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(gs.integral(imgs)))

    k_ref = orb_extract(imgs[0], 64, 20)
    k_got = orb_extract_spatial(imgs[0], mesh, 64, 20)
    for f in ("n", "x", "y", "response", "angle", "descriptor"):
        np.testing.assert_array_equal(np.asarray(getattr(k_got, f)),
                                      np.asarray(getattr(k_ref, f)), err_msg=f)


def test_scan_sharded_matches_single(testdata):
    """Data-parallel scanner must be bit-identical per frame."""
    import jax.numpy as jnp

    from grayskull_tpu.parallel import make_mesh, scan_sharded
    from grayskull_tpu.pipelines.scan import scan

    from .conftest import cpu_devices

    devs = cpu_devices(8)
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    mesh = make_mesh((4, 2), devices=devs)
    doc = np.asarray(testdata["document"])[::4, ::4]  # 256x192, fast on CPU
    batch = jnp.asarray(np.stack([np.roll(doc, 2 * i, axis=1) for i in range(4)]))
    pages, corners = scan_sharded(batch, mesh, out_size=(128, 96), max_blobs=64)
    ref_pages, ref_corners = scan(batch, out_size=(128, 96), max_blobs=64)
    np.testing.assert_array_equal(np.asarray(pages), np.asarray(ref_pages))
    np.testing.assert_array_equal(np.asarray(corners), np.asarray(ref_corners))
