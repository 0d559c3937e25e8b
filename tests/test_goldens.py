"""Standalone golden tests: bit-exact checks against baked C-reference outputs.

These run WITHOUT the reference checkout or a C compiler (tools/gen_goldens.py
bakes tests/golden/goldens.npz from the oracle), keeping the parity contract
testable in any environment.
"""

import os

import numpy as np
import pytest

import grayskull_tpu as gs
from grayskull_tpu.cascade import load_frontalface
from grayskull_tpu.ops.lbp import lbp_detect

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "goldens.npz")


@pytest.fixture(scope="module")
def g():
    if not os.path.exists(GOLDEN):
        pytest.skip("goldens not generated")
    return np.load(GOLDEN)


def test_dense_ops(g):
    img = g["input"]
    np.testing.assert_array_equal(np.asarray(gs.blur(img, 2)), g["blur2"])
    np.testing.assert_array_equal(np.asarray(gs.blur(img, 9)), g["blur9"])
    np.testing.assert_array_equal(
        np.asarray(gs.adaptive_threshold(img, 15, 5)), g["adaptive_15_5"]
    )
    np.testing.assert_array_equal(np.asarray(gs.erode(img)), g["erode"])
    np.testing.assert_array_equal(np.asarray(gs.dilate(img)), g["dilate"])
    np.testing.assert_array_equal(np.asarray(gs.sobel(img)), g["sobel"])
    assert int(gs.otsu_threshold(img)) == int(g["otsu"])
    np.testing.assert_array_equal(np.asarray(gs.threshold(img, 100)), g["threshold_100"])
    np.testing.assert_array_equal(np.asarray(gs.resize(img, (100, 40))), g["resize_100_40"])
    np.testing.assert_array_equal(
        np.asarray(gs.resize_nn(img, (7, 150))), g["resize_nn_7_150"]
    )
    np.testing.assert_array_equal(np.asarray(gs.downsample(img)), g["downsample"])
    np.testing.assert_array_equal(np.asarray(gs.sharpen(img)), g["sharpen"])
    np.testing.assert_array_equal(np.asarray(gs.integral(img)), g["integral"])


def test_template(g):
    res = np.asarray(gs.match_template(g["input"], g["tmpl"]))
    np.testing.assert_array_equal(res, g["match_template"])


def test_blobs(g):
    table, labels, _ = gs.ops.blobs(g["blobs_input"], 500)
    n = int(table.n)
    assert n == len(g["blobs_label"])
    np.testing.assert_array_equal(np.asarray(labels), g["blobs_labels"])
    np.testing.assert_array_equal(np.asarray(table.label)[:n], g["blobs_label"])
    np.testing.assert_array_equal(np.asarray(table.area)[:n], g["blobs_area"])
    box = np.stack([np.asarray(v)[:n] for v in
                    (table.box.x, table.box.y, table.box.w, table.box.h)], 1)
    np.testing.assert_array_equal(box, g["blobs_box"].astype(np.int64))


def test_fast(g):
    kps, score = gs.ops.fast(g["input"], 500, 15)
    n = int(kps.n)
    assert n == len(g["fast_xy"])
    np.testing.assert_array_equal(np.asarray(score), g["fast_scoremap"])
    xy = np.stack([np.asarray(kps.x)[:n], np.asarray(kps.y)[:n]], 1)
    np.testing.assert_array_equal(xy, g["fast_xy"].astype(np.int64))
    np.testing.assert_array_equal(np.asarray(kps.response)[:n], g["fast_response"].astype(np.int64))


def test_perspective(g):
    out = np.asarray(gs.perspective_correct(g["input"], g["persp_corners"].astype(np.int32),
                                            (50, 70)))
    np.testing.assert_array_equal(out, g["persp"])


@pytest.mark.parametrize("step", [1, 2, 3])
def test_lbp(g, step):
    key = "lbp_rects" if step == 1 else f"lbp_rects_step{step}"
    if key not in g:
        pytest.skip("goldens predate stride coverage")
    ii = gs.integral(g["lbp_input"])
    r = lbp_detect(load_frontalface(), np.asarray(ii), 50, 1.2, 1.0, 4.0, step)
    n = int(r.n)
    got = np.stack([np.asarray(v)[:n] for v in (r.x, r.y, r.w, r.h)], 1)
    np.testing.assert_array_equal(got, g[key].astype(np.int64))


def test_filter_presets(g):
    if "emboss" not in g:
        pytest.skip("goldens predate preset coverage")
    np.testing.assert_array_equal(np.asarray(gs.emboss(g["input"])), g["emboss"])
    np.testing.assert_array_equal(np.asarray(gs.blur_box(g["input"])), g["blur_box3"])
    np.testing.assert_array_equal(
        np.asarray(gs.blur_gaussian(g["input"])), g["blur_gaussian3"]
    )


def test_crop_histogram(g):
    if "crop_20_10_40_30" not in g:
        pytest.skip("goldens predate crop/histogram coverage")
    np.testing.assert_array_equal(
        np.asarray(gs.crop(g["input"], gs.Rect(20, 10, 40, 30))), g["crop_20_10_40_30"]
    )
    np.testing.assert_array_equal(np.asarray(gs.histogram(g["input"])), g["histogram"])


def test_contours(g):
    if "contour_input" not in g:
        pytest.skip("goldens predate contour coverage")
    img = g["contour_input"]
    c1 = gs.trace_contour(img, (6, 5))
    got1 = [int(c1.box.x), int(c1.box.y), int(c1.box.w), int(c1.box.h), int(c1.length)]
    np.testing.assert_array_equal(got1, g["contour1"].astype(np.int64))
    c2 = gs.trace_contour(img, (42, 20), visited=c1.visited)
    got2 = [int(c2.box.x), int(c2.box.y), int(c2.box.w), int(c2.box.h), int(c2.length)]
    np.testing.assert_array_equal(got2, g["contour2"].astype(np.int64))
    np.testing.assert_array_equal(
        np.asarray(c2.visited), g["contour_visited"]
    )
    from grayskull_tpu.ops.contour import largest_blob_contour

    c, found = largest_blob_contour(img, max_blobs=16)
    want = g["largest_contour"].astype(np.int64)
    assert int(found) == want[0]
    got = [int(c.box.x), int(c.box.y), int(c.box.w), int(c.box.h), int(c.length),
           int(c.start.x), int(c.start.y)]
    np.testing.assert_array_equal(got, want[1:])


def test_multiblob(g):
    if "multiblob_input" not in g:
        pytest.skip("goldens predate multi-blob coverage")
    table, labels, _ = gs.ops.blobs(g["multiblob_input"], 64)
    n = int(table.n)
    assert n == len(g["multiblob_label"])
    np.testing.assert_array_equal(np.asarray(labels), g["multiblob_labels"])
    np.testing.assert_array_equal(np.asarray(table.label)[:n], g["multiblob_label"])
    np.testing.assert_array_equal(np.asarray(table.area)[:n], g["multiblob_area"])
    box = np.stack([np.asarray(v)[:n] for v in
                    (table.box.x, table.box.y, table.box.w, table.box.h)], 1)
    np.testing.assert_array_equal(box, g["multiblob_box"].astype(np.int64))
    cen = np.stack([np.asarray(table.centroid.x)[:n],
                    np.asarray(table.centroid.y)[:n]], 1)
    np.testing.assert_array_equal(cen, g["multiblob_centroid"].astype(np.int64))
    biggest = int(np.argmax(g["multiblob_area"]))
    corners = gs.blob_corners(
        g["multiblob_input"], labels,
        int(np.asarray(table.label)[biggest]),
        gs.Rect(int(np.asarray(table.box.x)[biggest]),
                int(np.asarray(table.box.y)[biggest]),
                int(np.asarray(table.box.w)[biggest]),
                int(np.asarray(table.box.h)[biggest])),
        gs.Point(int(np.asarray(table.centroid.x)[biggest]),
                 int(np.asarray(table.centroid.y)[biggest])),
    )
    np.testing.assert_array_equal(
        np.asarray(corners), g["multiblob_corners"].astype(np.int64)
    )


def test_match_orb(g):
    if "match_d1" not in g:
        pytest.skip("goldens predate match coverage")
    import jax.numpy as jnp

    from grayskull_tpu.core import Keypoints

    def mk(desc):
        k = len(desc)
        return Keypoints(
            n=jnp.int32(k),
            x=jnp.zeros(k, jnp.int32), y=jnp.zeros(k, jnp.int32),
            response=jnp.zeros(k, jnp.int32), angle=jnp.zeros(k, jnp.float32),
            descriptor=jnp.asarray(desc, jnp.uint32),
        )

    for key, md in (("match_orb_64", 64.0), ("match_orb_200", 200.0)):
        m = gs.ops.match_orb(mk(g["match_d1"]), mk(g["match_d2"]), 100, md)
        n = int(m.n)
        ref = g[key]
        assert n == len(ref)
        got = np.stack([np.asarray(m.idx1)[:n], np.asarray(m.idx2)[:n],
                        np.asarray(m.distance)[:n]], 1)
        np.testing.assert_array_equal(got, ref.astype(np.int64))
