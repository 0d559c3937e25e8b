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


def test_lbp(g):
    ii = gs.integral(g["lbp_input"])
    r = lbp_detect(load_frontalface(), np.asarray(ii), 50, 1.2, 1.0, 4.0, 1)
    n = int(r.n)
    got = np.stack([np.asarray(v)[:n] for v in (r.x, r.y, r.w, r.h)], 1)
    np.testing.assert_array_equal(got, g["lbp_rects"].astype(np.int64))
