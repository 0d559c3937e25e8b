"""Comprehensive differential sweep: every op against the C oracle on every
reference test image (SURVEY.md §4 test-plan item b).  Marked slow."""

import numpy as np
import pytest

import grayskull_tpu as gs

pytestmark = pytest.mark.slow


def crop_to(img, h, w):
    return img[:h, :w].copy()


def test_every_op_every_testdata(oracle, testdata):
    for name, full in sorted(testdata.items()):
        # cap sizes to keep the (scalar C) oracle runtime sane
        img = crop_to(full, min(full.shape[0], 512), min(full.shape[1], 512))
        h, w = img.shape

        np.testing.assert_array_equal(np.asarray(gs.blur(img, 2)), oracle.blur(img, 2),
                                      err_msg=f"{name} blur2")
        np.testing.assert_array_equal(np.asarray(gs.blur(img, 9)), oracle.blur(img, 9),
                                      err_msg=f"{name} blur9")
        np.testing.assert_array_equal(np.asarray(gs.sobel(img)), oracle.sobel(img),
                                      err_msg=f"{name} sobel")
        np.testing.assert_array_equal(np.asarray(gs.erode(img)), oracle.erode(img),
                                      err_msg=f"{name} erode")
        np.testing.assert_array_equal(np.asarray(gs.dilate(img)), oracle.dilate(img),
                                      err_msg=f"{name} dilate")
        assert int(gs.otsu_threshold(img)) == oracle.otsu(img), f"{name} otsu"
        np.testing.assert_array_equal(
            np.asarray(gs.adaptive_threshold(img, 7, 3)),
            oracle.adaptive_threshold(img, 7, 3), err_msg=f"{name} adaptive",
        )
        np.testing.assert_array_equal(
            np.asarray(gs.resize(img, (h // 3, w * 2 // 3))),
            oracle.resize(img, h // 3, w * 2 // 3), err_msg=f"{name} resize",
        )
        np.testing.assert_array_equal(
            np.asarray(gs.resize_nn(img, (h * 2, w // 2))),
            oracle.resize_nn(img, h * 2, w // 2), err_msg=f"{name} resize_nn",
        )
        np.testing.assert_array_equal(np.asarray(gs.downsample(img)),
                                      oracle.downsample(img), err_msg=f"{name} downsample")
        np.testing.assert_array_equal(np.asarray(gs.integral(img)), oracle.integral(img),
                                      err_msg=f"{name} integral")
        np.testing.assert_array_equal(np.asarray(gs.sharpen(img)),
                                      oracle.filter(img, gs.SHARPEN_KERNEL[0], 1),
                                      err_msg=f"{name} sharpen")

        # template: find a crop of itself
        tmpl = img[h // 4 : h // 4 + 24, w // 4 : w // 4 + 24]
        np.testing.assert_array_equal(
            np.asarray(gs.match_template(img, tmpl)), oracle.match_template(img, tmpl),
            err_msg=f"{name} template",
        )

        # FAST corners
        r = oracle.fast(img, 2000, 20)
        kps, score = gs.ops.fast(img, 2000, 20)
        n = int(kps.n)
        assert n == r["n"], f"{name} fast count"
        np.testing.assert_array_equal(np.asarray(score), r["scoremap"],
                                      err_msg=f"{name} fast scoremap")

        # blobs on the binarized image
        binary = np.asarray(gs.threshold(img, int(gs.otsu_threshold(img))))
        b_ref = oracle.blobs(binary, 4000)
        table, labels, overflow = gs.ops.blobs(binary, 4000)
        if not bool(overflow):
            assert int(table.n) == b_ref["n"], f"{name} blob count"
            np.testing.assert_array_equal(np.asarray(labels), b_ref["labels"],
                                          err_msg=f"{name} blob labels")
