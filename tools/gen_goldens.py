#!/usr/bin/env python3
"""Generate golden outputs from the compiled C reference for standalone tests.

The differential suite needs the reference checkout + a C compiler; this script
bakes a compact set of C-reference outputs into ``tests/golden/goldens.npz`` so
the core parity contract stays testable anywhere (CI without the reference).

Run: ``python tools/gen_goldens.py`` (requires /root/reference or GRAYSKULL_REF).
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

from tests import oracle as oracle_mod  # noqa: E402


def main():
    ref = os.environ.get("GRAYSKULL_REF", "/root/reference")
    orc = oracle_mod.load(ref)
    assert orc is not None, "oracle unavailable"
    rng = np.random.default_rng(20260816)
    g = {}

    img = rng.integers(0, 256, (64, 96), dtype=np.uint8)
    g["input"] = img
    g["blur2"] = orc.blur(img, 2)
    g["blur9"] = orc.blur(img, 9)
    g["adaptive_15_5"] = orc.adaptive_threshold(img, 15, 5)
    g["erode"] = orc.erode(img)
    g["dilate"] = orc.dilate(img)
    g["sobel"] = orc.sobel(img)
    g["otsu"] = np.uint8(orc.otsu(img))
    g["threshold_100"] = orc.threshold(img, 100)
    g["resize_100_40"] = orc.resize(img, 100, 40)
    g["resize_nn_7_150"] = orc.resize_nn(img, 7, 150)
    g["downsample"] = orc.downsample(img)
    g["sharpen"] = orc.filter(img, np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], np.int8), 1)
    g["integral"] = orc.integral(img)

    tmpl = img[10:30, 20:52].copy()
    g["tmpl"] = tmpl
    g["match_template"] = orc.match_template(img, tmpl)

    # blobs on a binarized version
    binary = orc.threshold(orc.blur(img, 1), 128)
    g["blobs_input"] = binary
    b = orc.blobs(binary, 500)
    g["blobs_labels"] = b["labels"]
    g["blobs_label"] = b["label"]
    g["blobs_area"] = b["area"]
    g["blobs_box"] = b["box"]
    g["blobs_centroid"] = b["centroid"]

    # FAST + ORB (exact-host trig is machine-specific; store positions/responses
    # and the scoremap which are libm-independent)
    r = orc.fast(img, 500, 15)
    g["fast_xy"] = r["xy"]
    g["fast_response"] = r["response"]
    g["fast_scoremap"] = r["scoremap"]

    # perspective
    corners = np.array([(5, 3), (90, 8), (85, 60), (2, 58)], np.uint32)
    g["persp_corners"] = corners
    g["persp"] = orc.perspective_correct(img, corners, 50, 70)

    # LBP detection on a synthetic frame
    face_img = rng.integers(0, 256, (120, 160), dtype=np.uint8)
    g["lbp_input"] = face_img
    ii = orc.integral(face_img)
    g["lbp_rects"] = orc.lbp_detect(ii, 50, 1.2, 1.0, 4.0, 1)

    out_dir = os.path.join(HERE, "..", "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "goldens.npz")
    np.savez_compressed(path, **g)
    print(f"wrote {path} ({os.path.getsize(path)} bytes, {len(g)} arrays)")


if __name__ == "__main__":
    main()
