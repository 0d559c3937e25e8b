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

    # LBP detection on a synthetic frame — strides 1/2/3 (the CLI's
    # min_neighbors arg IS the window stride; see SURVEY §3.4)
    face_img = rng.integers(0, 256, (120, 160), dtype=np.uint8)
    g["lbp_input"] = face_img
    ii = orc.integral(face_img)
    g["lbp_rects"] = orc.lbp_detect(ii, 50, 1.2, 1.0, 4.0, 1)
    g["lbp_rects_step2"] = orc.lbp_detect(ii, 50, 1.2, 1.0, 4.0, 2)
    g["lbp_rects_step3"] = orc.lbp_detect(ii, 50, 1.2, 1.0, 4.0, 3)

    # filter presets (gs_sharpen covered above; these pin emboss + the two
    # normalized blurs incl. the int/unsigned division wrap for negatives)
    g["emboss"] = orc.filter(
        img, np.array([[-2, -1, 0], [-1, 1, 1], [0, 1, 2]], np.int8), 1)
    g["blur_box3"] = orc.filter(img, np.ones((3, 3), np.int8), 9)
    g["blur_gaussian3"] = orc.filter(
        img, np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.int8), 16)

    # crop + histogram (trivial but keeps the full dense surface golden-covered)
    g["crop_20_10_40_30"] = orc.crop(img, 20, 10, 40, 30)
    g["histogram"] = orc.histogram(img)

    # contour tracing on smooth synthetic shapes (the C tracer hangs on noise)
    cimg = np.zeros((40, 56), np.uint8)
    cimg[5:18, 6:30] = 255          # rectangle
    yy, xx = np.mgrid[0:40, 0:56]
    cimg[(yy - 28) ** 2 + (xx - 42) ** 2 <= 64] = 255  # disc
    g["contour_input"] = cimg
    c1 = orc.trace_contour(cimg, 6, 5)
    c2 = orc.trace_contour(cimg, 42, 20, visited=c1["visited"])
    g["contour1"] = np.array([*c1["box"], c1["length"]], np.uint32)
    g["contour2"] = np.array([*c2["box"], c2["length"]], np.uint32)
    g["contour_visited"] = c2["visited"]
    lb = orc.largest_blob_contour(cimg, 16)
    g["largest_contour"] = np.array(
        [int(lb["found"]), *lb["box"], lb["length"], *lb["start"]], np.uint32)

    # multi-blob frame: touching L-shapes + isolated specks exercise the
    # union-find merge + creation-order label numbering
    mimg = np.zeros((48, 64), np.uint8)
    mimg[4:8, 4:40] = 200
    mimg[4:24, 36:40] = 200          # merges with the bar -> one L component
    mimg[10:14, 4:20] = 200          # second bar, separate
    mimg[10:30, 16:20] = 200         # merges with it -> second L
    mimg[40, 50] = 255               # speck
    mimg[44:46, 2:60:7] = 255        # dashed row of specks
    g["multiblob_input"] = mimg
    mb = orc.blobs(mimg, 64)
    g["multiblob_labels"] = mb["labels"]
    g["multiblob_label"] = mb["label"]
    g["multiblob_area"] = mb["area"]
    g["multiblob_box"] = mb["box"]
    g["multiblob_centroid"] = mb["centroid"]
    # corners of the largest blob (VERDICT r3: warp/contour/multi-blob coverage)
    biggest = int(np.argmax(mb["area"]))
    blob = dict(label=mb["label"][biggest], area=mb["area"][biggest],
                box=mb["box"][biggest], centroid=mb["centroid"][biggest])
    g["multiblob_corners"] = orc.blob_corners(mimg, mb["labels"], blob)

    # descriptor matching on synthetic descriptors: pure integer Hamming +
    # ratio test, no libm dependence (unlike full ORB descriptors)
    d1 = rng.integers(0, 1 << 32, (40, 8), dtype=np.uint64).astype(np.uint32)
    d2 = d1.copy()
    flip = rng.integers(0, 2, d2.shape, dtype=np.uint64).astype(np.uint32)
    d2 = (d2 ^ (flip & rng.integers(0, 1 << 32, d2.shape,
                                    dtype=np.uint64).astype(np.uint32)))
    d2[::5] = rng.integers(0, 1 << 32, d2[::5].shape,
                           dtype=np.uint64).astype(np.uint32)
    g["match_d1"], g["match_d2"] = d1, d2
    g["match_orb_64"] = orc.match_orb(d1, d2, 100, 64.0)
    g["match_orb_200"] = orc.match_orb(d1, d2, 100, 200.0)

    out_dir = os.path.join(HERE, "..", "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "goldens.npz")
    np.savez_compressed(path, **g)
    print(f"wrote {path} ({os.path.getsize(path)} bytes, {len(g)} arrays)")
    write_testdata(ref, out_dir)


def write_testdata(ref, out_dir):
    """Bake tests/golden/testdata/: vendored lena+aruco (tiny real frames)
    plus deterministic synthetic stand-ins for document/receipt/grayskull at
    the real frame geometries, so content-agnostic tests (sharded-vs-unsharded
    comparisons, IO roundtrips, scan geometry) run without the reference."""
    sys.path.insert(0, os.path.join(HERE, ".."))
    import grayskull_tpu.io as gio

    tdir = os.path.join(out_dir, "testdata")
    os.makedirs(tdir, exist_ok=True)
    for name in ("lena", "aruco"):
        img = gio.read_pgm(os.path.join(ref, "testdata", f"{name}.pgm"))
        assert gio.write_pgm(np.asarray(img), os.path.join(tdir, f"{name}.pgm")) == 0

    rng = np.random.default_rng(20260818)

    def page(h, w, quad, noise=18, paper=205, ink=60):
        """Dark background + bright convex page with text-ish rows: enough
        structure for scan()/blob/contour paths to find and warp a page."""
        img = (rng.normal(35, noise, (h, w))).clip(0, 255).astype(np.uint8)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        inside = np.ones((h, w), bool)
        q = np.asarray(quad, np.float64)
        for i in range(4):
            x0, y0 = q[i]
            x1, y1 = q[(i + 1) % 4]
            inside &= (xx - x0) * (y1 - y0) - (yy - y0) * (x1 - x0) >= 0
        img[inside] = paper
        # horizontal "text" stripes clipped to the page
        stripe = (yy.astype(np.int64) % 24 < 3) & (xx > w * 0.15) & (xx < w * 0.85)
        img[inside & stripe] = ink
        return img

    synth = {
        "document": page(1024, 768, [(90, 120), (660, 80), (700, 930), (60, 960)]),
        "receipt": page(816, 612, [(140, 60), (470, 70), (490, 760), (120, 750)]),
        "grayskull": page(600, 800, [(150, 80), (650, 110), (620, 520), (170, 500)],
                          noise=25, paper=180),
    }
    for name, img in synth.items():
        assert gio.write_pgm(img, os.path.join(tdir, f"{name}.pgm")) == 0
    print(f"wrote {tdir}: lena, aruco (vendored) + {', '.join(synth)} (synthetic)")


if __name__ == "__main__":
    main()
