"""End-to-end pipeline parity: the document scanner vs the C reference chain."""

import numpy as np
import pytest

import grayskull_tpu as gs


def c_scan(oracle, img, out_h=1000, out_w=800):
    """The reference scan() chain executed step-by-step through the oracle."""
    tmp = oracle.blur(img, 1)
    t = (oracle.otsu(tmp) + 10) % 256
    tmp = oracle.threshold(tmp, t)
    b = oracle.blobs(tmp, 1000)
    if b["n"] == 0:
        return None
    largest = int(np.argmax(b["area"]))
    blob = dict(label=b["label"][largest], area=b["area"][largest],
                box=b["box"][largest], centroid=b["centroid"][largest])
    corners = oracle.blob_corners(img=tmp, labels=b["labels"], blob=blob)
    return oracle.perspective_correct(img, corners, out_h, out_w), corners


@pytest.mark.parametrize("name", ["document", "receipt"])
def test_scan_parity(oracle, testdata, name):
    img = testdata[name]
    page, corners = gs.pipelines.scan(img)
    ref = c_scan(oracle, img)
    assert ref is not None
    ref_page, ref_corners = ref
    np.testing.assert_array_equal(np.asarray(corners), ref_corners.astype(np.int64))
    ours = np.asarray(page)
    assert ours.shape == ref_page.shape
    np.testing.assert_array_equal(ours, ref_page)


def test_scan_synthetic_quad(oracle):
    # a bright tilted quadrilateral "page" on dark background
    img = np.full((120, 160), 30, np.uint8)
    yy, xx = np.mgrid[0:120, 0:160]
    inside = (
        (yy > 0.25 * xx - 5) & (yy < 100 - 0.1 * xx) & (xx > 20 + 0.1 * yy) & (xx < 140 - 0.05 * yy)
    )
    img[inside] = 220
    page, corners = gs.pipelines.scan(img, out_size=(50, 40))
    ref_page, ref_corners = c_scan(oracle, img, 50, 40)
    np.testing.assert_array_equal(np.asarray(corners), ref_corners.astype(np.int64))
    np.testing.assert_array_equal(np.asarray(page), ref_page)


def test_scan_batched_matches_single(testdata):
    img = testdata["document"][::4, ::4].copy()
    batch = np.stack([img, img[::-1].copy()])
    pages, corners = gs.pipelines.scan(batch, out_size=(100, 80))
    p0, c0 = gs.pipelines.scan(batch[0], out_size=(100, 80))
    np.testing.assert_array_equal(np.asarray(pages)[0], np.asarray(p0))
