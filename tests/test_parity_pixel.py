"""Differential tests: dense pixel ops vs the compiled C reference oracle.

Asserts bit-exact equality on random images and on the reference's real PGM
test data.
"""

import numpy as np
import pytest

import grayskull_tpu as gs


def rand_img(rng, h, w):
    return rng.integers(0, 256, (h, w), dtype=np.uint8)


SIZES = [(1, 1), (3, 5), (7, 7), (16, 24), (33, 31), (64, 64)]


def assert_same(ours, theirs, msg=""):
    ours = np.asarray(ours)
    theirs = np.asarray(theirs)
    if not np.array_equal(ours, theirs):
        bad = np.argwhere(ours != theirs)
        raise AssertionError(
            f"{msg}: {len(bad)} mismatches, first at {bad[0]}: "
            f"ours={ours[tuple(bad[0])]} ref={theirs[tuple(bad[0])]}"
        )


@pytest.mark.parametrize("size", SIZES)
def test_blur_parity(oracle, rng, size):
    img = rand_img(rng, *size)
    for r in (1, 2, 3, 9):
        assert_same(gs.blur(img, r), oracle.blur(img, r), f"blur r={r} {size}")


@pytest.mark.parametrize("size", SIZES)
def test_adaptive_parity(oracle, rng, size):
    img = rand_img(rng, *size)
    for r, c in ((1, 0), (1, 5), (3, 2), (15, 5)):
        assert_same(
            gs.adaptive_threshold(img, r, c),
            oracle.adaptive_threshold(img, r, c),
            f"adaptive r={r} c={c} {size}",
        )


@pytest.mark.parametrize("size", SIZES)
def test_morph_parity(oracle, rng, size):
    img = rand_img(rng, *size)
    assert_same(gs.erode(img), oracle.erode(img), f"erode {size}")
    assert_same(gs.dilate(img), oracle.dilate(img), f"dilate {size}")


@pytest.mark.parametrize("size", [(3, 3), (8, 8), (17, 23), (64, 64)])
def test_sobel_parity(oracle, rng, size):
    img = rand_img(rng, *size)
    assert_same(gs.sobel(img), oracle.sobel(img), f"sobel {size}")


@pytest.mark.parametrize("size", SIZES)
def test_otsu_parity(oracle, rng, size):
    img = rand_img(rng, *size)
    assert int(gs.otsu_threshold(img)) == oracle.otsu(img)


def test_otsu_parity_pathological(oracle):
    # constant, bimodal, single pixel, extremes
    cases = [
        np.full((8, 8), 0, np.uint8),
        np.full((8, 8), 255, np.uint8),
        np.full((8, 8), 128, np.uint8),
        np.array([[0, 255]], np.uint8),
        np.arange(256, dtype=np.uint8).reshape(16, 16),
    ]
    for img in cases:
        assert int(gs.otsu_threshold(img)) == oracle.otsu(img)


@pytest.mark.parametrize("size", SIZES)
def test_histogram_parity(oracle, rng, size):
    img = rand_img(rng, *size)
    assert_same(gs.histogram(img), oracle.histogram(img))


@pytest.mark.parametrize("size", SIZES)
def test_threshold_parity(oracle, rng, size):
    img = rand_img(rng, *size)
    for t in (0, 100, 254, 255):
        assert_same(gs.threshold(img, t), oracle.threshold(img, t))


@pytest.mark.parametrize(
    "src,dst",
    [((4, 4), (2, 2)), ((2, 2), (4, 4)), ((17, 13), (40, 9)), ((64, 64), (64, 64)),
     ((128, 128), (100, 50)), ((31, 64), (64, 31))],
)
def test_resize_parity(oracle, rng, src, dst):
    img = rand_img(rng, *src)
    assert_same(gs.resize(img, dst), oracle.resize(img, *dst), f"resize {src}->{dst}")
    assert_same(gs.resize_nn(img, dst), oracle.resize_nn(img, *dst), f"resize_nn {src}->{dst}")


@pytest.mark.parametrize("size", [(4, 4), (9, 9), (64, 32)])
def test_downsample_parity(oracle, rng, size):
    img = rand_img(rng, *size)
    assert_same(gs.downsample(img), oracle.downsample(img))


def test_crop_parity(oracle, rng):
    img = rand_img(rng, 32, 48)
    assert_same(gs.crop(img, gs.Rect(3, 5, 17, 11)), oracle.crop(img, 3, 5, 17, 11))


def test_filter_parity(oracle, rng):
    img = rand_img(rng, 24, 24)
    presets = {
        "sharpen": gs.SHARPEN_KERNEL,
        "emboss": gs.EMBOSS_KERNEL,
        "box": gs.BLUR_BOX_KERNEL,
        "gauss": gs.BLUR_GAUSSIAN_KERNEL,
    }
    for name, (k, norm) in presets.items():
        assert_same(gs.filter2d(img, k, norm), oracle.filter(img, k, norm), name)
    # custom kernel with negative weights and norm > 1 (the unsigned-division quirk)
    k = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.int8)
    assert_same(gs.filter2d(img, k, 3), oracle.filter(img, k, 3), "sobelx/3")
    # non-3x3 kernels
    k5 = np.ones((5, 5), np.int8)
    assert_same(gs.filter2d(img, k5, 25), oracle.filter(img, k5, 25), "box5")
    k13 = np.array([[1, -2, 1]], np.int8)
    assert_same(gs.filter2d(img, k13, 1), oracle.filter(img, k13, 1), "lap1x3")


def test_testdata_pipeline_parity(oracle, testdata):
    """README quickstart on lena.pgm: blur(2) -> otsu -> threshold, bit-exact."""
    img = testdata["lena"]
    blurred = np.asarray(gs.blur(img, 2))
    assert_same(blurred, oracle.blur(img, 2), "lena blur")
    t = int(gs.otsu_threshold(blurred))
    assert t == oracle.otsu(blurred)
    assert_same(gs.threshold(blurred, t), oracle.threshold(blurred, t), "lena threshold")
    assert_same(gs.sobel(img), oracle.sobel(img), "lena sobel")


@pytest.mark.slow
def test_testdata_all_ops_parity(oracle, testdata):
    for name, img in testdata.items():
        if img.size > 800 * 700:
            img = img[:512, :512]  # keep oracle runtime sane
        assert_same(gs.blur(img, 2), oracle.blur(img, 2), f"{name} blur")
        assert_same(gs.sobel(img), oracle.sobel(img), f"{name} sobel")
        assert_same(gs.erode(img), oracle.erode(img), f"{name} erode")
        assert_same(gs.dilate(img), oracle.dilate(img), f"{name} dilate")
        assert int(gs.otsu_threshold(img)) == oracle.otsu(img), f"{name} otsu"
        assert_same(
            gs.adaptive_threshold(img, 15, 5),
            oracle.adaptive_threshold(img, 15, 5),
            f"{name} adaptive",
        )
