"""Unit tests for dense pixel ops.

Covers the reference's unit-test vectors (behavioral expectations from
/root/reference/test.c, re-derived by hand) plus batching and dtype checks.
"""

import numpy as np
import pytest

import grayskull_tpu as gs

W = 255


def A(rows):
    return np.array(rows, dtype=np.uint8)


def test_crop():
    img = A([[0, 0, 0, 0], [0, 1, 0, 0], [0, 1, 1, 0], [0, 0, 0, 0]])
    out = np.asarray(gs.crop(img, gs.Rect(1, 1, 3, 2)))
    assert out.tolist() == [[1, 0, 0], [1, 1, 0]]


def test_crop_batched():
    img = np.stack([A([[1, 2], [3, 4]]), A([[5, 6], [7, 8]])])
    out = np.asarray(gs.crop(img, gs.Rect(1, 0, 1, 2)))
    assert out.shape == (2, 2, 1)
    assert out[1, :, 0].tolist() == [6, 8]


def test_resize_down():
    img = A([
        [0, 50, 100, 150],
        [25, 75, 125, 175],
        [50, 100, 150, 200],
        [75, 125, 175, 225],
    ])
    out = np.asarray(gs.resize(img, (2, 2)))
    # bilinear at half-pixel centers: means of each 2x2 quadrant, truncated
    assert out.tolist() == [[37, 137], [87, 187]]


def test_resize_up():
    img = A([[37, 137], [87, 187]])
    out = np.asarray(gs.resize(img, (4, 4)))
    assert out.tolist() == [
        [37, 62, 112, 137],
        [49, 74, 124, 149],
        [74, 99, 149, 174],
        [87, 112, 162, 187],
    ]


def test_resize_identity():
    img = A([[10, 20], [30, 40]])
    out = np.asarray(gs.resize(img, (2, 2)))
    assert out.tolist() == img.tolist()


def test_blur_clipped_window():
    img = A([[0, 0, 0], [0, W, 0], [0, 0, 0]])
    out = np.asarray(gs.blur(img, 1))
    assert out[1, 1] == 28  # 255/9 truncated
    assert out[0, 0] == 63  # 255/4 truncated (clipped 2x2 window)


def test_morph():
    sq = A([
        [0, 0, 0, 0, 0],
        [0, W, W, W, 0],
        [0, W, W, W, 0],
        [0, W, W, W, 0],
        [0, 0, 0, 0, 0],
    ])
    er = np.asarray(gs.erode(sq))
    assert er[2, 2] == 255 and er[1, 1] == 0
    dot = np.zeros((5, 5), np.uint8)
    dot[2, 2] = W
    di = np.asarray(gs.dilate(dot))
    assert di[2, 2] == 255
    assert di[1, 2] == 255 and di[3, 2] == 255 and di[2, 1] == 255 and di[2, 3] == 255
    assert di[0, 0] == 0


def test_sobel_edges():
    vert = np.zeros((5, 5), np.uint8)
    vert[:, 2:] = W
    out = np.asarray(gs.sobel(vert))
    assert out[2, 2] > 100 and out[3, 2] > 100
    assert out[2, 0] == 0
    horiz = np.zeros((5, 5), np.uint8)
    horiz[2:, :] = W
    out = np.asarray(gs.sobel(horiz))
    assert out[2, 2] > 100 and out[2, 3] > 100
    assert out[0, 2] == 0
    # border row/col must be zero
    assert out[0].max() == 0 and out[-1].max() == 0


def test_histogram():
    img = A([[0, 50, 100], [50, 100, 150], [100, 150, 200]])
    hist = np.asarray(gs.histogram(img))
    assert hist[0] == 1 and hist[50] == 2 and hist[100] == 3 and hist[150] == 2 and hist[200] == 1
    assert hist.sum() == 9


def test_threshold():
    img = A([[50, 150], [75, 200]])
    out = np.asarray(gs.threshold(img, 100))
    assert out.tolist() == [[0, 255], [0, 255]]


def test_otsu_bimodal():
    img = A([[40, 50, 60], [45, 55, 50], [190, 200, 210]])
    assert int(gs.otsu_threshold(img)) == 60


def test_otsu_uniform():
    img = A([[0, 85], [170, 255]])
    assert int(gs.otsu_threshold(img)) == 85


def test_otsu_constant():
    img = np.full((2, 2), 128, np.uint8)
    assert int(gs.otsu_threshold(img)) == 0


def test_otsu_batched():
    a = A([[40, 50, 60], [45, 55, 50], [190, 200, 210]])
    b = np.full((3, 3), 128, np.uint8)
    out = np.asarray(gs.otsu_threshold(np.stack([a, b])))
    assert out.tolist() == [60, 0]


def test_adaptive_threshold():
    img = A([
        [50, 50, 200, 50, 50],
        [50, 50, 200, 50, 50],
        [50, 50, 200, 50, 50],
        [200, 200, 100, 200, 200],
        [200, 200, 100, 200, 200],
    ])
    out0 = np.asarray(gs.adaptive_threshold(img, 1, 0))
    assert out0.tolist() == [
        [0, 0, W, 0, 0],
        [0, 0, W, 0, 0],
        [0, 0, W, 0, 0],
        [W, W, 0, W, W],
        [0, W, 0, W, 0],
    ]
    out5 = np.asarray(gs.adaptive_threshold(img, 1, 5))
    assert out5.tolist() == [
        [W, 0, W, 0, W],
        [W, 0, W, 0, W],
        [0, 0, W, 0, 0],
        [W, W, 0, W, W],
        [W, W, 0, W, W],
    ]


def test_downsample():
    img = A([[10, 20, 99], [30, 40, 99]])
    out = np.asarray(gs.downsample(img))
    assert out.shape == (1, 1)
    assert out[0, 0] == (10 + 20 + 30 + 40) // 4


def test_resize_nn():
    img = A([[1, 2], [3, 4]])
    out = np.asarray(gs.resize_nn(img, (4, 4)))
    assert out.tolist() == [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]]


def test_filter_identity_norm():
    img = A([[10, 200], [30, 90]])
    ident = np.zeros((3, 3), np.int8)
    ident[1, 1] = 1
    out = np.asarray(gs.filter2d(img, ident, 1))
    assert out.tolist() == img.tolist()


def test_filter_negative_sum_norm1_clamps_to_zero():
    img = A([[0, 0, 0], [0, 0, 255], [0, 0, 0]])
    k = np.zeros((3, 3), np.int8)
    k[1, 1] = 1
    k[1, 2] = -1  # center minus right neighbor
    out = np.asarray(gs.filter2d(img, k, 1))
    assert out[1, 1] == 0  # 0 - 255 wraps back to -255 under norm 1 -> clamp 0


def test_filter_negative_sum_norm_gt1_wraps_to_255():
    # C quirk: int/unsigned division promotes the negative sum to a huge unsigned,
    # so with norm > 1 the clamped result is 255 (grayskull.h:263).
    img = A([[0, 0, 0], [0, 0, 255], [0, 0, 0]])
    k = np.zeros((3, 3), np.int8)
    k[1, 1] = 1
    k[1, 2] = -1
    out = np.asarray(gs.filter2d(img, k, 2))
    assert out[1, 1] == 255


def test_blur_batched_matches_single():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (3, 16, 24), dtype=np.uint8)
    out_b = np.asarray(gs.blur(imgs, 2))
    for i in range(3):
        assert (out_b[i] == np.asarray(gs.blur(imgs[i], 2))).all()


def test_uint8_enforced():
    with pytest.raises(TypeError):
        gs.core.as_image(np.zeros((4, 4), np.float32))


def test_hist_nibble_matmul_matches_bincount(rng):
    """The scatter-free MXU histogram formulation is exact on any backend."""
    import jax.numpy as jnp

    from grayskull_tpu.ops.histogram import _hist_nibble_matmul

    flat = rng.integers(0, 256, (3, 977), dtype=np.uint8)
    got = np.asarray(_hist_nibble_matmul(jnp.asarray(flat)))
    want = np.stack([np.bincount(r, minlength=256) for r in flat]).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# fused Pallas bilinear resize (kernels/resize.py)
# ---------------------------------------------------------------------------

_RESIZE_SHAPES = [
    ((1024, 1024), (480, 640)),  # the benchmark downscale
    ((480, 640), (768, 1024)),   # upscale
    ((480, 640), (347, 200)),    # odd dh (block padding), narrow dw
    ((200, 256), (200, 256)),    # identity-size pass-through geometry
]


def test_resize_pallas_interpret(rng):
    """Interpret-mode check of the fused kernel vs the XLA formulation.

    In interpret mode the lerp lowers through XLA:CPU, which contracts
    ``a*b + c`` into FMA (unlike Mosaic on hardware) — measured ~3 ppm
    single-count uint8 flips on random data — so this asserts the corner
    selection plumbing (geometry, bands, one-hot tables) via a <=1-count
    envelope with a tiny flip budget; the tpu-marked test asserts full
    bit-exactness on hardware."""
    import jax.numpy as jnp

    from grayskull_tpu.kernels.resize import (resize_pallas,
                                              resize_pallas_available)
    from grayskull_tpu.ops.pixel import _resize

    for src, dst in _RESIZE_SHAPES:
        assert resize_pallas_available(*src, *dst), (src, dst)
        img = rng.integers(0, 256, (2,) + src, dtype=np.uint8)
        got = np.asarray(resize_pallas(jnp.asarray(img), dst, interpret=True))
        want = np.asarray(_resize(jnp.asarray(img), dst))
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1, (src, dst, diff.max())
        flips = int((diff != 0).sum())
        assert flips <= max(64, diff.size // 10000), (src, dst, flips)


def test_resize_pallas_dyadic_exact_interpret(rng):
    """A 2x upscale has dyadic lerp weights (0, 0.25, 0.75): every product
    and partial sum is exact in f32, so FMA contraction cannot change a bit
    — interpret mode must match the XLA path EXACTLY.  This pins the band
    geometry, block padding, and one-hot tables with zero float slack.
    (A flat frame is NOT a valid exact case: general weights sum to
    172.999... and sit exactly on the uint8 truncation boundary, the
    worst case for contraction.)"""
    import jax.numpy as jnp

    from grayskull_tpu.kernels.resize import (resize_pallas,
                                              resize_pallas_available)
    from grayskull_tpu.ops.pixel import _resize

    for src in [(240, 320), (100, 128), (173, 200)]:
        dst = (src[0] * 2, src[1] * 2)
        assert resize_pallas_available(*src, *dst)
        img = rng.integers(0, 256, (2,) + src, dtype=np.uint8)
        got = np.asarray(resize_pallas(jnp.asarray(img), dst, interpret=True))
        want = np.asarray(_resize(jnp.asarray(img), dst))
        np.testing.assert_array_equal(got, want, err_msg=f"{src}->{dst}")


from tests.conftest import tpu_default as _tpu_default  # noqa: E402


@pytest.mark.tpu
@pytest.mark.skipif(not _tpu_default(), reason="Pallas resize kernel needs TPU")
def test_resize_pallas_hardware_parity(oracle, rng):
    """On hardware Mosaic does NOT contract the lerp, so the fused kernel is
    bit-exact vs the C reference (and the public ``gs.resize`` dispatches to
    it for qualifying shapes)."""
    from grayskull_tpu.kernels.resize import resize_pallas_available

    for src, dst in _RESIZE_SHAPES:
        assert resize_pallas_available(*src, *dst)
        img = rng.integers(0, 256, src, dtype=np.uint8)
        got = np.asarray(gs.resize(img, dst))
        ref = oracle.resize(img, *dst)
        np.testing.assert_array_equal(got, ref, err_msg=f"{src}->{dst}")
