"""Unit + parity tests for integral image, template matching, perspective warp."""

import numpy as np
import pytest

import grayskull_tpu as gs

W = 255


def rand_img(rng, h, w):
    return rng.integers(0, 256, (h, w), dtype=np.uint8)


# --- integral ---------------------------------------------------------------


def test_integral_small():
    img = np.arange(1, 10, dtype=np.uint8).reshape(3, 3)
    ii = np.asarray(gs.integral(img))
    assert ii.tolist() == [[1, 3, 6], [5, 12, 21], [12, 27, 45]]
    assert int(gs.integral_sum(gs.integral(img), 1, 1, 2, 2)) == 28


def test_integral_parity(oracle, rng):
    for size in [(1, 1), (5, 7), (64, 48), (480, 640)]:
        img = rand_img(rng, *size)
        assert np.array_equal(np.asarray(gs.integral(img)), oracle.integral(img))


def test_integral_sum_parity(oracle, rng):
    img = rand_img(rng, 32, 40)
    ii = np.asarray(gs.integral(img))
    for (x, y, w, h) in [(0, 0, 1, 1), (0, 0, 40, 32), (5, 7, 10, 3), (39, 31, 1, 1)]:
        assert int(gs.integral_sum(ii, x, y, w, h)) == oracle.integral_sum(ii, x, y, w, h)


def test_integral_sum_vectorized(oracle, rng):
    img = rand_img(rng, 16, 16)
    ii = np.asarray(gs.integral(img))
    xs = np.arange(8)
    ys = np.arange(8)
    ours = np.asarray(gs.integral_sum(ii, xs, ys, 3, 3))
    for i in range(8):
        assert ours[i] == oracle.integral_sum(ii, int(xs[i]), int(ys[i]), 3, 3)


# --- template matching ------------------------------------------------------


def test_template_exact_match():
    img = np.zeros((5, 5), np.uint8)
    patch = np.array([[100, 150, 200], [125, 175, 225], [110, 160, 210]], np.uint8)
    img[1:4, 1:4] = patch
    res = np.asarray(gs.match_template(img, patch))
    x, y = gs.find_best_match(res)
    assert (int(x), int(y)) == (1, 1)
    assert res[1, 1] == 255


def test_template_bright_square():
    img = np.full((4, 4), 50, np.uint8)
    img[1:3, 1:3] = W
    tmpl = np.full((2, 2), W, np.uint8)
    res = np.asarray(gs.match_template(img, tmpl))
    x, y = gs.find_best_match(res)
    assert (int(x), int(y)) == (1, 1)


@pytest.mark.parametrize("isize,tsize", [((8, 8), (3, 3)), ((32, 24), (5, 9)),
                                         ((64, 64), (16, 16)), ((40, 40), (40, 40)),
                                         ((300, 300), (257, 255))])
def test_template_parity(oracle, rng, isize, tsize):
    img = rand_img(rng, *isize)
    tmpl = rand_img(rng, *tsize)
    ours = np.asarray(gs.match_template(img, tmpl))
    ref = oracle.match_template(img, tmpl)
    assert np.array_equal(ours, ref), (np.argwhere(ours != ref)[:3],)
    assert tuple(int(v) for v in gs.find_best_match(ours)) == oracle.find_best_match(ref)


def test_template_near_duplicate_tiebreak(oracle):
    # two identical best placements: first in scan order must win
    img = np.zeros((6, 10), np.uint8)
    img[1:3, 1:3] = 200
    img[1:3, 6:8] = 200
    tmpl = np.full((2, 2), 200, np.uint8)
    res = np.asarray(gs.match_template(img, tmpl))
    ours = tuple(int(v) for v in gs.find_best_match(res))
    assert ours == oracle.find_best_match(oracle.match_template(img, tmpl))


# --- perspective ------------------------------------------------------------


def corners_arr(tl, tr, br, bl):
    return np.array([tl, tr, br, bl], np.int32)


def test_perspective_identity_quad(oracle, rng):
    img = rand_img(rng, 20, 30)
    c = corners_arr((0, 0), (29, 0), (29, 19), (0, 19))
    ours = np.asarray(gs.perspective_correct(img, c, (20, 30)))
    ref = oracle.perspective_correct(img, c, 20, 30)
    assert np.array_equal(ours, ref)


@pytest.mark.parametrize("trial", range(5))
def test_perspective_random_quads_parity(oracle, rng, trial):
    img = rand_img(rng, 48, 64)
    xs = rng.integers(0, 64, 4)
    ys = rng.integers(0, 48, 4)
    c = np.stack([xs, ys], axis=1).astype(np.int32)
    size = (int(rng.integers(4, 100)), int(rng.integers(4, 100)))
    ours = np.asarray(gs.perspective_correct(img, c, size))
    ref = oracle.perspective_correct(img, c, *size)
    assert np.array_equal(ours, ref), np.argwhere(ours != ref)[:5]


def test_warp_kernel_odd_height_interpret(oracle, testdata):
    """The Pallas band sampler takes page heights that are not multiples of
    8 by edge-replicating the last coordinate row (ops/warp.py); interpret
    mode pins the full odd-height page bit-exact vs the C oracle."""
    import jax.numpy as jnp

    from grayskull_tpu.kernels.warp import quad_sample_available
    from grayskull_tpu.ops.warp import _warp_batched_tpu

    img = np.asarray(testdata["document"])
    h, w = img.shape
    c = corners_arr((int(w * 0.1), int(h * 0.15)), (int(w * 0.9), int(h * 0.1)),
                    (int(w * 0.85), int(h * 0.9)), (int(w * 0.12), int(h * 0.88)))
    size = (347, 200)  # dh % 8 == 3
    assert quad_sample_available(h, w, *size)
    got = _warp_batched_tpu(jnp.asarray(img)[None],
                            jnp.asarray(c)[None], size, interpret=True)
    ref = oracle.perspective_correct(img, c, *size)
    np.testing.assert_array_equal(np.asarray(got)[0], ref)


def test_warp_banded_sampler_interpret(testdata):
    """The r5 per-tile banded sampler (kernels/warp.py quad_sample_banded):
    corner maps must be exactly ``src[y, x]`` wherever the config's ``ok``
    holds, and the config ladder must grade from the narrow (64, 256) config
    (mild document quads) through (128, 512) (steep tilt) to neither
    (extreme quads -> gather fallback)."""
    import jax.numpy as jnp

    from grayskull_tpu.kernels.warp import quad_sample_banded
    from grayskull_tpu.ops.warp import _warp_coords

    img = np.asarray(testdata["document"])
    h, w = img.shape
    dh, dw = 1000, 800
    u = jnp.asarray(np.arange(dw, dtype=np.float32) / np.float32(dw - 1.0))
    v = jnp.asarray(np.arange(dh, dtype=np.float32) / np.float32(dh - 1.0))
    quads = {
        # (expect ok at (64,256), expect ok at (128,512))
        "mild": (np.array([[50, 40], [700, 60], [690, 1000], [40, 980]],
                          np.int32), True, True),
        "steep": (np.array([[0, 400], [760, 0], [767, 600], [10, 1010]],
                           np.int32), False, True),
        "extreme": (np.array([[10, 700], [1000, 10], [1020, 760], [3, 10]],
                             np.int32), False, False),
    }
    s = jnp.asarray(img)[None]
    for name, (q, ok64, ok128) in quads.items():
        y0, y1, x0, x1, _, _ = _warp_coords((h, w), jnp.asarray(q), u, v)
        coords = tuple(a[None] for a in (y0, y1, x0, x1))
        for (kb, kxb), expect in (((64, 256), ok64), ((128, 512), ok128)):
            maps, ok = quad_sample_banded(s, *coords, kb=kb, kxb=kxb,
                                          interpret=True)
            assert bool(ok) == expect, (name, kb, kxb)
            if not expect:
                continue
            c00, c01, c10, c11 = (np.asarray(m[0]) for m in maps)
            y0n, y1n, x0n, x1n = (np.asarray(a) for a in (y0, y1, x0, x1))
            np.testing.assert_array_equal(c00, img[y0n, x0n], err_msg=name)
            np.testing.assert_array_equal(c01, img[y0n, x1n], err_msg=name)
            np.testing.assert_array_equal(c10, img[y1n, x0n], err_msg=name)
            np.testing.assert_array_equal(c11, img[y1n, x1n], err_msg=name)


def test_warp_banded_ladder_dispatch_interpret(oracle, testdata):
    """The full TPU dispatch (banded ladder + gather fallback) stays
    bit-exact vs the C oracle in interpret mode across quads that take each
    branch of the ladder."""
    import jax.numpy as jnp

    from grayskull_tpu.ops.warp import _warp_batched_tpu

    img = np.asarray(testdata["document"])
    quads = [
        np.array([[50, 40], [700, 60], [690, 1000], [40, 980]], np.int32),
        np.array([[0, 400], [760, 0], [767, 600], [10, 1010]], np.int32),
        np.array([[10, 700], [1000, 10], [1020, 760], [3, 10]], np.int32),
    ]
    for q in quads:
        got = _warp_batched_tpu(jnp.asarray(img)[None], jnp.asarray(q)[None],
                                (1000, 800), interpret=True)
        ref = oracle.perspective_correct(img, q, 1000, 800)
        np.testing.assert_array_equal(np.asarray(got)[0], ref,
                                      err_msg=str(q[0]))


def test_perspective_document_scan_quad(oracle, testdata):
    img = testdata["document"]
    h, w = img.shape
    c = corners_arr((int(w * 0.1), int(h * 0.15)), (int(w * 0.9), int(h * 0.1)),
                    (int(w * 0.85), int(h * 0.9)), (int(w * 0.12), int(h * 0.88)))
    ours = np.asarray(gs.perspective_correct(img, c, (1000, 800)))
    ref = oracle.perspective_correct(img, c, 1000, 800)
    assert np.array_equal(ours, ref), np.argwhere(ours != ref)[:5]


from tests.conftest import tpu_default as _tpu_default  # noqa: E402


@pytest.mark.tpu
@pytest.mark.skipif(not _tpu_default(), reason="Pallas integral kernel needs TPU")
def test_integral_pallas_matches_xla(rng):
    """Single-pass MXU integral kernel must be bit-exact vs the XLA cumsums,
    including uint32 wraparound on large frames and padded geometries."""
    for shape in [(480, 640), (1024, 1024), (37, 130), (768, 1024)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        fast = np.asarray(gs.integral(img))
        ref = np.asarray(gs.integral(img, force_xla=True))
        np.testing.assert_array_equal(fast, ref, err_msg=str(shape))
    batch = rng.integers(0, 256, (3, 256, 384), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(gs.integral(batch)), np.asarray(gs.integral(batch, force_xla=True))
    )


@pytest.mark.tpu
@pytest.mark.skipif(not _tpu_default(), reason="Pallas warp sampler needs TPU")
def test_warp_pallas_matches_gather_tpu(testdata):
    """The band-sampler warp (kernels/warp.py) must be bit-identical to the
    gather path, including the runtime fallback on extreme quads — r3."""
    import jax
    import jax.numpy as jnp

    from grayskull_tpu.ops.warp import perspective_correct

    cpu = jax.devices("cpu")[0]
    doc = jnp.asarray(testdata["document"])
    quads = [
        # narrow banded config, wide banded config, gather fallback (r5)
        np.array([[31, 228], [571, 150], [728, 859], [132, 985]], np.int32),
        np.array([[0, 400], [760, 0], [767, 600], [10, 1010]], np.int32),
        np.array([[10, 700], [1000, 10], [1020, 760], [3, 10]], np.int32),
    ]
    for q in quads:
        got = np.asarray(perspective_correct(doc, jnp.asarray(q), (1000, 800)))
        with jax.default_device(cpu):
            ref = np.asarray(perspective_correct(
                jax.device_put(doc, cpu), jnp.asarray(q), (1000, 800)))
        np.testing.assert_array_equal(got, ref)


def test_integral_kernel_interpret():
    """The single-pass MXU integral kernel (interpret mode, CPU) == the XLA
    double-cumsum, including uint32 wraparound (a 600x600 frame of 255s sums
    past 2^31) and awkward padded geometries."""
    import jax.numpy as jnp

    from grayskull_tpu.kernels.integral import integral_pallas

    rng = np.random.default_rng(3)
    cases = [
        rng.integers(0, 256, (37, 130), dtype=np.uint8),
        rng.integers(0, 256, (128, 128), dtype=np.uint8),
        np.full((600, 600), 255, np.uint8),   # max sum ~91.8e9 mod 2^32 wraps
        # wider than the r1-r3 (w, w)-triu kernel's 1536 cap: the r4 blocked
        # scans keep any width on the kernel path (chunked lane carries)
        rng.integers(0, 256, (60, 2049), dtype=np.uint8),
    ]
    for img in cases:
        got = np.asarray(integral_pallas(jnp.asarray(img), interpret=True))
        ref = np.asarray(gs.integral(jnp.asarray(img), force_xla=True))
        np.testing.assert_array_equal(got, ref, err_msg=str(img.shape))
