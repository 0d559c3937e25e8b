"""Fused preprocessing pipeline tests.

On CPU the pipeline uses the composed-XLA path (checked vs the C oracle);
the Pallas kernels are checked against the XLA path when a TPU is present
(see also the TPU runs in the benchmark).
"""

import jax
import numpy as np
import pytest

import grayskull_tpu as gs
from grayskull_tpu.pipelines.preproc import preprocess, preprocess_reference


def test_preprocess_reference_vs_oracle(oracle, testdata):
    img = testdata["lena"]
    blurred, binary, edges, t = preprocess_reference(img)
    rb = oracle.blur(img, 2)
    rt = oracle.otsu(rb)
    rbin = oracle.threshold(rb, rt)
    redge = oracle.sobel(rbin)
    assert int(t) == rt
    np.testing.assert_array_equal(np.asarray(blurred), rb)
    np.testing.assert_array_equal(np.asarray(binary), rbin)
    np.testing.assert_array_equal(np.asarray(edges), redge)


def test_preprocess_batched(rng):
    imgs = rng.integers(0, 256, (3, 64, 128), dtype=np.uint8)
    out = preprocess(imgs)
    for i in range(3):
        single = preprocess(imgs[i])
        for a, b in zip(out, single):
            np.testing.assert_array_equal(np.asarray(a)[i], np.asarray(b))


from tests.conftest import tpu_default as _tpu_default  # noqa: E402


@pytest.mark.tpu
@pytest.mark.skipif(not _tpu_default(), reason="pallas kernels need TPU as default device")
def test_pallas_matches_xla(rng):
    imgs = rng.integers(0, 256, (2, 256, 256), dtype=np.uint8)
    out_p = preprocess(imgs)
    out_r = preprocess(imgs, force_xla=True)
    for name, a, b in zip(("blurred", "binary", "edges", "t"), out_p, out_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
    # odd geometry dispatches to the stencil-composed middle tier
    odd = rng.integers(0, 256, (2, 97, 200), dtype=np.uint8)
    out_s = preprocess(odd)
    out_x = preprocess(odd, force_xla=True)
    for name, a, b in zip(("blurred", "binary", "edges", "t"), out_s, out_x):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"stencil tier {name}")


def test_otsu_from_histogram_matches_otsu(rng):
    from grayskull_tpu.ops.histogram import otsu_from_histogram

    imgs = rng.integers(0, 256, (2, 32, 32), dtype=np.uint8)
    h = gs.histogram(imgs)
    t1 = otsu_from_histogram(h, 32 * 32)
    t2 = gs.otsu_threshold(imgs)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_preprocess_want_binary_false(testdata):
    """want_binary=False returns binary=None with identical other outputs."""
    import jax.numpy as jnp

    from grayskull_tpu.pipelines.preproc import preprocess

    img = jnp.asarray(testdata["lena"])
    full = preprocess(img)
    lean = preprocess(img, want_binary=False)
    assert lean[1] is None
    np.testing.assert_array_equal(np.asarray(lean[0]), np.asarray(full[0]))
    np.testing.assert_array_equal(np.asarray(lean[2]), np.asarray(full[2]))
    np.testing.assert_array_equal(np.asarray(lean[3]), np.asarray(full[3]))


@pytest.mark.tpu
@pytest.mark.skipif(not _tpu_default(), reason="pallas kernels need TPU as default device")
def test_blur_adaptive_pallas_match_oracle(oracle, rng):
    """The standalone blur/adaptive Pallas kernels (and the gs.blur /
    gs.adaptive_threshold dispatch on TPU) are bit-exact vs the C oracle
    for every supported radius."""
    import jax.numpy as jnp

    from grayskull_tpu.kernels.preproc import adaptive_pallas, blur_pallas

    imgs = rng.integers(0, 256, (2, 128, 256), dtype=np.uint8)
    jb = jnp.asarray(imgs)
    # non-128-divisible width: blocks span the full array width, so the
    # standalone kernels run on any w (stencil_available, unlike the fused
    # pair's preproc_available)
    imgs_odd = rng.integers(0, 256, (1, 48, 612), dtype=np.uint8)
    ref_odd = oracle.blur(imgs_odd[0], 2)
    np.testing.assert_array_equal(
        np.asarray(blur_pallas(jnp.asarray(imgs_odd), 2))[0], ref_odd)
    # awkward height (no divisor block): the row-padding path on real TPU
    imgs_pad = rng.integers(0, 256, (1, 97, 612), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(blur_pallas(jnp.asarray(imgs_pad), 2))[0],
        oracle.blur(imgs_pad[0], 2))
    # r <= 6 exercises the exact-magic division, r > 6 the f32-fixup
    # division and the multi-view (16/24-row) halos
    for r in (1, 2, 5, 6, 7, 16):
        got = np.asarray(blur_pallas(jb, r))
        via_op = np.asarray(gs.blur(jb, r))
        for i in range(2):
            ref = oracle.blur(imgs[i], r)
            np.testing.assert_array_equal(got[i], ref, err_msg=f"blur r={r}")
            np.testing.assert_array_equal(via_op[i], ref)
    for r, c in ((1, 0), (2, 5), (6, -3), (15, 7)):
        got = np.asarray(adaptive_pallas(jb, r, c))
        via_op = np.asarray(gs.adaptive_threshold(jb, r, c))
        for i in range(2):
            ref = oracle.adaptive_threshold(imgs[i], r, c)
            np.testing.assert_array_equal(got[i], ref, err_msg=f"adaptive r={r} c={c}")
            np.testing.assert_array_equal(via_op[i], ref)


@pytest.mark.tpu
@pytest.mark.skipif(not _tpu_default(), reason="pallas kernels need TPU as default device")
def test_sobel_morph_pallas_match_oracle(oracle, rng):
    """The sobel/erode/dilate Pallas stencils (and their gs.* dispatch on
    TPU) are bit-exact vs the C oracle, including the receipt pipeline's
    erode(dilate(adaptive)) composition."""
    import jax.numpy as jnp

    from grayskull_tpu.kernels.preproc import morph_pallas, sobel_pallas

    imgs = rng.integers(0, 256, (2, 128, 256), dtype=np.uint8)
    jb = jnp.asarray(imgs)
    got_s = np.asarray(sobel_pallas(jb))
    via_s = np.asarray(gs.sobel(jb))
    got_e = np.asarray(morph_pallas(jb, "erode"))
    via_e = np.asarray(gs.erode(jb))
    got_d = np.asarray(morph_pallas(jb, "dilate"))
    via_d = np.asarray(gs.dilate(jb))
    for i in range(2):
        np.testing.assert_array_equal(got_s[i], oracle.sobel(imgs[i]))
        np.testing.assert_array_equal(via_s[i], oracle.sobel(imgs[i]))
        np.testing.assert_array_equal(got_e[i], oracle.erode(imgs[i]))
        np.testing.assert_array_equal(via_e[i], oracle.erode(imgs[i]))
        np.testing.assert_array_equal(got_d[i], oracle.dilate(imgs[i]))
        np.testing.assert_array_equal(via_d[i], oracle.dilate(imgs[i]))
    chain = np.asarray(gs.erode(gs.dilate(gs.adaptive_threshold(jb, 15, 5))))
    for i in range(2):
        ref = oracle.erode(oracle.dilate(oracle.adaptive_threshold(imgs[i], 15, 5)))
        np.testing.assert_array_equal(chain[i], ref)


def test_stencil_row_padding_interpret(oracle, rng):
    """Awkward (non-block-divisible) heights run the standalone stencils by
    zero-padding rows to a cheap block size (kernels/preproc.py _pad_blk);
    checked bit-exact vs the C oracle in Pallas interpret mode on CPU —
    covers blur's real-h count clipping, morph's absolute-row neutral mask,
    sobel's interior mask and filter3's OOB-reads-0 pad equivalence."""
    import jax.numpy as jnp

    from grayskull_tpu.kernels.preproc import (_pad_blk, adaptive_pallas,
                                               blur_pallas, filter3_pallas,
                                               morph_pallas, sobel_pallas,
                                               stencil_available)

    # the motivating geometry: 816 rows would run blk=16 (3x read
    # amplification); padding to 896 runs blk=128 at 1.37x
    assert _pad_blk(816, 612, 2) == (128, 896)
    assert stencil_available(13, 136) and stencil_available(129, 136)

    sharpen = ((0, -1, 0), (-1, 5, -1), (0, -1, 0))
    # heights around block boundaries at w=136, plus lane-width edges:
    # the minimal legal frame (7x8 pads to one 8-row block), a width one
    # short of the 128 lane tile, and one just past it
    for h, w in ((13, 136), (100, 136), (129, 136), (7, 8), (9, 120), (17, 129)):
        img = rng.integers(0, 256, (1, h, w), dtype=np.uint8)
        jb = jnp.asarray(img)
        np.testing.assert_array_equal(
            np.asarray(blur_pallas(jb, 2, interpret=True))[0],
            oracle.blur(img[0], 2), err_msg=f"blur h={h}")
        # r=9 exercises nv=2 halo views over the padded frame
        np.testing.assert_array_equal(
            np.asarray(blur_pallas(jb, 9, interpret=True))[0],
            oracle.blur(img[0], 9), err_msg=f"blur r=9 h={h}")
        np.testing.assert_array_equal(
            np.asarray(adaptive_pallas(jb, 3, 5, interpret=True))[0],
            oracle.adaptive_threshold(img[0], 3, 5), err_msg=f"adaptive h={h}")
        np.testing.assert_array_equal(
            np.asarray(sobel_pallas(jb, interpret=True))[0],
            oracle.sobel(img[0]), err_msg=f"sobel h={h}")
        np.testing.assert_array_equal(
            np.asarray(morph_pallas(jb, "erode", interpret=True))[0],
            oracle.erode(img[0]), err_msg=f"erode h={h}")
        np.testing.assert_array_equal(
            np.asarray(morph_pallas(jb, "dilate", interpret=True))[0],
            oracle.dilate(img[0]), err_msg=f"dilate h={h}")
        np.testing.assert_array_equal(
            np.asarray(filter3_pallas(jb, sharpen, 1, interpret=True))[0],
            oracle.filter(np.asarray(img[0]), np.asarray(sharpen, np.int8), 1),
            err_msg=f"filter3 h={h}")


def test_preprocess_fused_pair_interpret(rng):
    """The headline fused pair (blur+histogram, threshold+sobel) checked
    off-hardware: Pallas interpret mode vs the composed-XLA reference on
    a multi-block geometry (24x128 -> blk=8, 3 blocks: interior blocks see
    both halo views; edge blocks see the frame-edge zero masks) and the
    single-block lena geometry (128x128), at the default radius and the
    max magic-divider radius, plus the want_binary=False byte-diet path."""
    from grayskull_tpu.kernels.preproc import preproc_available
    from grayskull_tpu.pipelines.preproc import _preprocess_pallas

    for (h, w), radius in (((24, 128), 2), ((128, 128), 2), ((24, 128), 6)):
        assert preproc_available(h, w, radius)
        imgs = rng.integers(0, 256, (2, h, w), dtype=np.uint8)
        got = _preprocess_pallas(imgs, radius, interpret=True)
        ref = preprocess_reference(imgs, radius)
        for name, a, b in zip(("blurred", "binary", "edges", "t"), got, ref):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"{name} {h}x{w} r={radius}")
    # edges-only consumers skip the binary HBM write but keep identical edges
    imgs = rng.integers(0, 256, (2, 24, 128), dtype=np.uint8)
    none_bin, edges = _preprocess_pallas(imgs, 2, want_binary=False,
                                         interpret=True)[1:3]
    assert none_bin is None
    ref = preprocess_reference(imgs, 2)
    np.testing.assert_array_equal(np.asarray(edges), np.asarray(ref[2]))


def test_preprocess_stencil_tier_interpret(rng):
    """Geometries the fused pair rejects (w % 128 != 0 / awkward h) run the
    stencil-composed middle tier on TPU; interpret mode checks it is
    bit-identical to the composed-XLA reference path."""
    from grayskull_tpu.kernels.preproc import preproc_available, stencil_available
    from grayskull_tpu.pipelines.preproc import _preprocess_stencil

    h, w = 97, 200
    assert not preproc_available(h, w) and stencil_available(h, w)
    imgs = rng.integers(0, 256, (2, h, w), dtype=np.uint8)
    got = _preprocess_stencil(imgs, 2, interpret=True)
    ref = preprocess_reference(imgs, 2)
    for name, a, b in zip(("blurred", "binary", "edges", "t"), got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


@pytest.mark.tpu
@pytest.mark.skipif(not _tpu_default(), reason="pallas kernels need TPU as default device")
def test_filter_pallas_match_oracle(oracle, rng):
    """filter3_pallas (all four presets plus a negative-sum kernel hitting
    the C unsigned-division wrap) is bit-exact vs the C oracle through the
    gs.filter2d dispatch."""
    import jax.numpy as jnp

    from grayskull_tpu.ops.pixel import (BLUR_BOX_KERNEL, BLUR_GAUSSIAN_KERNEL,
                                         EMBOSS_KERNEL, SHARPEN_KERNEL)

    imgs = rng.integers(0, 256, (2, 128, 200), dtype=np.uint8)
    jb = jnp.asarray(imgs)
    wrap = (np.array([[0, -3, 0], [-3, 2, -1], [0, -1, 0]], np.int8), 4)
    for kern, norm in (SHARPEN_KERNEL, EMBOSS_KERNEL, BLUR_BOX_KERNEL,
                       BLUR_GAUSSIAN_KERNEL, wrap):
        got = np.asarray(gs.filter2d(jb, kern, norm))
        for i in range(2):
            np.testing.assert_array_equal(
                got[i], oracle.filter(imgs[i], np.asarray(kern), norm),
                err_msg=f"filter norm={norm}")


def test_filter2d_gate_keeps_wide_taps_off_pallas(monkeypatch):
    """The Pallas stencil's negative-sum-wraps-to-255 shortcut is only valid
    for int8-range taps; filter2d must route wider (extension-API) kernels to
    the XLA u32-wrap path even when a TPU is available.  E.g. taps of -100000
    with norm 15_999_999 give a wrapped quotient of 254, not 255."""
    import jax.numpy as jnp

    import grayskull_tpu.kernels.preproc as kp
    import grayskull_tpu.ops.pixel as px

    calls = []
    monkeypatch.setattr(px, "_on_tpu", lambda: True)
    monkeypatch.setattr(kp, "stencil_available", lambda h, w: True)
    monkeypatch.setattr(
        kp, "filter3_pallas",
        lambda img, taps, norm, **kw: calls.append(taps) or img)

    img = jnp.asarray(np.full((16, 128), 255, np.uint8))
    wide = [[-100000] * 3] * 3
    out = np.asarray(px.filter2d(img, wide, 15_999_999))
    assert not calls, "wide taps must not dispatch to the Pallas stencil"
    # XLA path: interior acc = 9*255*-100000 = -229.5M, wraps to
    # (2^32 + acc) // norm = 254 — the Pallas shortcut would return 255
    assert out[8, 64] == 254
    # int8-range taps (the reference domain) still dispatch
    px.filter2d(img, [[0, -3, 0], [-3, 2, -1], [0, -1, 0]], 4)
    assert len(calls) == 1
