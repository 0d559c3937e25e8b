"""Unit + parity tests for connected components, blob corners, contour tracing."""

import jax.numpy as jnp
import numpy as np
import pytest

import grayskull_tpu as gs

W = 255


def rand_blobby(rng, h, w, p=0.45):
    """Random binary-ish image with blobby structure."""
    img = (rng.random((h, w)) < p).astype(np.uint8) * 255
    return img


def blobs_dict(img, cap):
    table, labels, overflowed = gs.blobs(img, cap)
    n = int(table.n)
    return dict(
        n=n,
        labels=np.asarray(labels),
        label=np.asarray(table.label)[:n],
        area=np.asarray(table.area)[:n],
        box=np.stack(
            [np.asarray(v)[:n] for v in (table.box.x, table.box.y, table.box.w, table.box.h)],
            axis=1,
        ),
        centroid=np.stack([np.asarray(table.centroid.x)[:n], np.asarray(table.centroid.y)[:n]], axis=1),
        overflowed=bool(overflowed),
    )


def assert_blobs_equal(ours, ref, msg=""):
    assert ours["n"] == ref["n"], f"{msg}: count {ours['n']} vs {ref['n']}"
    np.testing.assert_array_equal(ours["labels"], ref["labels"], err_msg=f"{msg}: label map")
    np.testing.assert_array_equal(ours["label"], ref["label"], err_msg=f"{msg}: labels")
    np.testing.assert_array_equal(ours["area"], ref["area"], err_msg=f"{msg}: areas")
    np.testing.assert_array_equal(ours["box"], ref["box"].astype(np.int64), err_msg=f"{msg}: boxes")
    np.testing.assert_array_equal(
        ours["centroid"], ref["centroid"].astype(np.int64), err_msg=f"{msg}: centroids"
    )


def test_blobs_reference_vector():
    # the reference's unit-test grid: 3 merged components with labels {1, 2, 6}
    img = np.array(
        [
            [W, W, 0, 0, W, 0],
            [W, 0, 0, W, W, 0],
            [0, 0, W, W, 0, 0],
            [W, W, W, 0, 0, W],
            [0, W, 0, 0, 0, W],
        ],
        np.uint8,
    )
    d = blobs_dict(img, 10)
    assert d["n"] == 3
    assert d["label"].tolist() == [1, 2, 6]
    assert d["area"].tolist() == [3, 9, 2]
    assert d["box"].tolist() == [[0, 0, 2, 2], [0, 0, 5, 5], [5, 3, 1, 2]]
    assert d["centroid"].tolist() == [[0, 0], [2, 2], [5, 3]]


@pytest.mark.parametrize("size", [(1, 1), (5, 6), (16, 16), (64, 48)])
@pytest.mark.parametrize("density", [0.2, 0.45, 0.8])
def test_blobs_parity_random(oracle, rng, size, density):
    img = rand_blobby(rng, *size, density)
    ours = blobs_dict(img, 4000)
    ref = oracle.blobs(img, 4000)
    assert not ours["overflowed"]
    assert_blobs_equal(ours, ref, f"{size}@{density}")


def test_blobs_spiral(oracle):
    # worst-case propagation distance: a spiral strip
    n = 41
    img = np.zeros((n, n), np.uint8)
    x0, x1, y0, y1 = 0, n - 1, 0, n - 1
    while x0 <= x1 and y0 <= y1:
        img[y0, x0 : x1 + 1] = 255
        img[y0 : y1 + 1, x1] = 255
        if y1 > y0 + 1:
            img[y1, x0 + 2 : x1 + 1] = 255
            img[y0 + 2 : y1 + 1, x0 + 2] = 255
        x0 += 4; y0 += 4; x1 -= 4; y1 -= 4
    ours = blobs_dict(img, 100)
    ref = oracle.blobs(img, 100)
    assert_blobs_equal(ours, ref, "spiral")


def test_blobs_aruco_pipeline(oracle, testdata):
    # the Makefile integration pipeline's blob stage on real data (downscaled)
    img = testdata["aruco"][::2, ::2].copy()
    b = np.asarray(gs.blur(img, 3))
    s = np.asarray(gs.sobel(b))
    t = np.asarray(gs.threshold(s, int(gs.otsu_threshold(s))))
    d = np.asarray(gs.dilate(t))
    e = np.asarray(gs.erode(d))
    ours = blobs_dict(e, 4000)
    ref = oracle.blobs(e, 4000)
    assert_blobs_equal(ours, ref, "aruco")


def test_blob_corners_parity(oracle, rng):
    img = rand_blobby(rng, 24, 32, 0.6)
    cap = 2000
    ours = blobs_dict(img, cap)
    ref = oracle.blobs(img, cap)
    assert_blobs_equal(ours, ref)
    table, labels, _ = gs.blobs(img, cap)
    for i in range(ref["n"]):
        blob = dict(
            label=ref["label"][i], area=ref["area"][i], box=ref["box"][i],
            centroid=ref["centroid"][i],
        )
        ref_c = oracle.blob_corners(img, ref["labels"], blob)
        ours_c = np.asarray(
            gs.blob_corners(
                img,
                labels,
                int(blob["label"]),
                gs.Rect(*[int(v) for v in blob["box"]]),
                gs.Point(*[int(v) for v in blob["centroid"]]),
            )
        )
        np.testing.assert_array_equal(ours_c, ref_c.astype(np.int64), err_msg=f"blob {i}")


def test_trace_contour_reference_vector():
    img = np.array(
        [
            [0, W, W, W, 0],
            [0, W, W, W, 0],
            [0, W, 0, W, W],
            [0, W, W, W, 0],
            [0, 0, W, 0, W],
        ],
        np.uint8,
    )
    c = gs.trace_contour(img, (1, 0))
    assert int(c.length) == 10
    assert tuple(int(v) for v in c.box) == (1, 0, 4, 5)
    expected_visited = np.array(
        [
            [0, W, W, W, 0],
            [0, W, 0, W, 0],
            [0, W, 0, 0, W],
            [0, W, 0, W, 0],
            [0, 0, W, 0, 0],
        ],
        np.uint8,
    )
    np.testing.assert_array_equal(np.asarray(c.visited), expected_visited)


def shapes_img(rng, h, w, nshapes=4):
    """Union of filled rects/discs — closed regions whose boundary traces terminate.

    (The C reference's gs_trace_contour loops FOREVER on salt-and-pepper noise:
    its only stop conditions are dead-end or a second visit of the start pixel, and
    a walk can cycle without revisiting the start.  Our implementation bounds the
    walk; the oracle cannot be safely called on such inputs.)
    """
    img = np.zeros((h, w), np.uint8)
    for _ in range(nshapes):
        if rng.random() < 0.5:
            y, x = rng.integers(0, h - 4), rng.integers(0, w - 4)
            hh, ww = rng.integers(3, h - y + 1), rng.integers(3, w - x + 1)
            img[y : y + hh, x : x + ww] = 255
        else:
            cy, cx = rng.integers(2, h - 2), rng.integers(2, w - 2)
            r = int(rng.integers(2, min(h, w) // 3 + 1))
            yy, xx = np.mgrid[0:h, 0:w]
            img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 255
    return img


def first_boundary_start(img):
    fgs = np.argwhere(img > 128)
    if len(fgs) == 0:
        return None
    y, x = fgs[0]  # topmost-leftmost foreground pixel
    return int(x), int(y)


@pytest.mark.parametrize("trial", range(8))
def test_trace_contour_parity_shapes(oracle, rng, trial):
    img = shapes_img(rng, 24, 28)
    start = first_boundary_start(img)
    if start is None:
        pytest.skip("no foreground")
    ours = gs.trace_contour(img, start)
    ref = oracle.trace_contour(img, *start)
    assert int(ours.length) == ref["length"]
    assert tuple(int(v) for v in ours.box) == ref["box"]
    np.testing.assert_array_equal(np.asarray(ours.visited), ref["visited"])


def test_trace_contour_visited_carryover(oracle, rng):
    img = np.zeros((16, 16), np.uint8)
    img[2:6, 2:7] = 255
    img[9:14, 8:15] = 255
    ours1 = gs.trace_contour(img, (2, 2))
    ours2 = gs.trace_contour(img, (8, 9), visited=ours1.visited)
    vref = np.zeros_like(img)
    r1 = oracle.trace_contour(img, 2, 2, visited=vref)
    r2 = oracle.trace_contour(img, 8, 9, visited=r1["visited"])
    assert int(ours2.length) == r2["length"]
    np.testing.assert_array_equal(np.asarray(ours2.visited), r2["visited"])


def test_single_pixel_blob():
    img = np.zeros((3, 3), np.uint8)
    img[1, 1] = 255
    d = blobs_dict(img, 5)
    assert d["n"] == 1
    assert d["label"].tolist() == [1]
    assert d["area"].tolist() == [1]
    assert d["box"].tolist() == [[1, 1, 1, 1]]


def test_empty_image_blobs():
    img = np.zeros((4, 4), np.uint8)
    d = blobs_dict(img, 5)
    assert d["n"] == 0
    assert (d["labels"] == 0).all()


def test_largest_blob_contour_vs_oracle(oracle):
    """Multi-blob contour driver parity vs the WASM-demo composition.

    Synthetic shapes only: the reference's gs_trace_contour loops forever on
    organic thresholded images (the known C hang we deliberately bound), so
    the oracle cannot be run on testdata here.
    """
    from grayskull_tpu.ops.contour import largest_blob_contour

    synth = np.zeros((120, 160), np.uint8)
    synth[10:60, 10:70] = 255
    synth[70:110, 90:150] = 255
    synth[15:25, 100:140] = 255
    ring = np.zeros((80, 80), np.uint8)
    ring[10:70, 10:70] = 255
    ring[25:55, 25:55] = 0
    for name, binary in {"synth": synth, "ring": ring}.items():
        ref = oracle.largest_blob_contour(binary, 50)
        c, found = largest_blob_contour(jnp.asarray(binary), 50)
        assert bool(found) == ref["found"], name
        if ref["found"]:
            assert (int(c.start.x), int(c.start.y)) == ref["start"], name
            assert (int(c.box.x), int(c.box.y), int(c.box.w), int(c.box.h)) == ref["box"], name
            assert int(c.length) == ref["length"], name


def test_largest_blob_contour_terminates_on_testdata(testdata):
    """Our driver is hang-proof on organic images (bounded walk)."""
    import grayskull_tpu as gs
    from grayskull_tpu.ops.contour import largest_blob_contour

    img = testdata["lena"]
    t = int(gs.otsu_threshold(img))
    binary = np.asarray(gs.threshold(img, t))
    c, found = largest_blob_contour(jnp.asarray(binary), 50)
    assert bool(found) and int(c.length) > 0


def test_largest_blob_contour_rejects_small(oracle):
    img = np.zeros((32, 32), np.uint8)
    img[4:7, 4:7] = 255  # area 9 < 100
    from grayskull_tpu.ops.contour import largest_blob_contour

    c, found = largest_blob_contour(jnp.asarray(img), 10)
    assert not bool(found)
    assert not oracle.largest_blob_contour(img, 10)["found"]


def test_find_contours_multi(oracle):
    """Shared-visited multi-contour extraction: every blob traced once."""
    from grayskull_tpu.ops.contour import find_contours

    img = np.zeros((64, 96), np.uint8)
    img[5:20, 5:30] = 255    # blob 1
    img[30:55, 40:80] = 255  # blob 2
    img[8:12, 60:90] = 255   # blob 3
    out = find_contours(jnp.asarray(img), max_contours=8, max_blobs=16)
    assert int(out.n) == 3
    # each contour must match a standalone oracle trace from the same start
    for k in range(3):
        sx, sy = int(out.start.x[k]), int(out.start.y[k])
        ref = oracle.trace_contour(img, sx, sy)
        assert (int(out.box.x[k]), int(out.box.y[k]),
                int(out.box.w[k]), int(out.box.h[k])) == ref["box"]
        assert int(out.length[k]) == ref["length"]


def test_find_contours_skips_visited():
    """A blob whose start pixel an earlier trace already visited is skipped."""
    from grayskull_tpu.ops.contour import find_contours

    img = np.zeros((32, 32), np.uint8)
    img[4:10, 4:10] = 255
    out = find_contours(jnp.asarray(img), max_contours=4, max_blobs=8)
    assert int(out.n) == 1
    assert int(out.length[0]) > 0


def test_blobs_past_capacity_divergence_pinned(oracle):
    """Past-capacity semantics (grayskull.h:348): C silently drops pixels
    whose component seed arrives after the label counter exhausts nblobs —
    even if those pixels later reconnect to an in-capacity component.  We
    deliberately do NOT reproduce the drops (ops/blobs.py:17-22): components
    are fully merged and ``overflowed`` flags the condition.  This test pins
    the exact divergence on a crafted image.
    """
    from grayskull_tpu.ops.blobs import blobs

    # cap=2.  Column 0 rows 0..3 plus a row-3 bridge is component A (label 1).
    # A dot at (0,4) takes label 2.  A dot at (0,8) plus the column below it
    # would take label 3 -> dropped by C -- but row 3 reconnects the column
    # to A, so C counts only the pixels reachable without passing through a
    # dropped pixel.
    img = np.zeros((6, 12), np.uint8)
    img[0:4, 0] = 255            # A's left arm
    img[3, 0:9] = 255            # bridge
    img[0, 4] = 255              # dot -> label 2
    img[0:3, 8] = 255            # column seeded past capacity -> dropped in C
    ref = oracle.blobs(img, 2)
    table, labels, ovf = blobs(jnp.asarray(img), 2)

    assert bool(ovf), "overflow must be flagged"
    assert ref["n"] == int(table.n) == 2
    np.testing.assert_array_equal(ref["label"], np.asarray(table.label)[:2])
    # C's label-1 area misses exactly the 3 dropped column pixels (rows 0..2
    # of col 8); ours counts the fully merged component
    assert int(np.asarray(table.area)[0]) == int(ref["area"][0]) + 3
    # the dot at (0,4) is unaffected either way
    assert int(np.asarray(table.area)[1]) == int(ref["area"][1]) == 1
    # both agree on the bounding box (the bridge pixel (3,8) is in-capacity)
    np.testing.assert_array_equal(
        np.asarray([table.box.x[0], table.box.y[0], table.box.w[0], table.box.h[0]]),
        ref["box"][0],
    )


from tests.conftest import tpu_default as _tpu_default  # noqa: E402


@pytest.mark.tpu
@pytest.mark.skipif(not _tpu_default(), reason="matmul blob aggregation needs TPU")
def test_blobs_matmul_aggregation_matches_cpu(testdata):
    """The TPU one-hot-matmul blob statistics must equal the CPU segment-op
    path field for field (area/bbox/centroid/labels/compaction order)."""
    import jax

    from grayskull_tpu.ops.blobs import blobs
    from grayskull_tpu.pipelines.scan import preprocess_binarize

    binary = preprocess_binarize(testdata["document"])
    tbl, labels, ov = blobs(binary, 1000)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        tbl_c, labels_c, ov_c = blobs(jax.device_put(binary, cpu), 1000)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(labels_c))
    assert bool(ov) == bool(ov_c)
    for f in ("n", "label", "area"):
        np.testing.assert_array_equal(
            np.asarray(getattr(tbl, f)), np.asarray(getattr(tbl_c, f)), err_msg=f
        )
    for f in ("x", "y", "w", "h"):
        np.testing.assert_array_equal(
            np.asarray(getattr(tbl.box, f)), np.asarray(getattr(tbl_c.box, f)), err_msg=f
        )
    for f in ("x", "y"):
        np.testing.assert_array_equal(
            np.asarray(getattr(tbl.centroid, f)),
            np.asarray(getattr(tbl_c.centroid, f)), err_msg=f,
        )


def test_label_components_fallback_matches_packed(rng, monkeypatch):
    """The pair-scan + pointer-jump fallback (frames past the packed-key bit
    budget) must agree with the packed-cummax fast path."""
    import importlib

    # "grayskull_tpu.ops.blobs" the *attribute* is the jitted function (the
    # ops package re-exports it), so fetch the module explicitly
    B = importlib.import_module("grayskull_tpu.ops.blobs")

    img = (rng.random((96, 128)) < 0.55).astype(np.uint8) * 255
    want = np.asarray(B.label_components(img))
    monkeypatch.setattr(B, "_packed_vbits", lambda h, w: None)
    B.label_components._clear_cache()
    try:
        got = np.asarray(B.label_components(img))
    finally:
        monkeypatch.undo()
        B.label_components._clear_cache()
    np.testing.assert_array_equal(got, want)


def test_ccl_serpentine_interpret_matches_xla(rng):
    """The Pallas serpentine-strip CCL kernel (interpret mode) must agree
    with the XLA packed-cummax path, including a snake component zigzagging
    between strips (the carry turning-point case) — r3 kernel."""
    import jax

    from grayskull_tpu.kernels.ccl import ccl_serpentine
    from grayskull_tpu.ops.blobs import label_components

    BIG = 2**30

    def run_both(img):
        h, w = img.shape
        ref = np.asarray(label_components(jnp.asarray(img)))
        fg = img >= 128
        idx = np.arange(h * w, dtype=np.int32).reshape(h, w)
        hp, wp = -(-h // 8) * 8, -(-w // 128) * 128
        L0 = np.full((hp, wp), BIG, np.int32)
        L0[:h, :w] = np.where(fg, idx, BIG)
        L, sweeps = ccl_serpentine(jnp.asarray(L0[None]), interpret=True)
        got = np.where(fg, np.asarray(L)[0, :h, :w], -1)
        np.testing.assert_array_equal(got, ref)
        return int(sweeps)

    sn = np.zeros((16, 128), np.uint8)  # blk=8 -> 2 strips
    for i, x in enumerate(range(0, 128, 8)):
        sn[:, x] = 255
        sn[15 if i % 2 == 0 else 0, x : x + 9] = 255
    assert run_both(sn) >= 1
    noise = (rng.random((16, 128)) < 0.45).astype(np.uint8) * 255
    run_both(noise)
    # single-arm rectangular spiral across 5 strips: ONE component whose
    # min label must flow down and back up repeatedly.  The original
    # single-call serpentine (revisited strips in one pallas_call) LIVELOCKED
    # here: up visits read stale prefetched inputs, overwrote the down
    # visits' improvements with an idempotent recomputation, and the changed
    # flag never cleared — the two-pass structure pins the fix.
    h, w = 40, 128
    sp = np.zeros((h, w), np.uint8)
    top, bot, lef, rig = 0, h - 1, 0, w - 1
    while top <= bot and lef <= rig:
        sp[top, lef:rig + 1] = 255
        sp[top:bot + 1, rig] = 255
        sp[bot, lef:rig + 1] = 255
        sp[top:bot + 1, lef] = 255
        top += 4; bot -= 4; lef += 4; rig -= 4
        if lef <= rig:
            sp[top - 3:top + 1, lef] = 255
    assert run_both(sp) >= 2  # needs more than one down+up sweep


@pytest.mark.tpu
@pytest.mark.skipif(not _tpu_default(), reason="Pallas CCL kernel needs TPU")
def test_ccl_and_rank_blobs_tpu_match_cpu(testdata):
    """On TPU, label_components (serpentine kernel) and blobs (rank
    propagation) must match the CPU XLA paths bit-for-bit on real frames."""
    import jax

    from grayskull_tpu.ops.blobs import blobs, label_components
    from grayskull_tpu.pipelines.scan import preprocess_binarize

    cpu = jax.devices("cpu")[0]
    binary = preprocess_binarize(jnp.asarray(testdata["document"]))
    got_lab = np.asarray(label_components(binary))
    got_tab = blobs(binary, 1000)
    with jax.default_device(cpu):
        bc = jax.device_put(binary, cpu)
        ref_lab = np.asarray(label_components(bc))
        ref_tab = blobs(bc, 1000)
    np.testing.assert_array_equal(got_lab, ref_lab)
    for f in ("n", "label", "area"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got_tab[0], f)), np.asarray(getattr(ref_tab[0], f)), err_msg=f
        )
    np.testing.assert_array_equal(np.asarray(got_tab[1]), np.asarray(ref_tab[1]))
