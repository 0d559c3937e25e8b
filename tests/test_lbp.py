"""LBP cascade parity tests vs the C oracle (frontalface cascade)."""

import numpy as np
import pytest

import grayskull_tpu as gs
from grayskull_tpu.cascade import load_frontalface
from grayskull_tpu.ops.lbp import lbp_detect, lbp_window, scale_ladder


@pytest.fixture(scope="module")
def cascade():
    return load_frontalface()


def test_cascade_tables_match_reference(oracle, cascade):
    ct = oracle.cascade_tables()
    assert cascade.window_w == ct["window_w"] and cascade.window_h == ct["window_h"]
    for k in (
        "features", "weak_feature_idx", "weak_subset_offset", "weak_num_subsets",
        "subsets", "stage_weak_start", "stage_nweaks",
    ):
        np.testing.assert_array_equal(np.asarray(getattr(cascade, k)), ct[k], err_msg=k)
    for k in ("weak_left_val", "weak_right_val", "stage_threshold"):
        np.testing.assert_array_equal(
            np.asarray(getattr(cascade, k)).view(np.uint32), ct[k].view(np.uint32), err_msg=k
        )


def rects_arr(r):
    n = int(r.n)
    return np.stack([np.asarray(v)[:n] for v in (r.x, r.y, r.w, r.h)], axis=1)


@pytest.mark.parametrize("step", [1, 2])
def test_lbp_detect_parity_lena(oracle, testdata, cascade, step):
    img = testdata["lena"]
    ii = np.asarray(gs.integral(img))
    ours = rects_arr(lbp_detect(cascade, ii, 100, 1.2, 1.0, 4.0, step))
    ref = oracle.lbp_detect(ii, 100, 1.2, 1.0, 4.0, step)
    np.testing.assert_array_equal(ours, ref.astype(np.int64))


def test_lbp_detect_parity_grayskull_crop(oracle, testdata, cascade):
    img = testdata["grayskull"][:240, :320].copy()
    ii = np.asarray(gs.integral(img))
    ours = rects_arr(lbp_detect(cascade, ii, 100, 1.2, 1.0, 4.0, 1))
    ref = oracle.lbp_detect(ii, 100, 1.2, 1.0, 4.0, 1)
    np.testing.assert_array_equal(ours, ref.astype(np.int64))


@pytest.mark.slow
def test_lbp_detect_parity_full_frame(oracle, testdata, cascade):
    img = testdata["grayskull"][:480, :640].copy()
    ii = np.asarray(gs.integral(img))
    for step in (2, 5):
        ours = rects_arr(lbp_detect(cascade, ii, 100, 1.2, 1.0, 4.0, step))
        ref = oracle.lbp_detect(ii, 100, 1.2, 1.0, 4.0, step)
        np.testing.assert_array_equal(ours, ref.astype(np.int64), err_msg=f"step={step}")


def test_lbp_max_rects_truncation(oracle, testdata, cascade):
    img = testdata["lena"]
    ii = np.asarray(gs.integral(img))
    ours = rects_arr(lbp_detect(cascade, ii, 5, 1.2, 1.0, 4.0, 1))
    ref = oracle.lbp_detect(ii, 5, 1.2, 1.0, 4.0, 1)
    assert len(ours) == len(ref) == 5
    np.testing.assert_array_equal(ours, ref.astype(np.int64))


def test_lbp_window_parity(oracle, testdata, cascade):
    img = testdata["lena"]
    ii = np.asarray(gs.integral(img))
    ref_all = oracle.lbp_detect(ii, 100, 1.2, 1.0, 4.0, 1)
    ladder = scale_ladder(cascade, 128, 128, 1.2, 1.0, 4.0)
    checked = 0
    for scale, win_w, win_h in ladder[:2]:
        for (x, y) in [(0, 0), (10, 20), (50, 50), (128 - win_w, 128 - win_h)]:
            ours = bool(lbp_window(cascade, ii, x, y, scale))
            ref = bool(oracle.lbp_window(ii, x, y, np.float32(scale)))
            assert ours == ref, (scale, x, y)
            checked += 1
    assert checked > 0
    del ref_all


def test_scale_ladder_float_semantics(cascade):
    # scale ladder must use f32 multiplication; 1.2 is inexact in f32 so the
    # ladder values differ from python doubles
    lad = scale_ladder(cascade, 640, 480, 1.2, 1.0, 4.0)
    scales = [s for s, _, _ in lad]
    f = np.float32
    expect = []
    s = f(1.0)
    while s <= f(4.0):
        ww, wh = int(f(24) * s), int(f(24) * s)
        if ww > 640 or wh > 480:
            break
        expect.append(float(s))
        s = f(s * f(1.2))
    assert scales == expect


def test_detect_faces_pipeline(oracle, testdata):
    img = testdata["lena"]
    ours = rects_arr(gs.pipelines.detect_faces(img, step=2))
    ii = oracle.integral(img)
    ref = oracle.lbp_detect(ii, 100, 1.2, 1.0, 4.0, 2)
    np.testing.assert_array_equal(ours, ref.astype(np.int64))


def test_opencv_xml_loader(tmp_path, cascade):
    # synthesize a tiny XML in OpenCV format and check roundtrip parsing
    xml = """<?xml version="1.0"?>
<opencv_storage>
<cascade>
  <stageType>BOOST</stageType>
  <featureType>LBP</featureType>
  <height>8</height>
  <width>8</width>
  <stages>
    <_>
      <maxWeakCount>2</maxWeakCount>
      <stageThreshold>-0.5</stageThreshold>
      <weakClassifiers>
        <_>
          <internalNodes>0 -1 1 -67130709 -21569 -1426120013 -1275125205 -21585 -16385 587145899 -24005</internalNodes>
          <leafValues>-0.6 0.7</leafValues>
        </_>
        <_>
          <internalNodes>0 -1 0 1 2 3 4 5 6 7 8</internalNodes>
          <leafValues>0.25 -0.25</leafValues>
        </_>
      </weakClassifiers>
    </_>
  </stages>
  <features>
    <_><rect>0 0 2 2</rect></_>
    <_><rect>1 1 2 2</rect></_>
  </features>
</cascade>
</opencv_storage>"""
    p = tmp_path / "tiny.xml"
    p.write_text(xml)
    from grayskull_tpu.cascade import load_opencv_xml

    c = load_opencv_xml(str(p))
    assert c.window_w == 8 and c.window_h == 8
    assert c.nweaks == 2 and c.nstages == 1 and c.nfeatures == 2
    assert c.weak_feature_idx.tolist() == [1, 0]
    assert c.weak_num_subsets.tolist() == [8, 8]
    assert c.subsets[:2].tolist() == [-67130709, -21569]
    assert np.isclose(c.weak_left_val[0], -0.6)


from tests.conftest import tpu_default as _tpu_default  # noqa: E402


@pytest.mark.tpu
@pytest.mark.skipif(not _tpu_default(), reason="Pallas LBP kernel needs TPU as default device")
def test_lbp_pallas_matches_xla(testdata, cascade):
    """The Pallas cascade evaluator must be bit-exact vs the XLA formulation
    at a resolution where the VMEM gate opens (640x480 integral)."""
    from grayskull_tpu.kernels.lbp import lbp_pallas_available

    img = testdata["aruco"]  # 640x480
    assert lbp_pallas_available(load_frontalface(), 480, 640, 1.0, 1)
    ii = gs.integral(img)
    fast = rects_arr(lbp_detect(cascade, ii, 100, 1.2, 1.0, 4.0, 1))
    ref = rects_arr(lbp_detect(cascade, ii, 100, 1.2, 1.0, 4.0, 1, force_xla=True))
    np.testing.assert_array_equal(fast, ref)


@pytest.mark.tpu
@pytest.mark.skipif(not _tpu_default(), reason="Pallas LBP kernel needs TPU as default device")
def test_lbp_pallas_multitile_800x600(testdata, cascade):
    """800x600 engages the ntx=2 strip-tiling path; bounded ladder for compile time."""
    img = testdata["grayskull"]
    ii = gs.integral(img)
    fast = rects_arr(lbp_detect(cascade, ii, 100, 1.2, 1.0, 2.0, 1))
    ref = rects_arr(lbp_detect(cascade, ii, 100, 1.2, 1.0, 2.0, 1, force_xla=True))
    np.testing.assert_array_equal(fast, ref)


@pytest.mark.tpu
@pytest.mark.skipif(not _tpu_default(), reason="Pallas LBP kernel needs TPU as default device")
@pytest.mark.parametrize("step", [2, 3])
def test_lbp_pallas_step_gt1(testdata, cascade, step):
    """r3: step>1 stays on the Pallas path (phase-decomposed integral) and
    matches the XLA formulation bit-for-bit — nanomagick faces N>=2 passes
    min_neighbors as the stride (nanomagick.c:363-364)."""
    from grayskull_tpu.kernels.lbp import lbp_pallas_available

    assert lbp_pallas_available(load_frontalface(), 480, 640, 1.0, step)
    img = testdata["aruco"]
    ii = gs.integral(img)
    fast = rects_arr(lbp_detect(cascade, ii, 100, 1.2, 1.0, 2.0, step))
    ref = rects_arr(lbp_detect(cascade, ii, 100, 1.2, 1.0, 2.0, step, force_xla=True))
    np.testing.assert_array_equal(fast, ref)


def test_strip_geometry_plan():
    """Pin the host-side strip planner's decisions (kernels.lbp._padded_dims):
    step-1 640x480 must hold th=32 chunked strips on EVERY ladder scale (the
    r3 110-fps geometry), tall step>1 configs must respect the tighter
    budget they are gated against (a th=32 step-2 scale predicted at 10.2 MB
    OOM'd the real 16 MB scoped limit), and step 4 must keep the validated
    th=8 shipping shape."""
    from grayskull_tpu.kernels.lbp import (_VMEM_BLOCK_BYTES,
                                           _VMEM_BLOCK_BYTES_STEPN,
                                           _VMEM_BLOCK_BYTES_T48_MULTI,
                                           _padded_dims, _stage_chunks,
                                           _vmem_estimate)
    from grayskull_tpu.ops.lbp import _grid_plan

    cas = load_frontalface()
    for step in (1, 2, 3, 4):
        for scale, _, _, ny, nx in _grid_plan(cas, 480, 640, 1.2, 1.0, 4.0, step):
            tw, th, chunks, nty, ntx, Hp, Wp, fits = _padded_dims(
                cas, scale, ny, nx, step)
            if step == 1:
                # r5 ladder: every step-1 640x480 scale holds th=48 strips
                # (3-5 chunks; 242 vs 226 M win/s e2e, exp_lbp_tail2_r5)
                assert th == 48 and fits, (scale, th, fits)
            if step == 4:
                assert th == 8, (scale, th)
            # chained chunks must cover all 20 stages exactly once, in order
            covered = [s for _, stages in chunks for s in stages]
            assert covered == list(range(cas.nstages))
            if fits:
                if step > 1 and th > 8:
                    budget = _VMEM_BLOCK_BYTES_STEPN
                elif th >= 48 and len(chunks) >= 4:
                    # hardware-calibrated boundary: a 10.91 MB prediction
                    # OOM'd at a real 17.30 MB; <= 10.28 MB all compiled
                    budget = _VMEM_BLOCK_BYTES_T48_MULTI
                else:
                    budget = _VMEM_BLOCK_BYTES
                for (geo, _), (_, _, k_lo, k_hi) in zip(
                        chunks, _stage_chunks(cas, len(chunks))):
                    est = _vmem_estimate(geo, th, tw, step, Hp, Wp, k_hi - k_lo)
                    assert est <= budget, (step, scale, est, budget)
    # the r5 tall-tail picks for the bench geometry, pinned exactly
    # (exp/results_lbp_tail_r5.json hardware-validated each)
    picks = {}
    for scale, _, _, ny, nx in _grid_plan(cas, 480, 640, 1.2, 1.0, 4.0, 1):
        _, th, chunks, *_ = _padded_dims(cas, scale, ny, nx, 1)
        picks[round(scale, 3)] = (th, len(chunks))
    assert picks == {1.0: (48, 3), 1.2: (48, 3), 1.44: (48, 3),
                     1.728: (48, 4), 2.074: (48, 4), 2.488: (48, 4),
                     2.986: (48, 4), 3.583: (48, 5)}, picks


def test_warm_start_compiles_detect_path(oracle, testdata):
    """pipelines.warm_start pre-compiles the per-scale executables (thread
    pool) and a subsequent detect_faces hits those caches with unchanged,
    oracle-exact results."""
    from grayskull_tpu.pipelines.faces import warm_start

    img = testdata["lena"]
    h, w = img.shape
    dt = warm_start(h, w, batch=1, max_scale=2.0)
    assert dt >= 0.0
    ours = rects_arr(gs.pipelines.detect_faces(img, max_scale=2.0))
    ii = np.asarray(gs.integral(img))
    ref = oracle.lbp_detect(ii, 100, 1.2, 1.0, 2.0, 1)
    np.testing.assert_array_equal(ours, ref)


def test_lbp_warm_start_empty_ladder():
    """A frame smaller than the cascade window warms (and detects) nothing."""
    from grayskull_tpu.ops.lbp import lbp_warm_start

    cas = load_frontalface()
    assert lbp_warm_start(cas, 16, 16) >= 0.0
    r = lbp_detect(cas, np.zeros((16, 16), np.uint32), 10)
    assert int(r.n) == 0


def test_stage_chunks_back_loaded_cascade():
    """Stage splits where the cumulative weak count only crosses the last
    threshold at the final stage must not emit an empty trailing chunk
    (stage_nweaks=[1, 99] at nchunks=2 used to index stage_weak_start[2])."""
    from types import SimpleNamespace

    from grayskull_tpu.kernels.lbp import _stage_chunks

    def fake(stage_nweaks):
        starts = np.concatenate(([0], np.cumsum(stage_nweaks)[:-1]))
        return SimpleNamespace(
            nweaks=int(np.sum(stage_nweaks)),
            nstages=len(stage_nweaks),
            stage_nweaks=np.asarray(stage_nweaks, np.uint16),
            stage_weak_start=np.asarray(starts, np.uint16),
        )

    for nweaks_per_stage in ([1, 99], [1], [5, 1, 94], [50, 50], [99, 1]):
        cas = fake(nweaks_per_stage)
        for nchunks in (1, 2, 3, 4):
            chunks = _stage_chunks(cas, nchunks)
            assert 1 <= len(chunks) <= nchunks
            # chunks tile the stage range contiguously with no empties
            assert chunks[0][0] == 0 and chunks[-1][1] == cas.nstages
            for (s_lo, s_hi, k_lo, k_hi) in chunks:
                assert s_lo < s_hi and k_lo < k_hi
            for prev, nxt in zip(chunks, chunks[1:]):
                assert prev[1] == nxt[0] and prev[3] == nxt[2]
            assert chunks[0][2] == 0 and chunks[-1][3] == cas.nweaks


def test_lbp_kernel_interpret_custom_cascade():
    """The Pallas cascade kernel (interpret mode, CPU) must match the XLA
    window evaluation for a synthetic non-frontalface cascade — covers the
    plan/chunk machinery for custom OpenCV-style cascades (incl. back-loaded
    stage weights) and the step>1 phase decomposition, none of which the
    frontalface-only TPU tests exercise off-hardware."""
    import jax.numpy as jnp

    from grayskull_tpu.core import LbpCascade
    from grayskull_tpu.kernels.lbp import lbp_eval_scale, lbp_pad_for
    from grayskull_tpu.ops.lbp import _eval_windows_jit

    rng = np.random.default_rng(5)
    feats = np.array([[0, 0, 2, 2], [1, 1, 2, 2], [2, 0, 1, 2]], np.int8)
    nweaks = 4
    cas = LbpCascade(
        window_w=8, window_h=8,
        features=feats,
        weak_feature_idx=np.array([0, 2, 1, 0], np.uint16),
        weak_left_val=rng.uniform(-1, 0, nweaks).astype(np.float32),
        weak_right_val=rng.uniform(0, 1, nweaks).astype(np.float32),
        weak_subset_offset=np.arange(0, 8 * nweaks, 8, dtype=np.uint16),
        weak_num_subsets=np.full(nweaks, 8, np.uint16),
        subsets=rng.integers(-2**31, 2**31, 8 * nweaks, dtype=np.int64)
        .astype(np.int32),
        stage_weak_start=np.array([0, 1], np.uint16),
        stage_nweaks=np.array([1, 3], np.uint16),   # back-loaded split
        stage_threshold=np.array([-0.2, 0.1], np.float32),
    )
    ih, iw = 40, 256
    frames = rng.integers(0, 256, (2, ih, iw), dtype=np.uint8)
    iib = gs.integral(jnp.asarray(frames))
    f = np.float32
    for scale in (1.0, 1.5):
        win = int(f(8) * f(scale))
        for step in (1, 2):
            ny = (ih - win) // step + 1
            nx = (iw - win) // step + 1
            ref = np.asarray(_eval_windows_jit(cas, iib, scale, ny, nx, step))
            iip = lbp_pad_for(cas, iib, [(scale, win, win)], ih, iw, step)
            got = np.asarray(
                lbp_eval_scale(cas, iip, scale, ny, nx, step, interpret=True))
            np.testing.assert_array_equal(
                got, ref, err_msg=f"scale={scale} step={step}")


def test_emit_rects_ladder_matches_concat(rng):
    """The fused per-scale emission must be bit-identical to the
    concat-then-top-k path across sparse/dense/truncating regimes."""
    import jax.numpy as jnp

    from grayskull_tpu.ops.lbp import _emit_rects, _emit_rects_ladder

    nb = 3
    sizes = (1200, 301, 64, 7)  # uneven per-scale window counts
    total = sum(sizes)
    metas = tuple(jnp.asarray(rng.integers(0, 500, total, dtype=np.int32))
                  for _ in range(4))
    for cap, dens in ((50, 0.01), (50, 0.4), (8, 0.9), (2000, 0.05)):
        hits = [jnp.asarray(rng.random((nb, s)) < dens) for s in sizes]
        # force edge patterns: empty scale, full scale, exact boundary hit
        hits[2] = jnp.zeros((nb, sizes[2]), bool)
        hits[3] = jnp.ones((nb, sizes[3]), bool)
        got = _emit_rects_ladder(tuple(hits), *metas, cap)
        want = _emit_rects(jnp.concatenate(hits, axis=1), *metas, cap)
        for f in ("n", "x", "y", "w", "h"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(want, f)),
                err_msg=f"cap={cap} dens={dens} field={f}")
    # single-scale ladder takes the no-concat branch
    hits = [jnp.asarray(rng.random((nb, 500)) < 0.2)]
    got = _emit_rects_ladder(tuple(hits), *metas, 30)
    want = _emit_rects(hits[0], *metas, 30)
    for f in ("n", "x", "y", "w", "h"):
        np.testing.assert_array_equal(np.asarray(getattr(got, f)),
                                      np.asarray(getattr(want, f)), err_msg=f)
