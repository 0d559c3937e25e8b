"""FAST / ORB / matching parity tests vs the C oracle.

The reference's trig output depends on the host libm (grayskull.h:100-101), so the
descriptor-path tests run in ``exact_host`` libm mode (bit-identical by
construction); a separate test asserts the fast on-device mode stays within 1 ulp
on angles and >= 99.9% of descriptor bits.
"""

import numpy as np
import pytest

import grayskull_tpu as gs
from grayskull_tpu.core import Keypoints
from grayskull_tpu.libm32 import use_exact_host_libm


@pytest.fixture()
def exact_libm():
    use_exact_host_libm(True)
    yield
    use_exact_host_libm(False)


def kp_arrays(kps):
    n = int(kps.n)
    return dict(
        n=n,
        xy=np.stack([np.asarray(kps.x)[:n], np.asarray(kps.y)[:n]], 1),
        response=np.asarray(kps.response)[:n],
        angle=np.asarray(kps.angle)[:n],
        descriptor=np.asarray(kps.descriptor)[:n],
    )


@pytest.mark.parametrize("thr", [0, 5, 20, 60, 200])
def test_fast_parity(oracle, testdata, thr):
    img = testdata["lena"]
    ref = oracle.fast(img, 5000, thr)
    kps, score = gs.ops.fast(img, 5000, thr)
    d = kp_arrays(kps)
    np.testing.assert_array_equal(np.asarray(score), ref["scoremap"])
    assert d["n"] == ref["n"]
    np.testing.assert_array_equal(d["xy"], ref["xy"].astype(np.int64))
    np.testing.assert_array_equal(d["response"], ref["response"].astype(np.int64))


def test_fast_cap_truncation(oracle, testdata):
    img = testdata["lena"]
    ref = oracle.fast(img, 50, 10)
    kps, _ = gs.ops.fast(img, 50, 10)
    d = kp_arrays(kps)
    assert d["n"] == ref["n"] == 50
    np.testing.assert_array_equal(d["xy"], ref["xy"].astype(np.int64))


def test_fast_random_parity(oracle, rng):
    for _ in range(3):
        img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
        ref = oracle.fast(img, 3000, 15)
        kps, score = gs.ops.fast(img, 3000, 15)
        d = kp_arrays(kps)
        np.testing.assert_array_equal(np.asarray(score), ref["scoremap"])
        assert d["n"] == ref["n"]
        np.testing.assert_array_equal(d["xy"], ref["xy"].astype(np.int64))


def test_orb_extract_parity_exact(oracle, testdata, exact_libm):
    img = testdata["lena"]
    for nk, thr in [(100, 10), (500, 20), (2500, 20)]:
        ours = kp_arrays(gs.ops.orb_extract(img, nk, thr))
        ref = oracle.orb_extract(img, nk, thr)
        assert ours["n"] == ref["n"]
        np.testing.assert_array_equal(ours["xy"], ref["xy"].astype(np.int64))
        np.testing.assert_array_equal(ours["response"], ref["response"].astype(np.int64))
        np.testing.assert_array_equal(
            ours["angle"].view(np.uint32), ref["angle"].view(np.uint32)
        )
        np.testing.assert_array_equal(ours["descriptor"].astype(np.uint32), ref["descriptor"])


def test_orb_fast_mode_close(oracle, testdata):
    """Default on-device trig: angles within 1 ulp, descriptors >=99.9% of bits."""
    img = testdata["lena"]
    ours = kp_arrays(gs.ops.orb_extract(img, 500, 20))
    ref = oracle.orb_extract(img, 500, 20)
    assert ours["n"] == ref["n"]
    np.testing.assert_array_equal(ours["xy"], ref["xy"].astype(np.int64))
    # angles within 1 ulp
    a, b = ours["angle"], ref["angle"]
    ulp = np.maximum(np.abs(np.spacing(b)), 1e-45)
    assert (np.abs(a - b) <= ulp + 1e-30).all()
    # descriptor bits nearly identical
    diff = np.bitwise_xor(ours["descriptor"].astype(np.uint32), ref["descriptor"])
    bad_bits = sum(bin(int(v)).count("1") for v in diff.ravel())
    total_bits = ours["n"] * 256
    assert bad_bits <= total_bits * 0.001, f"{bad_bits}/{total_bits} descriptor bits differ"


def test_match_orb_parity(oracle, testdata, exact_libm):
    img1 = testdata["lena"]
    img2 = testdata["lena"][::-1, ::-1].copy()
    o1 = oracle.orb_extract(img1, 500, 20)
    o2 = oracle.orb_extract(img2, 500, 20)

    def mk(o, cap=512):
        d = np.zeros((cap, 8), np.uint32)
        d[: o["n"]] = o["descriptor"]
        import jax.numpy as jnp

        return Keypoints(
            n=jnp.int32(o["n"]),
            x=jnp.zeros(cap, jnp.int32), y=jnp.zeros(cap, jnp.int32),
            response=jnp.zeros(cap, jnp.int32), angle=jnp.zeros(cap, jnp.float32),
            descriptor=jnp.asarray(d),
        )

    for mm, md in [(300, 60.0), (10, 60.0), (300, 5.0), (300, 256.0)]:
        ref = oracle.match_orb(o1["descriptor"], o2["descriptor"], mm, md)
        m = gs.ops.match_orb(mk(o1), mk(o2), mm, md)
        n = int(m.n)
        ours = np.stack(
            [np.asarray(m.idx1)[:n], np.asarray(m.idx2)[:n], np.asarray(m.distance)[:n]], 1
        )
        assert n == len(ref), f"mm={mm} md={md}: {n} vs {len(ref)}"
        np.testing.assert_array_equal(ours, ref.astype(np.int64))


def test_match_orb_single_candidate(oracle):
    """n2=1: second_best stays at max_distance+1 (sentinel bookkeeping)."""
    rng = np.random.default_rng(5)
    d1 = rng.integers(0, 2**32, (4, 8), dtype=np.uint32)
    d2 = d1[:1] ^ np.uint32(1)  # distance 1 from d1[0]
    import jax.numpy as jnp

    def mk(d, n):
        cap = len(d)
        return Keypoints(
            n=jnp.int32(n), x=jnp.zeros(cap, jnp.int32), y=jnp.zeros(cap, jnp.int32),
            response=jnp.zeros(cap, jnp.int32), angle=jnp.zeros(cap, jnp.float32),
            descriptor=jnp.asarray(d),
        )

    for md in (0.5, 1.0, 2.0, 60.0):
        ref = oracle.match_orb(d1, d2, 10, md)
        m = gs.ops.match_orb(mk(d1, 4), mk(d2, 1), 10, md)
        n = int(m.n)
        ours = np.stack(
            [np.asarray(m.idx1)[:n], np.asarray(m.idx2)[:n], np.asarray(m.distance)[:n]], 1
        )
        assert n == len(ref)
        np.testing.assert_array_equal(ours, ref.astype(np.int64))


def test_orb_extract_batched(testdata):
    img = testdata["lena"]
    batch = np.stack([img, img[::-1, ::-1].copy()])
    kb = gs.ops.orb_extract(batch, 100, 20)
    for i in range(2):
        single = gs.ops.orb_extract(batch[i], 100, 20)
        assert int(np.asarray(kb.n)[i]) == int(single.n)
        np.testing.assert_array_equal(np.asarray(kb.x)[i], np.asarray(single.x))
        np.testing.assert_array_equal(np.asarray(kb.descriptor)[i],
                                      np.asarray(single.descriptor))


def test_hamming_distance():
    d1 = np.zeros((1, 8), np.uint32)
    d2 = np.full((1, 8), 0xFFFFFFFF, np.uint32)
    assert int(gs.ops.hamming_distance(d1, d2)[0, 0]) == 256
    assert int(gs.ops.hamming_distance(d1, d1)[0, 0]) == 0


def ref_pyramid(oracle, img, nkps, threshold, n_levels):
    """Replicates extract_pyramid_orb_nm (nanomagick.c:245-290) via oracle calls."""
    levels = [img]
    for _ in range(1, min(n_levels, 4)):
        prev = levels[-1]
        h, w = prev.shape[0] // 2, prev.shape[1] // 2
        if h < 32 or w < 32:
            break
        levels.append(oracle.downsample(prev))
    out = []
    total = 0
    nlv = len(levels)
    for lvl, im in enumerate(levels):
        budget = nkps // nlv if lvl < nlv - 1 else nkps - total
        if budget == 0:
            continue
        r = oracle.orb_extract(im, budget, threshold)
        scale = 1 << lvl
        for i in range(r["n"]):
            out.append(
                (r["xy"][i, 0] * scale, r["xy"][i, 1] * scale, r["response"][i],
                 r["angle"][i], tuple(r["descriptor"][i]))
            )
        total += r["n"]
    return out


@pytest.mark.parametrize("nkps,thr,nlv", [(2500, 20, 3), (90, 20, 3), (300, 10, 4)])
def test_pyramid_orb_parity(oracle, testdata, exact_libm, nkps, thr, nlv):
    img = testdata["aruco"]
    ref = ref_pyramid(oracle, img, nkps, thr, nlv)
    ours = kp_arrays(gs.pipelines.extract_pyramid_orb(img, nkps, thr, nlv))
    assert ours["n"] == len(ref)
    for i, (x, y, resp, ang, desc) in enumerate(ref):
        assert (ours["xy"][i] == (x, y)).all(), i
        assert ours["response"][i] == resp
        assert np.float32(ours["angle"][i]).view(np.uint32) == np.float32(ang).view(np.uint32)
        assert tuple(ours["descriptor"][i].astype(np.uint32)) == desc


def test_track_aruco(oracle, testdata, exact_libm):
    """Config #4: two-frame tracking on aruco — matches bit-exact vs C chain."""
    scene = testdata["aruco"]
    tmpl = scene[100:350, 150:450].copy()  # 250x300 template >= 32px levels
    tk, sk, m = gs.pipelines.track(tmpl, scene)
    rt = ref_pyramid(oracle, tmpl, 2500, 20, 3)
    rs = ref_pyramid(oracle, scene, 2500, 20, 3)
    rd1 = np.array([d for *_, d in rt], np.uint32).reshape(-1, 8)
    rd2 = np.array([d for *_, d in rs], np.uint32).reshape(-1, 8)
    ref_m = oracle.match_orb(rd1, rd2, 300, 60.0)
    n = int(m.n)
    ours = np.stack(
        [np.asarray(m.idx1)[:n], np.asarray(m.idx2)[:n], np.asarray(m.distance)[:n]], 1
    )
    assert n == len(ref_m)
    np.testing.assert_array_equal(ours, ref_m.astype(np.int64))


def test_track_same_shape_batches_pair(testdata):
    """track() on same-shape frames takes the stacked batch-2 pyramid path —
    results must equal the per-frame pyramid extractions."""
    scene = testdata["aruco"][:240, :320].copy()
    tmpl = np.roll(scene, 7, axis=1)
    tk, sk, m = gs.pipelines.track(tmpl, scene, max_kps=400)
    want_t = gs.pipelines.extract_pyramid_orb(tmpl, 400, 20)
    want_s = gs.pipelines.extract_pyramid_orb(scene, 400, 20)
    for got, want in ((tk, want_t), (sk, want_s)):
        for f, g_v, w_v in zip(got._fields, got, want):
            np.testing.assert_array_equal(np.asarray(g_v), np.asarray(w_v),
                                          err_msg=f)


from tests.conftest import tpu_default as _tpu_default  # noqa: E402


@pytest.mark.tpu
@pytest.mark.skipif(not _tpu_default(), reason="fused FAST kernel needs TPU")
def test_fast_pallas_matches_xla(testdata):
    """The fused Pallas FAST kernel (scoremap + NMS + packed keys) must be
    bit-exact vs the XLA formulation, including the wraparound quirks."""
    import jax

    from grayskull_tpu.ops.features import fast, fast_scoremap
    from grayskull_tpu.kernels.fast import fast_pallas

    img = testdata["aruco"]
    for thr in (5, 20, 80):
        s_ref = np.asarray(fast_scoremap(img, thr))
        s_p, _ = fast_pallas(img[None], thr)
        np.testing.assert_array_equal(np.asarray(s_p)[0], s_ref, err_msg=f"thr={thr}")
    # other gated geometries (blk selection varies) + batched path
    for key, hw in (("lena", None), ("grayskull", (256, 512))):
        im2 = testdata[key]
        if hw is not None:
            im2 = im2[: hw[0], : hw[1]].copy()
        s_ref = np.asarray(fast_scoremap(im2, 20))
        s_p, _ = fast_pallas(im2[None], 20)
        np.testing.assert_array_equal(np.asarray(s_p)[0], s_ref, err_msg=key)
    both = np.stack([np.asarray(testdata["aruco"])] * 2)
    s2, _ = fast_pallas(both, 20)
    np.testing.assert_array_equal(np.asarray(s2)[0], np.asarray(s2)[1])
    kps, score = fast(img, 2000, 20)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        kps_c, score_c = fast(jax.device_put(img, cpu), 2000, 20)
    np.testing.assert_array_equal(np.asarray(score), np.asarray(score_c))
    for f in ("n", "x", "y", "response"):
        np.testing.assert_array_equal(
            np.asarray(getattr(kps, f)), np.asarray(getattr(kps_c, f)), err_msg=f
        )


def test_fast_pallas_row_padding_interpret(testdata):
    """Awkward heights (no divisor block) run the FAST kernel via zero row
    padding; interpret mode on CPU checks score map AND packed NMS keys are
    bit-exact vs the XLA formulation.  Pad rows are inert: the interior mask
    uses the real h, so they score 0 and emit no keys."""
    import jax.numpy as jnp

    from grayskull_tpu.kernels.fast import fast_pallas, fast_pallas_available
    from grayskull_tpu.ops.features import fast_scoremap

    img = np.asarray(testdata["aruco"])[:97]  # 97 rows: no divisor block
    h, w = img.shape
    assert fast_pallas_available(h, w)
    for thr in (5, 20):
        s_p, k_p = fast_pallas(jnp.asarray(img)[None], thr, interpret=True)
        s_ref = np.asarray(fast_scoremap(jnp.asarray(img), thr))
        np.testing.assert_array_equal(np.asarray(s_p)[0], s_ref, err_msg=f"thr={thr}")
        # XLA key construction (the fast() else-branch semantics)
        s = s_ref.astype(np.int32)
        sp = np.pad(s, 1)
        is_max = s > 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                is_max &= ~(sp[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w] > s)
        idx = np.arange(h * w, dtype=np.int32).reshape(h, w)
        k_ref = np.where(is_max, ((h * w - idx) << 8) | s, 0)
        np.testing.assert_array_equal(np.asarray(k_p)[0], k_ref, err_msg=f"keys thr={thr}")


def test_brief_oob_keypoints_match_scalar_path(testdata):
    """Batched rBRIEF must equal the scalar gs_get-parity path even for
    keypoints outside the C border contract (ADVICE r2 #1): the patch-offset
    correction turns OOB samples into zero reads, like gs_get."""
    import jax
    import jax.numpy as jnp

    from grayskull_tpu.ops.features import _brief_single, brief_descriptor

    img = jnp.asarray(testdata["lena"])  # 128x128
    h, w = img.shape
    xs = np.array([-30, -10, 0, 5, 64, w - 1, w + 4, w + 60], np.int32)
    ys = np.array([-25, 40, -3, h + 2, 64, h - 1, h + 30, -1], np.int32)
    angles = np.linspace(-3.0, 3.0, len(xs)).astype(np.float32)
    batched = np.asarray(brief_descriptor(img, xs, ys, angles))
    scalar = np.stack([
        np.asarray(_brief_single(img, jnp.int32(x), jnp.int32(y), jnp.float32(a)))
        for x, y, a in zip(xs, ys, angles)
    ])
    np.testing.assert_array_equal(batched, scalar)


def test_fast_negative_threshold_clamped(testdata):
    """C's threshold is `unsigned` (grayskull.h:482); negative inputs are
    clamped to 0 so the XLA and Pallas paths cannot diverge (ADVICE r2 #3)."""
    img = testdata["lena"]
    kn, sn = gs.ops.fast(img, 500, -7)
    k0, s0 = gs.ops.fast(img, 500, 0)
    np.testing.assert_array_equal(np.asarray(sn), np.asarray(s0))
    assert int(kn.n) == int(k0.n)


@pytest.mark.tpu
@pytest.mark.skipif(not _tpu_default(), reason="Pallas patch kernel needs TPU")
def test_orb_patch_kernel_matches_cpu(testdata):
    """orb_extract through the Pallas patch extractor (kernels/patches.py)
    must equal the CPU XLA path bit-for-bit, batch and single — r3."""
    import jax
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]
    scene = testdata["aruco"]
    batch = jnp.asarray(np.stack([scene, np.roll(scene, 5, axis=1)]))
    got = gs.ops.orb_extract(batch, 300, 20)
    g1 = gs.ops.orb_extract(jnp.asarray(scene), 300, 20)
    with jax.default_device(cpu):
        ref = gs.ops.orb_extract(jax.device_put(batch, cpu), 300, 20)
    for f in ("n", "x", "y", "response", "angle", "descriptor"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)), err_msg=f
        )
        np.testing.assert_array_equal(
            np.asarray(getattr(g1, f)), np.asarray(getattr(ref, f))[0], err_msg=f
        )


def test_orb_candidate_selection_paths_agree(testdata, rng):
    """The TPU selection (_select_candidates_approx — exact approx_max_k on
    packed response|inverse-rank keys) must equal the reference stable-sort
    formulation on every table field, including response ties, border
    rejections, and partially-valid tables.  approx_max_k with
    recall_target=1.0 is exact on CPU too, so this pins the semantics; the
    f32-exactness of the < 2^20 keys covers the TPU lowering."""
    import jax.numpy as jnp

    from grayskull_tpu.ops.features import (_select_candidates_approx,
                                            _select_candidates_sort, fast)

    scene = testdata["aruco"]
    h, w = scene.shape
    kps, _ = fast(jnp.asarray(scene), 2000, 20)
    for n_cand in (2000, 137, 0):
        valid = jnp.arange(2000) < n_cand
        for cap in (500, 2000, 7):
            a = _select_candidates_sort(kps, valid, cap, 15, h, w)
            b = _select_candidates_approx(kps, valid, cap, 15, h, w)
            for fa, fb, name in zip(a, b, ("n", "x", "y", "r")):
                np.testing.assert_array_equal(
                    np.asarray(fa), np.asarray(fb),
                    err_msg=f"{name} n_cand={n_cand} cap={cap}")
    # heavy ties: random low-entropy responses
    flat = Keypoints(
        n=jnp.int32(300),
        x=jnp.asarray(rng.integers(0, w, 300, dtype=np.int32)),
        y=jnp.asarray(rng.integers(0, h, 300, dtype=np.int32)),
        response=jnp.asarray(rng.integers(20, 23, 300, dtype=np.int32)),
        angle=jnp.zeros(300, jnp.float32),
        descriptor=jnp.zeros((300, 8), jnp.uint32),
    )
    valid = jnp.arange(300) < 251
    a = _select_candidates_sort(flat, valid, 100, 15, h, w)
    b = _select_candidates_approx(flat, valid, 100, 15, h, w)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
    # full 5000-candidate budget (orb_extract with max_kps >= 1250): the rank
    # field must hold ranks > 4095 without spilling into the response bits —
    # a 12-bit pack ranked a (response 10, rank 4900) candidate ABOVE a
    # (response 11, rank 1) one
    cand_cap = 5000
    wide = Keypoints(
        n=jnp.int32(cand_cap),
        x=jnp.asarray(rng.integers(20, w - 20, cand_cap, dtype=np.int32)),
        y=jnp.asarray(rng.integers(20, h - 20, cand_cap, dtype=np.int32)),
        response=jnp.asarray(rng.integers(0, 256, cand_cap, dtype=np.int32)),
        angle=jnp.zeros(cand_cap, jnp.float32),
        descriptor=jnp.zeros((cand_cap, 8), jnp.uint32),
    )
    valid = jnp.arange(cand_cap) < cand_cap
    for cap in (2000, 4200):
        a = _select_candidates_sort(wide, valid, cap, 15, h, w)
        b = _select_candidates_approx(wide, valid, cap, 15, h, w)
        for fa, fb, name in zip(a, b, ("n", "x", "y", "r")):
            np.testing.assert_array_equal(
                np.asarray(fa), np.asarray(fb), err_msg=f"{name} cap={cap}")


def test_patches_kernel_interpret_edge_keypoints():
    """kernels/patches.py (interpret mode, CPU) == the XLA _extract_patches
    contract — patch(r,c) = img[y-20+r, x-20+c] with zeros outside — for
    keypoints at the frame corners/edges where the aligned-window slicing
    and the zero padding interact, plus random interior points."""
    import jax.numpy as jnp

    from grayskull_tpu.kernels.patches import extract_patches_batched
    from grayskull_tpu.ops.features import _extract_patches

    rng = np.random.default_rng(11)
    h, w = 64, 200
    imgs = rng.integers(0, 256, (2, h, w), dtype=np.uint8)
    edge = [(0, 0), (w - 1, 0), (0, h - 1), (w - 1, h - 1),
            (w // 2, 0), (0, h // 2), (w - 1, h // 2), (w // 2, h - 1),
            (19, 19), (20, 20), (w - 20, h - 20)]
    xs = np.array([p[0] for p in edge]
                  + rng.integers(0, w, 53).tolist(), np.int32)
    ys = np.array([p[1] for p in edge]
                  + rng.integers(0, h, 53).tolist(), np.int32)
    xb = jnp.asarray(np.stack([xs, xs[::-1]]))
    yb = jnp.asarray(np.stack([ys, ys[::-1]]))
    got = np.asarray(extract_patches_batched(
        jnp.asarray(imgs), xb, yb, interpret=True))
    for i in range(2):
        ref = np.asarray(_extract_patches(
            jnp.asarray(imgs[i]), xb[i], yb[i]))
        np.testing.assert_array_equal(got[i], ref, err_msg=f"frame {i}")



def test_emit_packed_batched_matches_topk(rng):
    """_emit_packed_batched (the adaptive-k TPU emission) is pure XLA but the
    _on_tpu gate keeps the CPU suite off it — exercise every branch of its
    ladder directly against lax.top_k ground truth: sparse counts (amk k=512
    branch), mid (1024), dense (the capped-2048 / top_k fallback branch),
    exact ties in the score byte, and k_out values straddling the 512/1024/
    2048 branch points (ADVICE r4)."""
    import jax
    import jax.numpy as jnp

    from grayskull_tpu.ops.features import _emit_packed_batched

    L = 40960  # h*w of a small frame; < 2^23 like every packed-key caller
    for k_out in (7, 500, 512, 600, 1024, 1500, 2048, 3000):
        for counts in ((3, 0), (400, 511), (513, 80), (1025, 999),
                       (2049, 2500), (4000, 1)):
            keys = np.zeros((2, L), np.int32)
            for b, cnt in enumerate(counts):
                cnt = min(cnt, L)
                pos = rng.choice(L, size=cnt, replace=False)
                scores = rng.integers(0, 256, size=cnt)
                scores[: cnt // 2] = 37  # heavy exact ties in the score byte
                keys[b, pos] = ((L - pos.astype(np.int64)) << 8) | scores
            got = np.asarray(_emit_packed_batched(jnp.asarray(keys), k_out))
            want = np.asarray(jax.lax.top_k(jnp.asarray(keys), k_out)[0])
            np.testing.assert_array_equal(
                got, want, err_msg=f"k_out={k_out} counts={counts}")


def test_fast_compact_fold_invariants(testdata, rng):
    """fast_pallas_compact's folded map (interpret mode): when no strip
    reports a fold loss, the reduced map holds EXACTLY the full key map's
    nonzero keys (as a multiset — emission over either is identical); with
    losses, nnz(red) == nnz(key) - lost and red's keys are a subset.  Runs
    real frames (expected loss-free) plus a dense synthetic frame that
    forces collisions down the residual chain."""
    import jax.numpy as jnp

    from grayskull_tpu.kernels.fast import fast_pallas_compact

    frames = [
        testdata["aruco"],
        testdata["lena"],
        np.asarray(testdata["document"])[:480, :640],
        # dense worst case: high-frequency noise -> many survivors
        rng.integers(0, 256, (480, 640), dtype=np.uint8),
        # tie-heavy: binary checkerboard with period 2 (every corner ties)
        (np.indices((480, 640)).sum(0) % 2 * 255).astype(np.uint8),
    ]
    saw_loss = False
    for fi, img in enumerate(frames):
        h, w = img.shape
        _, key, red, lost = fast_pallas_compact(
            jnp.asarray(img)[None], 10, interpret=True)
        key = np.asarray(key[0])
        red = np.asarray(red[0])
        lost = int(np.asarray(lost).sum())
        full_keys = np.sort(key[key > 0])
        red_keys = np.sort(red[red > 0])
        assert red_keys.size == full_keys.size - lost, f"frame {fi}"
        assert np.isin(red_keys, full_keys).all(), f"frame {fi}"
        if lost == 0:
            np.testing.assert_array_equal(red_keys, full_keys,
                                          err_msg=f"frame {fi}")
        else:
            saw_loss = True
        # the gated emission is bit-exact either way (cond falls back)
        from grayskull_tpu.ops.features import (_emit_compact_gated,
                                                _emit_packed_batched)
        got = np.asarray(_emit_compact_gated(
            jnp.asarray(key)[None], jnp.asarray(red)[None],
            jnp.asarray([[[lost]]], dtype=jnp.int32), 2000))
        want = np.asarray(_emit_packed_batched(
            jnp.asarray(key.reshape(1, -1)), 2000))
        np.testing.assert_array_equal(got, want, err_msg=f"frame {fi}")
    assert saw_loss, "no frame exercised the fallback branch"
    # the shifted fold must keep the headline benchmark frame loss-free
    # (aruco's vertically periodic marker corners defeated the unshifted
    # fold — 5 lost keys)
    _, _, _, lost = fast_pallas_compact(
        jnp.asarray(np.asarray(testdata["aruco"]))[None], 10, interpret=True)
    assert int(np.asarray(lost).sum()) == 0, "aruco must not fall back"


def test_fast_lean_batched_path_interpret(testdata, rng):
    """The r5 lean kernel (fast_pallas_lean: folded keys only, no full-frame
    outputs) must agree with fast_pallas_compact's fold, and the batched ORB
    emission built on it (_fast_batched_tpu's cond: red when loss-free, full
    kernel re-run otherwise) must reproduce the XLA fast() tables on both a
    loss-free frame (aruco) and a fold-lossy one (noise)."""
    import jax
    import jax.numpy as jnp

    from grayskull_tpu.kernels.fast import (fast_pallas, fast_pallas_compact,
                                            fast_pallas_lean)
    from grayskull_tpu.ops.features import (_emit_packed_batched,
                                            _fast_table_from_vals, fast)

    aruco = np.asarray(testdata["aruco"])
    noise = rng.integers(0, 256, aruco.shape, dtype=np.uint8)
    cap = 500
    for img, name in ((aruco, "aruco"), (noise, "noise")):
        h, w = img.shape
        b = jnp.asarray(img)[None]
        red_l, lost_l = fast_pallas_lean(b, 10, interpret=True)
        _, key_c, red_c, lost_c = fast_pallas_compact(b, 10, interpret=True)
        np.testing.assert_array_equal(np.asarray(red_l), np.asarray(red_c),
                                      err_msg=name)
        np.testing.assert_array_equal(np.asarray(lost_l), np.asarray(lost_c),
                                      err_msg=name)
        # emulate _fast_batched_tpu's gating with interpret-mode kernels
        B, L = 1, h * w
        Lr = red_l.shape[1] * red_l.shape[2]
        k_out = min(cap, L)
        k_red = min(k_out, Lr)

        def emit_red():
            v = _emit_packed_batched(red_l.reshape(B, Lr), k_red)
            if k_out > k_red:
                v = jnp.pad(v, ((0, 0), (0, k_out - k_red)))
            return v

        def emit_full():
            _, key3 = fast_pallas(b, 10, interpret=True)
            return _emit_packed_batched(key3.reshape(B, L), k_out)

        vals = jax.lax.cond(jnp.sum(lost_l) == 0, emit_red, emit_full)
        n, tx, ty, tr = _fast_table_from_vals(vals, h, w)
        kps, _ = fast(jnp.asarray(img), cap, 10)
        nk = int(np.asarray(kps.n))
        assert int(np.asarray(n)[0]) == nk, name
        np.testing.assert_array_equal(np.asarray(tx)[0, :nk],
                                      np.asarray(kps.x)[:nk], err_msg=name)
        np.testing.assert_array_equal(np.asarray(ty)[0, :nk],
                                      np.asarray(kps.y)[:nk], err_msg=name)
        np.testing.assert_array_equal(np.asarray(tr)[0, :nk],
                                      np.asarray(kps.response)[:nk],
                                      err_msg=name)
