#!/usr/bin/env python3
"""Full benchmark suite: every BASELINE.json metric, with C-reference comparison.

Measures on the default JAX backend (TPU when available):

1. fused blur(2) -> Otsu -> threshold -> sobel throughput (1MP frames/sec)
2. ORB extraction (keypoints/sec on 640x480)
3. LBP cascade detection (windows/sec on 640x480, full scale ladder)
4. document scanner end-to-end latency
5. single-op throughputs (blur, sobel, histogram, integral)

When the reference checkout + compiler are present, the same workloads run
through the C oracle for a single-core comparison column.

Run: ``python benchmarks/bench_all.py [--quick]``; writes benchmarks/results.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import grayskull_tpu as gs  # noqa: E402
from grayskull_tpu.cascade import load_frontalface  # noqa: E402
from grayskull_tpu.ops.lbp import lbp_detect, scale_ladder  # noqa: E402
from grayskull_tpu.pipelines.preproc import preprocess  # noqa: E402
from grayskull_tpu.profiling import timeit  # noqa: E402


def load_oracle():
    sys.path.insert(0, os.path.join(HERE, ".."))
    try:
        from tests import oracle as om

        return om.load(os.environ.get("GRAYSKULL_REF", "/root/reference"))
    except Exception:
        return None


def tile_frame(h, w):
    ref = os.environ.get("GRAYSKULL_REF", "/root/reference")
    p = os.path.join(ref, "testdata", "lena.pgm")
    if os.path.exists(p):
        t = gs.io.read_pgm(p)
        reps = (-(-h // t.shape[0]), -(-w // t.shape[1]))
        return np.tile(t, reps)[:h, :w]
    return np.random.default_rng(0).integers(0, 256, (h, w), dtype=np.uint8)


# v5e HBM bandwidth spec-sheet value, kept for reference only; the roofline
# column divides by the MEASURED achievable bandwidth below (VERDICT r2 #1)
HBM_SPEC_GBPS = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    on_tpu = jax.default_backend() == "tpu"
    iters = 3 if args.quick else 20
    results = {"backend": jax.default_backend(), "device": str(jax.devices()[0])}
    orc = load_oracle()

    # measured achievable HBM bandwidth: the honest roofline denominator
    from grayskull_tpu.profiling import hbm_bandwidth_gbps

    bw = hbm_bandwidth_gbps()
    hbm_gbps = bw.get("triad_gbps", HBM_SPEC_GBPS)
    results["hbm_spec_gbps"] = HBM_SPEC_GBPS
    for k, v in bw.items():
        results[f"hbm_measured_{k}"] = v

    def record(key, dt, frames, bytes_per_frame=None):
        """Throughput + latency (+ GB/s and roofline % of the MEASURED
        achievable bandwidth when app-level bytes/frame are known)."""
        results[f"{key}_fps"] = frames / dt
        results[f"{key}_latency_ms"] = dt / frames * 1e3
        if bytes_per_frame is not None:
            gbps = frames * bytes_per_frame / dt / 1e9
            results[f"{key}_gbps"] = gbps
            results[f"{key}_hbm_roofline_pct"] = 100.0 * gbps / hbm_gbps

    # 1. fused preprocess, 1MP frames (large batch amortizes dispatch overhead)
    n = (256 if on_tpu else 2) if not args.quick else (16 if on_tpu else 2)
    frame = tile_frame(1024, 1024)
    batch = jnp.asarray(np.stack([np.roll(frame, 13 * i, axis=1) for i in range(n)]))
    dt = timeit(preprocess, batch, iters=iters)
    results["preprocess_1MP_fps"] = n / dt
    # app-level bytes: read frame + write blurred + read blurred + write
    # binary + write edges = 5 B/pixel (halo tensors add ~6%)
    record("preprocess_1MP", dt, n, bytes_per_frame=5 * 1024 * 1024)
    if orc:
        t0 = time.perf_counter()
        b = orc.blur(frame, 2)
        tt = orc.otsu(b)
        bn = orc.threshold(b, tt)
        orc.sobel(bn)
        results["preprocess_1MP_fps_c_reference"] = 1 / (time.perf_counter() - t0)

    # 2. ORB extraction on 640x480 (single-frame latency + batched throughput)
    scene = tile_frame(480, 640)
    dt = timeit(lambda im: gs.ops.orb_extract(im, 500, 20), jnp.asarray(scene), iters=iters, repeat=3)
    kps = gs.ops.orb_extract(jnp.asarray(scene), 500, 20)
    nk = int(kps.n)
    results["orb_extract_640x480_fps"] = 1 / dt
    if on_tpu:
        ob = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1) for i in range(16)]))
        dtb = timeit(lambda b: gs.ops.orb_extract(b, 500, 20), ob, iters=iters, repeat=3)
        results["orb_keypoints_per_sec"] = 16 * nk / dtb
    else:
        results["orb_keypoints_per_sec"] = nk / dt
    if orc:
        t0 = time.perf_counter()
        c_out = orc.orb_extract(scene, 500, 20)
        c_dt = time.perf_counter() - t0
        # rate from the C extraction's own keypoint count (can differ from ours)
        results["orb_keypoints_per_sec_c_reference"] = c_out["n"] / c_dt

    # 3. LBP detection on 640x480, full ladder, step 1 (batch 32 amortizes
    # the per-scale kernel launches; per-frame work is batch-invariant)
    casc = load_frontalface()
    nb = 32 if on_tpu else 1
    fb = np.stack([np.roll(scene, 7 * i, axis=1) for i in range(nb)])
    iib = jnp.asarray(np.asarray(gs.integral(fb)))
    lad = scale_ladder(casc, 640, 480, 1.2, 1.0, 4.0)
    nwin = sum(((480 - wh) // 1 + 1) * ((640 - ww) // 1 + 1) for _, ww, wh in lad)
    dt = timeit(lambda x: lbp_detect(casc, x, 100, 1.2, 1.0, 4.0, 1), iib, iters=iters, repeat=3)
    results["lbp_windows_per_sec"] = nb * nwin / dt
    results["lbp_640x480_fps"] = nb / dt
    if orc:
        ii1 = np.asarray(gs.integral(scene))
        t0 = time.perf_counter()
        orc.lbp_detect(ii1, 100, 1.2, 1.0, 4.0, 1)
        results["lbp_windows_per_sec_c_reference"] = nwin / (time.perf_counter() - t0)

    # 4. document scanner
    ref = os.environ.get("GRAYSKULL_REF", "/root/reference")
    doc_path = os.path.join(ref, "testdata", "document.pgm")
    if os.path.exists(doc_path):
        doc = gs.io.read_pgm(doc_path)
        dt = timeit(lambda im: gs.pipelines.scan(im), jnp.asarray(doc), iters=iters, repeat=3)
        results["document_scan_latency_ms"] = dt * 1e3
        if on_tpu:
            db = jnp.asarray(np.stack([np.roll(doc, 3 * i, axis=1) for i in range(8)]))
            dtb = timeit(lambda b: gs.pipelines.scan(b), db, iters=iters, repeat=3)
            results["document_scan_batched_fps"] = 8 / dtb
            # CCL convergence depth (serpentine sweeps of the Pallas kernel)
            from grayskull_tpu.kernels.ccl import ccl_serpentine
            from grayskull_tpu.pipelines.scan import preprocess_binarize

            binary = np.asarray(preprocess_binarize(jnp.asarray(doc)))
            h, w = binary.shape
            hp, wp = -(-h // 8) * 8, -(-w // 128) * 128
            L0 = np.full((hp, wp), 2**30, np.int32)
            idx = np.arange(h * w, dtype=np.int32).reshape(h, w)
            L0[:h, :w] = np.where(binary >= 128, idx, 2**30)
            _, sweeps = ccl_serpentine(jnp.asarray(L0[None]))
            results["document_ccl_sweeps"] = int(sweeps)

    # 4b. BASELINE config #2: receipt adaptive threshold + morphology cleanup
    rec_path = os.path.join(ref, "testdata", "receipt.pgm")
    if os.path.exists(rec_path):
        rec = gs.io.read_pgm(rec_path)
        nb2 = (64 if on_tpu else 2) if args.quick else (256 if on_tpu else 2)
        rb = jnp.asarray(np.stack([np.roll(rec, 5 * i, axis=1) for i in range(nb2)]))

        @jax.jit
        def adaptive_morph(x):
            return gs.erode(gs.dilate(gs.adaptive_threshold(x, 15, 5)))

        dt = timeit(adaptive_morph, rb, iters=iters)
        results["adaptive_morph_816x612_fps"] = nb2 / dt
        # odd geometry (612 % 128 != 0) exercises the stencil-composed
        # preprocess middle tier (row-padded blur/sobel + XLA otsu)
        dt = timeit(lambda x: gs.pipelines.preprocess(x), rb, iters=iters)
        results["preprocess_816x612_fps"] = nb2 / dt
        if orc:
            t0 = time.perf_counter()
            orc.erode(orc.dilate(orc.adaptive_threshold(rec, 15, 5)))
            results["adaptive_morph_816x612_fps_c_reference"] = 1 / (time.perf_counter() - t0)

    # 4c. BASELINE config #4: two-frame ORB tracking (extract x2 + match).
    # aruco.pgm per BASELINE.json — the tiled-lena frame is self-similar and
    # the Lowe ratio test rejects every match on it.
    aruco_path = os.path.join(ref, "testdata", "aruco.pgm")
    track_src = gs.io.read_pgm(aruco_path) if os.path.exists(aruco_path) else scene
    tmpl = jnp.asarray(track_src)
    scene2 = jnp.asarray(np.roll(track_src, 9, axis=1))

    @jax.jit
    def track_pair(a, b):
        ks = gs.ops.orb_extract(jnp.stack([a, b]), 500, 20)  # one batch-2 pass
        k1 = type(ks)(*(v[0] for v in ks))
        k2 = type(ks)(*(v[1] for v in ks))
        # cap 500 == the keypoint budget, so the match count can never
        # saturate the table (r2: a 200 cap hid match-quality regressions)
        return gs.ops.match_orb(k1, k2, 500, 64)

    m = track_pair(tmpl, scene2)
    dt = timeit(track_pair, tmpl, scene2, iters=iters)
    results["orb_track_pair_fps"] = 1 / dt
    results["orb_track_pair_matches"] = int(m.n)
    assert int(m.n) < 500, "match table saturated; raise the cap"

    # 5. single ops on the 1MP batch (bytes = app-level reads+writes)
    MP = 1024 * 1024
    for name, fn, bpf in [
        ("blur_r2", lambda x: gs.blur(x, 2), 2 * MP),
        ("sobel", gs.sobel, 2 * MP),
        ("gaussian3", gs.blur_gaussian, 2 * MP),
        ("histogram", gs.histogram, 1 * MP),
        ("integral", gs.integral, 5 * MP),
        ("otsu", gs.otsu_threshold, 1 * MP),
        # bilinear downscale 1024^2 -> 640x480 (one-hot selection matmuls)
        ("resize_640x480", lambda x: gs.resize(x, (480, 640)),
         MP + 480 * 640),
        ("resize_nn_640x480", lambda x: gs.resize_nn(x, (480, 640)),
         MP + 480 * 640),
    ]:
        dt = timeit(fn, batch, iters=iters)
        results[f"op_{name}_1MP_fps"] = n / dt
        record(f"op_{name}_1MP", dt, n, bytes_per_frame=bpf)

    # 5b. template matching: 32x32 template over 640x480 scenes (batched via
    # vmap; the reference scans ~0.28M placements x 1024 pixels each)
    nb3 = (64 if on_tpu else 2) if not args.quick else (8 if on_tpu else 2)
    sb = jnp.asarray(np.stack([np.roll(scene, 11 * i, axis=1) for i in range(nb3)]))
    tmpl32 = jnp.asarray(scene[200:232, 300:332])

    @jax.jit
    def tmatch(b):
        return jax.vmap(lambda im: gs.ops.find_best_match(
            gs.ops.match_template(im, tmpl32)))(b)

    dt = timeit(tmatch, sb, iters=iters)
    results["match_template_640x480_fps"] = nb3 / dt
    if orc:
        t0 = time.perf_counter()
        orc.match_template(scene, np.asarray(tmpl32))
        results["match_template_640x480_fps_c_reference"] = 1 / (
            time.perf_counter() - t0)

    # 5c. contour tracing: 12-blob synthetic frame.  The Moore walker is a
    # serial lax.while_loop (grayskull.h:446-480 is a serial walk too), so
    # these are latency numbers — dominated by total perimeter, not area.
    cim = np.zeros((480, 640), np.uint8)
    for r in range(3):
        for c in range(4):
            cim[120 * r + 20:120 * r + 100, 160 * c + 30:160 * c + 130] = 255
    cimj = jnp.asarray(cim)
    fc = jax.jit(lambda im: gs.ops.find_contours(im, 16, 64))
    assert int(fc(cimj).n) == 12
    dt = timeit(fc, cimj, iters=iters, repeat=3)
    results["find_contours_12blob_640x480_ms"] = dt * 1e3
    lbc = jax.jit(lambda im: gs.ops.largest_blob_contour(im))
    dt = timeit(lbc, cimj, iters=iters, repeat=3)
    results["largest_blob_contour_640x480_ms"] = dt * 1e3
    if orc:
        t0 = time.perf_counter()
        orc.largest_blob_contour(cim)
        results["largest_blob_contour_640x480_ms_c_reference"] = (
            time.perf_counter() - t0) * 1e3

    for k, v in results.items():
        if isinstance(v, float):
            results[k] = round(v, 2)
    # quick runs use tiny batches/iters - keep them out of the floor-gated
    # results.json (tests/test_perf_regression.py reads it)
    out = os.path.join(HERE, "results_quick.json" if args.quick else "results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
