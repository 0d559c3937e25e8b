"""r5: validate + time the SHIPPED tall-tail LBP strip ladder on hardware.

Follow-up to exp_lbp_tail_r5.py (whose override pass measured th=48x4
+8-16% on the tail scales but compile-OOM'd at scale 3.583 — the estimator
under-predicts big-scale map transients).  kernels/lbp.py now ships
(48,3)|(48,4)|(48,5) candidates with the 10.5 MB hardware-calibrated budget
for multi-chunk th=48.  This run validates every picked config compiles and
runs, pins per-scale bit-exactness against the r4-validated 32-family
configs, and measures the e2e detect pipeline both ways on the bench
geometry (batch-32 640x480 full ladder step 1).

Run: python exp/exp_lbp_tail2_r5.py   (TPU)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
from grayskull_tpu.cascade import load_frontalface
from grayskull_tpu.kernels import lbp as klbp
from grayskull_tpu.ops.lbp import lbp_detect, scale_ladder
from grayskull_tpu.profiling import timeit

OUT = {"backend": jax.default_backend()}


def per_scale(casc, iip, lad, grids, tag):
    rows, hits = [], []
    for (scale, ww, wh), (ny, nx) in zip(lad, grids):
        tw, th, chunks, *_ = klbp._padded_dims(casc, scale, ny, nx, 1)
        cfg = f"th={th}x{len(chunks)}"
        try:
            h = klbp.lbp_eval_scale(casc, iip, scale, ny, nx, 1)
            jax.block_until_ready(h)
            dt = timeit(lambda: klbp.lbp_eval_scale(casc, iip, scale, ny,
                                                    nx, 1),
                        iters=10, repeat=3)
        except Exception as e:
            print(f"  {tag} scale {scale:.3f}: {cfg} FAILED: {str(e)[:160]}",
                  flush=True)
            rows.append({"scale": scale, "cfg": cfg, "error": str(e)[:160]})
            hits.append(None)
            continue
        mwin = iip.shape[0] * ny * nx / dt / 1e6
        rows.append({"scale": round(scale, 4), "win": f"{ww}x{wh}",
                     "cfg": cfg, "ms": round(dt * 1e3, 3),
                     "mwin_per_s": round(mwin, 1)})
        hits.append(np.asarray(h))
        print(f"  {tag} scale {scale:.3f} ({ww}x{wh}) {cfg}: "
              f"{dt*1e3:.2f} ms = {mwin:.0f}M win/s", flush=True)
    return rows, hits


def main():
    lena = gs.io.read_pgm("/root/reference/testdata/lena.pgm")
    reps = (-(-480 // lena.shape[0]), -(-640 // lena.shape[1]))
    scene = np.tile(lena, reps)[:480, :640]
    casc = load_frontalface()
    nb = 32
    fb = np.stack([np.roll(scene, 7 * i, axis=1) for i in range(nb)])
    iib = jnp.asarray(np.asarray(gs.integral(fb)))
    lad = scale_ladder(casc, 640, 480, 1.2, 1.0, 4.0)
    grids = [((480 - wh) + 1, (640 - ww) + 1) for _, ww, wh in lad]
    nwin = sum(ny * nx for ny, nx in grids)

    def det(x):
        return lbp_detect(casc, x, 100, 1.2, 1.0, 4.0, 1)

    # shipped (tall-tail) ladder: per-scale validation + e2e
    iip = klbp.lbp_pad_for(casc, iib, lad, 480, 640, 1)
    OUT["ship_scales"], ship_hits = per_scale(casc, iip, lad, grids, "ship")
    if any("error" in r for r in OUT["ship_scales"]):
        with open("/root/repo/exp/results_lbp_tail_r5.json", "w") as f:
            json.dump(OUT, f, indent=1)
        print("shipped ladder has a failing config — results saved, "
              "gate needs tightening", flush=True)
        return
    det_ship = det(iib)
    t1 = timeit(det, iib, iters=10, repeat=3)
    OUT["ship_e2e_mwin_per_s"] = nb * nwin / t1 / 1e6
    OUT["ship_e2e_fps"] = nb / t1
    print(f"ship e2e: {nb*nwin/t1/1e6:.0f}M win/s ({nb/t1:.1f} fps)",
          flush=True)

    # r4-validated family for the A/B + exactness reference
    shipping = klbp._CANDIDATES
    klbp._CANDIDATES = shipping[3:]  # (32,1) onward
    klbp._padded_dims.cache_clear()
    klbp.lbp_eval_scale.clear_cache()
    try:
        iip_old = klbp.lbp_pad_for(casc, iib, lad, 480, 640, 1)
        OUT["old_scales"], old_hits = per_scale(casc, iip_old, lad, grids,
                                                "old32")
        flips = 0
        for a, b in zip(ship_hits, old_hits):
            if a is not None and b is not None:
                flips += int((a != b).sum())
        OUT["bitexact_flips"] = flips
        det_old = det(iib)
        for f in ("n", "x", "y", "w", "h"):
            np.testing.assert_array_equal(
                np.asarray(getattr(det_ship, f)),
                np.asarray(getattr(det_old, f)), err_msg=f)
        t0 = timeit(det, iib, iters=10, repeat=3)
        OUT["old_e2e_mwin_per_s"] = nb * nwin / t0 / 1e6
        OUT["old_e2e_fps"] = nb / t0
        OUT["speedup"] = t0 / t1
        print(f"old32 e2e: {nb*nwin/t0/1e6:.0f}M win/s ({nb/t0:.1f} fps); "
              f"ship speedup {t0/t1:.3f}x; flips {flips}; detect tables "
              f"identical", flush=True)
    finally:
        klbp._CANDIDATES = shipping
        klbp._padded_dims.cache_clear()
        klbp.lbp_eval_scale.clear_cache()

    with open("/root/repo/exp/results_lbp_tail_r5.json", "w") as f:
        json.dump(OUT, f, indent=1)
    print(json.dumps(OUT, indent=1))


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    main()
