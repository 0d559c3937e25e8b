"""r5: per-scale LBP ladder profile + tall-strip re-pick for the TAIL scales.

The r4 sweep left the leading scale at 281-283M win/s but the e2e pipeline at
227-232M; the fused-emission A/B (exp_lbp_emit_r5.py) measured dead (1.001x),
so the residual gap must live in the tail scales themselves (r4 numbers:
161-190M win/s for the large-window scales).  Large scales carry 4-5 MB of
scaled rect-sum maps, so the shipping candidate ladder drops them from
th=48 x3 to the 32/16 family.  More chunks shrink per-chunk maps — this
experiment A/Bs extending the ladder with (48,4|5|6) (and optionally 64-row
strips) so tall strips stay admissible at the tail, with per-scale hardware
timings, bit-exactness per scale, and the e2e detect pipeline both ways.

Run: python exp/exp_lbp_tail_r5.py [--tall64]   (TPU)
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
    """Config + time per ladder scale under the CURRENT candidate ladder."""
    rows = []
    hits = []
    for (scale, ww, wh), (ny, nx) in zip(lad, grids):
        tw, th, chunks, *_ = klbp._padded_dims(casc, scale, ny, nx, 1)
        cfg = f"th={th}x{len(chunks)}"
        try:
            h = klbp.lbp_eval_scale(casc, iip, scale, ny, nx, 1)
            jax.block_until_ready(h)
            dt = timeit(lambda: klbp.lbp_eval_scale(casc, iip, scale, ny, nx, 1),
                        iters=10, repeat=3)
        except Exception as e:  # scoped-VMEM overflow etc.
            print(f"  {tag} scale {scale:.3f}: {cfg} FAILED: {e}", flush=True)
            rows.append({"scale": scale, "cfg": cfg, "error": str(e)[:120]})
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


def main(tall64: bool):
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
    iip = klbp.lbp_pad_for(casc, iib, lad, 480, 640, 1)

    def det(x):
        return lbp_detect(casc, x, 100, 1.2, 1.0, 4.0, 1)

    base_det = det(iib)
    t0 = timeit(det, iib, iters=10, repeat=3)
    OUT["base_e2e_mwin_per_s"] = nb * nwin / t0 / 1e6
    OUT["base_e2e_fps"] = nb / t0
    print(f"base e2e: {nb*nwin/t0/1e6:.0f}M win/s ({nb/t0:.1f} fps)",
          flush=True)
    OUT["base_scales"], base_hits = per_scale(casc, iip, lad, grids, "base")

    shipping = klbp._CANDIDATES
    tall = ((48, 3), (48, 4), (48, 5), (48, 6)) + shipping[1:]
    if tall64:
        tall = ((64, 4), (64, 6), (64, 8)) + tall
    klbp._CANDIDATES = tall
    klbp._padded_dims.cache_clear()
    klbp.lbp_eval_scale.clear_cache()
    try:
        OUT["tall_scales"], tall_hits = per_scale(casc, iip, lad, grids,
                                                  "tall")
        flips = 0
        for bh, th_ in zip(base_hits, tall_hits):
            if bh is not None and th_ is not None:
                flips += int((bh != th_).sum())
        OUT["bitexact_flips"] = flips
        print("per-scale exactness flips:", flips, flush=True)
        t1 = timeit(det, iib, iters=10, repeat=3)
        OUT["tall_e2e_mwin_per_s"] = nb * nwin / t1 / 1e6
        OUT["tall_e2e_fps"] = nb / t1
        det_tall = det(iib)
        for f in ("n", "x", "y", "w", "h"):
            np.testing.assert_array_equal(
                np.asarray(getattr(base_det, f)),
                np.asarray(getattr(det_tall, f)), err_msg=f)
        print(f"tall e2e: {nb*nwin/t1/1e6:.0f}M win/s ({nb/t1:.1f} fps) "
              f"[{t0/t1:.3f}x], detect tables identical", flush=True)
        OUT["speedup"] = t0 / t1
    finally:
        klbp._CANDIDATES = shipping
        klbp._padded_dims.cache_clear()
        klbp.lbp_eval_scale.clear_cache()

    with open("/root/repo/exp/results_lbp_tail_r5.json", "w") as f:
        json.dump(OUT, f, indent=1)
    print(json.dumps(OUT, indent=1))


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    main("--tall64" in sys.argv[1:])
