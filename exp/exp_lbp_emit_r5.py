"""r5: fused per-scale LBP ladder emission — hardware A/B + exactness.

r4 left the pipeline at 227M win/s vs 281-283M for the leading scale alone;
docs/PERF_NOTES.md attributes the gap to the whole-ladder hit-mask concat +
single big top-k in ``_emit_rects``.  ``_emit_rects_ladder`` reduces each
scale's hit map to <= cap survivors immediately (exact approx_max_k over the
per-scale key map) and merges nscales*cap values.

Measures, in ONE process, the full detect pipeline on the bench config
(batch-32 640x480, full ladder, step 1) with each emission path, and pins
hardware exactness of the fused path against the concat path.

Run: python exp/exp_lbp_emit_r5.py   (TPU)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
from grayskull_tpu.cascade import load_frontalface
from grayskull_tpu.ops import lbp as mlbp
from grayskull_tpu.ops.lbp import lbp_detect, scale_ladder
from grayskull_tpu.profiling import timeit


def main():
    out = {"backend": jax.default_backend()}
    lena = gs.io.read_pgm("/root/reference/testdata/lena.pgm")
    reps = (-(-480 // lena.shape[0]), -(-640 // lena.shape[1]))
    scene = np.tile(lena, reps)[:480, :640]  # == bench_all.tile_frame(480, 640)
    casc = load_frontalface()
    nb = 32
    fb = np.stack([np.roll(scene, 7 * i, axis=1) for i in range(nb)])
    iib = jnp.asarray(np.asarray(gs.integral(fb)))
    lad = scale_ladder(casc, 640, 480, 1.2, 1.0, 4.0)
    nwin = sum(((480 - wh) + 1) * ((640 - ww) + 1) for _, ww, wh in lad)

    # eager dispatch like bench_all (per-scale executables is the design;
    # outer-jitting the dispatcher is not a supported configuration)
    def det(x):
        return lbp_detect(casc, x, 100, 1.2, 1.0, 4.0, 1)

    got = det(iib)  # exactness asserts below force the readback

    # A/B: force the concat path by flipping the EMISSION gate only (the
    # per-scale Pallas kernels stay on; _emit_rects vs _emit_rects_ladder)
    orig = mlbp._emit_rects_ladder

    def _concat_emit(hits, all_x, all_y, all_w, all_h, cap):
        import jax.numpy as _jnp
        return mlbp._emit_rects(_jnp.concatenate(hits, axis=1),
                                all_x, all_y, all_w, all_h, cap)

    mlbp._emit_rects_ladder = _concat_emit
    try:
        want = det(iib)
        for f in ("n", "x", "y", "w", "h"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(want, f)),
                err_msg=f)
        print("hardware exactness OK (ladder == concat emission)")
        t_cat = timeit(det, iib, iters=10, repeat=3)
    finally:
        mlbp._emit_rects_ladder = orig
    t_lad = timeit(det, iib, iters=10, repeat=3)
    out["ladder_win_per_sec"] = nb * nwin / t_lad
    out["concat_win_per_sec"] = nb * nwin / t_cat
    out["ladder_fps"] = nb / t_lad
    out["concat_fps"] = nb / t_cat
    out["speedup"] = t_cat / t_lad
    print(f"e2e: ladder {nb*nwin/t_lad/1e6:.0f}M win/s ({nb/t_lad:.0f} fps)  "
          f"concat {nb*nwin/t_cat/1e6:.0f}M win/s ({nb/t_cat:.0f} fps)  "
          f"{t_cat/t_lad:.2f}x")

    with open("/root/repo/exp/results_lbp_emit_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    main()
