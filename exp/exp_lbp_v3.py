"""Round-3 LBP validation: TH-adaptive strips + phase-decomposed step>1.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python exp/exp_lbp_v3.py
"""

import json
import sys
import time

import jax  # noqa: F401
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import grayskull_tpu as gs  # noqa: E402
from grayskull_tpu.cascade import load_frontalface  # noqa: E402
from grayskull_tpu.ops.lbp import lbp_detect, scale_ladder  # noqa: E402
from grayskull_tpu.profiling import timeit  # noqa: E402


def rects_arr(r):
    n = int(r.n)
    return np.stack([np.asarray(r.x)[:n], np.asarray(r.y)[:n],
                     np.asarray(r.w)[:n], np.asarray(r.h)[:n]], 1)


def main():
    out = {}
    t0 = time.time()
    casc = load_frontalface()
    scene = gs.io.read_pgm("/root/reference/testdata/aruco.pgm")
    ii = gs.integral(jnp.asarray(scene))
    for step in (1, 2, 3):
        fast = rects_arr(lbp_detect(casc, ii, 100, 1.2, 1.0, 4.0, step))
        ref = rects_arr(lbp_detect(casc, ii, 100, 1.2, 1.0, 4.0, step, force_xla=True))
        assert np.array_equal(fast, ref), f"lbp step={step}"
        print(f"  step{step}_parity: ok ({time.time()-t0:.0f}s)", flush=True)
        out[f"step{step}_parity"] = "ok"
    out["warmup_s"] = round(time.time() - t0, 1)

    nb = 32
    fb = np.stack([np.roll(scene, 7 * i, axis=1) for i in range(nb)])
    iib = jnp.asarray(np.asarray(gs.integral(jnp.asarray(fb))))
    for step in (1, 2):
        lad = scale_ladder(casc, 640, 480, 1.2, 1.0, 4.0)
        nwin = sum(((480 - wh) // step + 1) * ((640 - ww) // step + 1)
                   for _, ww, wh in lad)
        dt = timeit(lambda x, s=step: lbp_detect(casc, x, 100, 1.2, 1.0, 4.0, s),
                    iib, iters=15)
        out[f"lbp_step{step}_fps"] = round(nb / dt, 2)
        out[f"lbp_step{step}_Mwin_per_sec"] = round(nb * nwin / dt / 1e6, 1)
        print(f"  step{step}: {out[f'lbp_step{step}_fps']} fps, "
              f"{out[f'lbp_step{step}_Mwin_per_sec']} Mwin/s", flush=True)

    with open("/root/repo/exp/results_lbp_v3.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
