"""Round-3 on-TPU validation + timing of the updated preproc and LBP kernels.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python exp/exp_r3_validate.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import grayskull_tpu as gs  # noqa: E402
from grayskull_tpu.cascade import load_frontalface  # noqa: E402
from grayskull_tpu.ops.lbp import lbp_detect, scale_ladder  # noqa: E402
from grayskull_tpu.pipelines.preproc import preprocess, preprocess_reference  # noqa: E402
from grayskull_tpu.profiling import timeit  # noqa: E402


def rects_arr(r):
    n = int(r.n)
    return np.stack([np.asarray(r.x)[:n], np.asarray(r.y)[:n],
                     np.asarray(r.w)[:n], np.asarray(r.h)[:n]], 1)


def log(out, **kv):
    for k, v in kv.items():
        out[k] = round(v, 2) if isinstance(v, float) else v
        print(f"  {k}: {out[k]}", flush=True)


def main():
    out = {}
    t_start = time.perf_counter()

    # ---- preproc parity (Pallas vs XLA on-device) ----
    rng = np.random.default_rng(7)
    frame = rng.integers(0, 256, (1024, 1024), dtype=np.uint8)
    lena = gs.io.read_pgm("/root/reference/testdata/lena.pgm")
    for name, b in (("rand", np.stack([frame, 255 - frame])),
                    ("lena", np.stack([lena] * 2))):
        for r in (1, 2, 5):
            got = preprocess(jnp.asarray(b), radius=r)
            ref = preprocess_reference(jnp.asarray(b), radius=r)
            for nm, a, c in zip(("blurred", "binary", "edges", "t"), got, ref):
                assert np.array_equal(np.asarray(a), np.asarray(c)), (name, r, nm)
    log(out, preproc_parity="ok")

    # ---- preproc throughput ----
    n = 256
    batch = jnp.asarray(np.stack([np.roll(frame, 13 * i, axis=1) for i in range(n)]))
    dt = timeit(preprocess, batch, iters=30)
    log(out, preprocess_fps=n / dt, preprocess_ms=dt * 1e3)

    # ---- CCL serpentine kernel: parity + scanner timing ----
    from grayskull_tpu.ops.blobs import label_components
    from grayskull_tpu.pipelines.scan import preprocess_binarize, scan

    for name in ("document", "receipt"):
        img = jnp.asarray(gs.io.read_pgm(f"/root/reference/testdata/{name}.pgm"))
        binary = preprocess_binarize(img)
        got = np.asarray(label_components(binary))
        # XLA reference on CPU devices (dispatch gate is default-device aware)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            ref = np.asarray(label_components(jax.device_put(binary, cpu)))
        assert np.array_equal(got, ref), f"ccl {name}"
        dtl = timeit(label_components, binary, iters=15)
        dts = timeit(lambda im: scan(im), img, iters=15)
        log(out, **{f"{name}_ccl_parity": "ok", f"{name}_label_ms": dtl * 1e3,
                    f"{name}_scan_ms": dts * 1e3})
    doc = gs.io.read_pgm("/root/reference/testdata/document.pgm")
    db = jnp.asarray(np.stack([np.roll(doc, 3 * i, axis=1) for i in range(8)]))
    dtb = timeit(lambda b: scan(b), db, iters=10)
    log(out, scan_batched8_fps=8 / dtb)

    # ---- LBP parity: new kernel vs XLA, step 1 and 2 ----
    casc = load_frontalface()
    scene = gs.io.read_pgm("/root/reference/testdata/aruco.pgm")
    ii = gs.integral(jnp.asarray(scene))
    for step in (1, 2):
        fast = rects_arr(lbp_detect(casc, ii, 100, 1.2, 1.0, 4.0, step))
        ref = rects_arr(lbp_detect(casc, ii, 100, 1.2, 1.0, 4.0, step, force_xla=True))
        assert np.array_equal(fast, ref), f"lbp step={step}"
    log(out, lbp_parity_step12="ok",
        compile_time_to_here_s=time.perf_counter() - t_start)

    # ---- LBP throughput: batch 32, full ladder, steps 1 and 2 ----
    nb = 32
    fb = np.stack([np.roll(scene, 7 * i, axis=1) for i in range(nb)])
    iib = jnp.asarray(np.asarray(gs.integral(jnp.asarray(fb))))
    for step in (1, 2):
        lad = scale_ladder(casc, 640, 480, 1.2, 1.0, 4.0)
        nwin = sum(((480 - wh) // step + 1) * ((640 - ww) // step + 1)
                   for _, ww, wh in lad)
        dt = timeit(lambda x, s=step: lbp_detect(casc, x, 100, 1.2, 1.0, 4.0, s),
                    iib, iters=15)
        out[f"lbp_step{step}_fps"] = nb / dt
        out[f"lbp_step{step}_windows_per_sec"] = nb * nwin / dt

    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 2)
    print(json.dumps(out, indent=2))
    with open("/root/repo/exp/results_r3_validate.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
