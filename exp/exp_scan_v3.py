"""Round-3 scanner validation: Pallas warp + rank-propagation blobs on TPU.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python exp/exp_scan_v3.py
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import grayskull_tpu as gs  # noqa: E402
from grayskull_tpu.ops.blobs import blobs  # noqa: E402
from grayskull_tpu.ops.warp import perspective_correct  # noqa: E402
from grayskull_tpu.pipelines.scan import preprocess_binarize, scan  # noqa: E402
from grayskull_tpu.profiling import timeit  # noqa: E402


def log(out, **kv):
    for k, v in kv.items():
        out[k] = round(v, 2) if isinstance(v, float) else v
        print(f"  {k}: {out[k]}", flush=True)


def main():
    out = {}
    cpu = jax.devices("cpu")[0]

    def on_cpu(fn, *args):
        with jax.default_device(cpu):
            return fn(*[jax.device_put(a, cpu) for a in args])

    # ---- warp parity: Pallas sampler vs gather (CPU) ----
    doc = jnp.asarray(gs.io.read_pgm("/root/reference/testdata/document.pgm"))
    corner_sets = [
        np.array([[31, 228], [571, 150], [728, 859], [132, 985]], np.int32),
        np.array([[0, 0], [1023, 0], [1023, 767], [0, 767]], np.int32),  # identity-ish
        np.array([[5, 3], [900, 40], [1010, 700], [40, 760]], np.int32),
        np.array([[10, 700], [1000, 10], [1020, 760], [3, 10]], np.int32),  # extreme tilt
    ]
    for i, c in enumerate(corner_sets):
        got = np.asarray(perspective_correct(doc, jnp.asarray(c), (1000, 800)))
        ref = np.asarray(on_cpu(
            lambda s, cc: perspective_correct(s, cc, (1000, 800)), doc, jnp.asarray(c)
        ))
        assert np.array_equal(got, ref), f"warp corners set {i}"
    log(out, warp_parity="ok")
    dtw = timeit(lambda s: perspective_correct(s, jnp.asarray(corner_sets[0]),
                                               (1000, 800)), doc, iters=20)
    log(out, warp_ms=dtw * 1e3)

    # ---- blobs rank-propagation parity ----
    for name in ("document", "receipt"):
        img = jnp.asarray(gs.io.read_pgm(f"/root/reference/testdata/{name}.pgm"))
        binary = preprocess_binarize(img)
        t_got = blobs(binary, 1000)
        t_ref = on_cpu(lambda b: blobs(b, 1000), binary)
        for f in ("n", "label", "area"):
            assert np.array_equal(np.asarray(getattr(t_got[0], f)),
                                  np.asarray(getattr(t_ref[0], f))), (name, f)
        assert np.array_equal(np.asarray(t_got[1]), np.asarray(t_ref[1])), (name, "map")
        dtb = timeit(lambda b: blobs(b, 1000), binary, iters=15)
        log(out, **{f"{name}_blobs_parity": "ok", f"{name}_blobs_ms": dtb * 1e3})

    # ---- scanner end-to-end: parity + latency + batched fps ----
    for name in ("document", "receipt"):
        img = jnp.asarray(gs.io.read_pgm(f"/root/reference/testdata/{name}.pgm"))
        got = scan(img)
        ref = on_cpu(lambda im: scan(im), img)
        assert np.array_equal(np.asarray(got[1]), np.asarray(ref[1])), f"{name} corners"
        assert np.array_equal(np.asarray(got[0]), np.asarray(ref[0])), f"{name} page"
        dts = timeit(lambda im: scan(im), img, iters=20)
        log(out, **{f"{name}_scan_parity": "ok", f"{name}_scan_ms": dts * 1e3})
    doc_np = gs.io.read_pgm("/root/reference/testdata/document.pgm")
    db = jnp.asarray(np.stack([np.roll(doc_np, 3 * i, axis=1) for i in range(8)]))
    dtb = timeit(lambda b: scan(b), db, iters=10)
    log(out, scan_batched8_fps=8 / dtb)
    db32 = jnp.asarray(np.stack([np.roll(doc_np, 2 * i, axis=1) for i in range(32)]))
    dtb = timeit(lambda b: scan(b), db32, iters=10)
    log(out, scan_batched32_fps=32 / dtb)

    with open("/root/repo/exp/results_scan_v3.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
