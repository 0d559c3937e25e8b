"""Round-4 scanner stage profile (VERDICT r3 item 9).

The r3 profile (exp/results_scan_profile.json) predates the Pallas warp
band sampler, the CCL strip kernel and the rank-propagation blob stats —
its 18-34 ms stage numbers are all dead.  This re-measures the CURRENT
single-frame pipeline per stage and the batched throughput, and counts
sequential device dispatches to bound the tunnel-RTT floor:

  binarize (blur+otsu+threshold) | blobs (CCL kernel + stats) |
  corners | warp — plus end-to-end scan() single / batch-8 / batch-32.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python exp/exp_scan_r4_profile.py
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import grayskull_tpu as gs  # noqa: E402
from grayskull_tpu.ops.blobs import blob_corners, blobs  # noqa: E402
from grayskull_tpu.ops.warp import perspective_correct  # noqa: E402
from grayskull_tpu.pipelines.scan import (  # noqa: E402
    _scan_corners, preprocess_binarize, scan)
from grayskull_tpu.profiling import timeit  # noqa: E402


def log(out, **kv):
    for k, v in kv.items():
        out[k] = round(v, 2) if isinstance(v, float) else v
        print(f"  {k}: {out[k]}", flush=True)


def main():
    out = {"backend": jax.default_backend()}
    # dispatch-floor calibration: a trivial jitted op measured the same way
    # as the stages, so every *_ms below can be read net of the tunnel's
    # per-call RTT *at this run's tunnel mood* (drift range 1-9 ms)
    tiny = jnp.zeros((8, 128), jnp.int32)
    f_rtt = jax.jit(lambda x: x + 1)
    jax.block_until_ready(f_rtt(tiny))
    dt = timeit(f_rtt, tiny, iters=30, repeat=3)
    log(out, dispatch_floor_ms=dt * 1e3)
    for name in ("document", "receipt"):
        img = jnp.asarray(gs.io.read_pgm(f"/root/reference/testdata/{name}.pgm"))

        dt = timeit(preprocess_binarize, img, iters=20, repeat=3)
        log(out, **{f"{name}_binarize_ms": dt * 1e3})
        binary = jax.block_until_ready(preprocess_binarize(img))

        f_blobs = jax.jit(lambda b: blobs(b, 1000))
        jax.block_until_ready(f_blobs(binary))
        dt = timeit(f_blobs, binary, iters=15, repeat=3)
        log(out, **{f"{name}_blobs_ms": dt * 1e3})

        f_corners = jax.jit(lambda im: _scan_corners(im, 1000))
        corners = jax.block_until_ready(f_corners(img))
        dt = timeit(f_corners, img, iters=15, repeat=3)
        log(out, **{f"{name}_binarize_blobs_corners_ms": dt * 1e3})

        f_warp = jax.jit(lambda im, c: perspective_correct(
            im[None], c[None], (1000, 800)))
        jax.block_until_ready(f_warp(img, corners))
        dt = timeit(f_warp, img, corners, iters=15, repeat=3)
        log(out, **{f"{name}_warp_ms": dt * 1e3})

        dt = timeit(lambda im: scan(im), img, iters=20, repeat=3)
        log(out, **{f"{name}_scan_ms": dt * 1e3})

    doc = jnp.asarray(gs.io.read_pgm("/root/reference/testdata/document.pgm"))
    for nb in (8, 32):
        db = jnp.asarray(np.stack([np.asarray(doc)] * nb))
        dtb = timeit(lambda b: scan(b), db, iters=10, repeat=3)
        log(out, **{f"scan_batched{nb}_fps": nb / dtb})

    with open("/root/repo/exp/results_scan_profile.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote exp/results_scan_profile.json", flush=True)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    main()
