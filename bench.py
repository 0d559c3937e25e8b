#!/usr/bin/env python3
"""Headline benchmark: fused blur(2) -> Otsu -> threshold -> sobel throughput.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference (zserge/grayskull) publishes no performance numbers (BASELINE.md),
so ``vs_baseline`` is measured against this repo's north-star target of
10,000 1-megapixel frames/sec/chip (BASELINE.json).  The pipeline output is
bit-exact versus the C reference chain (see tests/).

Runs on whatever the default JAX backend is (the driver provides a real TPU
chip); on CPU it exercises the XLA fallback path with a smaller batch.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import grayskull_tpu as gs  # noqa: E402
from grayskull_tpu.pipelines.preproc import preprocess  # noqa: E402
from grayskull_tpu.profiling import sync as _sync  # noqa: E402  (fences EVERY leaf)

TARGET_FPS = 10_000.0  # north-star from BASELINE.json


def make_batch(n, h=1024, w=1024):
    """Realistic content: tiled testdata if available, else random."""
    ref = os.environ.get("GRAYSKULL_REF", "/root/reference")
    lena_path = os.path.join(ref, "testdata", "lena.pgm")
    if os.path.exists(lena_path):
        tile = gs.io.read_pgm(lena_path)
        reps = (h + tile.shape[0] - 1) // tile.shape[0], (w + tile.shape[1] - 1) // tile.shape[1]
        frame = np.tile(tile, reps)[:h, :w]
        batch = np.stack([np.roll(frame, 13 * i, axis=1) for i in range(n)])
    else:
        batch = np.random.default_rng(0).integers(0, 256, (n, h, w), dtype=np.uint8)
    return jnp.asarray(batch)


def main():
    on_tpu = jax.default_backend() == "tpu"
    n = 256 if on_tpu else 4
    # enough queued iterations that the tunnel's ~5 ms/dispatch amortizes away
    iters = 20 if on_tpu else 2
    imgs = make_batch(n)

    _sync(preprocess(imgs))  # compile + warm
    _sync(preprocess(imgs))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = preprocess(imgs)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    fps = n / dt

    print(
        json.dumps(
            {
                "metric": "fused_blur_otsu_threshold_sobel_1MP_frames_per_sec",
                "value": round(fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / TARGET_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
