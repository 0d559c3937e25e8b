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

# grayskull_tpu (and jnp constant creation generally) initializes the default
# backend at import — deferred into main() so the watchdog in
# _backend_or_none() runs FIRST and a dead TPU tunnel yields an explicit
# error line instead of a hang the driver can't interpret.

TARGET_FPS = 10_000.0  # north-star from BASELINE.json


def make_batch(n, h=1024, w=1024):
    """Realistic content: tiled testdata if available, else random."""
    import jax.numpy as jnp

    import grayskull_tpu as gs
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


def _backend_or_none(timeout_s: float = 180.0):
    """Initialize the default backend in a watchdog thread.

    The tunneled TPU backend can be fully down, in which case the FIRST
    device lookup blocks forever — a hung bench records nothing for the
    round, which is strictly worse than an explicit error line.
    """
    import threading

    box = {}

    def probe():
        try:
            box["backend"] = jax.default_backend()
        except Exception as e:  # noqa: BLE001 — report any init failure
            box["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return None, f"backend init exceeded {timeout_s:.0f}s (tunnel down?)"
    return box.get("backend"), box.get("error")


def main():
    backend, err = _backend_or_none()
    if backend is None:
        print(
            json.dumps(
                {
                    "metric": "fused_blur_otsu_threshold_sobel_1MP_frames_per_sec",
                    "value": 0.0,
                    "unit": "frames/sec/chip",
                    "vs_baseline": 0.0,
                    "error": err or "backend init failed",
                }
            )
        )
        return
    on_tpu = backend == "tpu"
    from grayskull_tpu.pipelines.preproc import preprocess
    from grayskull_tpu.profiling import sync as _sync  # fences EVERY leaf
    n = 256 if on_tpu else 4
    # enough queued iterations that the tunnel's ~5 ms/dispatch amortizes away
    iters = 20 if on_tpu else 2
    imgs = make_batch(n)

    _sync(preprocess(imgs))  # compile + warm
    _sync(preprocess(imgs))
    # best of 3 windows: the tunnel's runtime throughput drifts up to 2-5x
    # over hours (CLAUDE.md); the fastest window is the chip's sustained
    # rate, the slower ones are tunnel contention
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = preprocess(imgs)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    fps = n / best

    print(
        json.dumps(
            {
                "metric": "fused_blur_otsu_threshold_sobel_1MP_frames_per_sec",
                "value": round(fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / TARGET_FPS, 4),
                "backend": backend,
            }
        )
    )


if __name__ == "__main__":
    main()
