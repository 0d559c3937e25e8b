"""Adaptive-k ORB emission (VERDICT item 4): exactness + timing on TPU.

exp/results_amk_scaling.json showed approx_max_k cost ~linear in k (k=500
2.7 ms vs k=2000 5.5 ms over (16, 307200)) with the aggregation, not the
scan, dominating.  ops/features.py now emits adaptively
(_emit_packed_batched): a survivor-count reduction picks the smallest exact
k branch, and orb_extract's batched path runs ONE batched kernel + emission
+ selection instead of a vmapped per-frame chain.

This script checks the new batched path is bit-identical to the old vmapped
per-frame path (all four reference images, dense-tie synthetic frames, the
limit scalar/vector variants) and re-times the ORB headline.

Run: python exp/exp_orb_emit_r4.py   (TPU)
"""

import functools
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
from grayskull_tpu.ops.features import (_orb_select, _orb_select_batched_tpu,
                                        fast)
from grayskull_tpu.profiling import timeit

REF = "/root/reference/testdata"


def old_vmap_select(imgs, cap, threshold, limit=None):
    if limit is not None and jnp.ndim(limit) == 1:
        return jax.vmap(
            lambda im, lm: _orb_select(im, cap, threshold, lm)
        )(imgs, jnp.asarray(limit, jnp.int32))
    return jax.vmap(lambda im: _orb_select(im, cap, threshold, limit))(imgs)


def check_exact():
    frames = []
    for name in ("aruco.pgm", "lena.pgm", "document.pgm", "receipt.pgm"):
        img = np.asarray(gs.io.read_pgm(f"{REF}/{name}"))
        canvas = np.zeros((480, 640), np.uint8)
        hh, ww = min(480, img.shape[0]), min(640, img.shape[1])
        canvas[:hh, :ww] = img[:hh, :ww]
        frames.append(canvas)
    # dense synthetic: tied plateaus (the fastred killer) + random noise
    rng = np.random.default_rng(7)
    tie = np.zeros((480, 640), np.uint8)
    tie[100:130, 100:133] = 255
    tie[200:204, 200:320:3] = 200
    noise = rng.integers(0, 256, (480, 640), np.uint8)
    frames += [tie, noise]
    batch = jnp.asarray(np.stack(frames))

    for cap, thr in ((500, 20), (500, 5), (100, 20)):
        want = jax.block_until_ready(old_vmap_select(batch, cap, thr))
        got = jax.block_until_ready(
            jax.jit(lambda b: _orb_select_batched_tpu(b, cap, thr))(batch))
        for a, b in zip(want, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        print(f"  select cap={cap} thr={thr}: batched == vmapped", flush=True)

    lims = jnp.asarray([500, 100, 3, 0, 500, 47], jnp.int32)
    want = jax.block_until_ready(old_vmap_select(batch, 500, 20, lims))
    got = jax.block_until_ready(
        jax.jit(lambda b, l: _orb_select_batched_tpu(b, 500, 20, l))(batch, lims))
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("  select with per-frame limits: batched == vmapped", flush=True)

    # single-frame fast() (adaptive emission, B=1) vs lax.top_k ground truth
    for f in frames[:2] + [tie]:
        img = jnp.asarray(f)
        kps, score = jax.block_until_ready(fast(img, 2000, 20))
        s = np.asarray(score).astype(np.int64)
        h, w = s.shape
        sp = np.pad(s, 1)
        is_max = s > 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx or dy:
                    is_max &= ~(sp[1 + dy:1 + dy + h, 1 + dx:1 + dx + w] > s)
        ys, xs = np.nonzero(is_max & (s > 0))
        order = np.argsort(ys * w + xs)[:2000]
        assert int(kps.n) == len(order)
        np.testing.assert_array_equal(np.asarray(kps.x)[: len(order)], xs[order])
        np.testing.assert_array_equal(np.asarray(kps.y)[: len(order)], ys[order])
    print("  fast() single-frame: exact vs numpy scan-order", flush=True)


def bench():
    out = {"backend": jax.default_backend()}
    scene = gs.io.read_pgm(f"{REF}/aruco.pgm")
    img = jnp.asarray(scene)
    nb = 16
    batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1)
                                  for i in range(nb)]))

    fb = jax.jit(lambda b: gs.ops.orb_extract(b, 500, 20))
    kb = jax.block_until_ready(fb(batch))
    nk = int(jnp.sum(kb.n))
    dt = timeit(fb, batch, iters=30)
    out["batch16_ms"] = round(dt * 1e3, 3)
    out["kps_per_sec"] = round(nk / dt, 0)
    print(f"  orb_extract batch16: {dt * 1e3:.2f} ms -> "
          f"{nk / dt / 1e3:.0f}k kps/s", flush=True)

    f1 = jax.jit(lambda b: gs.ops.orb_extract(b, 500, 20))
    jax.block_until_ready(f1(img))
    dt1 = timeit(f1, img, iters=30)
    out["single_ms"] = round(dt1 * 1e3, 3)
    out["single_fps"] = round(1 / dt1, 1)
    print(f"  orb_extract single: {dt1 * 1e3:.2f} ms ({1 / dt1:.0f} fps)",
          flush=True)

    with open("exp/results_orb_emit_r4.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote exp/results_orb_emit_r4.json", flush=True)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    check_exact()
    bench()
