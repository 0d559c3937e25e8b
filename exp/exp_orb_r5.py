"""r5: ORB stage profile on the compact-emission pipeline + tunnel health.

r4's profile (exp/results_orb_r4.json) predates the in-kernel fold
compaction: batch-16 aruco 640x480 was 12.5 ms e2e with the full-map
emission at ~5.1 ms.  This re-profiles every stage of the CURRENT pipeline
and records a tunnel-health baseline (the headline preprocess on 256x1MP,
~19k fps when healthy) in the SAME process so cross-session comparisons can
be normalized for tunnel drift (CLAUDE.md: runtime throughput drifts 2-5x
over hours).

Run: python exp/exp_orb_r5.py   (TPU)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
from grayskull_tpu.kernels.fast import fast_pallas_compact
from grayskull_tpu.kernels.patches import extract_patches_batched
from grayskull_tpu.ops.features import (_brief_from_patches, _emit_compact_gated,
                                        _orientation_from_patches,
                                        _select_candidates_approx_b, orb_extract)
from grayskull_tpu.pipelines.preproc import preprocess
from grayskull_tpu.profiling import timeit


def main():
    out = {"backend": jax.default_backend()}
    it = 20

    # --- tunnel health baseline ---------------------------------------------
    frame = gs.io.read_pgm("/root/reference/testdata/lena.pgm")
    reps = (1024 // frame.shape[0] + 1, 1024 // frame.shape[1] + 1)
    mp = np.tile(frame, reps)[:1024, :1024]
    big = jnp.asarray(np.stack([np.roll(mp, 13 * i, axis=1) for i in range(256)]))
    dt = timeit(preprocess, big, iters=it, repeat=3)
    out["health_preprocess_1MP_fps"] = 256 / dt
    print(f"  health: preprocess 256x1MP = {256/dt:.0f} fps", flush=True)

    # --- pipeline -------------------------------------------------------------
    scene = gs.io.read_pgm("/root/reference/testdata/aruco.pgm")
    nb = 16
    batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1)
                                  for i in range(nb)]))
    h, w = scene.shape
    cap, thr = 500, 20
    cand_cap = min(cap * 4, 5000)

    ext = jax.jit(lambda b: orb_extract(b, cap, thr))
    kps = jax.block_until_ready(ext(batch))
    nk = int(jnp.sum(kps.n))
    dt = timeit(ext, batch, iters=it, repeat=3)
    out["end_to_end_ms"] = dt * 1e3
    out["keypoints_total"] = nk
    out["kps_per_sec"] = nk / dt
    print(f"  end-to-end: {dt*1e3:.2f} ms  {nk/dt:.0f} kps/s", flush=True)

    fk = jax.jit(lambda b: fast_pallas_compact(b, thr))
    dt = timeit(fk, batch, iters=it, repeat=3)
    out["fast_kernel_ms"] = dt * 1e3
    print(f"  fast kernel (compact): {dt*1e3:.2f} ms", flush=True)
    _, key3, red3, lost = jax.block_until_ready(fk(batch))

    em = jax.jit(lambda k, r, lo: _emit_compact_gated(k, r, lo, cand_cap))
    dt = timeit(em, key3, red3, lost, iters=it, repeat=3)
    out["emit_gated_ms"] = dt * 1e3
    print(f"  gated emission: {dt*1e3:.2f} ms", flush=True)
    vals = jax.block_until_ready(em(key3, red3, lost))

    def select(v):
        row_ok = v > 0
        n_c = jnp.sum(row_ok, axis=1).astype(jnp.int32)
        ridx = h * w - (v >> 8)
        tx = jnp.where(row_ok, ridx % w, 0).astype(jnp.int32)
        ty = jnp.where(row_ok, ridx // w, 0).astype(jnp.int32)
        tr = jnp.where(row_ok, v & 255, 0).astype(jnp.int32)
        valid = jnp.arange(cand_cap)[None, :] < n_c[:, None]
        return _select_candidates_approx_b(tx, ty, tr, valid, cap, 15, h, w)

    sel = jax.jit(select)
    dt = timeit(sel, vals, iters=it, repeat=3)
    out["selection_ms"] = dt * 1e3
    print(f"  selection: {dt*1e3:.2f} ms", flush=True)
    _, sx, sy, _ = jax.block_until_ready(sel(vals))
    tx = jnp.clip(sx, 15, w - 16)
    ty = jnp.clip(sy, 15, h - 16)

    pe = jax.jit(extract_patches_batched)
    dt = timeit(pe, batch, tx, ty, iters=it, repeat=3)
    out["patches_kernel_ms"] = dt * 1e3
    print(f"  patches kernel: {dt*1e3:.2f} ms", flush=True)
    patches = jax.block_until_ready(pe(batch, tx, ty))

    po = jax.jit(jax.vmap(lambda p: _orientation_from_patches(p, 15)))
    dt = timeit(po, patches, iters=it, repeat=3)
    out["orientation_ms"] = dt * 1e3
    print(f"  orientation: {dt*1e3:.2f} ms", flush=True)
    ang = jax.block_until_ready(po(patches))

    pb = jax.jit(jax.vmap(_brief_from_patches))
    dt = timeit(pb, patches, ang, iters=it, repeat=3)
    out["brief_ms"] = dt * 1e3
    print(f"  brief: {dt*1e3:.2f} ms", flush=True)

    with open("/root/repo/exp/results_orb_r5.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", "profile runs on the TPU"
    main()
