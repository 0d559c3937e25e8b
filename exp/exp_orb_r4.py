"""Round-4 ORB stage profile + emission A/B (VERDICT r3 item 4).

results_orb_profile.json predates the patch kernel (kernels/patches.py) and
the exact-approx_max_k emission; this re-profiles the CURRENT pipeline on
the same batch-16 640x480 aruco config and A/Bs the FAST key-emission
stage, the presumed new bottleneck:

  emit-amk   shipped: exact approx_max_k(recall=1.0) on the rank half of
             the packed key over all 307k positions/frame
  emit-topk  plain lax.top_k on the packed keys (the pre-r3 path)
  emit-seg8  exact two-stage: 8 row-segments per frame, per-segment
             approx_max_k(k=cand_cap) then a second approx_max_k over the
             8*cand_cap survivors.  Exact because every segment returns
             min(k, seg) items — the global top-k is a subset of the union.

All variants must produce identical candidate tables (scan-order first-k
semantics, grayskull.h:517-531).
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
from grayskull_tpu.kernels.fast import fast_pallas
from grayskull_tpu.kernels.patches import extract_patches_batched
from grayskull_tpu.ops.features import (_brief_from_patches,
                                        _orientation_from_patches, fast,
                                        orb_extract)
from grayskull_tpu.profiling import timeit


def emission_variants(h, w, cand_cap):
    """Each: (name, fn(key3 (N,H,W) i32) -> (vals (N,cap) i32)) — vals are the
    packed (inv_rank<<8)|score keys of the first cand_cap corners."""
    hw = h * w

    def amk(key3):
        def one(key):
            rk = (key >> 8).astype(jnp.float32)
            vals_f, idxs = jax.lax.approx_max_k(rk, cand_cap, recall_target=1.0)
            return (vals_f.astype(jnp.int32) << 8) | (key[idxs] & 255)
        return jax.vmap(one)(key3.reshape(key3.shape[0], -1))

    def topk(key3):
        def one(key):
            vals, _ = jax.lax.top_k(key, cand_cap)
            return vals
        return jax.vmap(one)(key3.reshape(key3.shape[0], -1))

    def seg8(key3):
        nseg = 8
        seg = hw // nseg

        def one(key):
            rk = (key >> 8).astype(jnp.float32).reshape(nseg, seg)
            v1, i1 = jax.lax.approx_max_k(rk, min(cand_cap, seg),
                                          recall_target=1.0)
            s1 = jnp.take_along_axis(
                (key.reshape(nseg, seg) & 255), i1, axis=1)
            v2, i2 = jax.lax.approx_max_k(v1.reshape(-1), cand_cap,
                                          recall_target=1.0)
            return (v2.astype(jnp.int32) << 8) | s1.reshape(-1)[i2]
        return jax.vmap(one)(key3.reshape(key3.shape[0], -1))

    return [("emit-amk", jax.jit(amk)), ("emit-topk", jax.jit(topk)),
            ("emit-seg8", jax.jit(seg8))]


def main():
    out = {"backend": jax.default_backend()}
    scene = gs.io.read_pgm("/root/reference/testdata/aruco.pgm")
    nb = 16
    batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1)
                                  for i in range(nb)]))
    h, w = scene.shape
    cap, thr = 500, 20
    cand_cap = min(cap * 4, 5000)
    it = 30

    dt = timeit(lambda b: orb_extract(b, cap, thr), batch, iters=it)
    kps = orb_extract(batch, cap, thr)
    nk = int(jnp.sum(kps.n))
    out["end_to_end_ms"] = dt * 1e3
    out["keypoints_total"] = nk
    out["kps_per_sec"] = nk / dt
    print(f"  end-to-end: {dt * 1e3:.2f} ms  {nk / dt:.0f} kps/s", flush=True)

    dt = timeit(lambda b: fast_pallas(b, thr), batch, iters=it)
    out["fast_kernel_ms"] = dt * 1e3
    print(f"  fast kernel: {dt * 1e3:.2f} ms", flush=True)

    f = jax.jit(jax.vmap(lambda im: fast(im, cand_cap, thr)[0]))
    dt = timeit(f, batch, iters=it)
    out["fast_plus_emit_ms"] = dt * 1e3
    print(f"  fast + emission: {dt * 1e3:.2f} ms", flush=True)

    # emission A/B on the kernel's real key output
    _, key3 = jax.block_until_ready(fast_pallas(batch, thr))
    ref_vals = None
    for name, fn in emission_variants(h, w, cand_cap):
        vals = np.asarray(jax.block_until_ready(fn(key3)))
        if ref_vals is None:
            ref_vals = vals
        else:
            np.testing.assert_array_equal(vals, ref_vals, err_msg=name)
        dt = timeit(fn, key3, iters=it)
        out[f"{name}_ms"] = dt * 1e3
        print(f"  {name}: {dt * 1e3:.2f} ms (exact)", flush=True)

    # selection (approx_max_k over the 2000-candidate table) + patches +
    # orientation + brief, timed on the real intermediates
    cand = jax.block_until_ready(f(batch))
    tx = jnp.clip(cand.x[:, :cap], 15, w - 16)
    ty = jnp.clip(cand.y[:, :cap], 15, h - 16)

    pe = jax.jit(lambda b, x, y: extract_patches_batched(b, x, y))
    dt = timeit(pe, batch, tx, ty, iters=it)
    out["patches_kernel_ms"] = dt * 1e3
    print(f"  patches kernel: {dt * 1e3:.2f} ms", flush=True)
    patches = jax.block_until_ready(pe(batch, tx, ty))

    po = jax.jit(jax.vmap(lambda p: _orientation_from_patches(p, 15)))
    dt = timeit(po, patches, iters=it)
    out["orientation_ms"] = dt * 1e3
    print(f"  orientation: {dt * 1e3:.2f} ms", flush=True)
    ang = jax.block_until_ready(po(patches))

    pb = jax.jit(jax.vmap(_brief_from_patches))
    dt = timeit(pb, patches, ang, iters=it)
    out["brief_ms"] = dt * 1e3
    print(f"  brief: {dt * 1e3:.2f} ms", flush=True)

    with open("/root/repo/exp/results_orb_r4.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", "profile runs on the TPU"
    main()
