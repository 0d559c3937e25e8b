"""Round-3 ORB stage profile (VERDICT r2 weak #4 / next #6).

Times each stage of ``orb_extract`` separately on batch-16 640x480:
FAST Pallas kernel | top_k emission | argsort (stable sort by response) |
patch extraction | orientation-from-patches | BRIEF one-hot einsum,
plus the end-to-end call — to see which stage bounds the 247k kps/s.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python exp/exp_orb_profile.py
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import grayskull_tpu as gs  # noqa: E402
from grayskull_tpu.kernels.fast import fast_pallas  # noqa: E402
from grayskull_tpu.ops.features import (  # noqa: E402
    _brief_from_patches, _extract_patches, _orientation_from_patches, fast,
    orb_extract,
)
from grayskull_tpu.profiling import timeit  # noqa: E402


def main():
    out = {"backend": jax.default_backend()}
    scene = gs.io.read_pgm("/root/reference/testdata/aruco.pgm")
    nb = 16
    batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1) for i in range(nb)]))
    h, w = scene.shape
    cap, thr = 500, 20
    cand_cap = min(cap * 4, 5000)
    it = 30

    # end to end
    dt = timeit(lambda b: orb_extract(b, cap, thr), batch, iters=it)
    kps = orb_extract(batch, cap, thr)
    nk = int(jnp.sum(kps.n))
    out["end_to_end_ms"] = dt * 1e3
    out["keypoints_total"] = nk
    out["kps_per_sec"] = nk / dt

    # stage 1: fused FAST kernel (scoremap + NMS + packed keys)
    dt = timeit(lambda b: fast_pallas(b, thr), batch, iters=it)
    out["fast_kernel_ms"] = dt * 1e3

    # stage 2: full fast() = kernel + top_k emission
    f = jax.jit(jax.vmap(lambda im: fast(im, cand_cap, thr)[0]))
    dt = timeit(f, batch, iters=it)
    out["fast_plus_topk_ms"] = dt * 1e3
    cand = f(batch)

    # stage 3: stable argsort of the 2000-wide candidate table
    @jax.jit
    def sort_stage(kps_b):
        def one(kk):
            valid = jnp.arange(cand_cap) < kk.n
            key = jnp.where(valid, -kk.response, 1)
            order = jnp.argsort(key, stable=True)
            return kk.x[order], kk.y[order], kk.response[order]
        return jax.vmap(one)(kps_b)

    dt = timeit(sort_stage, cand, iters=it)
    out["argsort_ms"] = dt * 1e3
    sx, sy, sr = sort_stage(cand)
    tx = jnp.clip(sx[:, :cap], 15, w - 16)
    ty = jnp.clip(sy[:, :cap], 15, h - 16)

    # stage 4: patch extraction (vmapped dynamic_slice)
    pe = jax.jit(jax.vmap(_extract_patches))
    dt = timeit(pe, batch, tx, ty, iters=it)
    out["patches_ms"] = dt * 1e3
    patches = pe(batch, tx, ty)

    # stage 5: orientation from patches
    po = jax.jit(jax.vmap(lambda p: _orientation_from_patches(p, 15)))
    dt = timeit(po, patches, iters=it)
    out["orientation_ms"] = dt * 1e3
    ang = po(patches)

    # stage 6: BRIEF one-hot einsum
    pb = jax.jit(jax.vmap(_brief_from_patches))
    dt = timeit(pb, patches, ang, iters=it)
    out["brief_ms"] = dt * 1e3

    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 3)
    print(json.dumps(out, indent=2))
    with open("/root/repo/exp/results_orb_profile.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
