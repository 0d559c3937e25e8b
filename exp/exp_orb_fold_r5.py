"""r5: in-kernel FAST key-map fold compaction — hardware validation + A/B.

The adaptive-k emission over the full 307k-key map was ORB's largest stage
(~5.1 ms of 12.5, exp/results_orb_r4.json).  fast_pallas_compact folds each
strip's key map to (1+K)*8 rows in VMEM (max/min pair folds, lane-rotated,
K=2 residual strips with open addressing) so emission runs over ~0.4L keys,
gated bit-exact on in-kernel loss counters (see kernels/fast.py).

Measures, all in ONE process on device-produced inputs:
  * hardware exactness: compact kernel's score/key == plain kernel's;
    fold invariants (nnz/subset/loss) on aruco + noise; gated emission ==
    full-map emission on both
  * emission A/B: _emit_packed_batched(full) vs _emit_compact_gated
  * end-to-end: batch-16 640x480 orb_extract kps/s (the BENCH metric)

Run: python exp/exp_orb_fold_r5.py   (TPU)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
from grayskull_tpu.kernels.fast import fast_pallas, fast_pallas_compact
from grayskull_tpu.ops.features import (_emit_compact_gated,
                                        _emit_packed_batched)
from grayskull_tpu.profiling import timeit


def main():
    out = {"backend": jax.default_backend()}
    scene = gs.io.read_pgm("/root/reference/testdata/aruco.pgm")
    nb = 16
    batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1)
                                  for i in range(nb)]))
    rng = np.random.default_rng(7)
    noise = jnp.asarray(rng.integers(0, 256, (nb, 480, 640), dtype=np.uint8))

    # --- hardware exactness ------------------------------------------------
    s0, k0 = jax.block_until_ready(fast_pallas(batch, 20))
    s1, k1, red, lost = jax.block_until_ready(fast_pallas_compact(batch, 20))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    lost_total = int(np.asarray(lost).sum())
    out["aruco_lost"] = lost_total
    kk = np.asarray(k1)
    rr = np.asarray(red)
    for f in range(nb):
        fk = np.sort(kk[f][kk[f] > 0])
        rk = np.sort(rr[f][rr[f] > 0])
        assert rk.size == fk.size - int(np.asarray(lost)[f].sum())
        assert np.isin(rk, fk).all()
    assert lost_total == 0, "aruco must stay on the compact path"

    _, kn, redn, lostn = jax.block_until_ready(fast_pallas_compact(noise, 20))
    out["noise_lost"] = int(np.asarray(lostn).sum())
    # gated emission == full emission on BOTH (one falls back, one doesn't)
    for key3, red3, lst in ((k1, red, lost), (kn, redn, lostn)):
        got = np.asarray(_emit_compact_gated(key3, red3, lst, 2000))
        want = np.asarray(_emit_packed_batched(
            key3.reshape(nb, -1), 2000))
        np.testing.assert_array_equal(got, want)
    print("exactness OK; aruco lost=0, noise lost:", out["noise_lost"])

    # --- emission A/B (jitted: eager timing here measures only the ~5 ms
    # per-op tunnel dispatch floor, not the compiled emission) -------------
    full2 = k1.reshape(nb, -1)
    t_full = timeit(jax.jit(lambda k: _emit_packed_batched(k, 2000)), full2,
                    iters=30, repeat=3)
    t_gated = timeit(
        jax.jit(lambda k, r, lo: _emit_compact_gated(k, r, lo, 2000)),
        k1, red, lost, iters=30, repeat=3)
    out["emit_full_ms"] = t_full * 1e3
    out["emit_gated_ms"] = t_gated * 1e3
    print(f"emission: full {t_full*1e3:.2f} ms  gated {t_gated*1e3:.2f} ms")

    # --- end-to-end ORB ----------------------------------------------------
    ext = jax.jit(lambda b: gs.ops.orb_extract(b, 500, 20))
    kps = jax.block_until_ready(ext(batch))
    nk = int(np.asarray(kps.n)[0])
    dt = timeit(ext, batch, iters=20, repeat=3)
    out["orb_batch16_ms"] = dt * 1e3
    out["orb_kps_per_sec"] = nb * nk / dt
    out["orb_nk"] = nk
    print(f"orb batch16: {dt*1e3:.2f} ms -> {nb*nk/dt/1e3:.0f}k kps/s (nk={nk})")

    # single-frame fast() path (uses the compact emission too)
    one = jnp.asarray(scene)
    f1 = jax.jit(lambda im: gs.ops.fast(im, 2000, 20)[0].n)
    jax.block_until_ready(f1(one))
    dt1 = timeit(f1, one, iters=30, repeat=3)
    out["fast_single_ms"] = dt1 * 1e3
    print(f"fast single: {dt1*1e3:.2f} ms")

    with open("/root/repo/exp/results_orb_fold_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    assert jax.default_backend() == "tpu"
    main()
