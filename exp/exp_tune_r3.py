"""Round-3 tuning experiments (one process, A/B):

1. LBP strip height th=24 at step 1 (budget override) — does the real
   scoped-VMEM usage fit, and what's the windows/s?
2. `lax.approx_max_k(recall_target=1.0)` vs `lax.top_k` for the FAST
   scan-order emission (exact? faster?).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python exp/exp_tune_r3.py
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import grayskull_tpu as gs  # noqa: E402
from grayskull_tpu.cascade import load_frontalface  # noqa: E402
from grayskull_tpu.profiling import timeit  # noqa: E402


def main():
    out = {}
    casc = load_frontalface()
    scene = gs.io.read_pgm("/root/reference/testdata/aruco.pgm")

    # ---------- 2. approx_max_k vs top_k on FAST keys ----------
    from grayskull_tpu.kernels.fast import fast_pallas

    nb = 16
    batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1) for i in range(nb)]))
    _, keys = fast_pallas(batch, 20)
    kflat = keys.reshape(nb, -1)

    @jax.jit
    def via_topk(k):
        return jax.lax.top_k(k, 2000)[0]

    @jax.jit
    def via_approx(k):
        return jax.lax.approx_max_k(k.astype(jnp.float32), 2000,
                                    recall_target=1.0)[0].astype(jnp.int32)

    a = via_topk(kflat)
    b = via_approx(kflat)
    # order + content must match exactly (scan-order emission depends on it)
    out["approx_exact"] = bool(jnp.array_equal(a, b))
    out["topk_ms"] = round(timeit(via_topk, kflat, iters=30) * 1e3, 2)
    out["approx_ms"] = round(timeit(via_approx, kflat, iters=30) * 1e3, 2)
    print(f"  top_k {out['topk_ms']} ms vs approx {out['approx_ms']} ms, "
          f"exact={out['approx_exact']}", flush=True)

    # ---------- 1. LBP th=24 (budget override) ----------
    import grayskull_tpu.kernels.lbp as KL
    from grayskull_tpu.ops.lbp import lbp_detect, scale_ladder

    fb = np.stack([np.roll(scene, 7 * i, axis=1) for i in range(32)])
    iib = jnp.asarray(np.asarray(gs.integral(jnp.asarray(fb))))
    lad = scale_ladder(casc, 640, 480, 1.2, 1.0, 4.0)
    nwin = sum(((480 - wh) + 1) * ((640 - ww) + 1) for _, ww, wh in lad)

    dt = timeit(lambda x: lbp_detect(casc, x, 100, 1.2, 1.0, 4.0, 1), iib, iters=15)
    out["lbp_th16_Mwin"] = round(32 * nwin / dt / 1e6, 1)
    ref = lbp_detect(casc, iib, 100, 1.2, 1.0, 4.0, 1)
    print(f"  th16 baseline: {out['lbp_th16_Mwin']} Mwin/s", flush=True)

    orig = KL._padded_dims

    def padded_dims_24(cascade, scale, ny, nx, step):
        tw = KL._pick_tw(nx)
        for th in ((24, 16, 8) if step == 1 else (8,)):
            geo = KL._plan(cascade, scale, tw, th, step)
            nty, ntx = -(-ny // th), -(-nx // tw)
            Hp = (nty - 1) * th + geo["rh"]
            Wp = (ntx - 1) * tw + geo["rw"]
            best = (tw, th, geo, nty, ntx, Hp, Wp)
            if th == 24 or KL._vmem_estimate(geo, th, tw, step, Hp, Wp) <= KL._VMEM_BLOCK_BYTES:
                return best
        return best

    KL._padded_dims = padded_dims_24
    try:
        got = lbp_detect(casc, iib, 101, 1.2, 1.0, 4.0, 1)  # 101: new jit key
        ok = bool(jnp.array_equal(jnp.stack([ref.n]), jnp.stack([got.n])))
        dt = timeit(lambda x: lbp_detect(casc, x, 101, 1.2, 1.0, 4.0, 1), iib, iters=15)
        out["lbp_th24_Mwin"] = round(32 * nwin / dt / 1e6, 1)
        out["lbp_th24_n_match"] = ok
        print(f"  th24: {out['lbp_th24_Mwin']} Mwin/s (n match: {ok})", flush=True)
    except Exception as e:  # noqa: BLE001
        out["lbp_th24_error"] = repr(e)[:200]
        print(f"  th24 FAILED: {out['lbp_th24_error']}", flush=True)
    finally:
        KL._padded_dims = orig

    json.dump(out, open("/root/repo/exp/results_tune_r3.json", "w"), indent=2)


if __name__ == "__main__":
    main()
