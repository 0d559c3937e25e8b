"""Round-3 ORB validation: Pallas patch kernel parity + throughput."""

import json
import sys

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import grayskull_tpu as gs  # noqa: E402
from grayskull_tpu.ops.features import match_orb, orb_extract  # noqa: E402
from grayskull_tpu.profiling import timeit  # noqa: E402


def main():
    cpu = jax.devices("cpu")[0]
    out = {}
    scene = gs.io.read_pgm("/root/reference/testdata/aruco.pgm")
    nb = 16
    batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1) for i in range(nb)]))
    got = orb_extract(batch, 500, 20)
    with jax.default_device(cpu):
        ref = orb_extract(jax.device_put(batch, cpu), 500, 20)
    for f in ("n", "x", "y", "response", "angle", "descriptor"):
        assert np.array_equal(np.asarray(getattr(got, f)),
                              np.asarray(getattr(ref, f))), f
    print("  batch parity: ok", flush=True)
    g1 = orb_extract(jnp.asarray(scene), 500, 20)
    for f in ("n", "x", "y", "response", "angle", "descriptor"):
        assert np.array_equal(np.asarray(getattr(g1, f)),
                              np.asarray(getattr(ref, f))[0]), f
    print("  single parity: ok", flush=True)

    dt = timeit(lambda b: orb_extract(b, 500, 20), batch, iters=30)
    nk = int(jnp.sum(got.n))
    out["kps_per_sec"] = round(nk / dt, 0)
    out["end_to_end_ms"] = round(dt * 1e3, 2)
    print(f"  batch16: {out['end_to_end_ms']} ms, {out['kps_per_sec']} kps/s",
          flush=True)
    dt1 = timeit(lambda im: orb_extract(im, 500, 20), jnp.asarray(scene), iters=30)
    out["single_fps"] = round(1 / dt1, 1)
    print(f"  single: {out['single_fps']} fps", flush=True)

    tmpl = jnp.asarray(scene)
    scene2 = jnp.asarray(np.roll(scene, 9, axis=1))

    @jax.jit
    def track_pair(a, b):
        k1 = orb_extract(a, 500, 20)
        k2 = orb_extract(b, 500, 20)
        return match_orb(k1, k2, 500, 64)

    m = track_pair(tmpl, scene2)
    dt = timeit(track_pair, tmpl, scene2, iters=30)
    out["track_pair_fps"] = round(1 / dt, 1)
    out["track_matches"] = int(m.n)
    print(f"  track: {out['track_pair_fps']} fps, {out['track_matches']} matches",
          flush=True)
    json.dump(out, open("/root/repo/exp/results_orb_v3.json", "w"), indent=2)


if __name__ == "__main__":
    main()
