import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import grayskull_tpu as gs
from grayskull_tpu.ops.features import fast, fast_scoremap, orb_extract
from grayskull_tpu.kernels.fast import fast_pallas
from grayskull_tpu.profiling import timeit

# scoremap parity vs XLA on several geometries (mirrors the TPU-gated test)
for key, hw in (("aruco", None), ("lena", None), ("grayskull", (256, 512))):
    im = gs.io.read_pgm(f"/root/reference/testdata/{key}.pgm")
    if hw is not None:
        im = im[: hw[0], : hw[1]].copy()
    for thr in (5, 20, 80):
        s_ref = np.asarray(fast_scoremap(im, thr))
        s_p, _ = fast_pallas(im[None], thr)
        assert np.array_equal(np.asarray(s_p)[0], s_ref), (key, thr)
print("  fast halo-free parity: ok", flush=True)

scene = gs.io.read_pgm("/root/reference/testdata/aruco.pgm")
batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1) for i in range(16)]))
kps = orb_extract(batch, 500, 20)
dt = timeit(lambda b: orb_extract(b, 500, 20), batch, iters=30)
print(f"  orb batch16: {dt*1e3:.2f} ms, {int(jnp.sum(kps.n))/dt:.0f} kps/s", flush=True)
