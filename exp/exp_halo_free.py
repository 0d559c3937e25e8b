import sys, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import grayskull_tpu as gs
from grayskull_tpu.pipelines.preproc import preprocess, preprocess_reference
from grayskull_tpu.profiling import timeit

rng = np.random.default_rng(7)
frame = rng.integers(0, 256, (1024, 1024), dtype=np.uint8)
lena = gs.io.read_pgm("/root/reference/testdata/lena.pgm")
for name, b in (("rand", np.stack([frame, 255 - frame])), ("lena", np.stack([lena] * 2))):
    for r in (1, 2, 5):
        got = preprocess(jnp.asarray(b), radius=r)
        ref = preprocess_reference(jnp.asarray(b), radius=r)
        for nm, a, c in zip(("blurred", "binary", "edges", "t"), got, ref):
            assert np.array_equal(np.asarray(a), np.asarray(c)), (name, r, nm)
print("  parity: ok", flush=True)
n = 256
batch = jnp.asarray(np.stack([np.roll(frame, 13 * i, axis=1) for i in range(n)]))
dt = timeit(preprocess, batch, iters=30)
print(f"  halo-free preprocess: {n/dt:.0f} fps ({dt*1e3:.2f} ms)", flush=True)
dt2 = timeit(lambda x: preprocess(x, want_binary=False), batch, iters=30)
print(f"  edges-only: {n/dt2:.0f} fps", flush=True)
