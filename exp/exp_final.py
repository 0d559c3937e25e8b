"""Final pipeline assembly: k1 mxu2 + otsu + k2, end-to-end."""
import functools
import sys
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from grayskull_tpu.ops.histogram import otsu_from_histogram
from grayskull_tpu.pipelines.preproc import preprocess as old_pipeline
from grayskull_tpu.profiling import timeit
import exp_tune3 as T3
import exp_tune2 as T2


@functools.partial(jax.jit, static_argnames=("radius", "blk"))
def pipeline_v3(imgs, radius=2, blk=256):
    blurred, hist = T3.blur_hist_mxu2(imgs, radius, blk, "full")
    t = otsu_from_histogram(hist, imgs.shape[-2] * imgs.shape[-1])
    binary, edges = T2.k2_t(blurred, t, blk, "full")
    return blurred, binary, edges, t


def main():
    n, h, w = 256, 1024, 1024
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (n, h, w), dtype=np.uint8))
    us = lambda dt: dt / n * 1e6
    print("backend:", jax.default_backend())

    # parity vs composed-ops XLA reference path on realistic + noise data
    import grayskull_tpu as gs, os
    lena = gs.io.read_pgm("/root/reference/testdata/lena.pgm")
    reps = (h // lena.shape[0] + 1, w // lena.shape[1] + 1)
    frame = np.tile(lena, reps)[:h, :w]
    lenabatch = jnp.asarray(np.stack([np.roll(frame, 13 * i, axis=1) for i in range(8)]))
    from grayskull_tpu.pipelines.preproc import preprocess_reference
    for name, batch in (("noise", imgs[:8]), ("lena", lenabatch)):
        ref = preprocess_reference(batch, 2)
        out = pipeline_v3(batch, 2)
        oks = [np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(out, ref)]
        print(f"parity {name}: blurred={oks[0]} binary={oks[1]} edges={oks[2]} t={oks[3]}")

    for name, fn in [
        ("PIPELINE v3        ", lambda: pipeline_v3(imgs, 2)),
        ("PIPELINE old       ", lambda: old_pipeline(imgs, 2)),
        ("k2 only            ", lambda: T2.k2_t(imgs, jnp.full((n,), 128, jnp.uint8), 256, "full")),
        ("otsu only          ", lambda: otsu_from_histogram(jnp.ones((n, 256), jnp.int32), h * w)),
    ]:
        dt = timeit(fn, iters=20)
        print(f"{name}: {us(dt):8.1f} us/frame  ({n/dt:8.0f} fps)")


if __name__ == "__main__":
    main()
