#!/usr/bin/env python3
"""A/B: spatially-sharded Pallas shard body vs the unsharded fused kernels.

VERDICT r3 item 3 acceptance: on ONE chip, the shard_map body that reuses the
fused kernel pair (mesh (1, 1), so halo exchanges are self-permutes and the
psum is a no-op) must land within ~15% of the unsharded kernel path — i.e.
the sharding layer adds collectives, not a reformulation penalty.

Run on the TPU: python exp/exp_sharded_kernels.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import grayskull_tpu as gs  # noqa: E402
from grayskull_tpu import profiling  # noqa: E402
from grayskull_tpu.kernels.preproc import (  # noqa: E402
    fused_blur_hist,
    fused_threshold_sobel,
)
from grayskull_tpu.ops.histogram import otsu_from_histogram  # noqa: E402
from grayskull_tpu.parallel import make_mesh, preprocess_spatial_shardmap  # noqa: E402


def unsharded(imgs):
    blurred, hist = fused_blur_hist(imgs, 2)
    t = otsu_from_histogram(hist, imgs.shape[1] * imgs.shape[2])
    binary, edges = fused_threshold_sobel(blurred, t)
    return blurred, binary, edges, t


def main():
    n, h, w = 64, 1024, 1024
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (n, h, w), dtype=np.uint8))

    mesh = make_mesh((1, 1), devices=jax.devices()[:1])

    # correctness first: shard body (kernels=True) == unsharded kernels
    small = imgs[:4, :256]
    a = preprocess_spatial_shardmap(small, mesh, kernels=True)
    b = unsharded(small)
    for name, x, y in zip(("blurred", "binary", "edges", "t"), a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=name)
    print("bit-exact: shard body == unsharded kernels", flush=True)

    t_un = profiling.timeit(unsharded, imgs, iters=10, warmup=3)
    t_sh = profiling.timeit(
        lambda x: preprocess_spatial_shardmap(x, mesh, kernels=True),
        imgs, iters=10, warmup=3)
    t_xla = profiling.timeit(
        lambda x: preprocess_spatial_shardmap(x, mesh, kernels=False),
        imgs, iters=10, warmup=3)

    out = {
        "unsharded_kernels_ms": t_un * 1e3,
        "shard_body_kernels_ms": t_sh * 1e3,
        "shard_body_xla_ms": t_xla * 1e3,
        "kernels_overhead_vs_unsharded": t_sh / t_un - 1,
        "fps_unsharded": n / t_un,
        "fps_shard_kernels": n / t_sh,
        "fps_shard_xla": n / t_xla,
    }
    print(json.dumps(out, indent=2))
    with open("exp/results_sharded_kernels.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
