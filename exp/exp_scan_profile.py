"""Round-3 document-scanner profile (VERDICT r2 weak #3).

Measures, on the real TPU:
  * the CCL ``lax.while_loop`` iteration count on the real binarized
    document/receipt frames (the fixpoint's serial depth);
  * per-stage latency: binarize | label_components | blobs aggregation |
    corners | warp — single frame and batch-8.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python exp/exp_scan_profile.py
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import grayskull_tpu as gs  # noqa: E402
from grayskull_tpu.ops.blobs import (  # noqa: E402
    _packed_vbits, blob_corners, blobs, label_components,
)
from grayskull_tpu.ops.warp import perspective_correct  # noqa: E402
from grayskull_tpu.pipelines.scan import preprocess_binarize, scan  # noqa: E402
from grayskull_tpu.profiling import timeit  # noqa: E402


@jax.jit
def label_components_counted(img):
    """ops.blobs.label_components fast path + an iteration counter."""
    h, w = img.shape
    big = jnp.int32(h * w)
    fg = img >= 128
    bg = ~fg
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    L0 = jnp.where(fg, idx, big)
    vbits = _packed_vbits(h, w)
    assert vbits is not None
    vmask = jnp.int32((1 << vbits) - 1)
    fgl = jnp.concatenate([jnp.zeros((h, 1), bool), fg[:, :-1]], 1)
    fgr = jnp.concatenate([fg[:, 1:], jnp.zeros((h, 1), bool)], 1)
    fgt = jnp.concatenate([jnp.zeros((1, w), bool), fg[:-1]], 0)
    fgb = jnp.concatenate([fg[1:], jnp.zeros((1, w), bool)], 0)
    rids = (
        (1, False, jnp.cumsum((fg & ~fgl).astype(jnp.int32), axis=1)),
        (1, True, jnp.cumsum((fg & ~fgr).astype(jnp.int32)[:, ::-1], axis=1)[:, ::-1]),
        (0, False, jnp.cumsum((fg & ~fgt).astype(jnp.int32), axis=0)),
        (0, True, jnp.cumsum((fg & ~fgb).astype(jnp.int32)[::-1], axis=0)[::-1]),
    )

    def body(state):
        L, _, it = state
        out = L
        for axis, reverse, rid in rids:
            key = (rid << vbits) | (~out & vmask)
            m = jax.lax.cummax(key, axis=axis, reverse=reverse)
            out = jnp.minimum(out, jnp.where(bg, big, ~m & vmask))
        return out, jnp.any(out != L), it + 1

    L, _, iters = jax.lax.while_loop(
        lambda s: s[1], body, (L0, jnp.bool_(True), jnp.int32(0))
    )
    return jnp.where(fg, L, jnp.int32(-1)), iters


def main():
    out = {"backend": jax.default_backend()}
    ref = "/root/reference/testdata"
    for name in ("document", "receipt"):
        img = jnp.asarray(gs.io.read_pgm(f"{ref}/{name}.pgm"))
        binary = preprocess_binarize(img)
        labels, iters = label_components_counted(binary)
        out[f"{name}_ccl_iters"] = int(iters)
        out[f"{name}_shape"] = list(img.shape)

        it = 20
        out[f"{name}_binarize_ms"] = timeit(preprocess_binarize, img, iters=it) * 1e3
        out[f"{name}_label_ms"] = timeit(label_components, binary, iters=it) * 1e3
        out[f"{name}_blobs_ms"] = timeit(lambda b: blobs(b, 1000), binary, iters=it) * 1e3
        table, labmap, _ = blobs(binary, 1000)
        largest = jnp.argmax(table.area).astype(jnp.int32)
        from grayskull_tpu.core import Point, Rect
        bb = Rect(table.box.x[largest], table.box.y[largest],
                  table.box.w[largest], table.box.h[largest])
        cc = Point(table.centroid.x[largest], table.centroid.y[largest])
        out[f"{name}_corners_ms"] = timeit(
            lambda b: blob_corners(b, labmap, table.label[largest], bb, cc),
            binary, iters=it,
        ) * 1e3
        corners = blob_corners(binary, labmap, table.label[largest], bb, cc)
        out[f"{name}_warp_ms"] = timeit(
            lambda im: perspective_correct(im, corners, (1000, 800)), img, iters=it
        ) * 1e3
        out[f"{name}_scan_total_ms"] = timeit(lambda im: scan(im), img, iters=it) * 1e3

    # batched scan (the weak batched-fps metric)
    doc = gs.io.read_pgm(f"{ref}/document.pgm")
    db = jnp.asarray(np.stack([np.roll(doc, 3 * i, axis=1) for i in range(8)]))
    dtb = timeit(lambda b: scan(b), db, iters=10)
    out["scan_batched8_fps"] = 8 / dtb
    # batched CCL iteration count (vmap -> all frames run the max count)
    lab_b = jax.vmap(label_components_counted)(jax.vmap(preprocess_binarize)(db))
    out["batched8_ccl_iters_max"] = int(jnp.max(lab_b[1]))

    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 2)
    print(json.dumps(out, indent=2))
    with open("/root/repo/exp/results_scan_profile.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
