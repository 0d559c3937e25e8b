#!/usr/bin/env python3
"""Experiment: faster label_components inner loop (VERDICT #5 follow-up).

Variants on document.pgm binarized:
  a) current: (value, barrier) pair associative scans + pointer jump
  b) packed cummax: key = runid<<21 | (~value & M21), lax.cummax per direction
     (runids precomputed once), + pointer jump
  c) b without pointer jump
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
from grayskull_tpu.ops.blobs import label_components, _segmented_min_scans
from grayskull_tpu.pipelines.scan import preprocess_binarize
from grayskull_tpu.profiling import timeit

M21 = (1 << 21) - 1


def make_packed(img):
    h, w = img.shape
    big = jnp.int32(h * w)
    fg = img >= 128
    bg = ~fg
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    L0 = jnp.where(fg, idx, big)

    # run ids per direction (monotone along scan direction), once
    fgl = jnp.concatenate([jnp.zeros((h, 1), bool), fg[:, :-1]], 1)
    fgr = jnp.concatenate([fg[:, 1:], jnp.zeros((h, 1), bool)], 1)
    fgt = jnp.concatenate([jnp.zeros((1, w), bool), fg[:-1]], 0)
    fgb = jnp.concatenate([fg[1:], jnp.zeros((1, w), bool)], 0)
    rid = {
        ("x", False): jnp.cumsum((fg & ~fgl).astype(jnp.int32), axis=1),
        ("x", True): jnp.cumsum((fg & ~fgr).astype(jnp.int32)[:, ::-1], axis=1)[:, ::-1],
        ("y", False): jnp.cumsum((fg & ~fgt).astype(jnp.int32), axis=0),
        ("y", True): jnp.cumsum((fg & ~fgb).astype(jnp.int32)[::-1], axis=0)[::-1],
    }

    def scans(L):
        out = L
        for axis_name, axis in (("x", 1), ("y", 0)):
            for reverse in (False, True):
                r = rid[(axis_name, reverse)]
                key = (r << 21) | (~out & M21)
                m = jax.lax.cummax(key, axis=axis, reverse=reverse)
                v = ~m & M21
                out = jnp.minimum(out, jnp.where(bg, big, v))
        return out

    def jump(L, Ln):
        flat = L.reshape(-1)
        tgt = jnp.clip(Ln.reshape(-1), 0, h * w - 1)
        Lj = jnp.where(Ln.reshape(-1) < big, flat[tgt], big).reshape(h, w)
        return jnp.minimum(Ln, Lj)

    @jax.jit
    def run_b():
        def body(state):
            L, _ = state
            Ln = scans(L)
            Ln2 = jump(L, Ln)
            return Ln2, jnp.any(Ln2 != L)

        L, _ = jax.lax.while_loop(lambda s: s[1], body, (L0, jnp.bool_(True)))
        return jnp.where(fg, L, jnp.int32(-1))

    @jax.jit
    def run_c():
        def body(state):
            L, _ = state
            Ln = scans(L)
            return Ln, jnp.any(Ln != L)

        L, _ = jax.lax.while_loop(lambda s: s[1], body, (L0, jnp.bool_(True)))
        return jnp.where(fg, L, jnp.int32(-1))

    return run_b, run_c


def main():
    ref = os.environ.get("GRAYSKULL_REF", "/root/reference")
    doc = jnp.asarray(gs.io.read_pgm(os.path.join(ref, "testdata", "document.pgm")))
    binary = preprocess_binarize(doc)
    want = np.asarray(label_components(binary))
    run_b, run_c = make_packed(binary)
    for name, fn in (("b_cummax+jump", run_b), ("c_cummax", run_c)):
        got = np.asarray(fn())
        print(name, "exact:", np.array_equal(got, want),
              "%.2f ms" % (timeit(fn, iters=10) * 1e3))
    print("a_current: %.2f ms" % (timeit(label_components, binary, iters=10) * 1e3))

    # also a worst-case zigzag to check convergence behavior
    z = np.zeros((256, 256), np.uint8)
    for i in range(0, 256, 4):
        z[i, : 255] = 255
        z[i + 2, 1:256] = 255
        z[i + 1, 254] = 255 if (i // 4) % 2 == 0 else 0
        z[i + 1, 1] = 0 if (i // 4) % 2 == 0 else 255
        z[i + 1, 254 if (i//4)%2==0 else 1] = 255
        z[i + 3, 1] = 255 if (i // 4) % 2 == 1 else 0
    zi = jnp.asarray(z)
    wantz = np.asarray(label_components(zi))
    run_bz, run_cz = make_packed(zi)
    for name, fn in (("b zigzag", run_bz), ("c zigzag", run_cz)):
        got = np.asarray(fn())
        print(name, "exact:", np.array_equal(got, wantz),
              "%.2f ms" % (timeit(fn, iters=10) * 1e3))
    print("a zigzag: %.2f ms" % (timeit(label_components, zi, iters=10) * 1e3))


if __name__ == "__main__":
    main()
