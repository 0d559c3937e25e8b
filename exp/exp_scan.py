#!/usr/bin/env python3
"""Profile the document scanner latency (VERDICT #5): which stage eats 141 ms?"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
from grayskull_tpu.ops.blobs import blobs, label_components, blob_corners, _segmented_min_scans
from grayskull_tpu.pipelines.scan import preprocess_binarize, scan
from grayskull_tpu.profiling import timeit

ref = os.environ.get("GRAYSKULL_REF", "/root/reference")
doc = jnp.asarray(gs.io.read_pgm(os.path.join(ref, "testdata", "document.pgm")))
print("doc", doc.shape)

binary = preprocess_binarize(doc)
binary.block_until_ready()

t = timeit(preprocess_binarize, doc, iters=20)
print(f"preprocess_binarize: {t*1e3:.2f} ms")

t = timeit(label_components, binary, iters=5)
print(f"label_components:    {t*1e3:.2f} ms")

t = timeit(lambda b: blobs(b, 1000), binary, iters=5)
print(f"blobs total:         {t*1e3:.2f} ms")

tbl, labels, _ = blobs(binary, 1000)
largest = int(jnp.argmax(tbl.area))
from grayskull_tpu.core import Point, Rect
box = Rect(tbl.box.x[largest], tbl.box.y[largest], tbl.box.w[largest], tbl.box.h[largest])
cent = Point(tbl.centroid.x[largest], tbl.centroid.y[largest])
lab = tbl.label[largest]
t = timeit(lambda b: blob_corners(b, labels, lab, box, cent), binary, iters=10)
print(f"blob_corners:        {t*1e3:.2f} ms")

corners = blob_corners(binary, labels, lab, box, cent)
from grayskull_tpu.ops.warp import perspective_correct
t = timeit(lambda im: perspective_correct(im, corners, (1000, 800)), doc, iters=10)
print(f"perspective:         {t*1e3:.2f} ms")

t = timeit(lambda im: scan(im), doc, iters=5)
print(f"scan end-to-end:     {t*1e3:.2f} ms")

# while-loop iteration count + per-iteration cost
h, w = binary.shape
big = jnp.int32(h * w)
fg = binary >= 128
bg = ~fg
idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
L = jnp.where(fg, idx, big)


@jax.jit
def step(L):
    Ln = _segmented_min_scans(L, bg, big)
    flat = L.reshape(-1)
    tgt = jnp.clip(Ln.reshape(-1), 0, h * w - 1)
    Lj = jnp.where(Ln.reshape(-1) < big, flat[tgt], big).reshape(h, w)
    return jnp.minimum(Ln, Lj)


@jax.jit
def scans_only(L):
    return _segmented_min_scans(L, bg, big)


it = 0
cur = L
while True:
    nxt = step(cur)
    it += 1
    if bool(jnp.all(nxt == cur)) or it > 50:
        break
    cur = nxt
print(f"while iterations: {it}")

t = timeit(step, L, iters=10)
print(f"one body step:       {t*1e3:.2f} ms")
t = timeit(scans_only, L, iters=10)
print(f"  scans only:        {t*1e3:.2f} ms")

# aggregation cost = blobs - label_components
