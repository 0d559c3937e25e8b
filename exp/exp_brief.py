#!/usr/bin/env python3
"""Experiment: gather-free rBRIEF formulations (VERDICT #4).

Candidates, all bit-exact targets vs the current vmapped `_brief_single`:
  a) baseline: vmap over keypoints, 512 scalar image gathers each
  b) patch: vmapped dynamic_slice 48x48 patches from a zero-padded image,
     then in-patch one-hot row-select (bf16 matmul) + col mask reduce
  c) band: row-band extraction via vmapped dynamic_slice (48, W), column
     one-hot matmul to 48x48 patches, then same in-patch sampling
  d) take: patches + flat take_along_axis (gather, small arrays)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
from grayskull_tpu.ops.features import BRIEF_PATTERN, brief_descriptor
from grayskull_tpu.libm32 import sinf, cosf_like_reference
from grayskull_tpu.profiling import timeit

PAD = 20
P = 48

_pat = np.asarray(BRIEF_PATTERN, np.float32)
_PX = jnp.asarray(np.concatenate([_pat[:, 0], _pat[:, 2]]))  # (512,)
_PY = jnp.asarray(np.concatenate([_pat[:, 1], _pat[:, 3]]))


def _rot_coords(x, y, angle):
    """Rotated integer sample coords, patch-relative. x,y,angle: (N,)."""
    sin_a = sinf(angle)[:, None]
    cos_a = cosf_like_reference(angle)[:, None]
    dx = (_PX[None, :] * cos_a - _PY[None, :] * sin_a).astype(jnp.int32)
    dy = (_PX[None, :] * sin_a + _PY[None, :] * cos_a).astype(jnp.int32)
    return dx + PAD, dy + PAD  # in [0, 41)


def _bits_pack(vals):
    v1 = vals[:, :256]
    v2 = vals[:, 256:]
    bits = (v1 > v2).astype(jnp.uint32)  # (N, 256)
    weights = jnp.asarray((1 << np.arange(32, dtype=np.int64)).astype(np.uint32))
    return jnp.sum(bits.reshape(-1, 8, 32) * weights[None, None, :], axis=2,
                   dtype=jnp.uint32)


def _patches(img, x, y):
    imgp = jnp.pad(img, PAD)
    return jax.vmap(
        lambda xx, yy: jax.lax.dynamic_slice(imgp, (yy, xx), (P, P))
    )(x, y)  # origin image(y-PAD, x-PAD)


def _sample_onehot(patches, dx, dy):
    ar = jnp.arange(P)
    oh_y = (dy[:, :, None] == ar[None, None, :]).astype(jnp.bfloat16)  # (N,512,P)
    oh_x = (dx[:, :, None] == ar[None, None, :]).astype(jnp.float32)
    pb = patches.astype(jnp.bfloat16)
    rows = jnp.einsum("nkp,npq->nkq", oh_y, pb,
                      preferred_element_type=jnp.float32)  # (N,512,P)
    return jnp.sum(rows * oh_x, axis=-1)  # (N,512)


@jax.jit
def brief_b(img, x, y, angle):
    dx, dy = _rot_coords(x, y, angle)
    pat = _patches(img, x, y)
    return _bits_pack(_sample_onehot(pat, dx, dy))


@jax.jit
def brief_c(img, x, y, angle):
    h, w = img.shape
    dx, dy = _rot_coords(x, y, angle)
    imgp = jnp.pad(img, ((PAD, PAD + P), (PAD, PAD + P)))
    band = jax.vmap(
        lambda yy: jax.lax.dynamic_slice(imgp, (yy, 0), (P, w + 2 * PAD + P))
    )(y)  # (N, P, W')
    ar = jnp.arange(w + 2 * PAD + P)
    oh_c = (x[:, None, None] + jnp.arange(P)[None, None, :] ==
            ar[None, :, None]).astype(jnp.bfloat16)  # (N, W', P)
    pat = jnp.einsum("npw,nwq->npq", band.astype(jnp.bfloat16), oh_c,
                     preferred_element_type=jnp.float32)
    return _bits_pack(_sample_onehot(pat, dx, dy))


@jax.jit
def brief_d(img, x, y, angle):
    dx, dy = _rot_coords(x, y, angle)
    pat = _patches(img, x, y).reshape(-1, P * P).astype(jnp.int32)
    idx = dy * P + dx
    vals = jnp.take_along_axis(pat, idx, axis=1)
    return _bits_pack(vals.astype(jnp.float32))


def main():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (480, 640), dtype=np.uint8)
    N = 500
    x = rng.integers(15, 640 - 15, N).astype(np.int32)
    y = rng.integers(15, 480 - 15, N).astype(np.int32)
    angle = rng.uniform(-np.pi, np.pi, N).astype(np.float32)
    ji, jx, jy, ja = map(jnp.asarray, (img, x, y, angle))

    ref = np.asarray(brief_descriptor(ji, jx, jy, ja))
    for name, fn in [("b_patch_onehot", brief_b), ("c_band_matmul", brief_c),
                     ("d_take", brief_d)]:
        try:
            out = np.asarray(fn(ji, jx, jy, ja))
            ok = np.array_equal(out, ref)
            dt = timeit(fn, ji, jx, jy, ja, iters=10)
            print(f"{name}: exact={ok}  {dt*1e3:.2f} ms  "
                  f"({N/dt/1e3:.1f}k desc/s)")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")

    dt = timeit(brief_descriptor, ji, jx, jy, ja, iters=3)
    print(f"a_baseline: {dt*1e3:.2f} ms  ({N/dt/1e3:.1f}k desc/s)")


if __name__ == "__main__":
    main()
