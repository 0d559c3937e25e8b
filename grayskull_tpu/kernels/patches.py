"""Pallas keypoint-patch extractor — the TPU fast path behind
``ops.features._extract_patches``.

The XLA formulation (vmapped ``dynamic_slice``) lowers to a multi-element
gather and measured **10.9 ms for 32k patches** (batch-16 x 2000 keypoints)
— the dominant ORB stage (r3 profile).  This kernel selects each 48x48
patch out of an aligned VMEM window instead:

* the padded int16 frame is one revisited VMEM block per frame (i8 dynamic
  slices are unsupported; int16 halves the int32 footprint);
* per keypoint, an aligned (64, 256) window is sliced at
  ``(floor16(y-20), floor128(x-20))`` (scalar-prefetch arrays), and the
  misaligned 48x48 patch comes out with one one-hot row-select matmul and
  one shift-matrix column-select matmul (~1.4 MMAC/keypoint — uint8 values
  are exact in bf16/f32);
* keypoints are processed ``KP_BLK`` per grid step to amortize step
  overhead.

Samples are exactly ``imgp[y-20+r, x-20+c]`` with the same zero padding as
the XLA path, so descriptors and orientations are bit-identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["extract_patches_batched", "patches_pallas_available"]

KP_BLK = 64   # keypoints per grid step
# full unroll measured 2.2x the rolled loop (11.62 -> 5.21 ms for 32k
# patches, bit-exact — exp/results_orb_tune2_r5.json): each iteration is
# two tiny MXU ops at ~5% utilization and Mosaic only pipelines the window
# slice + selects across iterations when the loop is unrolled.  Mosaic's
# fori_loop supports exactly unroll=1 or unroll=num_steps; 64 x ~20 ops is
# well under the ~5k-op compile-time blowup threshold.
KP_UNROLL = KP_BLK
_WIN_H = 64   # aligned window rows (>= 15 misalign + 48)
_WIN_W = 256  # aligned window cols (>= 127 misalign + 48)
_P = 48       # patch size (ops.features._BRIEF_PATCH)
_PAD = 20     # ops.features._BRIEF_PAD


def _round(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def patches_pallas_available(h: int, w: int) -> bool:
    hp = _round(h + _PAD + _P, 16) + _WIN_H
    wp = _round(w + _PAD + _P, 128) + _WIN_W
    return w >= 128 and hp * wp * 2 <= 4 * 1024 * 1024


def _patch_kernel(pk_ref, img_ref, out_ref, *, nkb: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    base = (i * nkb + j) * KP_BLK

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (_P, _WIN_H), 1)  # [p_row, win_row]
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (_WIN_W, _P), 0)  # [win_col, p_col]
    p_row = jax.lax.broadcasted_iota(jnp.int32, (_P, _WIN_H), 0)
    p_col = jax.lax.broadcasted_iota(jnp.int32, (_WIN_W, _P), 1)

    def body(k, _):
        # one packed (ys << 15 | xs) scalar per keypoint: four separate
        # prefetch arrays hit the 1 MB SMEM capacity at batch 128 x 500 kps
        # (measured compile OOM, exp_orb_scale_r5) — SMEM scalar shifts are
        # free next to the two MXU selects below
        pk = pk_ref[base + k]
        ys = pk >> 15
        xs = pk & 0x7FFF
        ry = pl.multiple_of((ys >> 4) << 4, 16)
        rx = pl.multiple_of((xs >> 7) << 7, 128)
        oy = ys & 15   # in [0, 16): patch row r = window row oy + r
        ox = xs & 127  # in [0, 128)
        win = img_ref[0, pl.ds(ry, _WIN_H), pl.ds(rx, _WIN_W)]  # (64, 256) i16
        winf = win.astype(jnp.int32).astype(jnp.bfloat16)
        oh_r = (r_iota == oy + p_row).astype(jnp.bfloat16)  # (P, WIN_H)
        oh_c = (c_iota == ox + p_col).astype(jnp.bfloat16)  # (WIN_W, P)
        rows = jax.lax.dot_general(
            oh_r, winf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, WIN_W)
        patch = jax.lax.dot_general(
            rows.astype(jnp.bfloat16), oh_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, P); exact: one-hot x uint8-valued
        out_ref[0, k] = patch.astype(jnp.int32).astype(jnp.uint8)  # no f32->u8
        return 0

    jax.lax.fori_loop(0, KP_BLK, body, 0, unroll=KP_UNROLL)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _extract_pallas(imgp, packed, interpret: bool = False):
    n = imgp.shape[0]
    nk = packed.shape[0] // n
    nkb = nk // KP_BLK
    hp, wp = imgp.shape[1:]
    coordless = pl.BlockSpec((1, KP_BLK, _P, _P),
                             lambda i, j, *refs: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # packed (ys << 15 | xs) per keypoint
        grid=(n, nkb),
        in_specs=[
            pl.BlockSpec((1, hp, wp), lambda i, j, *refs: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=coordless,
    )
    return pl.pallas_call(
        functools.partial(_patch_kernel, nkb=nkb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, nk, _P, _P), jnp.uint8),
        interpret=interpret,
    )(packed, imgp)


def extract_patches_batched(imgs, x, y, interpret: bool = False):
    """(N, H, W) uint8 + (N, K) int32 keypoint coords -> (N, K, 48, 48)
    uint8 patches, ``patch[r, c] = imgp[y - 20 + r, x - 20 + c]`` with zeros
    outside the frame — identical to ``_extract_patches``'s contract.
    ``K`` is padded to a multiple of ``KP_BLK`` internally."""
    n, h, w = imgs.shape
    nk = x.shape[1]
    nkp = _round(nk, KP_BLK)
    hp = _round(h + _PAD + _P, 16) + _WIN_H
    wp = _round(w + _PAD + _P, 128) + _WIN_W
    imgp = jnp.pad(imgs, ((0, 0), (_PAD, hp - h - _PAD), (_PAD, wp - w - _PAD))
                   ).astype(jnp.int16)
    # start of the patch in padded coords; clips keep unused pad rows valid
    def prep(c, lim):
        cc = jnp.pad(c, ((0, 0), (0, nkp - nk)), mode="edge")
        return jnp.clip(cc, 0, lim)  # patch start = c (padded coords: c-20+PAD)

    ys = prep(y, h + _PAD)  # start row in padded frame = y - 20 + PAD = y
    xs = prep(x, w + _PAD)
    # ry = (ys >> 4) << 4 <= ys <= h + 20 <= hp - _WIN_H (and same for rx),
    # so the aligned window always fits without a clip; 15-bit fields are
    # enough because patches_pallas_available caps hp * wp * 2 at 4 MB
    packed = (ys << 15) | xs
    out = _extract_pallas(imgp, packed.reshape(-1), interpret=interpret)
    return out[:, :nk]
