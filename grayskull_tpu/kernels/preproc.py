"""Fused Pallas kernels for the preprocessing pipeline (the headline benchmark):

    blur(r) -> histogram -> [otsu sweep] -> threshold -> sobel

Two kernels per batch; each frame's data crosses HBM once per kernel:

* :func:`fused_blur_hist` — grid over frames; processes each frame in row strips
  held in VMEM.  The clipped-window box blur is separable shift-adds with an
  **exact** integer division by the count grid (XLA/Mosaic strength-reduce the
  constant-free ``//`` correctly for int32).  The histogram uses a SWAR scheme:
  each pixel adds ``1 << 4*(p & 7)`` into one of 32 packed int32 counters
  selected by ``p >> 3`` — 8 bins ride in each 32-bit word (4-bit fields), so a
  256-bin histogram costs ~32 masked adds per pixel instead of 256.  With 8-row
  strips each field holds at most 8, so no cross-field carry occurs (the top
  field may wrap int32 — harmless, the mask recovers the count mod 16 which
  equals the true count).
* :func:`fused_threshold_sobel` — binarize against a per-frame threshold and
  run the 3x3 Sobel on the binary image, strip-wise.

Bit-exact versus the reference chain (differential tests) and versus the
composed-ops XLA path.

Mosaic constraints honored: dynamic row offsets are multiples of 8 (strip
starts), loads are pre-padded so slice lengths can round up to sublanes, no
1-D intermediates, no dynamic_slice on values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_blur_hist", "fused_threshold_sobel", "preproc_available"]

_STRIP = 128  # blur strip rows
_HSR = 8  # histogram strip rows (4-bit SWAR capacity)


def _round8(v: int) -> int:
    return (v + 7) // 8 * 8


def _blur_hist_kernel(x_ref, blur_ref, hist_ref, *, r: int, h: int, w: int, load_rows: int):
    nstrips = h // _STRIP
    mask4 = jnp.int32(0x0F0F0F0F)

    def strip(si, carry):
        hist_acc, acc_e, acc_o = carry
        y0 = si * _STRIP
        # int16 taps when sums fit (255*(2r+1)^2 <= 32767, i.e. r <= 5):
        # 2x vector density on the VPU
        dtype = jnp.int16 if 255 * (2 * r + 1) ** 2 <= 32767 else jnp.int32
        rows = x_ref[0, pl.ds(y0, load_rows), :].astype(dtype)
        rows = rows[: _STRIP + 2 * r]
        px = jnp.pad(rows, ((0, 0), (r, r)))
        rs = px[:, 0:w]
        for k in range(1, 2 * r + 1):
            rs = rs + px[:, k : k + w]
        cs_n = rs[0:_STRIP, :]
        for k in range(1, 2 * r + 1):
            cs_n = cs_n + rs[k : k + _STRIP, :]
        cs = cs_n.astype(jnp.int32)
        ii = jax.lax.broadcasted_iota(jnp.int32, (_STRIP, w), 0) + y0
        jj = jax.lax.broadcasted_iota(jnp.int32, (_STRIP, w), 1)
        cy = jnp.minimum(ii + r, h - 1) - jnp.maximum(ii - r, 0) + 1
        cx = jnp.minimum(jj + r, w - 1) - jnp.maximum(jj - r, 0) + 1
        blurred = cs // (cy * cx)
        blur_ref[0, pl.ds(y0, _STRIP), :] = blurred.astype(jnp.uint8)

        # SWAR histogram: level 1 packs 8 bins as 4-bit fields per int32 word
        # (counts <= _HSR = 8 per field, no cross-field carry); level 2 expands
        # to 8-bit fields accumulated across the strip (counts <= 128), so the
        # expensive lane-reduction flush happens once per frame, not per strip.
        for sub in range(_STRIP // _HSR):
            seg = blurred[sub * _HSR : (sub + 1) * _HSR]
            word = seg >> 3
            contrib = jnp.int32(1) << ((seg & 7) << 2)
            packs = [
                jnp.sum(jnp.where(word == k, contrib, 0), axis=0, keepdims=True)
                for k in range(32)
            ]
            packs = jnp.concatenate(packs, axis=0)  # (32, w)
            acc_e = acc_e + (packs & mask4)  # fields 0,2,4,6 in byte slots
            acc_o = acc_o + ((packs >> 4) & mask4)  # fields 1,3,5,7
        # flush every strip's level-2 bytes into the 32-bit histogram
        # (counts per byte <= 8 * 16 = 128 per strip, safe)
        fields = []
        for f in range(4):
            fields.append(jnp.sum((acc_e >> (8 * f)) & 255, axis=1, keepdims=True))
            fields.append(jnp.sum((acc_o >> (8 * f)) & 255, axis=1, keepdims=True))
        # field order: e0=bin0, o0=bin1, e1=bin2, o1=bin3, ...
        hist_acc = hist_acc + jnp.concatenate(fields, axis=1)
        zero = jnp.zeros((32, w), jnp.int32)
        return hist_acc, zero, zero

    hist, _, _ = jax.lax.fori_loop(
        0, nstrips, strip,
        (jnp.zeros((32, 8), jnp.int32), jnp.zeros((32, w), jnp.int32),
         jnp.zeros((32, w), jnp.int32)),
    )
    hist_ref[0] = hist


@functools.partial(jax.jit, static_argnames=("radius",))
def fused_blur_hist(imgs: jnp.ndarray, radius: int = 2):
    """(N, H, W) uint8 -> (blurred uint8, hist (N, 256) int32)."""
    n, h, w = imgs.shape
    r = int(radius)
    load_rows = _round8(_STRIP + 2 * r)
    pad_bottom = load_rows - _STRIP - r  # so the last strip's load stays in bounds
    xp = jnp.pad(imgs, ((0, 0), (r, pad_bottom), (0, 0)))
    hp = h + r + pad_bottom
    blurred, hist = pl.pallas_call(
        functools.partial(_blur_hist_kernel, r=r, h=h, w=w, load_rows=load_rows),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, hp, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
            jax.ShapeDtypeStruct((n, 32, 8), jnp.int32),
        ],
    )(xp)
    # SWAR layout: hist[word, field] is the count of value word*8 + field
    return blurred, hist.reshape(n, 256)


def _threshold_sobel_kernel(t_ref, x_ref, bin_ref, edge_ref, *, h: int, w: int, load_rows: int):
    t = t_ref[pl.program_id(0)]
    nstrips = h // _STRIP

    def strip(si, _):
        y0 = si * _STRIP
        rows = x_ref[0, pl.ds(y0, load_rows), :].astype(jnp.int32)
        rows = rows[: _STRIP + 2]
        b = jnp.where(rows > t, jnp.int32(255), jnp.int32(0))
        bin_ref[0, pl.ds(y0, _STRIP), :] = b[1 : 1 + _STRIP].astype(jnp.uint8)
        pb = jnp.pad(b, ((0, 0), (1, 1)))

        def sh(dy, dx):
            return pb[1 + dy : 1 + dy + _STRIP, 1 + dx : 1 + dx + w]

        gx = -sh(-1, -1) + sh(-1, 1) - 2 * sh(0, -1) + 2 * sh(0, 1) - sh(1, -1) + sh(1, 1)
        gy = -sh(-1, -1) - 2 * sh(-1, 0) - sh(-1, 1) + sh(1, -1) + 2 * sh(1, 0) + sh(1, 1)
        mag = jnp.minimum((jnp.abs(gx) + jnp.abs(gy)) >> 1, 255)
        ii = jax.lax.broadcasted_iota(jnp.int32, (_STRIP, w), 0) + y0
        jj = jax.lax.broadcasted_iota(jnp.int32, (_STRIP, w), 1)
        interior = (ii >= 1) & (ii < h - 1) & (jj >= 1) & (jj < w - 1)
        edge_ref[0, pl.ds(y0, _STRIP), :] = jnp.where(interior, mag, 0).astype(jnp.uint8)
        return 0

    jax.lax.fori_loop(0, nstrips, strip, 0)


@jax.jit
def fused_threshold_sobel(blurred: jnp.ndarray, thresholds: jnp.ndarray):
    """(N, H, W) uint8 + (N,) thresholds -> (binary, edges) in one HBM pass."""
    n, h, w = blurred.shape
    load_rows = _round8(_STRIP + 2)
    pad_bottom = load_rows - _STRIP - 1
    xp = jnp.pad(blurred, ((0, 0), (1, pad_bottom), (0, 0)))
    hp = h + 1 + pad_bottom
    t = thresholds.astype(jnp.int32)
    binary, edges = pl.pallas_call(
        functools.partial(_threshold_sobel_kernel, h=h, w=w, load_rows=load_rows),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (N,) thresholds
            pl.BlockSpec((1, hp, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
            jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
        ],
    )(t, xp)
    return binary, edges


def preproc_available(h: int, w: int, radius: int = 2) -> bool:
    """Whether the strip kernels handle this frame geometry."""
    return (
        h % _STRIP == 0
        and w % 128 == 0
        and w >= 256
        and 1 <= radius <= min(15, _STRIP // 2)
        and h * w <= 8 * 1024 * 1024  # frame + outputs in VMEM
    )
