"""Pallas bilinear-resize kernel — the TPU fast path behind ``ops.resize``.

``gs_resize`` (/root/reference/grayskull.h:171-187) samples four corners per
output pixel with static half-pixel-center coordinates.  The XLA formulation
(ops/pixel.py ``_resize``) is gather-free but pays four full-frame one-hot
selection passes plus the exact-f32 adder over four HBM-resident term maps —
measured at 9.9% of the HBM roofline (r4).  This kernel fuses everything
into one pass per 64-row output block:

* the padded int16 source rides as one revisited VMEM block (the
  ``kernels/warp.py`` pattern); each block reads a 16-aligned row **band**
  whose start comes in by scalar prefetch — coordinates are static, so the
  band heights are exact at trace time, not runtime guesses;
* row picks y0/y1 are one small one-hot matmul ``R (128, band) @ band``
  (rows 0..63 select y0 of each output row, 64..127 select y1);
* column picks x0/x1 are two one-hot MXU contractions with static
  ``(swp, dwp)`` bf16 matrices — each output element sums exactly one
  ``1.0 * pixel`` product, so the corner samples are bit-exact;
* the float lerp tail runs IN-KERNEL in C operation order.  Mosaic lowers
  each vector op to its own VPU instruction and does NOT contract
  ``a*b + c`` into FMA (hardware-verified: exp/results_resize_r5.json's
  bit-exact sweep; XLA itself does contract, which is why the XLA path
  needs ``exactf32``) — so plain f32 ops reproduce the reference's
  per-operation rounding.  The weights (1-dx, dx, 1-dy, dy) are host
  numpy float32 (same IEEE ops as the C), never recomputed on device where
  XLA's reciprocal-multiply rewrite could change them.

The kernel is gated to real-TPU dispatch (``ops.pixel.resize``): in Pallas
interpret mode the body lowers through XLA:CPU, which DOES contract the lerp
(measured 3 ppm uint8 flips on random data), so interpret-mode tests assert
the corner samples exactly and the lerp only within the 1-count contraction
envelope; the hardware parity test asserts full bit-exactness.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["resize_pallas", "resize_pallas_available"]


def _coords_np(dst_n: int, src_n: int):
    """Host float32 C coordinates — same math as ``ops.pixel._src_coords_f32``
    (which returns a device array for ``d``; this stays numpy so the kernel's
    static table construction works under an enclosing jit trace)."""
    x = np.arange(dst_n, dtype=np.float32)
    s = (x + np.float32(0.5)) * np.float32(src_n) / np.float32(dst_n) - np.float32(0.5)
    s = np.maximum(np.float32(0.0), np.minimum(s, np.float32(src_n) - np.float32(1.0)))
    i0 = s.astype(np.int32)
    i1 = np.minimum(i0 + 1, src_n - 1)
    return i0, i1, (s - i0.astype(np.float32)).astype(np.float32)

_OUT_BLK = 64  # default output rows per grid step (y0+y1 fill 128 MXU rows)
_SRC_VMEM_BYTES = 4 * 1024 * 1024  # whole-frame source block budget (warp gate)
_TOTAL_VMEM_BYTES = 11 * 1024 * 1024  # conservative scoped-VMEM budget


def _round(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _geometry(sh: int, sw: int, dh: int, dw: int, blk: int = _OUT_BLK,
              align: int = 16):
    """Static band geometry + host coordinate tables for one resize shape.

    ``align`` is the source sublane tiling (16 for the int16 source, 32 for
    uint8): band starts and the band height must be multiples of it.
    """
    x0, x1, dx = _coords_np(dw, sw)
    y0, y1, dy = _coords_np(dh, sh)
    dhp = _round(dh, blk)
    dwp = _round(dw, 128)
    shp = _round(sh, align) + align
    nblk = dhp // blk
    # per-block source row span (edge rows replicate the last coordinate)
    y0e = np.concatenate([y0, np.full(dhp - dh, y0[-1] if dh else 0, np.int32)])
    y1e = np.concatenate([y1, np.full(dhp - dh, y1[-1] if dh else 0, np.int32)])
    bs = (y0e.reshape(nblk, blk)[:, 0] // align) * align  # aligned starts
    span = int((y1e.reshape(nblk, blk)[:, -1] - bs).max()) + 1
    band = _round(span, align)
    # the in-kernel ``pl.ds(bs, band)`` read must stay inside the padded
    # source: Pallas CLAMPS an out-of-range dynamic-slice start, which would
    # silently shift the rows under the block's one-hot table (the table uses
    # the same ``bs``, so clamping here keeps both consistent; row indices
    # stay < band because y <= sh-1 <= shp-align-1 and shp-band <= bs)
    if band <= shp:
        bs = np.minimum(bs, shp - band).astype(bs.dtype)
    return x0, x1, dx, y0e, y1e, dy, bs, band, shp, dhp, dwp, nblk


def resize_pallas_available(sh: int, sw: int, dh: int, dw: int,
                            blk: int = _OUT_BLK, src_u8: bool = False) -> bool:
    if min(sh, sw, dh, dw) < 8 or sw < 128:
        return False
    align, sb = (32, 1) if src_u8 else (16, 2)
    shp = _round(sh, align) + align
    swp = _round(sw, 128)
    if shp * swp * sb > _SRC_VMEM_BYTES:
        return False
    _, _, _, _, _, _, _, band, _, _, dwp, _ = _geometry(sh, sw, dh, dw, blk,
                                                        align)
    if band > shp:
        return False
    est = (
        shp * swp * sb               # resident source
        + 2 * swp * dwp * 2          # OHX0/OHX1 bf16 (resident)
        + band * swp * (4 + 2)       # band i32 + bf16 view
        + 2 * 2 * blk * band * 2     # R blocks bf16 (double-buffered)
        + 2 * blk * swp * (4 + 2)    # rows01 f32 + bf16
        + 2 * 2 * blk * dwp * 4      # c0/c1 f32
        + 6 * blk * dwp * 4          # lerp temporaries
    )
    return est <= _TOTAL_VMEM_BYTES


def _col_chunks(x0, x1, dw: int, dwp: int, swp: int):
    """Banded column-selection tables, or None when banding saves no MXU work.

    The full one-hot matrices are (swp, dwp) with exactly one nonzero per
    real output column — for the 1MP downscale that is ~2.7 GFLOP/frame of
    mostly-zero MXU work, the measured bound of the blk64/u8 variant.  The
    x maps are monotone, so each 128-column output chunk reads a narrow
    source band: per-chunk (sband, 128) one-hots cut the column-pick FLOPs
    by swp/sband (4x on the benchmark downscale, 5x on the 2x upscale).
    """
    nchunk = dwp // 128
    offs, spans = [], []
    for c in range(nchunk):
        lo, hi = c * 128, min((c + 1) * 128, dw)
        if lo >= dw:  # fully padded chunk: all-zero one-hot, any offset
            offs.append(0)
            spans.append(0)
            continue
        off = (int(x0[lo]) // 128) * 128
        offs.append(off)
        spans.append(int(x1[hi - 1]) - off + 1)
    sband = _round(max(spans), 128)
    if sband >= swp:  # degenerate mapping: the full matmul is no worse
        return None
    offs = [min(o, swp - sband) for o in offs]
    ohb0 = np.zeros((nchunk, sband, 128), np.float32)
    ohb1 = np.zeros((nchunk, sband, 128), np.float32)
    j = np.arange(dw)
    c = j // 128
    ohb0[c, np.asarray(x0) - np.asarray(offs)[c], j % 128] = 1.0
    ohb1[c, np.asarray(x1) - np.asarray(offs)[c], j % 128] = 1.0
    return tuple(offs), sband, ohb0, ohb1


def _kernel(bs_ref, src_ref, r_ref, ohx0_ref, ohx1_ref, wx_ref, wy_ref,
            out_ref, *, blk: int, band: int, swp: int, dwp: int, align: int,
            offs):
    j = pl.program_id(1)
    bs = pl.multiple_of(bs_ref[j], align)
    rows = src_ref[0, pl.ds(bs, band), :]
    bandf = rows.astype(jnp.int32).astype(jnp.bfloat16)  # uint8 exact in bf16

    # row picks: (2*blk, band) @ (band, swp) — rows 0..blk-1 -> y0, rest y1
    rows01 = jax.lax.dot_general(
        r_ref[0], bandf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)

    if offs is None:
        # column picks: (2*blk, swp) @ (swp, dwp), one matmul per corner pair
        c0 = jax.lax.dot_general(
            rows01, ohx0_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        c1 = jax.lax.dot_general(
            rows01, ohx1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        # banded column picks: per 128-column chunk, (2*blk, sband) @
        # (sband, 128) with a static 128-aligned source slice (offsets are
        # host constants — the x maps are static)
        p0, p1 = [], []
        sband = ohx0_ref.shape[1]
        for c, off in enumerate(offs):
            seg = rows01[:, off : off + sband]
            p0.append(jax.lax.dot_general(
                seg, ohx0_ref[c], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            p1.append(jax.lax.dot_general(
                seg, ohx1_ref[c], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        c0 = p0[0] if len(p0) == 1 else jnp.concatenate(p0, axis=1)
        c1 = p1[0] if len(p1) == 1 else jnp.concatenate(p1, axis=1)
    c00, c10 = c0[:blk], c0[blk:]
    c01, c11 = c1[:blk], c1[blk:]

    ndx = wx_ref[0:1, :]     # (1, dwp) = 1 - dx  (host f32, C's runtime op)
    dx = wx_ref[1:2, :]
    ndy = wy_ref[0, :, 0:1]  # (blk, 1)
    dy = wy_ref[0, :, 1:2]
    # exact C association (grayskull.h:183-184); Mosaic does not contract
    t1 = (c00 * ndx) * ndy
    t2 = (c01 * dx) * ndy
    t3 = (c10 * ndx) * dy
    t4 = (c11 * dx) * dy
    p = ((t1 + t2) + t3) + t4
    # (uint8_t) float truncation; Mosaic has no direct f32->u8 cast, and
    # f32->i32 is the same round-toward-zero (values are in [0, 255])
    out_ref[0] = p.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit,
                   static_argnames=("size", "interpret", "blk", "src_u8",
                                    "banded"))
def resize_pallas(img: jnp.ndarray, size, interpret: bool = False,
                  blk: int = _OUT_BLK, src_u8: bool = False,
                  banded: bool = True):
    """(N, sh, sw) uint8 -> (N, dh, dw) uint8 bilinear resize, fused.

    Callers gate on ``resize_pallas_available`` (same ``blk``/``src_u8``).
    Bit-exact vs ``gs_resize`` on TPU hardware; see the module docstring for
    the interpret-mode caveat.  ``src_u8`` keeps the resident frame uint8
    (halves the source VMEM and skips the XLA int16-convert pass at the cost
    of 32-row band alignment); both variants compute identically.
    """
    n, sh, sw = img.shape
    dh, dw = size
    align = 32 if src_u8 else 16
    x0, x1, dx, y0e, y1e, dy, bs, band, shp, dhp, dwp, nblk = _geometry(
        sh, sw, dh, dw, blk, align)
    swp = _round(sw, 128)

    srcp = jnp.pad(img, ((0, 0), (0, shp - sh), (0, swp - sw)))
    if not src_u8:
        srcp = srcp.astype(jnp.int16)

    chunks = _col_chunks(x0, x1, dw, dwp, swp) if banded else None
    if chunks is not None:
        offs, _, ohx0, ohx1 = chunks
        oh_spec = pl.BlockSpec(ohx0.shape, lambda i, j, bs_: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        offs = None
        # static one-hot column matrices (padded dest lanes stay all-zero)
        ohx0 = np.zeros((swp, dwp), np.float32)
        ohx0[np.asarray(x0), np.arange(dw)] = 1.0
        ohx1 = np.zeros((swp, dwp), np.float32)
        ohx1[np.asarray(x1), np.arange(dw)] = 1.0
        oh_spec = pl.BlockSpec((swp, dwp), lambda i, j, bs_: (0, 0),
                               memory_space=pltpu.VMEM)

    # static one-hot row matrices per block (y0 rows then y1 rows, band-rel)
    r = np.zeros((nblk, 2 * blk, band), np.float32)
    bi = np.repeat(np.arange(nblk), blk)
    ri = np.tile(np.arange(blk), nblk)
    r[bi, ri, y0e - np.repeat(bs, blk)] = 1.0
    r[bi, ri + blk, y1e - np.repeat(bs, blk)] = 1.0

    wx = np.stack([np.float32(1.0) - dx, dx])  # (2, dw)
    wx = np.pad(wx, ((0, 0), (0, dwp - dw)))
    dye = np.concatenate([dy, np.zeros(dhp - dh, np.float32)])
    wy = np.stack([np.float32(1.0) - dye, dye], axis=-1)  # (dhp, 2)

    out = pl.pallas_call(
        functools.partial(_kernel, blk=blk, band=band, swp=swp, dwp=dwp,
                          align=align, offs=offs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # bs
            grid=(n, nblk),
            in_specs=[
                pl.BlockSpec((1, shp, swp), lambda i, j, bs_: (i, 0, 0),
                             memory_space=pltpu.VMEM),  # revisited frame
                pl.BlockSpec((1, 2 * blk, band), lambda i, j, bs_: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                oh_spec,
                oh_spec,
                pl.BlockSpec((2, dwp), lambda i, j, bs_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk, 2), lambda i, j, bs_: (0, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, blk, dwp), lambda i, j, bs_: (i, j, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, dhp, dwp), jnp.uint8),
        interpret=interpret,
    )(jnp.asarray(bs, jnp.int32), srcp, jnp.asarray(r, jnp.bfloat16),
      jnp.asarray(ohx0, jnp.bfloat16), jnp.asarray(ohx1, jnp.bfloat16),
      jnp.asarray(wx), jnp.asarray(wy)[None])
    return out[:, :dh, :dw]
