"""Pallas quad-warp sampler — the TPU fast path behind ``ops.warp``.

``gs_perspective_correct`` samples 4 bilinear corners per output pixel; the
XLA formulation's ``src[y, x]`` gathers serialize on TPU and measured
**34 ms per 1000x800 page** (r3 profile) — the document scanner's dominant
cost.  This kernel replaces the gathers with dense algebra:

* each output row samples the source along a straight line (the quad warp is
  bilinear in (u, v), so for fixed v both coordinates are affine in u) — an
  8-row output block therefore reads a bounded source **band** whose row/col
  start ride in as scalar-prefetch arguments (computed from the traced
  corners in XLA);
* the arbitrary column permutation ``band[:, x0(u)]`` becomes a one-hot MXU
  contraction ``band @ onehot_x`` (uint8 values are exact in bf16/f32); the
  row selection ``CS[y0(u)-bs, u]`` is then a cheap per-lane one-hot
  VPU reduction over the band height;
* ``x1 = min(x0+1, sw-1)`` / ``y1`` get their own one-hot / selector, so all
  four corner samples come out of two matmuls per output row.

The kernel returns the four corner-value maps; the float lerp tail (exact-f32
adds, C truncation) runs unchanged in XLA — the samples are exactly
``src[y, x]``, so the page is bit-identical to the gather path.  A runtime
``lax.cond`` falls back to the gather path when a block's source span
exceeds the static band (extreme quads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["quad_sample", "quad_sample_available", "BAND_K", "BAND_KX",
           "quad_sample_banded", "quad_sample_banded_available"]

BAND_K = 192   # source rows per band (max y-span of an 8-row output block)
BAND_KX = 768  # source cols per band (max x-span of an 8-row output block)


def _round(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def quad_sample_available(sh: int, sw: int, dh: int, dw: int) -> bool:
    # the padded source frame rides as one revisited int16 VMEM block
    # (Mosaic dynamic sublane/lane slicing needs i16/i32, not i8; int32
    # blocks OOMed once batched grids double-buffer the next frame).
    # Any dh works: the caller edge-replicates the last coordinate row to a
    # multiple of 8 (ops/warp.py), which cannot widen any block's band span.
    shp = _round(sh, 16) + BAND_K
    swp = _round(sw, 128) + BAND_KX
    return dh >= 1 and sw >= 128 and shp * swp * 2 <= 4 * 1024 * 1024 and dw >= 8


def _sample_kernel(bs_ref, cs_ref, src_ref, y0_ref, y1_ref, x0_ref, x1_ref,
                   c00_ref, c01_ref, c10_ref, c11_ref, *, dwp: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nblk = pl.num_programs(1)
    # alignment hints: bs is 16-aligned (the i16 tile height), cs 128-aligned
    # by construction in quad_sample; Mosaic cannot prove it for SMEM scalars
    bs = pl.multiple_of(bs_ref[i * nblk + j], 16)
    cs = pl.multiple_of(cs_ref[i * nblk + j], 128)
    band = src_ref[0, pl.ds(bs, BAND_K), pl.ds(cs, BAND_KX)]
    # i16 -> i32 -> bf16 (no direct i16->bf16); uint8 values exact in bf16
    bandf = band.astype(jnp.int32).astype(jnp.bfloat16)  # (K, KX)

    kx_iota = jax.lax.broadcasted_iota(jnp.int32, (BAND_KX, dwp), 0)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (BAND_K, dwp), 0)
    for r in range(8):
        # keep every intermediate 2-D (Mosaic has no 1-D vectors)
        x0 = x0_ref[0, r : r + 1, :] - cs  # (1, dwp) band-relative
        x1 = x1_ref[0, r : r + 1, :] - cs
        y0 = y0_ref[0, r : r + 1, :] - bs
        y1 = y1_ref[0, r : r + 1, :] - bs
        oh_x0 = (kx_iota == x0).astype(jnp.bfloat16)
        oh_x1 = (kx_iota == x1).astype(jnp.bfloat16)
        cs0 = jax.lax.dot_general(
            bandf, oh_x0, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (K, dwp): cs0[k, u] = src[bs+k, x0[u]]
        cs1 = jax.lax.dot_general(
            bandf, oh_x1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sel0 = (k_iota == y0).astype(jnp.float32)
        sel1 = (k_iota == y1).astype(jnp.float32)
        c00_ref[0, r : r + 1, :] = jnp.sum(cs0 * sel0, axis=0, keepdims=True)
        c10_ref[0, r : r + 1, :] = jnp.sum(cs0 * sel1, axis=0, keepdims=True)
        c01_ref[0, r : r + 1, :] = jnp.sum(cs1 * sel0, axis=0, keepdims=True)
        c11_ref[0, r : r + 1, :] = jnp.sum(cs1 * sel1, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _quad_sample_pallas(srcp, y0, y1, x0, x1, bs, cs, interpret=False):
    n, dh, dwp = y0.shape
    shp, swp = srcp.shape[1:]
    nblk = dh // 8
    coord_spec = pl.BlockSpec((1, 8, dwp), lambda i, j, bs_, cs_: (i, j, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # bs, cs
        grid=(n, nblk),
        in_specs=[
            pl.BlockSpec((1, shp, swp), lambda i, j, bs_, cs_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # revisited frame block
            coord_spec, coord_spec, coord_spec, coord_spec,
        ],
        out_specs=[coord_spec] * 4,
    )
    shape = jax.ShapeDtypeStruct((n, dh, dwp), jnp.float32)
    return pl.pallas_call(
        functools.partial(_sample_kernel, dwp=dwp),
        grid_spec=grid_spec,
        out_shape=[shape] * 4,
        interpret=interpret,
    )(bs, cs, srcp, y0, y1, x0, x1)


def quad_sample_banded_available(sh: int, sw: int, dh: int, dw: int,
                                 kb: int = 32, kxb: int = 256) -> bool:
    """Gate for the per-chunk banded sampler: the uint8 source frame rides as
    one revisited VMEM block (32-row sublane tiling for dynamic u8 slicing)."""
    shp = _round(sh, 32) + kb
    swp = _round(sw, 128) + kxb
    return dh >= 1 and sw >= 128 and dw >= 8 and shp * swp <= 4 * 1024 * 1024


def _banded_kernel(bs_ref, cs_ref, src_ref, yy_ref, xx_ref, oa_ref, ob_ref,
                   *, kb: int, kxb: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    c = pl.program_id(2)
    flat = (i * pl.num_programs(1) + j) * pl.num_programs(2) + c
    bs = pl.multiple_of(bs_ref[flat], 32)
    cs = pl.multiple_of(cs_ref[flat], 128)
    band = src_ref[0, pl.ds(bs, kb), pl.ds(cs, kxb)]
    bandf = band.astype(jnp.int32).astype(jnp.bfloat16)  # (kb, kxb), u8 exact

    kx_iota = jax.lax.broadcasted_iota(jnp.int32, (kxb, 256), 0)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (kb, 256), 0)
    for r in range(8):
        xx = xx_ref[0, r : r + 1, :] - cs  # (1, 256) = [x0 | x1], band-relative
        yy = yy_ref[0, r : r + 1, :] - bs  # (1, 256) = [y0 | y1]
        oh = (kx_iota == xx).astype(jnp.bfloat16)  # one 1 per real lane
        cs01 = jax.lax.dot_general(
            bandf, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (kb, 256): lanes <128 sample x0, lanes >=128 sample x1
        sel = (k_iota == yy).astype(jnp.float32)
        # yy paired with cs01 lanes: [y0|y1] picks [c00 | c11]
        oa_ref[0, r : r + 1, :] = jnp.sum(cs01 * sel, axis=0, keepdims=True)
        # swapped rows [y1|y0] pick [c10 | c01]
        yswap = jnp.concatenate([yy[:, 128:], yy[:, :128]], axis=1)
        sel2 = (k_iota == yswap).astype(jnp.float32)
        ob_ref[0, r : r + 1, :] = jnp.sum(cs01 * sel2, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("kb", "kxb", "interpret"))
def _quad_sample_banded_pallas(srcp, yy, xx, bs, cs, kb, kxb, interpret=False):
    n, dh, dwp2 = yy.shape  # dwp2 = 2 * dwp
    shp, swp = srcp.shape[1:]
    nblk = dh // 8
    nchunk = dwp2 // 256
    coord_spec = pl.BlockSpec((1, 8, 256), lambda i, j, c, bs_, cs_: (i, j, c),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # bs, cs
        grid=(n, nblk, nchunk),
        in_specs=[
            pl.BlockSpec((1, shp, swp), lambda i, j, c, bs_, cs_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # revisited u8 frame block
            coord_spec, coord_spec,
        ],
        out_specs=[coord_spec] * 2,
    )
    shape = jax.ShapeDtypeStruct((n, dh, dwp2), jnp.float32)
    return pl.pallas_call(
        functools.partial(_banded_kernel, kb=kb, kxb=kxb),
        grid_spec=grid_spec,
        out_shape=[shape] * 2,
        interpret=interpret,
    )(bs, cs, srcp, yy, xx)


def banded_prep(src, y0, y1, x0, x1, kb: int, kxb: int):
    """XLA-side prep for the banded sampler: padded source, interleaved
    ``[y0|y1]``/``[x0|x1]`` coordinate pairs, per-tile band starts and the
    fits-the-band predicate.  Runs unconditionally (cheap) so ``ok`` can
    steer a ``lax.cond`` whose taken branch alone runs the kernel."""
    n, sh, sw = src.shape
    dh, dw = y0.shape[-2:]
    dwp = _round(dw, 128)

    def padc(a):
        return jnp.pad(a, ((0, 0), (0, 0), (0, dwp - dw)), mode="edge")

    nblk = dh // 8
    nchunk = dwp // 128

    def tiles(a):
        return a.reshape(n, nblk, 8, nchunk, 128)

    y0p, y1p = tiles(padc(y0)), tiles(padc(y1))
    x0p, x1p = tiles(padc(x0)), tiles(padc(x1))
    ymin = jnp.min(y0p, axis=(2, 4))  # (n, nblk, nchunk)
    ymax = jnp.max(y1p, axis=(2, 4))
    xmin = jnp.min(x0p, axis=(2, 4))
    xmax = jnp.max(x1p, axis=(2, 4))
    shp = _round(sh, 32) + kb
    swp = _round(sw, 128) + kxb
    bs = jnp.clip((ymin // 32) * 32, 0, shp - kb).astype(jnp.int32)
    cs = jnp.clip((xmin // 128) * 128, 0, swp - kxb).astype(jnp.int32)
    ok = jnp.all(ymax - bs < kb) & jnp.all(xmax - cs < kxb)

    srcp = jnp.pad(src, ((0, 0), (0, shp - sh), (0, swp - sw)))
    yy = jnp.concatenate([y0p, y1p], axis=4).reshape(n, dh, 2 * dwp)
    xx = jnp.concatenate([x0p, x1p], axis=4).reshape(n, dh, 2 * dwp)
    return (srcp, yy, xx, bs.reshape(-1), cs.reshape(-1)), ok


def banded_run(prep, dw: int, kb: int, kxb: int, interpret=False):
    """Run the banded kernel on :func:`banded_prep` inputs; returns the four
    corner maps ``(c00, c01, c10, c11)`` sliced back to ``dw`` columns."""
    srcp, yy, xx, bs, cs = prep
    n, dh, dwp2 = yy.shape
    dwp = dwp2 // 2
    nchunk = dwp // 128
    oa, ob = _quad_sample_banded_pallas(srcp, yy, xx, bs, cs, kb, kxb,
                                        interpret=interpret)
    # oa = [c00 | c11] per 256-lane pair, ob = [c10 | c01]
    oat = oa.reshape(n, dh, nchunk, 2, 128)
    obt = ob.reshape(n, dh, nchunk, 2, 128)
    c00 = oat[:, :, :, 0].reshape(n, dh, dwp)[:, :, :dw]
    c11 = oat[:, :, :, 1].reshape(n, dh, dwp)[:, :, :dw]
    c10 = obt[:, :, :, 0].reshape(n, dh, dwp)[:, :, :dw]
    c01 = obt[:, :, :, 1].reshape(n, dh, dwp)[:, :, :dw]
    return c00, c01, c10, c11


def quad_sample_banded(src, y0, y1, x0, x1, kb: int = 64, kxb: int = 256,
                       interpret=False):
    """Corner samples for the quad warp with per-(8-row, 128-lane) bands.

    Same contract as :func:`quad_sample`, but each output tile reads only a
    ``(kb, kxb)`` source band around its own coordinate span — the column
    one-hot contraction shrinks from ``(BAND_K, BAND_KX) @ (BAND_KX, dwp)``
    per block to ``(kb, kxb) @ (kxb, 256)`` per tile (~9x fewer MXU MACs at
    the defaults), and the source stays uint8-resident.  ``ok`` is False
    whenever any tile's span exceeds the static band (steep tilt or a source
    chunk wider than ``kxb``); callers chain to a wider config or the gather
    path.  Corner maps are exactly ``src[y, x].astype(f32)``.
    """
    dw = y0.shape[-1]
    prep, ok = banded_prep(src, y0, y1, x0, x1, kb, kxb)
    return banded_run(prep, dw, kb, kxb, interpret=interpret), ok


def quad_sample(src, y0, y1, x0, x1, interpret=False):
    """Corner samples ``src[y?, x?]`` for the quad warp, gather-free.

    ``src``: (N, sh, sw) uint8; coordinate maps (N, dh, dw) int32 (already
    clamped in-bounds, dh a multiple of 8).  Returns four (N, dh, dw)
    float32 maps and an ``ok`` bool scalar — when False (a block's span
    exceeded the static band) the caller must use the gather path; when
    True the maps hold exactly ``src[y, x].astype(f32)``.
    """
    n, sh, sw = src.shape
    dh, dw = y0.shape[-2:]
    dwp = _round(dw, 128)

    def padc(c):
        # edge-replicated padding keeps the padded lanes inside each block's
        # real coordinate span (zero padding would wreck the band-start
        # minima and force the fallback on every frame)
        return jnp.pad(c, ((0, 0), (0, 0), (0, dwp - dw)), mode="edge")

    y0p, y1p = padc(y0), padc(y1)
    x0p, x1p = padc(x0), padc(x1)

    # per-(frame, block) band starts + span check, all in XLA on traced data
    nblk = dh // 8
    y0b = y0p.reshape(n, nblk, 8 * dwp)
    y1b = y1p.reshape(n, nblk, 8 * dwp)
    x0b = x0p.reshape(n, nblk, 8 * dwp)
    x1b = x1p.reshape(n, nblk, 8 * dwp)
    ymin = jnp.min(y0b, axis=2)
    ymax = jnp.max(y1b, axis=2)
    xmin = jnp.min(x0b, axis=2)
    xmax = jnp.max(x1b, axis=2)
    shp = _round(sh, 16) + BAND_K
    swp = _round(sw, 128) + BAND_KX
    bs = jnp.clip((ymin // 16) * 16, 0, shp - BAND_K).astype(jnp.int32)
    cs = jnp.clip((xmin // 128) * 128, 0, swp - BAND_KX).astype(jnp.int32)
    ok = jnp.all(ymax - bs < BAND_K) & jnp.all(xmax - cs < BAND_KX)

    srcp = jnp.pad(src, ((0, 0), (0, shp - sh), (0, swp - sw))).astype(jnp.int16)
    c00, c01, c10, c11 = _quad_sample_pallas(
        srcp, y0p, y1p, x0p, x1p, bs.reshape(-1), cs.reshape(-1),
        interpret=interpret,
    )
    return (c00[:, :, :dw], c01[:, :, :dw], c10[:, :, :dw], c11[:, :, :dw]), ok
