"""Pallas LBP cascade evaluator — the TPU fast path behind ``ops.lbp``.

The XLA formulation in ``ops/lbp.py`` materializes ~1,250 full-window-grid
slices per scale through HBM (9 block reads x 139 weaks), which makes it
HBM-bound at ~30 M windows/s.  This kernel keeps the integral image resident
in VMEM and evaluates the whole cascade per window tile in registers:

* grid ``(N, tiles_y, tiles_x)`` with window tiles of (16, 256); the padded
  integral image is one revisited VMEM block per frame, so each weak's nine
  block sums are *static* slices of a per-tile region value (the tile's
  dynamic row offset is a multiple of 8, satisfying Mosaic's alignment rule);
* rect-sum maps are built once per tile per distinct scaled block size
  (four shifted slices — ``gs_integral_sum``'s edge guards become a leading
  zero row/column, exactly like the XLA path);
* the reference's per-window early exit (grayskull.h:810) becomes a per-tile
  exit: stages run in groups of four, each later group wrapped in
  ``pl.when(any window in this tile still alive)``.  Semantics-neutral —
  early exit only skips work for windows that already failed;
* per-scale geometry (the reference's float32 feature scaling,
  grayskull.h:799-804) is host-side static data baked into the kernel, so
  each ladder scale compiles its own specialized kernel (~8 s, cached).

Bit-exact vs ``ops.lbp._eval_windows`` and the C oracle (uint32 wrap
arithmetic, f32 stage sums in weak order).  Tile shapes beyond (16, 256)
blow up Mosaic compile time (the unrolled 139-weak body scales with vregs
per op); do not raise them without re-measuring compilation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lbp_eval_scale", "lbp_pallas_available"]

_TH, _TW = 16, 256  # window tile (sublanes x lanes)
_STAGES_PER_GROUP = 4


def _round(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _lbp_scale_kernel(ii_ref, out_ref, alive_ref, *, cascade, ny, nx, used,
                      geo, stage_groups):
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    rh, rw = geo["rh"], geo["rw"]
    region = ii_ref[0, pl.ds(ty * _TH, rh), pl.ds(tx * _TW, rw)]  # uint32

    mh, mw = _TH + geo["ey"], _TW + geo["ex"]
    maps = {}
    for (w_, h_) in used:
        maps[(w_, h_)] = (
            region[h_ : h_ + mh, w_ : w_ + mw]
            + region[0:mh, 0:mw]
            - region[0:mh, w_ : w_ + mw]
            - region[h_ : h_ + mh, 0:mw]
        )

    wy = jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 0) + ty * _TH
    wx = jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 1) + tx * _TW
    alive_ref[:] = ((wy < ny) & (wx < nx)).astype(jnp.int32)

    fx, fy, fw, fh, wi = geo["fx"], geo["fy"], geo["fw"], geo["fh"], geo["wi"]
    subs, counts = geo["subs"], geo["counts"]
    lefts, rights = geo["lefts"], geo["rights"]
    # code bit per block (bj*3+bi): TL<<7 TC<<6 TR<<5 L<<0 C=- R<<4 BL<<1 BC<<2 BR<<3
    block_bits = (7, 6, 5, 0, -1, 4, 1, 2, 3)  # grayskull.h:781-782

    def eval_weak(k):
        f = int(wi[k])
        w_, h_ = int(fw[f]), int(fh[f])
        m = maps[(w_, h_)]

        def block(bj, bi):
            oy = int(fy[f]) + bj * h_
            ox = int(fx[f]) + bi * w_
            return m[oy : oy + _TH, ox : ox + _TW]

        center = block(1, 1)
        code = jnp.zeros((_TH, _TW), jnp.int32)
        for blk, bit in enumerate(block_bits):
            if bit < 0:
                continue
            c = (block(blk // 3, blk % 3) >= center).astype(jnp.int32)
            code = code | (c << int(bit))
        idx = code >> 5
        bit_i = code & 31
        word = jnp.zeros_like(code)
        for jj in range(8):
            word = jnp.where(idx == jj, jnp.int32(int(subs[k, jj])), word)
        match = (idx < int(counts[k])) & (((word >> bit_i) & 1) == 1)
        return jnp.where(match, jnp.float32(float(lefts[k])),
                         jnp.float32(float(rights[k])))

    def eval_stage(si):
        s0 = int(cascade.stage_weak_start[si])
        cnt = int(cascade.stage_nweaks[si])
        ssum = eval_weak(s0)
        for k in range(1, cnt):
            ssum = ssum + eval_weak(s0 + k)
        return ssum >= jnp.float32(float(cascade.stage_threshold[si]))

    for gi, group in enumerate(stage_groups):
        if gi == 0:
            for si in group:
                alive_ref[:] = alive_ref[:] & eval_stage(si).astype(jnp.int32)
        else:
            @pl.when(jnp.sum(alive_ref[:]) > 0)
            def _(group=group):
                for si in group:
                    alive_ref[:] = alive_ref[:] & eval_stage(si).astype(jnp.int32)

    out_ref[0] = alive_ref[:].astype(jnp.uint8)


def _plan(cascade, scale: float):
    """Host-side static geometry for one ladder scale."""
    from ..ops.lbp import _scaled_features, _subset_matrix

    fx, fy, fw, fh = _scaled_features(cascade, scale)
    wi = cascade.weak_feature_idx.astype(np.int32)
    used = tuple(sorted(set((int(fw[f]), int(fh[f])) for f in wi)))
    ey = max(int(fy[f] + 3 * fh[f]) for f in wi) + 1
    ex = max(int(fx[f] + 3 * fw[f]) for f in wi) + 1
    max_h = max(h_ for (_, h_) in used)
    max_w = max(w_ for (_, w_) in used)
    subs, counts = _subset_matrix(cascade)
    geo = dict(fx=fx, fy=fy, fw=fw, fh=fh, wi=wi, subs=subs,
               counts=counts.astype(np.int32),
               lefts=np.asarray(cascade.weak_left_val, np.float32),
               rights=np.asarray(cascade.weak_right_val, np.float32),
               ey=ey, ex=ex,
               rh=_round(_TH + ey + max_h, 8), rw=_round(_TW + ex + max_w, 128))
    return used, geo


@functools.partial(jax.jit, static_argnames=("cascade", "scale", "ny", "nx"))
def lbp_eval_scale(cascade, iib: jnp.ndarray, scale: float, ny: int, nx: int):
    """(N, H, W) uint32 integral image -> (N, ny, nx) bool window hits."""
    n, H, W = iib.shape
    used, geo = _plan(cascade, scale)
    nty, ntx = -(-ny // _TH), -(-nx // _TW)
    Hp = (nty - 1) * _TH + geo["rh"]
    Wp = (ntx - 1) * _TW + geo["rw"]
    # leading 1-zero pad = gs_integral_sum edge guards; trailing zeros are only
    # reached by invalid windows / last-position feature overhang (same
    # semantics as ops.lbp._eval_windows)
    iip = jnp.pad(iib, ((0, 0), (1, Hp - H - 1), (1, Wp - W - 1)))

    nst = cascade.nstages
    per = _STAGES_PER_GROUP
    stage_groups = tuple(
        tuple(range(g * per, min((g + 1) * per, nst)))
        for g in range(-(-nst // per))
    )
    out = pl.pallas_call(
        functools.partial(_lbp_scale_kernel, cascade=cascade, ny=ny, nx=nx,
                          used=used, geo=geo, stage_groups=stage_groups),
        grid=(n, nty, ntx),
        in_specs=[pl.BlockSpec((1, Hp, Wp), lambda i, j, k: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _TH, _TW), lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, nty * _TH, ntx * _TW), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((_TH, _TW), jnp.int32)],
    )(iip)
    return out[:, :ny, :nx] != 0


def lbp_pallas_available(cascade, ih: int, iw: int, scale: float, step: int) -> bool:
    """Geometry gate for the Pallas path (step 1, VMEM-sized integral).

    Mirrors ``lbp_eval_scale``'s actual padded-block allocation: the per-frame
    VMEM block is ``((nty-1)*TH + rh, (ntx-1)*TW + rw)``, NOT the full image
    padded by the window span on every side.
    """
    if step != 1:
        return False
    used, geo = _plan(cascade, scale)
    f = np.float32
    win_w = int(f(cascade.window_w) * f(scale))
    win_h = int(f(cascade.window_h) * f(scale))
    ny = ih - win_h + 1
    nx = iw - win_w + 1
    if ny <= 0 or nx <= 0:
        return False
    nty, ntx = -(-ny // _TH), -(-nx // _TW)
    Hp = (nty - 1) * _TH + geo["rh"]
    Wp = (ntx - 1) * _TW + geo["rw"]
    return Hp * Wp * 4 <= 6 * 1024 * 1024
