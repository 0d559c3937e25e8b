"""Pallas LBP cascade evaluator — the TPU fast path behind ``ops.lbp``.

The XLA formulation in ``ops/lbp.py`` materializes ~1,250 full-window-grid
slices per scale through HBM (9 block reads x 139 weaks), which makes it
HBM-bound at ~30 M windows/s.  This kernel keeps the integral image resident
in VMEM and evaluates the whole cascade per window strip in registers:

* grid ``(N, strips_y, strips_x)`` with window strips of (8, <=768) — the
  strip spans the FULL window-grid width whenever it fits, so each weak's
  nine lane-misaligned block slices (the dominant cost: every one is a
  vector relayout) are paid once per strip row instead of once per 256-wide
  tile (1.6x);
* the padded integral image is one revisited VMEM block per frame, so each
  weak's nine block sums are *static* slices of a per-strip region value
  (the strip's dynamic row offset is a multiple of 8, satisfying Mosaic's
  alignment rule);
* rect-sum maps are built per strip per distinct scaled block size (four
  shifted slices — ``gs_integral_sum``'s edge guards become a leading zero
  row/column, exactly like the XLA path);
* per-scale geometry (the reference's float32 feature scaling,
  grayskull.h:799-804) is host-side static data baked into the kernel, so
  each ladder scale compiles its own specialized kernel (~8 s, cached).

The reference's per-window early exit (grayskull.h:810) deliberately has NO
counterpart here: surviving windows are *scattered*, not clustered — on the
640x480 testdata even after 8 stages (0.5% windows alive) ~90% of (8,128)
tiles still contain a survivor, so tile-granularity exits never fire (and
measured 0% win).  Dense evaluation of all 20 stages is semantics-identical
(the exit is purely a serial-CPU optimization) and lets the strips stay
branch-free.

Bit-exact vs ``ops.lbp._eval_windows`` and the C oracle (uint32 wrap
arithmetic, f32 stage sums in weak order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lbp_eval_scale", "lbp_pallas_available"]

_TH = 8  # window-strip height (sublanes)
_TW_MAX = 768  # full-width strips up to this many lanes; wider grids tile


def _round(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _pick_tw(nx: int) -> int:
    return min(_round(nx, 128), _TW_MAX)


def _lbp_scale_kernel(ii_ref, out_ref, *, cascade, ny, nx, used, geo, tw):
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    rh, rw = geo["rh"], geo["rw"]
    region = ii_ref[0, pl.ds(ty * _TH, rh), pl.ds(tx * tw, rw)]  # uint32

    # per-size-tight map extents (building to the global ey/ex wastes ~2x)
    maps = {}
    for (w_, h_) in used:
        mh = _TH + geo["ey_s"][(w_, h_)]
        mw = tw + geo["ex_s"][(w_, h_)]
        maps[(w_, h_)] = (
            region[h_ : h_ + mh, w_ : w_ + mw]
            + region[0:mh, 0:mw]
            - region[0:mh, w_ : w_ + mw]
            - region[h_ : h_ + mh, 0:mw]
        )

    wy = jax.lax.broadcasted_iota(jnp.int32, (_TH, tw), 0) + ty * _TH
    wx = jax.lax.broadcasted_iota(jnp.int32, (_TH, tw), 1) + tx * tw
    alive = ((wy < ny) & (wx < nx)).astype(jnp.int32)

    fx, fy, fw, fh, wi = geo["fx"], geo["fy"], geo["fw"], geo["fh"], geo["wi"]
    subs = geo["subs"]
    lefts, rights = geo["lefts"], geo["rights"]
    # code bit per block (bj*3+bi): TL<<7 TC<<6 TR<<5 L<<0 C=- R<<4 BL<<1 BC<<2 BR<<3
    block_bits = (7, 6, 5, 0, -1, 4, 1, 2, 3)  # grayskull.h:781-782

    def eval_weak(k):
        f = int(wi[k])
        w_, h_ = int(fw[f]), int(fh[f])
        m = maps[(w_, h_)]
        oy = int(fy[f])

        # one lane-misaligned slice per block COLUMN (the expensive relayout),
        # then cheap sublane-only sub-slices for the three block rows
        blocks = {}
        for bi in range(3):
            ox = int(fx[f]) + bi * w_
            tall = m[oy : oy + 2 * h_ + _TH, ox : ox + tw]
            for bj in range(3):
                blocks[(bj, bi)] = tall[bj * h_ : bj * h_ + _TH, :]

        center = blocks[(1, 1)]
        code = jnp.zeros((_TH, tw), jnp.int32)
        for blk, bit in enumerate(block_bits):
            if bit < 0:
                continue
            c = (blocks[(blk // 3, blk % 3)] >= center).astype(jnp.int32)
            code = code | (c << int(bit))
        idx = code >> 5
        bit_i = code & 31
        # 3-level mux tree on idx bits; subset words beyond num_subsets are
        # zero-padded, so C's (code/32 < num_subsets) guard is subsumed — a
        # zero word can never match (grayskull.h:785-788)
        s = [jnp.int32(int(subs[k, jj])) for jj in range(8)]
        b0 = (idx & 1) != 0
        b1 = (idx & 2) != 0
        b2 = (idx & 4) != 0
        w01 = jnp.where(b0, s[1], s[0])
        w23 = jnp.where(b0, s[3], s[2])
        w45 = jnp.where(b0, s[5], s[4])
        w67 = jnp.where(b0, s[7], s[6])
        lo_w = jnp.where(b1, w23, w01)
        hi_w = jnp.where(b1, w67, w45)
        word = jnp.where(b2, hi_w, lo_w)
        match = ((word >> bit_i) & 1) == 1
        return jnp.where(match, jnp.float32(float(lefts[k])),
                         jnp.float32(float(rights[k])))

    for si in range(cascade.nstages):
        s0 = int(cascade.stage_weak_start[si])
        cnt = int(cascade.stage_nweaks[si])
        ssum = eval_weak(s0)
        for k in range(1, cnt):
            ssum = ssum + eval_weak(s0 + k)
        passed = ssum >= jnp.float32(float(cascade.stage_threshold[si]))
        alive = alive & passed.astype(jnp.int32)

    out_ref[0] = alive.astype(jnp.uint8)


def _plan(cascade, scale: float, tw: int):
    """Host-side static geometry for one ladder scale at strip width ``tw``."""
    from ..ops.lbp import _scaled_features, _subset_matrix

    fx, fy, fw, fh = _scaled_features(cascade, scale)
    wi = cascade.weak_feature_idx.astype(np.int32)
    used = tuple(sorted(set((int(fw[f]), int(fh[f])) for f in wi)))
    ey = max(int(fy[f] + 3 * fh[f]) for f in wi) + 1
    ex = max(int(fx[f] + 3 * fw[f]) for f in wi) + 1
    ey_s = {s: max(int(fy[f] + 3 * fh[f]) for f in wi
                   if (int(fw[f]), int(fh[f])) == s) + 1 for s in used}
    ex_s = {s: max(int(fx[f] + 3 * fw[f]) for f in wi
                   if (int(fw[f]), int(fh[f])) == s) + 1 for s in used}
    max_h = max(h_ for (_, h_) in used)
    max_w = max(w_ for (_, w_) in used)
    subs, counts = _subset_matrix(cascade)
    geo = dict(fx=fx, fy=fy, fw=fw, fh=fh, wi=wi, subs=subs,
               counts=counts.astype(np.int32),
               lefts=np.asarray(cascade.weak_left_val, np.float32),
               rights=np.asarray(cascade.weak_right_val, np.float32),
               ey=ey, ex=ex, ey_s=ey_s, ex_s=ex_s,
               rh=_round(_TH + ey + max_h, 8), rw=_round(tw + ex + max_w, 128))
    return used, geo


def _padded_dims(cascade, scale: float, ny: int, nx: int):
    tw = _pick_tw(nx)
    used, geo = _plan(cascade, scale, tw)
    nty, ntx = -(-ny // _TH), -(-nx // tw)
    Hp = (nty - 1) * _TH + geo["rh"]
    Wp = (ntx - 1) * tw + geo["rw"]
    return tw, used, geo, nty, ntx, Hp, Wp


@functools.partial(jax.jit, static_argnames=("cascade", "scale", "ny", "nx"))
def lbp_eval_scale(cascade, iip: jnp.ndarray, scale: float, ny: int, nx: int):
    """(N, Hp', Wp') zero-guarded padded integral -> (N, ny, nx) bool hits.

    ``iip`` must carry one leading zero row/column (the ``gs_integral_sum``
    edge guards) and enough trailing zero padding for this scale's geometry —
    ``lbp_pad_for`` supplies a single shared padding for a whole ladder.
    """
    n = iip.shape[0]
    tw, used, geo, nty, ntx, Hp, Wp = _padded_dims(cascade, scale, ny, nx)
    assert iip.shape[1] >= Hp and iip.shape[2] >= Wp, (iip.shape, Hp, Wp)
    out = pl.pallas_call(
        functools.partial(_lbp_scale_kernel, cascade=cascade, ny=ny, nx=nx,
                          used=used, geo=geo, tw=tw),
        grid=(n, nty, ntx),
        in_specs=[pl.BlockSpec((1, Hp, Wp), lambda i, j, k: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _TH, tw), lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, nty * _TH, ntx * tw), jnp.uint8),
    )(iip)
    return out[:, :ny, :nx] != 0


def lbp_pad_for(cascade, iib: jnp.ndarray, ladder, ih: int, iw: int, step: int):
    """One shared zero-padded integral covering every ladder scale's kernel.

    Padding per scale costs a full HBM copy of the integral batch; the max
    over scales is padded once instead.  Trailing zeros are only reached by
    invalid windows / last-position feature overhang (same semantics as
    ``ops.lbp._eval_windows``); the leading zero row/column is the
    ``gs_integral_sum`` edge guard.
    """
    Hp = Wp = 0
    for scale, win_w, win_h in ladder:
        ny = (ih - win_h) // step + 1
        nx = (iw - win_w) // step + 1
        if ny <= 0 or nx <= 0:
            continue
        _, _, _, _, _, hp, wp = _padded_dims(cascade, scale, ny, nx)
        Hp, Wp = max(Hp, hp), max(Wp, wp)
    n, H, W = iib.shape
    return jnp.pad(iib, ((0, 0), (1, max(Hp - H - 1, 0)), (1, max(Wp - W - 1, 0))))


def lbp_pallas_available(cascade, ih: int, iw: int, scale: float, step: int) -> bool:
    """Geometry gate for the Pallas path (step 1, VMEM-sized integral).

    Mirrors ``lbp_eval_scale``'s actual padded-block allocation: the per-frame
    VMEM block is ``((nty-1)*TH + rh, (ntx-1)*tw + rw)``, NOT the full image
    padded by the window span on every side.
    """
    if step != 1:
        return False
    f = np.float32
    win_w = int(f(cascade.window_w) * f(scale))
    win_h = int(f(cascade.window_h) * f(scale))
    ny = ih - win_h + 1
    nx = iw - win_w + 1
    if ny <= 0 or nx <= 0:
        return False
    _, _, _, _, _, Hp, Wp = _padded_dims(cascade, scale, ny, nx)
    return Hp * Wp * 4 <= 6 * 1024 * 1024
