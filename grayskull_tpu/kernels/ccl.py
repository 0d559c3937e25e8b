"""Pallas connected-components kernel — the TPU fast path behind
``ops.blobs.label_components``.

The XLA formulation iterates packed-key ``cummax`` sweeps over the FULL
frame through HBM: every ``lax.while_loop`` round reads and writes ~8
frame-sized int32 arrays, and the round count is the component "serpentine
depth" (measured 20+ on the document testdata), making CCL the dominant
cost of the document scanner (VERDICT r2 weak #3).

This kernel runs the same min-index propagation entirely in VMEM:

* grid ``(N, 2*nstrips - 1)`` — a **serpentine sweep**: strips walk top to
  bottom, then bottom to top, one revisited output block per strip
  (``input_output_aliases`` keeps the HBM buffer current between visits;
  adjacent grid steps touch disjoint strips, so the pipelined DMAs never
  race);
* each strip is min-propagated to a **local fixpoint** in VMEM
  (``lax.while_loop`` whose body does four segmented min-scans via
  log-doubling shifts — background pixels are barriers), so HBM sees each
  strip once per visit instead of once per round;
* the converged boundary row rides to the next strip in a VMEM scratch
  carry (4-connectivity: a column-wise min where both sides are
  foreground);
* a per-frame ``changed`` flag accumulates in scratch; the caller loops
  the whole serpentine until it reports a clean sweep.  One down+up sweep
  converges anything whose components don't zig-zag between strips more
  than once (real documents converge in a single launch; the outer loop
  guarantees the general case).

The fixpoint (min raster index per 4-connected component of
``pixel >= 128``) is order-independent, so the result is bit-identical to
the XLA path and the C oracle's labeling (grayskull.h:322-402 semantics
via ops/blobs.py's creation-rank mapping).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ccl_serpentine", "ccl_pallas_available"]


def _pick_blk(h: int, w: int) -> int:
    """Strip height: VMEM wants ~6 arrays of (blk, w) int32 live."""
    for blk in (256, 128, 64, 32, 16, 8):
        if h % blk == 0 and blk * w * 4 <= 1024 * 1024:
            return blk
    return 0


def _seg_min_scan(v0, bgi, big, axis: int, reverse: bool, n: int):
    """Segmented prefix-min along ``axis`` (barriers where ``bgi != 0``), via
    log-doubling shifts.  Identity element (big, no-barrier).  Barrier masks
    are int32 0/1 — Mosaic cannot pad i1 vectors."""
    v = jnp.where(bgi != 0, big, v0)
    b = bgi

    def shift(x, k, fill):
        if axis == 1:
            pad = ((0, 0), (k, 0)) if not reverse else ((0, 0), (0, k))
            sl = (slice(None), slice(0, x.shape[1])) if not reverse else (
                slice(None), slice(k, None))
        else:
            pad = ((k, 0), (0, 0)) if not reverse else ((0, k), (0, 0))
            sl = (slice(0, x.shape[0]), slice(None)) if not reverse else (
                slice(k, None), slice(None))
        return jnp.pad(x, pad, constant_values=fill)[sl]

    k = 1
    while k < n:
        v_sh = shift(v, k, big)
        b_sh = shift(b, k, 0)
        v = jnp.where(b != 0, v, jnp.minimum(v, v_sh))
        b = b | b_sh
        k *= 2
    return jnp.minimum(v0, jnp.where(bgi != 0, big, v))


def _strip_fixpoint(L, bgi, big, h_blk: int, w: int):
    """Min-propagate one VMEM strip to a local fixpoint."""

    def round_(Lc):
        out = Lc
        for axis, reverse, n in ((1, False, w), (1, True, w),
                                 (0, False, h_blk), (0, True, h_blk)):
            out = _seg_min_scan(out, bgi, big, axis, reverse, n)
        return out

    def body(state):
        Lc, _ = state
        Ln = round_(Lc)
        return Ln, jnp.any(Ln != Lc)

    L, _ = jax.lax.while_loop(lambda s: s[1], body, (L, jnp.bool_(True)))
    return L


def _ccl_kernel(L_ref, out_ref, flag_ref, carry_ref, *, blk: int, w: int,
                nstrips: int, big_val: int):
    j = pl.program_id(1)
    big = jnp.int32(big_val)
    # walk: strips 0..ns-1 (down), then ns-2..0 (up)
    L = L_ref[0]
    bgi = (L == big).astype(jnp.int32)

    @pl.when(j == 0)
    def _():
        flag_ref[0, 0] = 0

    # merge the carried boundary row (4-connectivity: same-column min where
    # both rows are foreground).  The previous strip in walk order is ABOVE
    # while walking down (j <= ns-1: merge into our top row) and BELOW while
    # walking up (j >= ns: merge into our bottom row).
    carry = carry_ref[0:1, :]
    use_carry = j != 0
    merge_top = j < nstrips
    top = L[0:1, :]
    bot = L[blk - 1 : blk, :]
    top2 = jnp.where(merge_top & use_carry & (top != big) & (carry != big),
                     jnp.minimum(top, carry), top)
    bot2 = jnp.where((~merge_top) & use_carry & (bot != big) & (carry != big),
                     jnp.minimum(bot, carry), bot)
    L = jax.lax.concatenate([top2, L[1 : blk - 1, :], bot2], 0)

    L2 = _strip_fixpoint(L, bgi, big, blk, w)
    out_ref[0] = L2
    flag_ref[0, 0] = flag_ref[0, 0] | jnp.any(L2 != L_ref[0]).astype(jnp.int32)

    # carry out: the converged boundary row facing the NEXT strip in walk
    # order — below us until the turning point (j < ns-1), above after
    carry_ref[0:1, :] = jnp.where(j < nstrips - 1,
                                  L2[blk - 1 : blk, :], L2[0:1, :])


def ccl_pallas_available(h: int, w: int) -> bool:
    return (_pick_blk(h, w) >= 8 and w % 128 == 0 and w >= 128
            and h * w < 2**30)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ccl_serpentine(L0: jnp.ndarray, interpret: bool = False):
    """Run serpentine strip sweeps until a clean pass.  ``L0``: (N, H, W)
    int32 with ``big = 2**30`` at background pixels; returns
    ``(fixpoint, sweep_count)`` — the count is the bench's CCL-depth metric.
    ``interpret=True`` runs the Pallas interpreter (CPU logic testing)."""
    n, h, w = L0.shape
    blk = _pick_blk(h, w)
    nstrips = h // blk
    big_val = 2**30

    def index_in(i, j):
        s = jnp.where(j < nstrips, j, 2 * nstrips - 2 - j)
        return (i, s, 0)

    def sweep(L):
        out, flag = pl.pallas_call(
            functools.partial(_ccl_kernel, blk=blk, w=w, nstrips=nstrips,
                              big_val=big_val),
            grid=(n, 2 * nstrips - 1),
            in_specs=[pl.BlockSpec((1, blk, w), index_in, memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((1, blk, w), index_in, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (i, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, h, w), jnp.int32),
                jax.ShapeDtypeStruct((n, 1), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((1, w), jnp.int32)],
            input_output_aliases={0: 0},
            interpret=interpret,
        )(L)
        return out, flag

    def body(state):
        L, _, k = state
        L2, flag = sweep(L)
        return L2, jnp.any(flag > 0), k + 1

    L, _, sweeps = jax.lax.while_loop(
        lambda s: s[1], body, (L0, jnp.bool_(True), jnp.int32(0))
    )
    return L, sweeps
