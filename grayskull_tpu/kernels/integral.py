"""Single-pass Pallas integral image — the TPU fast path behind ``ops.integral``.

``jnp.cumsum`` twice (the XLA formulation) lowers to ~10 log-shift passes per
axis through HBM (~3.4k 1MP fps).  This kernel streams each frame once through
VMEM, grid ``(N, H/blk)`` with a sequential inter-strip carry, and both scans
run as BLOCKED (128, 128) triangular MXU matmuls (r4 — exp/exp_integral_r4.py):

* the W-axis cumsum runs per 128-lane chunk: (blk, 128) @ (128, 128) triu in
  bf16 (uint8 inputs are bf16-exact, in-chunk partials < 255*128 exact in the
  f32 accumulator), then a serial int32 lane carry — chunk c's last column
  broadcast-adds into chunk c+1;
* the H-axis cumsum of those row sums runs per 128-row sub-block as THREE
  tiny (128, 128) lower-triangular matmuls, one per byte plane (each plane
  bf16-exact, per-plane column sums <= 255*128 < 2^24), recombined exactly in
  int32 with a serial row carry; int32 wraparound == the reference's uint32
  wraparound (grayskull.h:744-752) bit-for-bit;
* the inter-strip carry row lives in VMEM scratch.

The r1-r3 kernel used ONE (blk, w) @ (w, w) triu for the W scan and (blk, blk)
tril byte planes for the H scan — ~5.1k MACs/px at blk=512 and a hard
``w <= 1536`` cap from the VMEM-resident (w, w) triangle.  Blocking cuts the
MXU work to ~1k MACs/px (measured 1.43x end-to-end: 4.24 -> 2.96 ms per
64x1MP in one process) and lifts the width cap to a VMEM strip gate.

Sublane-shifted adds (the obvious alternative for the H scan) are relayouts
on TPU — the byte-planed MXU form measured ~2.6x the XLA path end to end
before blocking, ~6.3x after.  Bit-exact vs ``ops.integral`` (differentially
tested on TPU, including odd geometries and the wide-frame gate boundary).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["integral_pallas", "integral_pallas_available"]

# VMEM strip gate: the kernel keeps ~20 B/px of strip-sized values live
# (uint8 in + int32 rowcs + int32 out, each with concat temporaries and
# double-buffered grid blocks).  blk*wp = 512k is the measured-safe point
# (blk=512, wp=1024 compiled to an ~11 MB stack); wider frames drop blk.
_MAX_STRIP_PX = 512 * 1024


def _integral_kernel(x_ref, out_ref, carry_ref, triu_ref, tril_ref, *, blk, w):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)
        r = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        triu_ref[:] = (r <= c).astype(jnp.bfloat16)
        tril_ref[:] = (r >= c).astype(jnp.bfloat16)

    x = x_ref[0]  # (blk, w) uint8

    # W-scan: per-chunk triu matmul + serial int32 lane carry.
    parts = []
    off = None
    for c in range(w // 128):
        xc = x[:, 128 * c:128 * (c + 1)].astype(jnp.int32).astype(jnp.bfloat16)
        pc = jax.lax.dot_general(
            xc, triu_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # in-chunk row prefix, < 255*128
        if off is not None:
            pc = pc + off  # (blk, 1) broadcast over lanes
        parts.append(pc)
        off = pc[:, 127:128]
    rowcs = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    # H-scan: per-sub-block byte-plane tril matmuls + serial int32 row carry.
    dot = lambda a: jax.lax.dot_general(
        tril_ref[:], a, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    run = carry_ref[0:1, :]  # (1, w) column carry
    ys = []
    for s in range(blk // 128):
        r = rowcs[128 * s:128 * (s + 1), :]
        b0 = (r & 255).astype(jnp.bfloat16)
        b1 = ((r >> 8) & 255).astype(jnp.bfloat16)
        b2 = (r >> 16).astype(jnp.bfloat16)
        y = dot(b0) + (dot(b1) << 8) + (dot(b2) << 16)
        y = y + run  # (1, w) broadcast over sublanes
        ys.append(y)
        run = y[127:128, :]
    out_ref[0] = jnp.concatenate(ys, axis=0) if len(ys) > 1 else ys[0]
    carry_ref[0:1, :] = run


def _pick_block(hp: int, wp: int) -> int:
    """Strip height minimizing padded rows inside the measured VMEM gate.

    Bigger blocks amortize the carry chain, but only at equal padding: a
    600-row frame at blk=512 pads to 1024 (~70% dead rows) where blk=128
    pads to 640 — so pick by padded row count ceil(hp/blk)*blk first,
    tie-breaking toward the larger block."""
    fits = [blk for blk in (512, 256, 128) if blk * wp <= _MAX_STRIP_PX]
    if not fits:
        return 128
    return min(fits, key=lambda blk: (-(-hp // blk) * blk, -blk))


@functools.partial(jax.jit, static_argnames=("interpret",))
def integral_pallas(imgs: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(H, W) or (N, H, W) uint8 -> same-shape uint32 inclusive 2D prefix sum."""
    single = imgs.ndim == 2
    x = imgs[None] if single else imgs
    n, h, w = x.shape
    wp = -(-w // 128) * 128
    blk = _pick_block(-(-h // 128) * 128, wp)
    hp = -(-h // blk) * blk
    x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w)))
    out = pl.pallas_call(
        functools.partial(_integral_kernel, blk=blk, w=wp),
        grid=(n, hp // blk),
        in_specs=[pl.BlockSpec((1, blk, wp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, blk, wp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((8, wp), jnp.int32),
            pltpu.VMEM((128, 128), jnp.bfloat16),
            pltpu.VMEM((128, 128), jnp.bfloat16),
        ],
        interpret=interpret,
    )(x)
    out = jax.lax.bitcast_convert_type(out[:, :h, :w], jnp.uint32)
    return out[0] if single else out


def integral_pallas_available(h: int, w: int) -> bool:
    """Geometry gate: one (128, wp) strip row must fit the VMEM budget."""
    return h > 0 and 0 < w and 128 * (-(-w // 128) * 128) <= _MAX_STRIP_PX
