"""Single-pass Pallas integral image — the TPU fast path behind ``ops.integral``.

``jnp.cumsum`` twice (the XLA formulation) lowers to ~10 log-shift passes per
axis through HBM (~5k 1MP fps).  This kernel streams each frame once through
VMEM, grid ``(N, H/blk)`` with a sequential inter-strip carry:

* the W-axis cumsum of the raw uint8 strip is ONE upper-triangular bf16
  matmul on the MXU — uint8 inputs are bf16-exact and every partial sum is
  < 255*W < 2^24, exact in the f32 accumulator;
* the H-axis cumsum of those row sums is THREE tiny lower-triangular matmuls,
  one per byte plane of the int32 row sums (each plane bf16-exact, per-plane
  column sums <= 255*blk < 2^24), recombined exactly in int32
  (255*W*blk < 2^31 for every gated geometry);
* the carry row lives in VMEM scratch; int32 wraparound == the reference's
  uint32 wraparound (grayskull.h:744-752) bit-for-bit.

Sublane-shifted adds (the obvious alternative for the H scan) are relayouts
on TPU — the byte-planed MXU form measured ~2.6x the XLA path end to end.
Bit-exact vs ``ops.integral`` (differentially tested on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["integral_pallas", "integral_pallas_available"]

_MAX_W = 1536  # triu (W, W) bf16 must stay VMEM-resident


def _integral_kernel(x_ref, out_ref, carry_ref, triu_ref, tril_ref, *, blk, w):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)
        r = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
        triu_ref[:] = (r <= c).astype(jnp.bfloat16)
        rr = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
        tril_ref[:] = (rr >= cc).astype(jnp.bfloat16)

    x = x_ref[0].astype(jnp.int32).astype(jnp.bfloat16)  # (blk, w)
    rowcs = jax.lax.dot_general(
        x, triu_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # exact row prefix sums, < 255*w

    b0 = (rowcs & 255).astype(jnp.bfloat16)
    b1 = ((rowcs >> 8) & 255).astype(jnp.bfloat16)
    b2 = (rowcs >> 16).astype(jnp.bfloat16)
    dot = lambda a: jax.lax.dot_general(
        tril_ref[:], a, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    y = dot(b0) + (dot(b1) << 8) + (dot(b2) << 16)
    y = y + carry_ref[0:1, :]
    out_ref[0] = y
    carry_ref[0:1, :] = y[blk - 1 : blk, :]


def _pick_block(hp: int) -> int:
    return 512 if hp >= 1024 else 128


@functools.partial(jax.jit, static_argnames=("interpret",))
def integral_pallas(imgs: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(H, W) or (N, H, W) uint8 -> same-shape uint32 inclusive 2D prefix sum."""
    single = imgs.ndim == 2
    x = imgs[None] if single else imgs
    n, h, w = x.shape
    blk = _pick_block(-(-h // 32) * 32)
    hp = -(-h // blk) * blk
    wp = -(-w // 128) * 128
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
            pltpu.VMEM((wp, wp), jnp.bfloat16),
            pltpu.VMEM((blk, blk), jnp.bfloat16),
        ],
        interpret=interpret,
    )(x)
    out = jax.lax.bitcast_convert_type(out[:, :h, :w], jnp.uint32)
    return out[0] if single else out


def integral_pallas_available(h: int, w: int) -> bool:
    """Geometry gate: the (W, W) triangular matrix must fit VMEM."""
    return 0 < w <= _MAX_W and h > 0
