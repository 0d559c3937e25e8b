"""Deterministic IEEE-754 binary32 addition, implemented with integer ops.

Why this exists: the reference library's float paths (bilinear resize
grayskull.h:183, perspective warp :441, Otsu accumulation :210-217, LBP stage sums
:808, BRIEF rotation :629-632) round at every individual float32 operation.  XLA
backends (CPU LLVM codegen, and potentially the TPU vector unit) contract
``a*b + c`` into a fused multiply-add with a single rounding — and neither
``lax.optimization_barrier`` nor the available XLA flags reliably prevent it.
A multiply whose consumer is *not* an add is always correctly rounded; only
float additions fed by same-kernel multiplies are at risk.

So: bit-exact float32 *additions* are done here on the uint32 bit patterns with
explicit round-to-nearest-even.  This is backend-independent and immune to
compiler contraction (the operands pass through integer bitcasts, which cannot be
fused into an FMA).

Scope/limits (fine for the image-domain values these ops produce):

* inputs must be finite; NaN/Inf propagation is not IEEE-faithful,
* subnormal *results* flush to zero (subnormal inputs are handled),
* -0/+0 sign conventions follow magnitude order, not IEEE addition rules.

Cost: ~40 integer VPU ops per add — used only on parity-critical paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["f32_add", "f32_sub", "f32_sum4"]

_U = jnp.uint32
_MANT_MASK = jnp.uint32(0x7FFFFF)
_IMPLICIT = jnp.uint32(0x800000)
_ABS_MASK = jnp.uint32(0x7FFFFFFF)


def _msb_pos(v):
    """Position of the highest set bit of v (uint32, v > 0)."""
    r = jnp.zeros(v.shape, jnp.uint32)
    for sh in (16, 8, 4, 2, 1):
        big = (v >> jnp.uint32(sh)) != 0
        r = r + jnp.where(big, jnp.uint32(sh), jnp.uint32(0))
        v = jnp.where(big, v >> jnp.uint32(sh), v)
    return r


def f32_add(a, b):
    """fl32(a + b) with round-to-nearest-even, bit-exact and contraction-proof."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    a, b = jnp.broadcast_arrays(a, b)
    ua = jax.lax.bitcast_convert_type(a, jnp.uint32)
    ub = jax.lax.bitcast_convert_type(b, jnp.uint32)

    absa = ua & _ABS_MASK
    absb = ub & _ABS_MASK
    swap = absa < absb
    ux = jnp.where(swap, ub, ua)
    uy = jnp.where(swap, ua, ub)
    ax = ux & _ABS_MASK
    ay = uy & _ABS_MASK

    sx = ux >> 31
    sy = uy >> 31
    ex_raw = ax >> 23
    ey_raw = ay >> 23
    # subnormals: exponent field 0 means exponent 1 without the implicit bit
    mx = jnp.where(ex_raw == 0, ax & _MANT_MASK, (ax & _MANT_MASK) | _IMPLICIT)
    my = jnp.where(ey_raw == 0, ay & _MANT_MASK, (ay & _MANT_MASK) | _IMPLICIT)
    ex = jnp.maximum(ex_raw, jnp.uint32(1))
    ey = jnp.maximum(ey_raw, jnp.uint32(1))

    # 3 guard bits
    mx3 = mx << 3
    my3 = my << 3
    d = ex - ey  # >= 0 since |x| >= |y|
    dc = jnp.minimum(d, jnp.uint32(31))
    shifted = my3 >> dc
    lost = my3 - (shifted << dc)  # bits shifted out (as integer remainder)
    frac = lost != 0  # true iff alignment lost a nonzero fraction

    same_sign = sx == sy
    base_add = mx3 + shifted
    base_sub = mx3 - shifted - frac.astype(_U)
    base = jnp.where(same_sign, base_add, base_sub)

    zero_res = base == 0
    safe_base = jnp.where(zero_res, jnp.uint32(1), base)
    p = _msb_pos(safe_base)

    # round path: p > 23 — shift right by s with RNE using (low, frac) sticky
    s = jnp.where(p > 23, p - 23, jnp.uint32(0))
    half = jnp.where(s > 0, jnp.uint32(1) << (s - jnp.uint32(1)), jnp.uint32(0))
    m_shift = safe_base >> s
    low = safe_base - (m_shift << s)
    lsb = m_shift & jnp.uint32(1)
    roundup = jnp.where(
        s > 0,
        (low > half) | ((low == half) & (frac | (lsb == 1))),
        jnp.zeros_like(frac),
    )
    m_rounded = m_shift + roundup.astype(_U)
    # left path: p <= 23 — exact left shift (massive cancellation implies frac == 0)
    lshift = jnp.where(p < 23, jnp.uint32(23) - p, jnp.uint32(0))
    m_final = m_rounded << lshift

    # value = base * 2^(ex-153) = m_f * 2^(e_f-150)  =>  e_f = ex + p - 26 (both paths)
    e_f = ex.astype(jnp.int32) - 26 + p.astype(jnp.int32)
    # rounding carry: mantissa overflowed to 2^24
    carried = m_final == jnp.uint32(0x1000000)
    m_final = jnp.where(carried, jnp.uint32(0x800000), m_final)
    e_f = jnp.where(carried, e_f + 1, e_f)

    # flush subnormal/underflow results to zero; clamp overflow to inf
    underflow = e_f <= 0
    overflow = e_f >= 255
    u_res = (sx << 31) | (jnp.clip(e_f, 0, 254).astype(_U) << 23) | (m_final & _MANT_MASK)
    u_res = jnp.where(zero_res | underflow, sx << 31, u_res)
    u_res = jnp.where(overflow, (sx << 31) | jnp.uint32(0x7F800000), u_res)
    # exact zero result of cancellation: IEEE gives +0 for RNE
    u_res = jnp.where(zero_res & ~same_sign, jnp.uint32(0), u_res)
    return jax.lax.bitcast_convert_type(u_res, jnp.float32)


def f32_sub(a, b):
    """fl32(a - b), exact (negation is sign-flip, always exact)."""
    b = jnp.asarray(b, jnp.float32)
    return f32_add(a, -b)


def f32_sum4(t1, t2, t3, t4):
    """C-order sum ``((t1 + t2) + t3) + t4`` with exact f32 rounding at each add."""
    return f32_add(f32_add(f32_add(t1, t2), t3), t4)
