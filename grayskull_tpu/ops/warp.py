"""Perspective correction — ``gs_perspective_correct``
(/root/reference/grayskull.h:423-444).

Faithfulness note (also in the reference): this is a **bilinear quad warp**, not a
true homography — destination (u, v) interpolates linearly between the top edge
c0→c1 and bottom edge c3→c2.  Float math is float32 in the reference's exact
operation order; sums of same-kernel products go through the contraction-proof
exact f32 adder (see exactf32.py), and the final store truncates toward zero like
the C uint8 cast.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..exactf32 import f32_add, f32_sum4

__all__ = ["perspective_correct"]


def _warp_coords(src_hw, corners: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Exact-f32 source coordinates of the bilinear quad warp: returns
    ``(y0, y1, x0, x1, dy, dx)`` with the reference's operation order,
    clamping and truncation (grayskull.h:425-441)."""
    sh, sw = src_hw
    c = corners.astype(jnp.float32)  # (4, 2) as (x, y); order TL, TR, BR, BL
    one = jnp.float32(1.0)

    def edge(p0, p1):
        # p0 * (1 - u) + p1 * u, exact f32 add of the two products
        return f32_add(p0 * (one - u), p1 * u)

    top_x = edge(c[0, 0], c[1, 0])  # (dw,)
    top_y = edge(c[0, 1], c[1, 1])
    bot_x = edge(c[3, 0], c[2, 0])
    bot_y = edge(c[3, 1], c[2, 1])

    vv = v[:, None]
    src_x = f32_add(top_x[None, :] * (one - vv), bot_x[None, :] * vv)  # (dh, dw)
    src_y = f32_add(top_y[None, :] * (one - vv), bot_y[None, :] * vv)
    src_x = jnp.maximum(jnp.float32(0.0), jnp.minimum(src_x, jnp.float32(sw) - one))
    src_y = jnp.maximum(jnp.float32(0.0), jnp.minimum(src_y, jnp.float32(sh) - one))

    x0 = src_x.astype(jnp.int32)  # truncation, values >= 0
    y0 = src_y.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, sw - 1)
    y1 = jnp.minimum(y0 + 1, sh - 1)
    dx = src_x - x0.astype(jnp.float32)
    dy = src_y - y0.astype(jnp.float32)
    return y0, y1, x0, x1, dy, dx


def _warp_lerp(c00, c01, c10, c11, dy, dx) -> jnp.ndarray:
    """The reference's bilinear blend in its exact association order."""
    one = jnp.float32(1.0)
    # ((c00*(1-dx))*(1-dy)) + ((c01*dx)*(1-dy)) + ((c10*(1-dx))*dy) + ((c11*dx)*dy)
    t1 = (c00 * (one - dx)) * (one - dy)
    t2 = (c01 * dx) * (one - dy)
    t3 = (c10 * (one - dx)) * dy
    t4 = (c11 * dx) * dy
    return f32_sum4(t1, t2, t3, t4).astype(jnp.uint8)


def _warp_rows(src: jnp.ndarray, corners: jnp.ndarray, u: jnp.ndarray,
               v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear quad warp of the output rows whose v-coordinates are ``v``.

    ``u``/``v`` are the reference's host-f32 ``x/(dw-1)`` / ``y/(dh-1)`` grids
    (``v`` may be any row subset — the space-sharded scanner passes each
    shard's band).  Exact-f32 arithmetic identical to the full warp.
    """
    y0, y1, x0, x1, dy, dx = _warp_coords(src.shape[-2:], corners, u, v)

    def gather(yi, xi):
        return src[..., yi, xi].astype(jnp.float32)

    return _warp_lerp(gather(y0, x0), gather(y0, x1), gather(y1, x0),
                      gather(y1, x1), dy, dx)


# banded-sampler config ladder: the narrow config covers every mildly tilted
# document-scale quad (measured spans on the scan benchmarks: <=17 rows,
# <=123 cols per tile); the wide one covers ~40 deg tilts and up to ~3x
# source-to-output downscales before the gather path takes over.
_BANDED_CONFIGS = ((64, 256), (128, 512))


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def _warp_batched_tpu(srcs: jnp.ndarray, corners: jnp.ndarray, size,
                      interpret: bool = False):
    """Batched warp with the banded Pallas sampler (kernels/warp.py): corner
    samples via per-tile one-hot MXU selects instead of serialized gathers
    (r3: 34 ms -> ~3 ms per 1000x800 page with whole-row bands; r5: per-tile
    bands cut the contraction ~9x further).  A ``lax.cond`` ladder picks the
    narrowest config whose static band fits every tile's source span; only
    the taken branch executes on device, and extreme quads fall back to the
    XLA gather path.

    Page heights that are not multiples of 8 edge-replicate the LAST
    coordinate row up to the block size (replicated rows have the same
    source span as the real last row, so band limits are untouched) and
    slice the extra sample rows off before the lerp — exact."""
    from ..kernels.warp import banded_prep, banded_run

    dh, dw = size
    dhp = -(-dh // 8) * 8
    u = jnp.asarray(np.arange(dw, dtype=np.float32) / np.float32(dw - 1.0))
    v = jnp.asarray(np.arange(dh, dtype=np.float32) / np.float32(dh - 1.0))
    coords = jax.vmap(
        lambda cc: _warp_coords(srcs.shape[-2:], cc, u, v)
    )(corners)
    y0, y1, x0, x1, dy, dx = coords
    if dhp != dh:
        rpad = ((0, 0), (0, dhp - dh), (0, 0))
        y0, y1, x0, x1 = (jnp.pad(a, rpad, mode="edge")
                          for a in (y0, y1, x0, x1))

    def use_gather(_):
        def one(src, yy0, yy1, xx0, xx1):
            g = lambda yi, xi: src[yi, xi].astype(jnp.float32)  # noqa: E731
            return g(yy0, xx0), g(yy0, xx1), g(yy1, xx0), g(yy1, xx1)

        return jax.vmap(one)(srcs, y0, y1, x0, x1)

    from ..kernels.warp import quad_sample_banded_available

    sh, sw = srcs.shape[-2:]
    configs = [cfg for cfg in _BANDED_CONFIGS
               if quad_sample_banded_available(sh, sw, dh, dw, *cfg)]
    branch = use_gather
    for kb, kxb in reversed(configs):
        prep, ok = banded_prep(srcs, y0, y1, x0, x1, kb, kxb)

        def make(pr, k, kx, okk, fb):
            return lambda _: jax.lax.cond(
                okk,
                lambda __: banded_run(pr, dw, k, kx, interpret=interpret),
                fb, None)

        branch = make(prep, kb, kxb, ok, branch)

    c00, c01, c10, c11 = branch(None)
    if dhp != dh:
        c00, c01, c10, c11 = (c[:, :dh] for c in (c00, c01, c10, c11))
    return _warp_lerp(c00, c01, c10, c11, dy, dx)


@functools.partial(jax.jit, static_argnames=("size",))
def _perspective_correct(src: jnp.ndarray, corners: jnp.ndarray, size) -> jnp.ndarray:
    dh, dw = size
    # u = x / (dst.w - 1), v = y / (dst.h - 1): static grids, computed host-side in
    # numpy f32 so XLA cannot rewrite the division (grayskull.h:425-427).
    u = jnp.asarray(np.arange(dw, dtype=np.float32) / np.float32(dw - 1.0))
    v = jnp.asarray(np.arange(dh, dtype=np.float32) / np.float32(dh - 1.0))
    return _warp_rows(src, corners, u, v)


def perspective_correct(src: jnp.ndarray, corners, size) -> jnp.ndarray:
    """Warp the quad ``corners`` (TL, TR, BR, BL as (x, y) rows) to a ``size=(h, w)``
    rectangle — ``gs_perspective_correct`` (grayskull.h:423-444).

    ``corners`` may be a traced (4, 2) array (e.g. straight from
    :func:`grayskull_tpu.ops.blobs.blob_corners`), keeping the whole document-scan
    pipeline on device.
    """
    from ..core import on_tpu
    from ..kernels.warp import quad_sample_banded_available

    corners = jnp.asarray(corners)
    if corners.shape[-2:] != (4, 2):
        raise ValueError(f"corners must be (4, 2) (x, y) rows, got {corners.shape}")
    size = (int(size[0]), int(size[1]))
    single = src.ndim == 2
    srcs = src[None] if single else src
    cb = corners[None] if corners.ndim == 2 else corners
    if cb.shape[0] != srcs.shape[0]:
        cb = jnp.broadcast_to(cb, (srcs.shape[0], 4, 2))
    if on_tpu() and quad_sample_banded_available(
            srcs.shape[1], srcs.shape[2], *size, *_BANDED_CONFIGS[0]):
        out = _warp_batched_tpu(srcs, cb, size)
        return out[0] if single else out
    if single:
        return _perspective_correct(src, corners, size)
    return jax.vmap(lambda im, cc: _perspective_correct(im, cc, size))(srcs, cb)
