"""Sharded pipelines: data-parallel batches and spatially-sharded frames.

``preprocess_sharded`` — pure data parallelism: shard the N axis over the mesh's
``data`` axis with ``jit`` + ``NamedSharding``; XLA partitions everything (the
pipeline is per-frame independent, so no collectives are generated).

``preprocess_spatial_shardmap`` — the interesting one: frames sharded along H
over the ``space`` axis inside a ``shard_map``:

* blur: radius-r halo exchange (``ppermute``), separable clipped-window sums
  with count grids in *global* row coordinates;
* histogram/Otsu: local bincount + ``psum`` over the space axis — every shard
  then runs the identical 256-step sweep (cheap, replicated);
* threshold: local; sobel: 1-row halo exchange, global-border zeroing.

Bit-exact versus the single-device ops for any mesh size (tests assert this on
an 8-device CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.histogram import otsu_from_histogram
from .halo import exchange_halo

__all__ = ["preprocess_sharded", "preprocess_spatial_shardmap", "integral_sharded", "scan_sharded"]


def _integral_local_with_carry(x_local, space_axis: str):
    """Distributed 2D prefix sum: local scan + exclusive carry over the shard axis.

    The reference's sequential two-pass integral (grayskull.h:744-752) becomes a
    segmented associative scan: each shard integrates its rows locally, then adds
    the all-gathered column totals of the shards above it (one ICI collective).
    """
    local = jnp.cumsum(jnp.cumsum(x_local.astype(jnp.uint32), axis=-1), axis=-2)
    last = local[..., -1, :]  # (..., w): this shard's total column sums
    gathered = lax.all_gather(last, space_axis)  # (nshards, ..., w)
    idx = lax.axis_index(space_axis)
    nsh = lax.axis_size(space_axis)
    shard_ids = jnp.arange(nsh)
    mask = (shard_ids < idx).astype(jnp.uint32)
    carry = jnp.tensordot(mask, gathered, axes=(0, 0))  # exclusive prefix
    return local + carry[..., None, :]


def integral_sharded(imgs, mesh: Mesh, data_axis: str = "data", space_axis: str = "space"):
    """Integral images of H-sharded frames — bit-identical to ``gs.integral``.

    ``imgs``: (N, H, W) uint8, N divisible by the data axis, H by the space axis.
    """
    body = functools.partial(_integral_local_with_carry, space_axis=space_axis)
    spec = P(data_axis, space_axis, None)
    fn = shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec)
    imgs = jax.device_put(imgs, NamedSharding(mesh, spec))
    return jax.jit(fn)(imgs)


def preprocess_sharded(imgs, mesh: Mesh, radius: int = 2, data_axis: str = "data"):
    """Data-parallel fused preprocess over the mesh's ``data`` axis.

    Returns (blurred, binary, edges, thresholds) with outputs sharded like the
    input batch.
    """
    from ..pipelines.preproc import preprocess_reference

    spec = P(data_axis)
    sharding = NamedSharding(mesh, P(data_axis, None, None))
    imgs = jax.device_put(imgs, sharding)
    fn = jax.jit(
        functools.partial(preprocess_reference, radius=radius),
        in_shardings=sharding,
        out_shardings=(sharding, sharding, sharding, NamedSharding(mesh, spec)),
    )
    return fn(imgs)


def _axis_counts_global(h: int, r: int, start, local_h: int):
    gi = jnp.arange(local_h, dtype=jnp.int32) + start
    return (jnp.minimum(gi + r, h - 1) - jnp.maximum(gi - r, 0) + 1).astype(jnp.int32)


def _spatial_pipeline(imgs_local, *, h: int, w: int, radius: int, space_axis: str):
    """Per-shard body: imgs_local (n_loc, h_loc, w) uint8."""
    r = radius
    n_loc, h_loc, _ = imgs_local.shape
    idx = lax.axis_index(space_axis)
    row0 = idx.astype(jnp.int32) * h_loc

    # ---- blur with halo exchange ----
    x = exchange_halo(imgs_local.astype(jnp.int32), r, space_axis)  # (n, h_loc+2r, w)
    px = jnp.pad(x, ((0, 0), (0, 0), (r, r)))
    rowsum = px[:, :, 0:w]
    for k in range(1, 2 * r + 1):
        rowsum = rowsum + px[:, :, k : k + w]
    colsum = rowsum[:, 0:h_loc, :]
    for k in range(1, 2 * r + 1):
        colsum = colsum + rowsum[:, k : k + h_loc, :]
    cy = _axis_counts_global(h, r, row0, h_loc)
    cxv = np.arange(w)
    cx = jnp.asarray(
        (np.minimum(cxv + r, w - 1) - np.maximum(cxv - r, 0) + 1).astype(np.int32)
    )
    counts = cy[:, None] * cx[None, :]
    blurred = (colsum // counts[None]).astype(jnp.uint8)

    # ---- otsu: local histogram + psum ----
    from ..ops.histogram import _hist_nibble_matmul

    from ..core import on_tpu

    flat = blurred.reshape(n_loc, -1)
    if on_tpu():
        local_hist = _hist_nibble_matmul(flat).astype(jnp.int32)
    else:
        local_hist = jax.vmap(lambda f: jnp.bincount(f, length=256))(flat.astype(jnp.int32))
    hist = lax.psum(local_hist, space_axis)
    t = otsu_from_histogram(hist, h * w)  # replicated across shards

    # ---- threshold (local) ----
    binary = jnp.where(blurred > t[:, None, None].astype(jnp.uint8), jnp.uint8(255),
                       jnp.uint8(0))

    # ---- sobel with 1-row halo ----
    b = exchange_halo(binary.astype(jnp.int32), 1, space_axis)
    pb = jnp.pad(b, ((0, 0), (0, 0), (1, 1)))

    def sh(dy, dx):
        return pb[:, 1 + dy : 1 + dy + h_loc, 1 + dx : 1 + dx + w]

    gx = -sh(-1, -1) + sh(-1, 1) - 2 * sh(0, -1) + 2 * sh(0, 1) - sh(1, -1) + sh(1, 1)
    gy = -sh(-1, -1) - 2 * sh(-1, 0) - sh(-1, 1) + sh(1, -1) + 2 * sh(1, 0) + sh(1, 1)
    mag = jnp.clip((jnp.abs(gx) + jnp.abs(gy)) // 2, 0, 255)
    gi = jnp.arange(h_loc, dtype=jnp.int32) + row0
    gj = jnp.arange(w, dtype=jnp.int32)
    interior = ((gi >= 1) & (gi < h - 1))[:, None] & ((gj >= 1) & (gj < w - 1))[None, :]
    edges = jnp.where(interior[None], mag, 0).astype(jnp.uint8)
    return blurred, binary, edges, t


def preprocess_spatial_shardmap(imgs, mesh: Mesh, radius: int = 2,
                                data_axis: str = "data", space_axis: str = "space"):
    """Fused preprocess with the batch sharded over ``data`` AND the frame height
    sharded over ``space`` (halo exchange + psum histogram over ICI).

    ``imgs``: (N, H, W) uint8; N divisible by the data axis, H by the space axis.
    """
    n, h, w = imgs.shape
    body = functools.partial(
        _spatial_pipeline, h=h, w=w, radius=radius, space_axis=space_axis
    )
    in_spec = P(data_axis, space_axis, None)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(in_spec,),
        out_specs=(in_spec, in_spec, in_spec, P(data_axis)),
    )
    sharding = NamedSharding(mesh, in_spec)
    imgs = jax.device_put(imgs, sharding)
    return jax.jit(fn)(imgs)


def scan_sharded(imgs, mesh: Mesh, out_size=(1000, 800), max_blobs: int = 1000,
                 data_axis: str = "data"):
    """Data-parallel document scanner — frames sharded over ``data``.

    The scanner (nanomagick.c:186-210) is per-frame independent, so the
    production deployment is pure batch sharding: each chip runs the full
    blur -> threshold -> CCL -> corners -> warp chain on its local frames and
    XLA partitions the whole jit with zero collectives.  Bit-identical to
    :func:`grayskull_tpu.pipelines.scan` on every frame.

    Returns ``(pages (N, out_h, out_w) uint8, corners (N, 4, 2) int32)``.
    """
    from ..pipelines.scan import scan

    out_size = (int(out_size[0]), int(out_size[1]))
    spec = P(data_axis, None, None)
    imgs = jax.device_put(imgs, NamedSharding(mesh, spec))
    fn = jax.jit(
        functools.partial(scan, out_size=out_size, max_blobs=max_blobs),
        out_shardings=(NamedSharding(mesh, spec),
                       NamedSharding(mesh, P(data_axis, None, None))),
    )
    return fn(imgs)
