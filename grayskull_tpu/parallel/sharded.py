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
from .halo import bottom_halo, exchange_halo

__all__ = ["preprocess_sharded", "preprocess_spatial_shardmap", "integral_sharded",
           "scan_sharded", "match_template_sharded"]


def _integral_local_with_carry(x_local, space_axis: str, kernels: bool = False,
                               interpret: bool = False):
    """Distributed 2D prefix sum: local scan + exclusive carry over the shard axis.

    The reference's sequential two-pass integral (grayskull.h:744-752) becomes a
    segmented associative scan: each shard integrates its rows locally, then adds
    the all-gathered column totals of the shards above it (one ICI collective).
    ``kernels`` routes the local scan through the single-pass Pallas kernel
    (blocked triangular MXU matmuls) instead of the XLA double-cumsum.
    """
    if kernels:
        from ..kernels.integral import integral_pallas

        local = integral_pallas(x_local, interpret=interpret)
    else:
        local = jnp.cumsum(jnp.cumsum(x_local.astype(jnp.uint32), axis=-1), axis=-2)
    last = local[..., -1, :]  # (..., w): this shard's total column sums
    gathered = lax.all_gather(last, space_axis)  # (nshards, ..., w)
    idx = lax.axis_index(space_axis)
    nsh = lax.axis_size(space_axis)
    shard_ids = jnp.arange(nsh)
    mask = (shard_ids < idx).astype(jnp.uint32)
    carry = jnp.tensordot(mask, gathered, axes=(0, 0))  # exclusive prefix
    return local + carry[..., None, :]


@functools.lru_cache(maxsize=64)
def _integral_fn(mesh: Mesh, data_axis: str, space_axis: str,
                 kernels: bool = False, interpret: bool = False):
    body = functools.partial(_integral_local_with_carry, space_axis=space_axis,
                             kernels=kernels, interpret=interpret)
    spec = P(data_axis, space_axis, None)
    # pallas_call's out_shape carries no varying-mesh-axes annotation (same
    # constraint as the spatial preprocess bodies) — drop the vma check only
    # on the kernel route.
    return jax.jit(shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec,
                             check_vma=not kernels))


def integral_sharded(imgs, mesh: Mesh, data_axis: str = "data", space_axis: str = "space",
                     kernels: bool | None = None, interpret: bool = False):
    """Integral images of H-sharded frames — bit-identical to ``gs.integral``.

    ``imgs``: (N, H, W) uint8, N divisible by the data axis, H by the space axis.

    ``kernels``: run each shard's local scan through the single-pass Pallas
    integral kernel — default on TPU when the shard geometry qualifies.
    ``interpret`` runs that kernel in Pallas interpret mode (CPU-mesh tests).

    The jitted shard_map callables here and below are lru_cached per
    (mesh, geometry): rebuilding shard_map each call defeats jit's
    function-identity cache and pays a full re-trace per invocation
    (measured 40x the kernel runtime on a 64x1MP batch).
    """
    from ..kernels.integral import integral_pallas_available

    h_loc = imgs.shape[1] // mesh.shape[space_axis]
    if kernels is None:
        from ..core import on_tpu

        kernels = on_tpu() and integral_pallas_available(h_loc, imgs.shape[2])
    elif kernels:
        # an explicit kernels=True on shards too wide for the VMEM strip gate
        # would dispatch an ungated pallas_call (compile-time failure) — fall
        # back to the bit-identical cumsum route instead
        kernels = integral_pallas_available(h_loc, imgs.shape[2])
    spec = P(data_axis, space_axis, None)
    imgs = jax.device_put(imgs, NamedSharding(mesh, spec))
    return _integral_fn(mesh, data_axis, space_axis, bool(kernels), interpret)(imgs)


@functools.lru_cache(maxsize=64)
def _preprocess_sharded_fn(mesh: Mesh, radius: int, data_axis: str):
    from ..pipelines.preproc import preprocess_reference

    spec = P(data_axis)
    sharding = NamedSharding(mesh, P(data_axis, None, None))
    return jax.jit(
        functools.partial(preprocess_reference, radius=radius),
        in_shardings=sharding,
        out_shardings=(sharding, sharding, sharding, NamedSharding(mesh, spec)),
    )


def preprocess_sharded(imgs, mesh: Mesh, radius: int = 2, data_axis: str = "data"):
    """Data-parallel fused preprocess over the mesh's ``data`` axis.

    Returns (blurred, binary, edges, thresholds) with outputs sharded like the
    input batch.
    """
    sharding = NamedSharding(mesh, P(data_axis, None, None))
    imgs = jax.device_put(imgs, sharding)
    return _preprocess_sharded_fn(mesh, int(radius), data_axis)(imgs)


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
    # counts is TRACED (row0 is the axis index): plain integer division by a
    # traced grid lowers pathologically on TPU — use the exact f32-divide +
    # +-1 integer fixup instead (exact for colsum < 2^24).
    from ..kernels.preproc import _fixup_div

    assert 255 * (2 * r + 1) ** 2 < 2**24
    blurred = _fixup_div(colsum, counts[None]).astype(jnp.uint8)

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


def _spatial_pipeline_kernels(imgs_local, *, h: int, w: int, radius: int,
                              space_axis: str, interpret: bool):
    """Per-shard body that reuses the fused Pallas kernel pair.

    Halo rows travel as uint8 over ICI (``exchange_halo``), then each shard
    runs ``fused_blur_hist_window`` (clipped counts at global coordinates,
    histogram masked to its own rows) and — after the psum'd Otsu and a
    1-row blurred halo exchange — ``fused_threshold_sobel_window``.  The
    only collectives are the two ppermute halos and one (N, 256) psum."""
    from ..kernels import preproc as kp

    r = radius
    n_loc, h_loc, _ = imgs_local.shape
    idx = lax.axis_index(space_axis)
    row0 = idx.astype(jnp.int32) * h_loc

    x = exchange_halo(imgs_local, r, space_axis)  # (n, h_loc + 2r, w) uint8
    blurred_ext, local_hist = kp.fused_blur_hist_window(
        x, row0 - r, radius=r, h_total=h, row_lo=r, row_hi=r + h_loc,
        interpret=interpret)
    blurred = blurred_ext[:, r : r + h_loc]
    hist = lax.psum(local_hist, space_axis)
    t = otsu_from_histogram(hist, h * w)  # replicated across shards

    b = exchange_halo(blurred, 1, space_axis)  # (n, h_loc + 2, w) uint8
    binary_ext, edges_ext = kp.fused_threshold_sobel_window(
        b, t, row0 - 1, h_total=h, interpret=interpret)
    return (blurred, binary_ext[:, 1 : 1 + h_loc],
            edges_ext[:, 1 : 1 + h_loc], t)


def preprocess_spatial_shardmap(imgs, mesh: Mesh, radius: int = 2,
                                data_axis: str = "data", space_axis: str = "space",
                                kernels: bool | None = None,
                                interpret: bool = False):
    """Fused preprocess with the batch sharded over ``data`` AND the frame height
    sharded over ``space`` (halo exchange + psum histogram over ICI).

    ``imgs``: (N, H, W) uint8; N divisible by the data axis, H by the space axis.

    ``kernels``: route the shard bodies through the fused Pallas kernel pair
    (``fused_blur_hist_window``/``fused_threshold_sobel_window``) instead of
    composed XLA ops — default on TPU when the shard geometry qualifies.
    ``interpret`` runs those kernels in Pallas interpret mode (CPU-mesh tests).
    """
    n, h, w = imgs.shape
    from ..core import on_tpu
    from ..kernels.preproc import window_available

    h_loc = h // mesh.shape[space_axis]
    if kernels is None:
        kernels = on_tpu() and window_available(h_loc, w, radius)
    in_spec = P(data_axis, space_axis, None)
    imgs = jax.device_put(imgs, NamedSharding(mesh, in_spec))
    return _spatial_fn(mesh, h, w, int(radius), data_axis, space_axis,
                       bool(kernels), bool(interpret))(imgs)


@functools.lru_cache(maxsize=64)
def _spatial_fn(mesh: Mesh, h: int, w: int, radius: int, data_axis: str,
                space_axis: str, kernels: bool, interpret: bool):
    if kernels:
        body = functools.partial(
            _spatial_pipeline_kernels, h=h, w=w, radius=radius,
            space_axis=space_axis, interpret=interpret,
        )
    else:
        body = functools.partial(
            _spatial_pipeline, h=h, w=w, radius=radius, space_axis=space_axis
        )
    in_spec = P(data_axis, space_axis, None)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(in_spec,),
        out_specs=(in_spec, in_spec, in_spec, P(data_axis)),
        # pallas_call's out_shape carries no varying-mesh-axes annotation, so
        # the vma checker rejects the kernel body; the XLA body keeps it on
        check_vma=not kernels,
    )
    return jax.jit(fn)


def _match_template_body(x_local, tmpl, *, space_axis: str):
    """Per-shard body: all placements whose top row lives in this shard.

    A placement (y, x) reads template-height rows downward, so each shard
    fetches ``th - 1`` bottom-halo rows (multi-hop for templates taller than
    a shard) and runs the dense SSD decomposition locally — the halo
    ppermute is the ONLY collective.  Shards past the last valid placement
    row produce rows the caller slices off (their windows read the zero
    padding below the global frame)."""
    from ..ops.template import _match_template

    ext = bottom_halo(x_local, tmpl.shape[-2] - 1, space_axis)
    return jax.vmap(lambda im: _match_template(im, tmpl))(ext)


@functools.lru_cache(maxsize=64)
def _match_template_fn(mesh: Mesh, data_axis: str, space_axis: str):
    body = functools.partial(_match_template_body, space_axis=space_axis)
    spec = P(data_axis, space_axis, None)
    return jax.jit(shard_map(body, mesh=mesh,
                             in_specs=(spec, P(None, None)), out_specs=spec))


def match_template_sharded(imgs, tmpl, mesh: Mesh, data_axis: str = "data",
                           space_axis: str = "space"):
    """SSD template matching on H-sharded frames — bit-identical to
    ``gs.match_template`` (grayskull.h:701-723) on every placement.

    ``imgs``: (N, H, W) uint8, N divisible by the data axis, H by the space
    axis; ``tmpl``: (th, tw) uint8, replicated.  Returns the (N, H-th+1,
    W-tw+1) score map sharded like the input.
    """
    from ..ops.template import match_template  # noqa: F401  (validation twin)
    from ..ops.template import _MAX_TEMPLATE_PIXELS

    n, h, w = imgs.shape
    th, tw = tmpl.shape
    if th > h or tw > w:
        raise ValueError(f"template {tmpl.shape} larger than image {(h, w)}")
    if th * tw > _MAX_TEMPLATE_PIXELS:
        raise ValueError(
            f"template has {th * tw} pixels; exact uint32 scoring supports up "
            f"to {_MAX_TEMPLATE_PIXELS}")
    spec = P(data_axis, space_axis, None)
    imgs = jax.device_put(imgs, NamedSharding(mesh, spec))
    tmpl = jax.device_put(jnp.asarray(tmpl),
                          NamedSharding(mesh, P(None, None)))
    res = _match_template_fn(mesh, data_axis, space_axis)(imgs, tmpl)
    return res[:, : h - th + 1, :]


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
    out_size = (int(out_size[0]), int(out_size[1]))
    spec = P(data_axis, None, None)
    imgs = jax.device_put(imgs, NamedSharding(mesh, spec))
    return _scan_sharded_fn(mesh, out_size, int(max_blobs), data_axis)(imgs)


@functools.lru_cache(maxsize=64)
def _scan_sharded_fn(mesh: Mesh, out_size, max_blobs: int, data_axis: str):
    from ..pipelines.scan import scan

    spec = P(data_axis, None, None)
    return jax.jit(
        functools.partial(scan, out_size=out_size, max_blobs=max_blobs),
        out_shardings=(NamedSharding(mesh, spec),
                       NamedSharding(mesh, P(data_axis, None, None))),
    )
