"""Halo exchange over a sharded spatial axis via ``lax.ppermute`` (ICI ring).

A stencil of radius ``r`` on an H-sharded frame needs ``r`` boundary rows from
each neighbor shard.  Global frame edges receive zeros — which composes exactly
with the reference's clipped-window/zero-pad boundary semantics (the count grids
and interior masks are computed from *global* row coordinates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["exchange_halo", "bottom_halo"]


def exchange_halo(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Extend the second-to-last axis with ``halo`` rows from ring neighbors.

    ``x``: (..., h_local, w) inside a ``shard_map`` over ``axis_name``.
    Returns (..., h_local + 2*halo, w); global top/bottom halos are zero.
    """
    if halo == 0:
        return x
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    bottom_rows = x[..., -halo:, :]
    top_rows = x[..., :halo, :]
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_prev = lax.ppermute(bottom_rows, axis_name, fwd)  # prev shard's last rows
    from_next = lax.ppermute(top_rows, axis_name, bwd)  # next shard's first rows
    from_prev = jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev)
    from_next = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=-2)


def bottom_halo(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Extend the second-to-last axis with ``halo`` rows from the shards BELOW.

    Unlike :func:`exchange_halo`, the halo may exceed the shard height: whole
    neighbor blocks are fetched over the ring (``ceil(halo / h_local)``
    ppermute hops) and the extension truncated to ``halo`` rows.  Rows past
    the global bottom edge are zero.  Sliding-window consumers whose windows
    only extend downward (template matching, LBP) need exactly this shape.
    """
    if halo == 0:
        return x
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    h_loc = x.shape[-2]
    parts = [x]
    for k in range(1, -(-halo // h_loc) + 1):
        # receiver r takes shard r+k's whole block (zero past the bottom)
        blk = lax.ppermute(x, axis_name, [(i, (i - k) % n) for i in range(n)])
        parts.append(jnp.where(idx + k < n, blk, jnp.zeros_like(blk)))
    ext = jnp.concatenate(parts, axis=-2)
    return ext[..., : h_loc + halo, :]
