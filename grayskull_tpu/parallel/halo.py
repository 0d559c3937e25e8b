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

__all__ = ["exchange_halo"]


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
