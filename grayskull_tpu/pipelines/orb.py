"""Pyramid ORB extraction and two-frame template tracking —
``extract_pyramid_orb_nm`` / ``orb()``
(/root/reference/examples/nanomagick/nanomagick.c:244-345).

Per level: halve via 2x box downsample while both dims stay >= 32 (max 4 levels),
extract ORB with a per-level keypoint budget (equal split, last level takes the
remainder of the *actual* totals — a dynamic quantity, handled with traced count
limits over static tables), scale coordinates back by ``2^level``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import Keypoints, Matches
from ..ops.features import match_orb, orb_extract
from ..ops.pixel import downsample

__all__ = ["pyramid_levels", "extract_pyramid_orb", "track"]


def pyramid_levels(shape, n_levels: int = 3):
    """Static level plan: [(h, w), ...] halving while >= 32px (nanomagick.c:255-264)."""
    n_levels = min(int(n_levels), 4)
    h, w = shape
    levels = [(h, w)]
    for _ in range(1, n_levels):
        h, w = h // 2, w // 2
        if h < 32 or w < 32:
            break
        levels.append((h, w))
    return levels


@functools.partial(jax.jit, static_argnames=("max_kps", "n_levels"))
def extract_pyramid_orb(img: jnp.ndarray, max_kps: int, threshold, n_levels: int = 3):
    """Multi-scale ORB over a box-downsampled pyramid (nanomagick.c:245-290).

    ``img`` may be (H, W) or a batch (N, H, W) — batched extraction runs every
    level over the whole batch at once (one ``orb_extract`` per level), with the
    last level's dynamic budget tracked per frame.  Returns a
    :class:`Keypoints` table of capacity ``max_kps`` (per frame) with
    coordinates in full-resolution pixels, level results concatenated in level
    order.
    """
    single = img.ndim == 2
    imgs = img[None] if single else img
    b = imgs.shape[0]
    cap = int(max_kps)
    levels = pyramid_levels(imgs.shape[-2:], n_levels)
    nlv = len(levels)
    per_level = cap // nlv

    tables = []
    cur = imgs
    total = jnp.zeros((b,), jnp.int32)
    for lvl in range(nlv):
        if lvl > 0:
            cur = downsample(cur)
        if lvl == nlv - 1:
            budget = jnp.maximum(jnp.int32(cap) - total, 0)  # nanomagick.c:275-276
            t = orb_extract(cur, cap, threshold, limit=budget)
        else:
            if per_level == 0:
                continue  # C: level_nkps == 0 -> skip level (nanomagick.c:277)
            t = orb_extract(cur, per_level, threshold)
        scale = 1 << lvl
        t = t._replace(x=t.x * scale, y=t.y * scale)
        tables.append(t)
        total = total + t.n

    # concatenate tables compactly into one cap-table per frame, level order
    xs = jnp.concatenate([t.x for t in tables], axis=1)
    ys = jnp.concatenate([t.y for t in tables], axis=1)
    rs = jnp.concatenate([t.response for t in tables], axis=1)
    an = jnp.concatenate([t.angle for t in tables], axis=1)
    de = jnp.concatenate([t.descriptor for t in tables], axis=1)
    valid = jnp.concatenate(
        [jnp.arange(t.x.shape[1])[None, :] < t.n[:, None] for t in tables],
        axis=1,
    )
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    ok = valid & (rank < cap)
    dst = jnp.where(ok, rank, cap)

    def gather1(v, d):
        buf = jnp.zeros((cap + 1,) + v.shape[1:], v.dtype)
        return buf.at[d].set(v, mode="drop")[:cap]

    gather = jax.vmap(gather1)
    n = jnp.minimum(jnp.sum(valid.astype(jnp.int32), axis=1), cap)
    out = Keypoints(
        n=n.astype(jnp.int32),
        x=gather(xs, dst), y=gather(ys, dst), response=gather(rs, dst),
        angle=gather(an, dst), descriptor=gather(de, dst),
    )
    if single:
        return Keypoints(*(v[0] for v in out))
    return out


@functools.partial(jax.jit, static_argnames=("max_kps", "max_matches", "n_levels"))
def track(template: jnp.ndarray, scene: jnp.ndarray, max_kps: int = 2500,
          threshold=20, max_matches: int = 300, max_distance=60.0, n_levels: int = 3):
    """Two-frame ORB template tracking — the compute core of ``nanomagick orb``
    (nanomagick.c:292-311).  Returns (template_kps, scene_kps, matches).

    Same-shape frames extract as ONE batch-2 pyramid pass (each level's FAST /
    top-k / patch stages run once over both frames)."""
    if template.shape == scene.shape:
        both = extract_pyramid_orb(jnp.stack([template, scene]), max_kps,
                                   threshold, n_levels)
        tk = Keypoints(*(v[0] for v in both))
        sk = Keypoints(*(v[1] for v in both))
    else:
        tk = extract_pyramid_orb(template, max_kps, threshold, n_levels)
        sk = extract_pyramid_orb(scene, max_kps, threshold, n_levels)
    m = match_orb(tk, sk, max_matches, max_distance)
    return tk, sk, m
