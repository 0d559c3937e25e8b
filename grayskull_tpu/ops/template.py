"""Template matching — ``gs_match_template`` / ``gs_find_best_match``
(/root/reference/grayskull.h:705-738).

The reference scans every placement and accumulates the sum of squared differences
in a uint64.  The TPU formulation uses the SSD decomposition

    SSD(y, x) = win_sum(I^2) - 2 * corr(I, T) + sum(T^2)

where ``corr`` is a cross-correlation (an MXU-friendly contraction) and
``win_sum(I^2)`` comes from an integral image.  All terms are computed mod 2^32;
since the true SSD fits in uint32 for templates up to ~66k pixels (guarded), the
wrapped arithmetic yields the exact value.  The reference's final score is

    score = SSD * 255 / (K * 255 * 255)  ==  SSD / (255 * K)      (K = tmpl pixels)

which lets the division stay in uint32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["match_template", "find_best_match"]

_MAX_TEMPLATE_PIXELS = (2**32 - 1) // (255 * 255)  # 66051: true SSD must fit uint32


@jax.jit
def _match_template(img: jnp.ndarray, tmpl: jnp.ndarray) -> jnp.ndarray:
    ih, iw = img.shape
    th, tw = tmpl.shape
    rh, rw = ih - th + 1, iw - tw + 1
    I = img.astype(jnp.int32)
    T = tmpl.astype(jnp.int32)

    # corr(I, T): cross-correlation over valid placements.  Integer convs don't map
    # to the TPU MXU, so decompose uint8 into hi/lo nibbles and run four float32
    # convolutions: every product is <= 225 and every partial sum < 2^24, so the
    # f32 arithmetic is exact (and FMA contraction is harmless on exact values).
    def corr_f32(a, b):
        return jax.lax.conv_general_dilated(
            a[None, None],
            b[None, None],
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        )[0, 0]

    ih_, il_ = (I >> 4).astype(jnp.float32), (I & 15).astype(jnp.float32)
    th_, tl_ = (T >> 4).astype(jnp.float32), (T & 15).astype(jnp.float32)
    c_hh = corr_f32(ih_, th_).astype(jnp.uint32)
    c_hl = corr_f32(ih_, tl_).astype(jnp.uint32)
    c_lh = corr_f32(il_, th_).astype(jnp.uint32)
    c_ll = corr_f32(il_, tl_).astype(jnp.uint32)
    corr = jnp.uint32(256) * c_hh + jnp.uint32(16) * (c_hl + c_lh) + c_ll

    # win_sum(I^2) via padded integral image (uint32, modular)
    sq = (I * I).astype(jnp.uint32)
    cs = jnp.pad(jnp.cumsum(jnp.cumsum(sq, axis=-1), axis=-2), ((1, 0), (1, 0)))
    win_sq = (
        cs[th : th + rh, tw : tw + rw]
        - cs[0:rh, tw : tw + rw]
        - cs[th : th + rh, 0:rw]
        + cs[0:rh, 0:rw]
    )

    sum_t2 = jnp.sum((T * T).astype(jnp.uint32))
    ssd = win_sq - jnp.uint32(2) * corr.astype(jnp.uint32) + sum_t2
    score = ssd // jnp.uint32(255 * th * tw)
    # score <= 255 always (ssd <= K*255^2), so 255 - min(score,255) == 255 - score
    return (jnp.uint32(255) - jnp.minimum(score, jnp.uint32(255))).astype(jnp.uint8)


def match_template(img: jnp.ndarray, tmpl: jnp.ndarray) -> jnp.ndarray:
    """SSD template match, normalized so 255 = perfect — ``gs_match_template``.

    Output shape: (ih - th + 1, iw - tw + 1).  Bit-exact vs the reference for
    templates up to 66k pixels (the reference's uint64 sums fit our uint32 path).
    """
    if img.ndim == 3:
        return jax.vmap(lambda im: match_template(im, tmpl))(img)
    ih, iw = img.shape
    th, tw = tmpl.shape
    if th > ih or tw > iw:
        raise ValueError(f"template {tmpl.shape} larger than image {img.shape}")
    if th * tw > _MAX_TEMPLATE_PIXELS:
        raise ValueError(
            f"template has {th * tw} pixels; exact uint32 scoring supports up to "
            f"{_MAX_TEMPLATE_PIXELS}"
        )
    return _match_template(img, tmpl)


@jax.jit
def find_best_match(result: jnp.ndarray):
    """Argmax scan, first-occurrence tie-break — ``gs_find_best_match``
    (grayskull.h:725-738).  Returns (x, y) int32 scalars.

    Note the reference's strict ``>`` update means an all-zero result map yields
    (0, 0), which this reproduces.
    """
    w = result.shape[-1]
    idx = jnp.argmax(result.reshape(result.shape[:-2] + (-1,)), axis=-1).astype(jnp.int32)
    return idx % w, idx // w
