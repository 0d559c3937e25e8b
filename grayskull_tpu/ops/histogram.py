"""Histogram and Otsu threshold — ``gs_histogram`` / ``gs_otsu_threshold``
(/root/reference/grayskull.h:199-223).

Otsu is the subtle one: the reference accumulates ``sum`` and ``sumB`` in float32
**sequentially over bins 0..255**, and float32 addition is not associative — so we
reproduce the exact accumulation order with ``lax.scan`` (256 tiny steps) instead of
a parallel reduction.  The variance expression keeps the C association
``((wb*wf)*(mB-mF))*(mB-mF)`` and the argmax keeps the first-max tie-break
(strict ``>`` update, grayskull.h:220).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import on_tpu as _on_tpu

__all__ = ["histogram", "otsu_threshold", "otsu_from_histogram"]


def _hist_nibble_matmul(flat: jnp.ndarray) -> jnp.ndarray:
    """(N, P) uint8 -> (N, 256) int32 via hi/lo-nibble one-hot contraction.

    ``hist[hi*16+lo] = onehot16(hi)^T @ onehot16(lo)`` — 32 compares per pixel
    and an MXU contraction instead of a scatter (XLA scatter serializes on
    TPU).  Counts are small integers, so bf16/f32 matmul arithmetic is exact.
    """
    iota = jnp.arange(16, dtype=jnp.uint8)
    a = (flat[..., None] >> 4 == iota).astype(jnp.bfloat16)  # (N, P, 16)
    b = (flat[..., None] & 15 == iota).astype(jnp.bfloat16)
    m = jnp.einsum("npi,npj->nij", a, b, preferred_element_type=jnp.float32)
    return m.reshape(flat.shape[0], 256).astype(jnp.uint32)


@jax.jit
def histogram(img: jnp.ndarray) -> jnp.ndarray:
    """256-bin histogram — ``gs_histogram`` (grayskull.h:199-203).

    Returns uint32 counts of shape (..., 256) (leading batch dims preserved).
    On TPU the scatter-free nibble-matmul path is used (~100x faster than
    ``bincount``'s scatter); elsewhere ``bincount``.
    """
    lead = img.shape[:-2]
    flat = img.reshape((-1, img.shape[-2] * img.shape[-1]))
    if _on_tpu():
        out = _hist_nibble_matmul(flat.astype(jnp.uint8))
    else:
        out = jax.vmap(lambda f: jnp.bincount(f, length=256))(
            flat.astype(jnp.int32)
        ).astype(jnp.uint32)
    return out.reshape(lead + (256,)) if lead else out[0]


def _otsu_from_hist(hist: jnp.ndarray, total: jnp.ndarray) -> jnp.ndarray:
    """Exact C otsu sweep (grayskull.h:205-223) over one 256-bin histogram."""
    hist_f = hist.astype(jnp.float32)
    bins_f = jnp.arange(256, dtype=jnp.float32)
    terms = bins_f * hist_f  # (float)i * hist[i] — product rounded to f32

    # zero/False values *derived from the data* so the scan carries carry the
    # same varying-manual-axes type as the scanned terms under shard_map
    zf = terms[0] * jnp.float32(0.0)
    zu = hist[0] * jnp.uint32(0)
    zb = zu != zu

    # sum: sequential f32 accumulation in bin order (grayskull.h:210)
    def add(c, t):
        return c + t, None

    total_sum, _ = jax.lax.scan(add, zf, terms, unroll=16)

    total_u = total.astype(jnp.uint32)

    # C order inside the loop body (grayskull.h:211-221):
    #   wb += hist[t]; if (!wb) continue; wf = total - wb; if (!wf) break;
    #   sumB += t*hist[t]; ...
    # The break happens BEFORE sumB is updated on the breaking iteration, and the
    # `continue` skips the sumB update too; `done` freezes every later iteration.
    def step_exact(carry, xs):
        wb, sumB, varMax, thr, done = carry
        t, h, term = xs
        wb2 = jnp.where(done, wb, wb + h.astype(jnp.uint32))
        skip = wb2 == 0
        wf = total_u - wb2
        brk = (~skip) & (~done) & (wf == 0)
        active = (~skip) & (~done) & (~brk)
        sumB2 = jnp.where(active, sumB + term, sumB)
        mB = sumB2 / wb2.astype(jnp.float32)
        mF = (total_sum - sumB2) / wf.astype(jnp.float32)
        d = mB - mF
        var = ((wb2.astype(jnp.float32) * wf.astype(jnp.float32)) * d) * d
        better = active & (var > varMax)
        varMax2 = jnp.where(better, var, varMax)
        thr2 = jnp.where(better, t, thr)
        return (wb2, sumB2, varMax2, thr2, done | brk), None

    ts = jnp.arange(256, dtype=jnp.uint32)
    init = (zu, zf, zf + jnp.float32(-1.0), zu, zb)
    # unroll: the per-step work is tiny, TPU sequential-step overhead dominates
    (wb, sumB, varMax, thr, done), _ = jax.lax.scan(
        step_exact, init, (ts, hist, terms), unroll=16
    )
    return thr.astype(jnp.uint8)


@jax.jit
def otsu_from_histogram(hist: jnp.ndarray, total) -> jnp.ndarray:
    """Otsu sweep over precomputed histogram(s) — (..., 256) counts -> uint8.

    ``total`` is the pixel count per image (scalar).  Used by fused pipelines
    that produce histograms on device (e.g. the Pallas MXU histogram).
    """
    total = jnp.asarray(total, jnp.uint32)
    if hist.ndim == 1:
        return _otsu_from_hist(hist.astype(jnp.uint32), total)
    flat = hist.reshape((-1, 256)).astype(jnp.uint32)
    out = jax.vmap(lambda hh: _otsu_from_hist(hh, total))(flat)
    return out.reshape(hist.shape[:-1])


@jax.jit
def otsu_threshold(img: jnp.ndarray) -> jnp.ndarray:
    """Otsu's threshold — ``gs_otsu_threshold`` (grayskull.h:205-223).

    Returns a uint8 scalar (or (N,) for batched input).  Bit-exact vs the C float32
    sweep, including first-argmax tie-breaks and the early ``wf == 0`` break.
    """
    hist = histogram(img)
    h, w = img.shape[-2:]
    total = jnp.uint32(h * w)
    if hist.ndim == 1:
        return _otsu_from_hist(hist, total)
    flat_hist = hist.reshape((-1, 256))
    out = jax.vmap(lambda hh: _otsu_from_hist(hh, total))(flat_hist)
    return out.reshape(img.shape[:-2])
