"""Dense pixel ops — TPU-native, batched equivalents of grayskull's L2 layer
(/root/reference/grayskull.h:150-320).

Every op is a pure function over uint8 arrays and reproduces the reference's integer
arithmetic **bit-exactly** (C truncating division, unsigned wraparound, float32
truncation), verified by differential tests against the compiled C oracle.

Boundary semantics differ per op, exactly as in the reference:

* ``blur`` / ``adaptive_threshold`` / ``erode`` / ``dilate``: the window is *clipped*
  at image borders (mean over fewer samples / min-max over fewer samples).
* ``filter``: out-of-bounds samples read as 0 (``gs_get`` semantics, grayskull.h:143).
* ``sobel``: only the interior is computed; the 1-px border is 0 (the reference
  leaves dst untouched there — callers always pass a zeroed dst, nanomagick.c:139).

All ops accept (H, W) or (N, H, W) uint8 and are jit-friendly (static shapes, no
data-dependent Python control flow).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import Rect, batched, on_tpu as _on_tpu
from ..exactf32 import f32_sum4

__all__ = [
    "crop",
    "copy",
    "resize_nn",
    "resize",
    "downsample",
    "threshold",
    "adaptive_threshold",
    "blur",
    "filter",
    "filter2d",
    "SHARPEN_KERNEL",
    "EMBOSS_KERNEL",
    "BLUR_BOX_KERNEL",
    "BLUR_GAUSSIAN_KERNEL",
    "sharpen",
    "emboss",
    "blur_box",
    "blur_gaussian",
    "erode",
    "dilate",
    "sobel",
]


# ---------------------------------------------------------------------------
# crop / copy (grayskull.h:154-162)
# ---------------------------------------------------------------------------


def crop(img: jnp.ndarray, roi: Rect) -> jnp.ndarray:
    """ROI copy — ``gs_crop`` (grayskull.h:154-158).  ``roi`` must be static ints."""
    x, y, w, h = int(roi[0]), int(roi[1]), int(roi[2]), int(roi[3])
    if x < 0 or y < 0 or w <= 0 or h <= 0:
        raise ValueError(f"invalid crop rect {roi}")
    H, W = img.shape[-2:]
    if x + w > W or y + h > H:
        raise ValueError(f"crop rect {roi} exceeds image {W}x{H}")
    return img[..., y : y + h, x : x + w]


def copy(img: jnp.ndarray) -> jnp.ndarray:
    """``gs_copy`` (grayskull.h:160-162) — identity under functional semantics."""
    return jnp.asarray(img)


# ---------------------------------------------------------------------------
# resize (grayskull.h:164-187)
# ---------------------------------------------------------------------------


def _sel_matrix(idx: np.ndarray, src_n: int) -> jnp.ndarray:
    """One-hot row-selection matrix (len(idx), src_n) in bf16.

    Gathers serialize on TPU even with static indices; a one-hot matmul rides
    the MXU instead and is EXACT here: every output element sums exactly one
    ``1.0 * pixel`` product, and uint8 pixel values are exact in bf16.
    """
    m = np.zeros((len(idx), src_n), np.float32)
    m[np.arange(len(idx)), np.asarray(idx, np.int64)] = 1.0
    return jnp.asarray(m, jnp.bfloat16)


def _sel_rows(sel, img):
    """(d, s) one-hot @ (..., s, w) -> (..., d, w) int32-exact selection."""
    out = jnp.einsum("ds,...sw->...dw", sel, img.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out


def _sel_cols(img_f32, sel):
    """(..., h, s) @ (d, s)^T -> (..., h, d); inputs are integer-valued f32."""
    return jnp.einsum("...hs,ds->...hd", img_f32.astype(jnp.bfloat16), sel,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("size",))
def _resize_nn(img, size):
    sh, sw = img.shape[-2:]
    dh, dw = size
    # C: sx = x * src.w / dst.w  (unsigned integer division, grayskull.h:166)
    sx = (np.arange(dw, dtype=np.uint32) * np.uint32(sw)) // np.uint32(dw)
    sy = (np.arange(dh, dtype=np.uint32) * np.uint32(sh)) // np.uint32(dh)
    # one-hot row+column selection matmuls (indices are static and in range;
    # gs_get's OOB-reads-0 cannot trigger for valid sizes)
    out = _sel_cols(_sel_rows(_sel_matrix(sy, sh), img), _sel_matrix(sx, sw))
    return out.astype(jnp.uint8)


def resize_nn(img: jnp.ndarray, size) -> jnp.ndarray:
    """Nearest-neighbor resize — ``gs_resize_nn`` (grayskull.h:164-169).

    ``size`` is static ``(h, w)`` of the output.
    """
    return _resize_nn(img, (int(size[0]), int(size[1])))


def _src_coords_f32(dst_n: int, src_n: int):
    """C: sx = ((float)x + 0.5f) * src.w / dst.w - 0.5f, clamped (grayskull.h:174-177).

    Computed host-side in numpy float32: the sizes are static, and doing the math in
    XLA would let the compiler rewrite ``* src / dst`` into a reciprocal multiply,
    which changes float32 rounding and breaks bit-exactness vs the C reference.
    """
    x = np.arange(dst_n, dtype=np.float32)
    s = (x + np.float32(0.5)) * np.float32(src_n) / np.float32(dst_n) - np.float32(0.5)
    s = np.maximum(np.float32(0.0), np.minimum(s, np.float32(src_n) - np.float32(1.0)))
    i0 = s.astype(np.int32)  # (unsigned)sx — truncation, s >= 0
    i1 = np.minimum(i0 + 1, src_n - 1)
    d = (s - i0.astype(np.float32)).astype(np.float32)
    return i0, i1, jnp.asarray(d)


@functools.partial(jax.jit, static_argnames=("size",))
def _resize(img, size):
    sh, sw = img.shape[-2:]
    dh, dw = size
    x0, x1, dx = _src_coords_f32(dw, sw)
    y0, y1, dy = _src_coords_f32(dh, sh)

    # corner picks via one-hot selection matmuls (MXU) instead of gathers:
    # row-select twice, then column-select each; every sum has exactly one
    # nonzero term, so the picks are bit-exact.
    sy0 = _sel_matrix(np.asarray(y0), sh)
    sy1 = _sel_matrix(np.asarray(y1), sh)
    sx0 = _sel_matrix(np.asarray(x0), sw)
    sx1 = _sel_matrix(np.asarray(x1), sw)
    r0 = _sel_rows(sy0, img)
    r1 = _sel_rows(sy1, img)
    c00 = _sel_cols(r0, sx0)
    c01 = _sel_cols(r0, sx1)
    c10 = _sel_cols(r1, sx0)
    c11 = _sel_cols(r1, sx1)
    dx2 = dx[None, :]
    dy2 = dy[:, None]
    # Exact C association (grayskull.h:183-184):
    #   ((c00*(1-dx))*(1-dy)) + ((c01*dx)*(1-dy)) + ((c10*(1-dx))*dy) + ((c11*dx)*dy)
    # Weight grids are precomputed host-side in numpy f32 (each product of two
    # static weights rounds exactly once there is NO such product in C — C multiplies
    # the pixel by each weight separately, so we keep two device multiplies).  The
    # additions use the contraction-proof exact f32 adder (see exactf32.py): XLA
    # would otherwise fuse mul+add chains into FMAs and change the rounding.
    one = jnp.float32(1.0)
    t1 = (c00 * (one - dx2)) * (one - dy2)
    t2 = (c01 * dx2) * (one - dy2)
    t3 = (c10 * (one - dx2)) * dy2
    t4 = (c11 * dx2) * dy2
    p = f32_sum4(t1, t2, t3, t4)
    return p.astype(jnp.uint8)  # (uint8_t) float truncation toward zero


def resize(img: jnp.ndarray, size) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers — ``gs_resize`` (grayskull.h:171-187).

    ``size`` is static ``(h, w)``.  Float math is float32 with the reference's exact
    operation order; the final store truncates toward zero like the C uint8 cast.
    On TPU, qualifying shapes dispatch to the fused Pallas band sampler
    (kernels/resize.py) — one pass instead of four full-frame one-hot
    selections plus the exact-f32 adder tail (bit-exact either way: Mosaic
    does not contract the lerp into FMA).
    """
    size = (int(size[0]), int(size[1]))
    sh, sw = img.shape[-2:]
    if _on_tpu() and img.dtype == jnp.uint8:
        from ..kernels.resize import resize_pallas, resize_pallas_available

        # uint8-resident source measured fastest (31.1k vs 28.0k fps int16
        # on the 1MP downscale, exp/results_resize_r5.json)
        if resize_pallas_available(sh, sw, *size, src_u8=True):
            lead = img.shape[:-2]
            out = resize_pallas(img.reshape((-1, sh, sw)), size, src_u8=True)
            return out.reshape(lead + size)
    return _resize(img, size)


@jax.jit
def downsample(img: jnp.ndarray) -> jnp.ndarray:
    """2x box downsample, integer ``sum/4`` — ``gs_downsample`` (grayskull.h:189-197)."""
    h, w = img.shape[-2:]
    dh, dw = h // 2, w // 2
    x = img[..., : dh * 2, : dw * 2].astype(jnp.uint32)
    lead = img.shape[:-2]
    x = x.reshape(lead + (dh, 2, dw, 2))
    s = x.sum(axis=(-3, -1))
    return (s // 4).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# thresholds (grayskull.h:225-247)
# ---------------------------------------------------------------------------


@jax.jit
def threshold(img: jnp.ndarray, thresh) -> jnp.ndarray:
    """Global binarize ``pixel > t ? 255 : 0`` — ``gs_threshold`` (grayskull.h:225-228).

    ``thresh`` may be a traced scalar (e.g. an Otsu result still on device).
    """
    t = jnp.asarray(thresh, dtype=jnp.uint8)
    return jnp.where(img > t, jnp.uint8(255), jnp.uint8(0))


def _clipped_window_sums(img: jnp.ndarray, radius: int):
    """Clipped-window box sums and counts via a padded 2D prefix sum.

    Returns (sum, count) as uint32 arrays of the image shape.  Exact: uint32 prefix
    sums (max 255 * 16.8M pixels fits), clamped-corner differencing.
    """
    h, w = img.shape[-2:]
    r = int(radius)
    x = img.astype(jnp.uint32)
    # prefix sum with a leading zero row/col so rect sums are pure differences
    cs = jnp.cumsum(jnp.cumsum(x, axis=-1), axis=-2)
    pad = [(0, 0)] * (img.ndim - 2) + [(1, 0), (1, 0)]
    cs = jnp.pad(cs, pad)
    ys = jnp.arange(h, dtype=jnp.int32)
    xs = jnp.arange(w, dtype=jnp.int32)
    y_lo = jnp.maximum(ys - r, 0)
    y_hi = jnp.minimum(ys + r, h - 1)
    x_lo = jnp.maximum(xs - r, 0)
    x_hi = jnp.minimum(xs + r, w - 1)

    def take2(a, yi, xi):
        return a[..., yi, :][..., xi]

    s = (
        take2(cs, y_hi + 1, x_hi + 1)
        - take2(cs, y_lo, x_hi + 1)
        - take2(cs, y_hi + 1, x_lo)
        + take2(cs, y_lo, x_lo)
    )
    count = ((y_hi - y_lo + 1)[:, None] * (x_hi - x_lo + 1)[None, :]).astype(jnp.uint32)
    return s, count


def _axis_counts(n: int, r: int) -> np.ndarray:
    return (np.minimum(np.arange(n) + r, n - 1) - np.maximum(np.arange(n) - r, 0) + 1).astype(
        np.float32
    )


def _exact_div(s: jnp.ndarray, counts: np.ndarray) -> jnp.ndarray:
    """Exact ``s // counts`` for int32 ``s < 2^24`` and a constant divisor grid.

    XLA's integer division by a constant *array* compiles pathologically on TPU
    (minutes for a 256x256 grid), and float division gets rewritten to a
    reciprocal multiply with wrong rounding.  So: estimate with the float
    reciprocal (error provably <= 1 for s < 2^24 regardless of FMA/rewrite
    slop), then repair with an exact integer fixup.
    """
    counts_i = jnp.asarray(counts.astype(np.int32))
    recip = jnp.asarray((1.0 / counts.astype(np.float64)).astype(np.float32))
    q0 = jnp.floor(s.astype(jnp.float32) * recip).astype(jnp.int32)
    r0 = s - q0 * counts_i
    return q0 + (r0 >= counts_i).astype(jnp.int32) - (r0 < 0).astype(jnp.int32)


def _div_by_axis_counts(s: jnp.ndarray, h: int, w: int, r: int, smax: int) -> jnp.ndarray:
    """Exact ``s // (cy * cx)`` for the clipped-window count grid."""
    assert smax < 2**24
    counts = np.outer(_axis_counts(h, r), _axis_counts(w, r)).astype(np.int64)
    return _exact_div(s, counts)


def _blur_small(img: jnp.ndarray, r: int) -> jnp.ndarray:
    """Separable shift-add blur for small radii — the TPU-fast path.

    The clipped-window division uses per-axis exact magic multiplies (see
    ``_magic_for``); a float32 division would hit XLA's reciprocal rewrite and
    round 119.9999 for an exact 120, and integer division by a constant grid
    compiles pathologically on TPU.
    """
    h, w = img.shape[-2:]
    lead = img.ndim - 2
    x = img.astype(jnp.int32)
    px = jnp.pad(x, [(0, 0)] * lead + [(0, 0), (r, r)])
    rowsum = sum(px[..., :, k : k + w] for k in range(2 * r + 1))
    py = jnp.pad(rowsum, [(0, 0)] * lead + [(r, r), (0, 0)])
    colsum = sum(py[..., k : k + h, :] for k in range(2 * r + 1))
    smax = 255 * (2 * r + 1) ** 2
    return _div_by_axis_counts(colsum, h, w, r, smax).astype(jnp.uint8)


def _stencil_pallas_or_none(which: str, img, r: int = 1, c=None):
    """Route ``blur``/``adaptive_threshold``/``sobel``/``erode``/``dilate``
    through the Pallas stencil kernels (kernels/preproc.py) when on TPU and
    the geometry qualifies; the standalone XLA paths pay several full-frame
    f32/int32 intermediates while the kernels stream uint8 row blocks once
    (bit-exact either way).  Returns None to fall through to the XLA path."""
    h, w = img.shape[-2:]
    from ..kernels import preproc as kp

    if not (_on_tpu() and img.dtype == jnp.uint8
            and kp.stencil_available(h, w, r)):
        return None
    lead = img.shape[:-2]
    iib = img.reshape((-1, h, w))
    if which == "blur":
        out = kp.blur_pallas(iib, r)
    elif which == "adaptive":
        out = kp.adaptive_pallas(iib, r, c)
    elif which == "sobel":
        out = kp.sobel_pallas(iib)
    else:
        out = kp.morph_pallas(iib, which)
    return out.reshape(lead + (h, w))


@functools.partial(jax.jit, static_argnames=("radius",))
def blur(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Arbitrary-radius box mean with clipped windows — ``gs_blur`` (grayskull.h:268-283).

    Border pixels average over the clipped window (``sum/count`` with the true sample
    count), unlike ``filter`` which zero-pads.  Division truncates like C unsigned
    division.  Small radii use an exact separable float32 path (VPU-friendly);
    large radii fall back to uint32 prefix sums.
    """
    r = int(radius)
    out = _stencil_pallas_or_none("blur", img, r)
    if out is not None:
        return out
    if r <= 15:  # (2r+1)^2 * 255 < 2^24 — f32 path exact
        return _blur_small(img, r)
    s, count = _clipped_window_sums(img, radius)
    return (s // count).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("radius",))
def adaptive_threshold(img: jnp.ndarray, radius: int, c) -> jnp.ndarray:
    """Mean-offset adaptive threshold — ``gs_adaptive_threshold`` (grayskull.h:230-247).

    ``threshold = sum/count - c`` with C unsigned division then int subtraction;
    output is ``src > threshold ? 255 : 0``.  Small radii use the separable
    shift-add path (see :func:`blur`), large radii the prefix-sum path.
    """
    r = int(radius)
    out = _stencil_pallas_or_none("adaptive", img, r, c)
    if out is not None:
        return out
    if r <= 15:
        h, w = img.shape[-2:]
        lead = img.ndim - 2
        x = img.astype(jnp.int32)
        px = jnp.pad(x, [(0, 0)] * lead + [(0, 0), (r, r)])
        rowsum = sum(px[..., :, k : k + w] for k in range(2 * r + 1))
        py = jnp.pad(rowsum, [(0, 0)] * lead + [(r, r), (0, 0)])
        s = sum(py[..., k : k + h, :] for k in range(2 * r + 1))
        smax = 255 * (2 * r + 1) ** 2
        q = _div_by_axis_counts(s, h, w, r, smax)
    else:
        s, count = _clipped_window_sums(img, radius)
        q = (s // count).astype(jnp.int32)
    thr = q - jnp.asarray(c, jnp.int32)
    return jnp.where(img.astype(jnp.int32) > thr, jnp.uint8(255), jnp.uint8(0))


# ---------------------------------------------------------------------------
# generic small-kernel filter + presets (grayskull.h:249-266)
# ---------------------------------------------------------------------------

# Kernel presets (grayskull.h:249-253). Weights are int8 (the reference stores them
# as uint8 and reinterprets, grayskull.h:261); norm is the divisor.
SHARPEN_KERNEL = (np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], np.int8), 1)
EMBOSS_KERNEL = (np.array([[-2, -1, 0], [-1, 1, 1], [0, 1, 2]], np.int8), 1)
BLUR_BOX_KERNEL = (np.ones((3, 3), np.int8), 9)
BLUR_GAUSSIAN_KERNEL = (np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.int8), 16)


def filter2d(img: jnp.ndarray, kernel, norm: int) -> jnp.ndarray:
    """Generic correlation with zero-padded borders — ``gs_filter`` (grayskull.h:255-266).

    Reproduces two C quirks exactly:

    * kernel weights are int8 reinterpretations of the uint8 kernel image;
    * ``sum / norm`` is **unsigned** division (``int / unsigned`` promotes to
      unsigned in C): a negative sum with ``norm > 1`` wraps to a huge value and
      clamps to 255, not 0.  With ``norm == 1`` the wrap is value-preserving.
    """
    kernel = np.asarray(kernel)
    if kernel.dtype == np.uint8:
        kernel = kernel.astype(np.int8)
    kernel = kernel.astype(np.int32)
    kh, kw = kernel.shape
    norm = int(norm)
    if norm <= 0:
        raise ValueError("norm must be > 0")
    h, w = img.shape[-2:]
    # the Pallas stencil's negative-sum-wraps-to-255 shortcut (and its f32
    # fixup division) is proven only for int8-range taps — the reference's
    # own domain (gs_filter reinterprets a uint8 kernel image as int8);
    # wider taps (API extension) stay on the XLA u32-wrap path
    in_int8 = kernel.min() >= -128 and kernel.max() <= 127
    if ((kh, kw) == (3, 3) and norm < 16_000_000 and in_int8
            and img.dtype == jnp.uint8):
        from ..kernels import preproc as kp

        if _on_tpu() and kp.stencil_available(h, w):
            taps = tuple(tuple(int(v) for v in row) for row in kernel)
            lead = img.shape[:-2]
            out = kp.filter3_pallas(img.reshape((-1, h, w)), taps, norm)
            return out.reshape(lead + (h, w))
    src = img.astype(jnp.int32)
    # sample offsets: (x + i - kw/2, y + j - kh/2), OOB reads 0 (gs_get)
    pad_l, pad_r = kw // 2, kw - 1 - kw // 2
    pad_t, pad_b = kh // 2, kh - 1 - kh // 2
    padded = jnp.pad(src, [(0, 0)] * (img.ndim - 2) + [(pad_t, pad_b), (pad_l, pad_r)])
    acc = jnp.zeros_like(src)
    for j in range(kh):
        for i in range(kw):
            wgt = int(kernel[j, i])
            if wgt == 0:
                continue
            acc = acc + padded[..., j : j + h, i : i + w] * wgt
    # C: sum = sum / norm with unsigned promotion (grayskull.h:263)
    q = (acc.astype(jnp.uint32) // jnp.uint32(norm)).astype(jnp.int32)
    return jnp.clip(q, 0, 255).astype(jnp.uint8)


filter = filter2d  # reference name (shadows the builtin only inside this module)


def sharpen(img):
    """``gs_sharpen`` preset filter (grayskull.h:249)."""
    return filter2d(img, *SHARPEN_KERNEL)


def emboss(img):
    """``gs_emboss`` preset filter (grayskull.h:250)."""
    return filter2d(img, *EMBOSS_KERNEL)


def blur_box(img):
    """``gs_blur_box`` preset filter (grayskull.h:251)."""
    return filter2d(img, *BLUR_BOX_KERNEL)


def blur_gaussian(img):
    """``gs_blur_gaussian`` preset filter (grayskull.h:252-253)."""
    return filter2d(img, *BLUR_GAUSSIAN_KERNEL)


# ---------------------------------------------------------------------------
# morphology (grayskull.h:285-304)
# ---------------------------------------------------------------------------


def _morph(img: jnp.ndarray, op: str) -> jnp.ndarray:
    # Clipped 3x3 window min/max == reduce_window padded with the op-neutral value.
    init = 255 if op == "erode" else 0
    fn = jax.lax.min if op == "erode" else jax.lax.max
    x = img.astype(jnp.int32)
    lead = img.ndim - 2
    out = jax.lax.reduce_window(
        x,
        jnp.int32(init),
        fn,
        window_dimensions=(1,) * lead + (3, 3),
        window_strides=(1,) * (lead + 2),
        padding=[(0, 0)] * lead + [(1, 1), (1, 1)],
    )
    return out.astype(jnp.uint8)


@jax.jit
def erode(img: jnp.ndarray) -> jnp.ndarray:
    """3x3 min filter with clipped borders — ``gs_erode`` (grayskull.h:286-303)."""
    out = _stencil_pallas_or_none("erode", img)
    if out is not None:
        return out
    return _morph(img, "erode")


@jax.jit
def dilate(img: jnp.ndarray) -> jnp.ndarray:
    """3x3 max filter with clipped borders — ``gs_dilate`` (grayskull.h:286-304)."""
    out = _stencil_pallas_or_none("dilate", img)
    if out is not None:
        return out
    return _morph(img, "dilate")


# ---------------------------------------------------------------------------
# sobel (grayskull.h:306-320)
# ---------------------------------------------------------------------------


@jax.jit
def sobel(img: jnp.ndarray) -> jnp.ndarray:
    """Sobel magnitude ``(|gx|+|gy|)/2`` on the interior — ``gs_sobel``
    (grayskull.h:306-320).  The 1-px border is 0 (the reference leaves the
    caller's dst untouched there; callers pass zeroed buffers)."""
    out = _stencil_pallas_or_none("sobel", img)
    if out is not None:
        return out
    x = img.astype(jnp.int32)

    def sh(dy, dx):
        # interior sample: img[y+dy, x+dx] for y,x in [1, H-1) x [1, W-1)
        return x[..., 1 + dy : x.shape[-2] - 1 + dy, 1 + dx : x.shape[-1] - 1 + dx]

    gx = -sh(-1, -1) + sh(-1, 1) - 2 * sh(0, -1) + 2 * sh(0, 1) - sh(1, -1) + sh(1, 1)
    gy = -sh(-1, -1) - 2 * sh(-1, 0) - sh(-1, 1) + sh(1, -1) + 2 * sh(1, 0) + sh(1, 1)
    mag = (jnp.abs(gx) + jnp.abs(gy)) // 2
    mag = jnp.clip(mag, 0, 255).astype(jnp.uint8)
    pad = [(0, 0)] * (img.ndim - 2) + [(1, 1), (1, 1)]
    return jnp.pad(mag, pad)
