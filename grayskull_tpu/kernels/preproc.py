"""Fused Pallas kernels for the preprocessing pipeline (the headline benchmark):

    blur(r) -> histogram -> [otsu sweep] -> threshold -> sobel

Reference semantics: ``gs_blur`` (clipped-window mean, truncating integer
division — /root/reference/grayskull.h:268-283), ``gs_histogram`` (:199-203),
``gs_threshold`` (:225-228), ``gs_sobel`` (interior-only, :306-320).

Two kernels per batch, each grid-blocked ``(N, H/BLK)`` so Mosaic streams
row blocks through VMEM with double buffering (whole-frame blocks measured
~2.5x slower).  Cross-block stencil rows are 8-row views of the SAME input
at the neighbor blocks (edge-clamped index maps, masked to zero in-kernel —
which the clipped-count division / interior masks make exact); the r2
pre-gathered halo tensor cost an extra full-frame HBM pass per kernel.

Design notes (all bit-exact, differentially tested):

* **Column sums on the MXU.**  The vertical (2r+1)-tap sum is a banded-
  matrix matmul ``band @ rows`` with 0/1 bf16 weights: uint8 pixels are
  exact in bf16 and the MXU accumulates in f32, so the sums are exact
  integers.  This removes every sublane-shifted add (each is a relayout on
  TPU) and makes the halo concat 8-aligned.  Horizontal taps stay cheap
  lane-shift adds (int16 when ``255*(2r+1)^2 <= 32767``).
* **Magic-multiply division.**  TPU has no vector integer divide; ``lax``'s
  lowering cost ~60us/frame.  ``cs // (cy*cx)`` becomes two exact
  floor-divisions by small constants — ``(cs*m[cy] >> 19) * m[cx] >> 19``
  with ``m[d] = ceil(2**19/d)`` in uint32 — selected from (BLK,1)/(1,W)
  magic vectors.  Exactness for every reachable (cs, d) pair is verified at
  import time and pinned by tests; the Pallas path is limited to r <= 6
  (r=7, d=14 has no exact uint32 magic at this shift).
* **MXU nibble histogram.**  For each 8-row group, one-hot matrices
  ``A[(i*8+r), w] = [hi(r,w)==i]`` / ``B[(j*8+r), w] = [lo(r,w)==j]`` are
  built with ONE (128,W) compare each and contracted ``A @ B^T`` on the
  MXU.  ``C[i*8+r1, j*8+r2]`` counts cross-row pairs; the block diagonal
  ``r1==r2`` is the joint (hi,lo) histogram, extracted once per frame with
  two small f32 dots (``precision=HIGHEST`` — default f32 matmuls truncate
  operands to bf16 on the MXU and round counts > 256).
* **Compare-free threshold.**  ``pixel > t`` is ``((t - pixel) >> 31) & 255``.

Mosaic constraints honored: no u8->bf16 casts (via int32), no int8/int16
vector compares or shifts, no 1-D iota, f32 matmul precision pinned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_blur_hist", "fused_threshold_sobel", "blur_pallas",
           "adaptive_pallas", "sobel_pallas", "morph_pallas", "filter3_pallas",
           "fused_blur_hist_window", "fused_threshold_sobel_window",
           "preproc_available", "stencil_available", "window_available"]

_MAGIC_SHIFT = 19  # uint32 arithmetic: products stay < 2**32 through r=6
_MAX_RADIUS = 6  # no exact (m, 19) pair exists for r=7, d=14; XLA path covers r>6


def _verify_magic(max_r: int = _MAX_RADIUS) -> None:
    """Host-side proof that the two-stage magic division is exact.

    floor(floor(cs/cy)/cx) == floor(cs/(cy*cx)) holds for positive ints;
    each stage's magic multiply must floor-divide exactly over its operand
    range and stay within uint32 (S=18/int32 has no exact magic for r=6,d=9).
    """
    for r in range(1, max_r + 1):
        n_max = 255 * (2 * r + 1) ** 2
        n = np.arange(n_max + 1, dtype=np.uint64)
        for d in range(r + 1, 2 * r + 2):
            m = -((1 << _MAGIC_SHIFT) // -d)  # ceil: exact shift when d | 2**19
            assert n_max * m < 2**32, (r, d)
            q = (n * np.uint64(m)) >> np.uint64(_MAGIC_SHIFT)
            assert np.array_equal(q, n // np.uint64(d)), (r, d)


_verify_magic()


def _round8(v: int) -> int:
    return (v + 7) // 8 * 8


def _pick_block(h: int, w: int) -> int:
    """Largest row-block size keeping a block's working set VMEM-friendly."""
    for blk in (256, 128, 64, 32, 16, 8):
        if h % blk == 0 and blk * w <= 256 * 1024:
            return blk
    return 0


def _halo16(imgs: jnp.ndarray, blk: int) -> jnp.ndarray:
    """(N, H, W) -> (N, H/blk, 16, W): 8 rows above + 8 below each block.

    Zeros beyond the frame edges (exact: blur's clipped-count division and
    sobel's interior mask ignore them).  Superseded in the live kernels by
    ``_halo_specs`` neighbor-block views (this build cost a full-frame HBM
    pass); kept for the archived experiments in exp/.
    """
    n, h, w = imgs.shape
    nb = h // blk
    z8 = jnp.zeros((n, 8, w), imgs.dtype)
    parts = []
    for j in range(nb):
        top = z8 if j == 0 else imgs[:, j * blk - 8 : j * blk]
        bot = z8 if j == nb - 1 else imgs[:, (j + 1) * blk : (j + 1) * blk + 8]
        parts.append(jnp.concatenate([top, bot], axis=1))
    return jnp.stack(parts, axis=1)


def _magic_vec(count_vec: jnp.ndarray, r: int) -> jnp.ndarray:
    """Magic multiplier per clipped-window count (counts in r+1 .. 2r+1)."""
    ceil_div = lambda d: -((1 << _MAGIC_SHIFT) // -d)
    m = jnp.full_like(count_vec, ceil_div(2 * r + 1))
    for d in range(r + 1, 2 * r + 1):
        m = jnp.where(count_vec == d, ceil_div(d), m)
    return m.astype(jnp.uint32)


def _fill_band(band_ref, r: int, blk: int, hr: int = 8):
    """Banded column-sum matrix: band[out, in] = [in in out+hr-r .. out+hr+r]."""
    o = jax.lax.broadcasted_iota(jnp.int32, (blk, blk + 2 * hr), 0)
    i_in = jax.lax.broadcasted_iota(jnp.int32, (blk, blk + 2 * hr), 1)
    band_ref[:] = ((i_in >= o + hr - r) & (i_in <= o + hr + r)).astype(jnp.bfloat16)


def _fixup_div(n: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Exact floor(n/d) for non-negative int32 with n < 2**24: f32 divide
    (absolute error << 1 for these magnitudes) then a +-1 integer fixup —
    covers the r > 6 counts for which no exact uint32 magic pair exists."""
    est = (n.astype(jnp.float32) / d.astype(jnp.float32)).astype(jnp.int32)
    est = est - (est * d > n).astype(jnp.int32)
    return est + ((est + 1) * d <= n).astype(jnp.int32)


def _gather_rows(x_ref, halo_refs, j, nb, *, nv: int, blk: int):
    """(blk + 16*nv, w) int32: nv 8-row halo views above + block + nv below.

    Halos are 8-row views of the SAME input at the neighbor blocks (index
    maps clamp at the frame edges; the clamped fetch is masked to the zeros
    the clipped-count division expects) — a pre-gathered halo tensor cost an
    extra full-frame HBM pass per kernel to build (r2 design, rejected).
    """
    b8 = blk // 8
    n8 = nb * b8
    parts = []
    for idx, k in enumerate(range(nv, 0, -1)):
        parts.append(jnp.where(j * b8 >= k, halo_refs[idx][0].astype(jnp.int32), 0))
    parts.append(x_ref[0].astype(jnp.int32))
    for k in range(1, nv + 1):
        parts.append(jnp.where((j + 1) * b8 + k <= n8,
                               halo_refs[nv + k - 1][0].astype(jnp.int32), 0))
    return jnp.concatenate(parts, axis=0)


def _blur_block(x_ref, halo_refs, band_ref, j, nb, *, r: int, h: int,
                w: int, blk: int, nv: int = 1, row_base=0):
    """Clipped-window box mean of one (blk, w) block, exact int32 0..255.

    Vertical window sums ride a banded bf16 matmul over the halo-extended
    rows; the clipped division is exact magic multipliers for r <= 6 and
    f32-divide-with-fixup beyond (counts < 2**24 stay f32-exact).

    ``row_base`` (static 0 or a traced SMEM scalar) shifts the count grid's
    row coordinates: spatially-sharded callers pass the GLOBAL row index of
    this array's row 0 (possibly negative — the array then carries exchanged
    halo rows whose outputs the caller slices away) so the clipped-count
    division is taken against the global frame height ``h``."""
    rows = _gather_rows(x_ref, halo_refs, j, nb, nv=nv, blk=blk)
    xb = rows.astype(jnp.bfloat16)
    cs_col = jax.lax.dot_general(
        band_ref[:], xb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (blk, w) exact vertical sums (integers < 2**24)
    small = 255 * (2 * r + 1) ** 2 <= 32767  # r <= 5
    csi = cs_col.astype(jnp.int16 if small else jnp.int32)
    px = jnp.pad(csi, ((0, 0), (r, r)))
    cs_n = px[:, 0:w]
    for k in range(1, 2 * r + 1):
        cs_n = cs_n + px[:, k : k + w]

    y0 = j * blk
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + y0 + row_base
    jjv = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    cyv = jnp.minimum(ii + r, h - 1) - jnp.maximum(ii - r, 0) + 1
    cxv = jnp.minimum(jjv + r, w - 1) - jnp.maximum(jjv - r, 0) + 1
    if r <= _MAX_RADIUS:
        cs = cs_n.astype(jnp.int32).astype(jnp.uint32)  # products wrap-free in u32
        return ((((cs * _magic_vec(cyv, r)) >> _MAGIC_SHIFT)
                 * _magic_vec(cxv, r)) >> _MAGIC_SHIFT).astype(jnp.int32)
    cs = cs_n.astype(jnp.int32)
    return _fixup_div(_fixup_div(cs, cyv), cxv)


def _blur_hist_kernel(x_ref, top_ref, bot_ref, blur_ref, hist_ref, acc_ref,
                      band_ref, *, r: int, h: int, w: int, blk: int):
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        _fill_band(band_ref, r, blk)

    blurred = _blur_block(x_ref, (top_ref, bot_ref), band_ref, j, nb,
                          r=r, h=h, w=w, blk=blk)
    blur_ref[0] = blurred.astype(jnp.uint8)

    # MXU nibble histogram over 8-row groups — int8 one-hots: the int8 MXU
    # path accumulates integer MACs in int32 (exact by construction) and
    # measured ~5% faster than bf16 with half the one-hot VMEM bytes
    klass = jax.lax.broadcasted_iota(jnp.int32, (128, w), 0) >> 3
    acc = acc_ref[:]
    hi_all = blurred >> 4
    lo_all = blurred & 15
    for g in range(blk // 8):
        hi = jnp.concatenate([hi_all[g * 8 : (g + 1) * 8]] * 16, axis=0)
        lo = jnp.concatenate([lo_all[g * 8 : (g + 1) * 8]] * 16, axis=0)
        a = (hi == klass).astype(jnp.int8)
        b = (lo == klass).astype(jnp.int8)
        c = jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        acc = acc + c
    acc_ref[:] = acc

    @pl.when(j == nb - 1)
    def _():
        _hist_extract(acc_ref, hist_ref)


def _hist_extract(acc_ref, hist_ref):
    """Fold the (128, 128) nibble-pair accumulator to the (16, 16) histogram.

    Counts <= h*w < 2^24 stay exact in the f32 extraction dots."""
    accv = acc_ref[:].astype(jnp.float32)
    xid = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    yid = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    masked = jnp.where((xid & 7) == (yid & 7), accv, 0.0)
    pid = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    pcol = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1) >> 3
    p = (pid == pcol).astype(jnp.float32)
    t1 = jax.lax.dot_general(
        p, masked, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    m = jax.lax.dot_general(
        t1, p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    hist_ref[0] = m.astype(jnp.int32)


def _halo_specs(blk: int, h: int, w: int):
    """8-row neighbor views of the input: the block above's last 8 rows and
    the block below's first 8 (index maps clamp at the frame edges; kernels
    mask the clamped fetch to zero)."""
    b8 = blk // 8
    n8 = h // 8
    top = pl.BlockSpec((1, 8, w), lambda i, j: (i, jnp.maximum(j * b8 - 1, 0), 0),
                       memory_space=pltpu.VMEM)
    bot = pl.BlockSpec((1, 8, w), lambda i, j: (i, jnp.minimum((j + 1) * b8, n8 - 1), 0),
                       memory_space=pltpu.VMEM)
    return top, bot


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def fused_blur_hist(imgs: jnp.ndarray, radius: int = 2,
                    interpret: bool = False):
    """(N, H, W) uint8 -> (blurred uint8, hist (N, 256) int32)."""
    n, h, w = imgs.shape
    r = int(radius)
    blk = _pick_block(h, w)
    nb = h // blk
    top_spec, bot_spec = _halo_specs(blk, h, w)
    blurred, hist = pl.pallas_call(
        functools.partial(_blur_hist_kernel, r=r, h=h, w=w, blk=blk),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            top_spec,
            bot_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, 16), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
            jax.ShapeDtypeStruct((n, 16, 16), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((128, 128), jnp.int32),
            pltpu.VMEM((blk, blk + 16), jnp.bfloat16),
        ],
        interpret=interpret,
    )(imgs, imgs, imgs)
    # hist[hi, lo] -> flat bin hi*16+lo
    return blurred, hist.reshape(n, 256)


def _blur_hist_window_kernel(row0_ref, x_ref, top_ref, bot_ref, blur_ref,
                             hist_ref, acc_ref, band_ref, *, r: int,
                             h_total: int, w: int, blk: int, row_lo: int,
                             row_hi: int):
    """`_blur_hist_kernel` over a halo-extended shard: the count grid rides
    the traced global row offset (SMEM) and the histogram one-hots are
    masked to the shard's own rows [row_lo, row_hi) — exchanged halo rows
    and block-padding rows contribute nothing."""
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        _fill_band(band_ref, r, blk)

    blurred = _blur_block(x_ref, (top_ref, bot_ref), band_ref, j, nb,
                          r=r, h=h_total, w=w, blk=blk, row_base=row0_ref[0])
    blur_ref[0] = blurred.astype(jnp.uint8)

    klass = jax.lax.broadcasted_iota(jnp.int32, (128, w), 0) >> 3
    rsub = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0) & 7
    acc = acc_ref[:]
    hi_all = blurred >> 4
    lo_all = blurred & 15
    for g in range(blk // 8):
        src = j * blk + g * 8 + rsub  # absolute row in the extended array
        vmask = (src >= row_lo) & (src < row_hi)
        hi_rep = jnp.concatenate([hi_all[g * 8 : (g + 1) * 8]] * 16, axis=0)
        lo_rep = jnp.concatenate([lo_all[g * 8 : (g + 1) * 8]] * 16, axis=0)
        a = ((hi_rep == klass) & vmask).astype(jnp.int8)
        b = (lo_rep == klass).astype(jnp.int8)
        acc = acc + jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
    acc_ref[:] = acc

    @pl.when(j == nb - 1)
    def _():
        _hist_extract(acc_ref, hist_ref)


@functools.partial(jax.jit, static_argnames=("radius", "h_total", "row_lo",
                                             "row_hi", "interpret"))
def fused_blur_hist_window(imgs: jnp.ndarray, row0, radius: int = 2, *,
                           h_total: int, row_lo: int, row_hi: int,
                           interpret: bool = False):
    """Shard-local fused blur+histogram for spatially-sharded frames.

    ``imgs``: (N, h_ext, W) uint8 — one shard's rows plus ``radius``
    exchanged halo rows on each side (zeros beyond the global frame edges,
    matching ``gs_blur``'s clipped-window OOB semantics).  ``row0``: traced
    int32 scalar, the GLOBAL row index of ``imgs`` row 0 (``idx*h_loc - r``,
    may be negative).  The clipped-count division runs against the global
    frame height ``h_total``; the histogram counts only extended-array rows
    in ``[row_lo, row_hi)`` (the shard's own rows).  Returns
    ``(blurred (N, h_ext, W), hist (N, 256))`` — blurred rows outside the
    window are garbage (their windows straddle unavailable rows); slice
    ``[row_lo:row_hi]``."""
    n, h_ext, w = imgs.shape
    r = int(radius)
    blk, hp = _pad_blk(h_ext, w, 1)
    imgs = _pad_rows(imgs, hp)
    nb = hp // blk
    top_spec, bot_spec = _halo_specs(blk, hp, w)
    row0v = jnp.asarray(row0, jnp.int32).reshape(1)
    blurred, hist = pl.pallas_call(
        functools.partial(_blur_hist_window_kernel, r=r, h_total=int(h_total),
                          w=w, blk=blk, row_lo=int(row_lo), row_hi=int(row_hi)),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            top_spec,
            bot_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, 16), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, hp, w), jnp.uint8),
            jax.ShapeDtypeStruct((n, 16, 16), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((128, 128), jnp.int32),
            pltpu.VMEM((blk, blk + 16), jnp.bfloat16),
        ],
        interpret=interpret,
    )(row0v, imgs, imgs, imgs)
    return blurred[:, :h_ext], hist.reshape(n, 256)


def _blur_only_kernel(x_ref, *rest, r: int, h: int, w: int, blk: int, nv: int):
    halo_refs, (blur_ref, band_ref) = rest[: 2 * nv], rest[2 * nv :]
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        _fill_band(band_ref, r, blk, hr=8 * nv)

    blurred = _blur_block(x_ref, halo_refs, band_ref, j, nb,
                          r=r, h=h, w=w, blk=blk, nv=nv)
    blur_ref[0] = blurred.astype(jnp.uint8)


def _adaptive_kernel(c_ref, x_ref, *rest, r: int, h: int, w: int, blk: int,
                     nv: int):
    halo_refs, (out_ref, band_ref) = rest[: 2 * nv], rest[2 * nv :]
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        _fill_band(band_ref, r, blk, hr=8 * nv)

    mean = _blur_block(x_ref, halo_refs, band_ref, j, nb,
                       r=r, h=h, w=w, blk=blk, nv=nv)
    # src > mean - c  ->  255 : 0, compare-free (sign-bit select)
    thr = mean - c_ref[0]
    src = x_ref[0].astype(jnp.int32)
    out_ref[0] = (((thr - src) >> 31) & 255).astype(jnp.uint8)


def _halo_specs_multi(blk: int, h: int, w: int, nv: int):
    """nv 8-row neighbor views per side, ordered top (furthest first) then
    bottom; index maps clamp at the frame edges (kernels mask the clamped
    fetch to zero)."""
    b8 = blk // 8
    n8 = h // 8
    specs = []
    for k in range(nv, 0, -1):
        specs.append(pl.BlockSpec(
            (1, 8, w), lambda i, j, k=k: (i, jnp.maximum(j * b8 - k, 0), 0),
            memory_space=pltpu.VMEM))
    for k in range(1, nv + 1):
        specs.append(pl.BlockSpec(
            (1, 8, w),
            lambda i, j, k=k: (i, jnp.minimum((j + 1) * b8 + k - 1, n8 - 1), 0),
            memory_space=pltpu.VMEM))
    return specs


def _n_halo_views(r: int) -> int:
    return max(1, -(-r // 8))  # 8*ceil(r/8) halo rows per side


def _pad_blk(h: int, w: int, nv: int, budget: int = 256 * 1024):
    """(blk, padded_h) minimizing streamed rows: padded x (blk+16nv)/blk.

    Heights whose largest divisor-block is small (e.g. 816 -> blk=16 with
    nv=2 means 3x read amplification) instead PAD the bottom with zero rows
    to a cheap block size (816 -> 896 runs blk=128 at 1.37x).  Zero pad
    rows are exact for every stencil here: blur/adaptive count math uses
    the REAL h and zero rows add nothing to window sums; sobel masks to the
    real interior; filter3's zero pad == ``gs_get`` OOB-reads-0; morph
    masks out-of-frame rows to the op-neutral value in-kernel.  ``budget``
    caps blk*w for kernels with tighter VMEM working sets (FAST)."""
    best = None
    for blk in (256, 128, 64, 32, 16, 8):
        if blk * w > budget:
            continue
        hp = -(-h // blk) * blk
        # streamed rows: input block + halo views per grid step, plus the
        # padded output write
        cost = hp * ((blk + 16 * nv) / blk + 1)
        if best is None or cost < best[2]:
            best = (blk, hp, cost)
    return best[:2] if best else (0, h)


def _pad_rows(imgs: jnp.ndarray, hp: int) -> jnp.ndarray:
    h = imgs.shape[1]
    return imgs if hp == h else jnp.pad(imgs, ((0, 0), (0, hp - h), (0, 0)))


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def blur_pallas(imgs: jnp.ndarray, radius: int,
                interpret: bool = False) -> jnp.ndarray:
    """(N, H, W) uint8 -> clipped-window box mean, bit-exact ``gs_blur``
    (grayskull.h:268-283) — the fused kernel's blur stage without the
    histogram contraction (the standalone XLA blur pays ~4 full-frame f32
    intermediates; this streams uint8 row blocks once)."""
    n, h, w = imgs.shape
    r = int(radius)
    nv = _n_halo_views(r)
    blk, hp = _pad_blk(h, w, nv)
    imgs = _pad_rows(imgs, hp)
    nb = hp // blk
    halo_specs = _halo_specs_multi(blk, hp, w, nv)
    out = pl.pallas_call(
        functools.partial(_blur_only_kernel, r=r, h=h, w=w, blk=blk, nv=nv),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            *halo_specs,
        ],
        out_specs=pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, w), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((blk, blk + 16 * nv), jnp.bfloat16)],
        interpret=interpret,
    )(imgs, *([imgs] * (2 * nv)))
    return out[:, :h]


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def adaptive_pallas(imgs: jnp.ndarray, radius: int, c,
                    interpret: bool = False) -> jnp.ndarray:
    """(N, H, W) uint8 -> ``gs_adaptive_threshold`` (grayskull.h:230-247):
    ``src > clipped_mean - c ? 255 : 0`` with the mean from the same exact
    blur stage; ``c`` is a runtime int32 scalar (SMEM)."""
    n, h, w = imgs.shape
    r = int(radius)
    nv = _n_halo_views(r)
    blk, hp = _pad_blk(h, w, nv)
    imgs = _pad_rows(imgs, hp)
    nb = hp // blk
    halo_specs = _halo_specs_multi(blk, hp, w, nv)
    cv = jnp.asarray(c, jnp.int32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_adaptive_kernel, r=r, h=h, w=w, blk=blk, nv=nv),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            *halo_specs,
        ],
        out_specs=pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, w), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((blk, blk + 16 * nv), jnp.bfloat16)],
        interpret=interpret,
    )(cv, imgs, *([imgs] * (2 * nv)))
    return out[:, :h]


def _sobel_kernel(x_ref, top_ref, bot_ref, out_ref, *, h: int, w: int, blk: int):
    """Sobel magnitude on raw uint8 — the fused kernel2's separable scheme
    ([1,2,1] column pass + lane diff, [1,2,1] lane pass + sublane diff; 4
    lane relayouts vs the direct 3x3's 6) without the binary factorization:
    gx/gy reach +-1020 so the arithmetic stays int32 end to end."""
    j = pl.program_id(1)
    nb = pl.num_programs(1)
    top = jnp.where(j > 0, top_ref[0, 7:8, :].astype(jnp.int32), 0)
    bot = jnp.where(j < nb - 1, bot_ref[0, 0:1, :].astype(jnp.int32), 0)
    rows = jnp.concatenate([top, x_ref[0].astype(jnp.int32), bot], axis=0)
    pb = jnp.pad(rows, ((0, 0), (1, 1)))  # (blk+2, w+2)
    sv = pb[0:blk, :] + (pb[1 : 1 + blk, :] << 1) + pb[2 : 2 + blk, :]
    gx = sv[:, 2 : 2 + w] - sv[:, 0:w]
    tv = pb[:, 0:w] + (pb[:, 1 : 1 + w] << 1) + pb[:, 2 : 2 + w]
    gy = tv[2 : 2 + blk, :] - tv[0:blk, :]
    mag = jnp.minimum((jnp.abs(gx) + jnp.abs(gy)) >> 1, 255)
    y0 = j * blk
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + y0
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    interior = ((ii >= 1) & (ii < h - 1)) & ((jj >= 1) & (jj < w - 1))
    out_ref[0] = jnp.where(interior, mag, 0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sobel_pallas(imgs: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(N, H, W) uint8 -> interior Sobel magnitude ``(|gx|+|gy|)/2`` clipped
    to 255, zero border — bit-exact ``gs_sobel`` (grayskull.h:306-320)."""
    n, h, w = imgs.shape
    blk, hp = _pad_blk(h, w, 1)
    imgs = _pad_rows(imgs, hp)
    nb = hp // blk
    top_spec, bot_spec = _halo_specs(blk, hp, w)
    out = pl.pallas_call(
        functools.partial(_sobel_kernel, h=h, w=w, blk=blk),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            top_spec,
            bot_spec,
        ],
        out_specs=pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, w), jnp.uint8),
        interpret=interpret,
    )(imgs, imgs, imgs)
    return out[:, :h]


def _morph_kernel(x_ref, top_ref, bot_ref, out_ref, *, op: str, h: int,
                  w: int, blk: int):
    """3x3 clipped-window min/max — ``gs_erode``/``gs_dilate``
    (grayskull.h:286-304).  Separable: sublane pass then lane pass, with the
    op-neutral value (255 for min, 0 for max) standing in for out-of-frame
    neighbors, exactly like the XLA ``reduce_window`` padding.  Out-of-frame
    is judged by ABSOLUTE row vs the real ``h`` (the frame may be padded to
    a cheaper block size; pad rows are zeros, not neutral)."""
    j = pl.program_id(1)
    neutral = 255 if op == "erode" else 0
    f = jnp.minimum if op == "erode" else jnp.maximum
    rows = jnp.concatenate(
        [top_ref[0, 7:8, :].astype(jnp.int32), x_ref[0].astype(jnp.int32),
         bot_ref[0, 0:1, :].astype(jnp.int32)], axis=0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk + 2, 1), 0) + j * blk - 1
    rows = jnp.where((ii >= 0) & (ii < h), rows, neutral)
    sv = f(f(rows[0:blk, :], rows[1 : 1 + blk, :]), rows[2 : 2 + blk, :])
    pb = jnp.pad(sv, ((0, 0), (1, 1)), constant_values=neutral)
    out = f(f(pb[:, 0:w], pb[:, 1 : 1 + w]), pb[:, 2 : 2 + w])
    out_ref[0] = out.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("op", "interpret"))
def morph_pallas(imgs: jnp.ndarray, op: str,
                 interpret: bool = False) -> jnp.ndarray:
    """(N, H, W) uint8 -> 3x3 clipped erode/dilate, bit-exact vs the XLA
    ``reduce_window`` path (which costs a full-frame int32 round trip)."""
    n, h, w = imgs.shape
    blk, hp = _pad_blk(h, w, 1)
    imgs = _pad_rows(imgs, hp)
    nb = hp // blk
    top_spec, bot_spec = _halo_specs(blk, hp, w)
    out = pl.pallas_call(
        functools.partial(_morph_kernel, op=op, h=h, w=w, blk=blk),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            top_spec,
            bot_spec,
        ],
        out_specs=pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, w), jnp.uint8),
        interpret=interpret,
    )(imgs, imgs, imgs)
    return out[:, :h]


def _rank1_taps(taps):
    """Integer rank-1 factorization ``taps[j][i] == u[j] * v[i]`` if one
    exists (box and gaussian presets are separable), else None."""
    from fractions import Fraction

    k = [[int(x) for x in row] for row in taps]
    pivot = next((j for j in range(3) if any(k[j])), None)
    if pivot is None:
        return None
    import math

    g = math.gcd(math.gcd(abs(k[pivot][0]), abs(k[pivot][1])), abs(k[pivot][2]))
    v = [x // g for x in k[pivot]]
    i0 = next(i for i in range(3) if v[i])
    u = []
    for j in range(3):
        c = Fraction(k[j][i0], v[i0])
        if c.denominator != 1 or any(k[j][i] != c * v[i] for i in range(3)):
            return None
        u.append(int(c))
    return tuple(u), tuple(v)


def _filter3_kernel(x_ref, top_ref, bot_ref, out_ref, *, taps, norm: int,
                    w: int, blk: int):
    """Generic 3x3 correlation with zero-padded borders — ``gs_filter``
    (grayskull.h:255-266).  Taps are static Python ints (the reference's
    int8-reinterpreted kernel image), so zero taps compile away and the
    weighted shifted adds stay int32 end to end.  C's ``int / unsigned``
    promotion quirk: a negative sum with norm > 1 wraps to >= 2^32 - 291k
    whose quotient always clamps to 255 (for any norm < ~16M), so the wrap
    reduces to a sign test — no u32 arithmetic needed in-kernel."""
    j = pl.program_id(1)
    nb = pl.num_programs(1)
    top = jnp.where(j > 0, top_ref[0, 7:8, :].astype(jnp.int32), 0)
    bot = jnp.where(j < nb - 1, bot_ref[0, 0:1, :].astype(jnp.int32), 0)
    rows = jnp.concatenate([top, x_ref[0].astype(jnp.int32), bot], axis=0)
    uv = _rank1_taps(taps)
    if uv is not None:
        # separable rank-1 kernel (box/gaussian): sublane pass then lane
        # pass — 2 lane relayouts instead of the direct form's up to 6
        u, v = uv
        sv = None
        for dj in range(3):
            if u[dj] == 0:
                continue
            t = rows[dj : dj + blk, :]
            if u[dj] != 1:
                t = t * u[dj]
            sv = t if sv is None else sv + t
        pb = jnp.pad(sv, ((0, 0), (1, 1)))
        acc = None
        for di in range(3):
            if v[di] == 0:
                continue
            t = pb[:, di : di + w]
            if v[di] != 1:
                t = t * v[di]
            acc = t if acc is None else acc + t
    else:
        pb = jnp.pad(rows, ((0, 0), (1, 1)))  # zero pad == gs_get OOB-read-0
        acc = None
        for dj in range(3):
            for di in range(3):
                wgt = taps[dj][di]
                if wgt == 0:
                    continue
                t = pb[dj : dj + blk, di : di + w]
                if wgt != 1:
                    t = t * wgt
                acc = t if acc is None else acc + t
    if acc is None:
        acc = jnp.zeros((blk, w), jnp.int32)
    if norm == 1:
        out = jnp.clip(acc, 0, 255)
    else:
        pos = jnp.minimum(_fixup_div(jnp.maximum(acc, 0), jnp.int32(norm)), 255)
        out = jnp.where(acc < 0, 255, pos)
    out_ref[0] = out.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("taps", "norm", "interpret"))
def filter3_pallas(imgs: jnp.ndarray, taps, norm: int,
                   interpret: bool = False) -> jnp.ndarray:
    """(N, H, W) uint8 + static 3x3 int taps -> ``gs_filter``, bit-exact vs
    the XLA path in ``ops.pixel.filter2d`` (which pays ~4 full-frame int32
    intermediates; this streams uint8 blocks once).  Covers the sharpen /
    emboss / box / gaussian presets (grayskull.h:249-253).  Zero pad rows
    need no in-kernel mask: ``gs_get`` reads 0 out of bounds."""
    n, h, w = imgs.shape
    blk, hp = _pad_blk(h, w, 1)
    imgs = _pad_rows(imgs, hp)
    nb = hp // blk
    top_spec, bot_spec = _halo_specs(blk, hp, w)
    out = pl.pallas_call(
        functools.partial(_filter3_kernel, taps=taps, norm=int(norm), w=w,
                          blk=blk),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            top_spec,
            bot_spec,
        ],
        out_specs=pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, w), jnp.uint8),
        interpret=interpret,
    )(imgs, imgs, imgs)
    return out[:, :h]


def _threshold_sobel_kernel(t_ref, x_ref, top_ref, bot_ref, *out_refs,
                            h: int, w: int, blk: int, want_binary: bool):
    if want_binary:
        bin_ref, edge_ref = out_refs
    else:
        (edge_ref,) = out_refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(1)
    t = t_ref[i]
    # 1-row halos from the neighbor blocks' 8-row views (edge fetches are
    # clamped by the index map and masked to zero here; sobel's interior
    # mask ignores them anyway)
    top = jnp.where(j > 0, top_ref[0, 7:8, :].astype(jnp.int32), 0)
    bot = jnp.where(j < nb - 1, bot_ref[0, 0:1, :].astype(jnp.int32), 0)
    rows = jnp.concatenate([top, x_ref[0].astype(jnp.int32), bot], axis=0)
    # compare-free binarize: (t - p) >> 31 is all-ones iff p > t; work on the
    # 0/1 value and scale by 255 via (b<<8)-b at the edges (sobel on binary
    # input factors the 255 out exactly: |gx|+|gy| <= 8 before scaling)
    b1 = ((t - rows) >> 31) & 1
    if want_binary:
        bin_ref[0] = ((b1[1 : 1 + blk] << 8) - b1[1 : 1 + blk]).astype(jnp.uint8)

    # separable sobel: column pass [1,2,1] then lane diff for gx; lane pass
    # [1,2,1] then sublane diff for gy — 4 lane relayouts instead of the
    # direct 3x3's 6 (lane-shifted slices are the dominant cost; measured
    # 13% faster end-to-end, bit-exact)
    pb = jnp.pad(b1, ((0, 0), (1, 1)))
    Sv = pb[0:blk, :] + (pb[1 : 1 + blk, :] << 1) + pb[2 : 2 + blk, :]  # (blk, w+2)
    gx = Sv[:, 2 : 2 + w] - Sv[:, 0:w]
    Tv = pb[:, 0:w] + (pb[:, 1 : 1 + w] << 1) + pb[:, 2 : 2 + w]  # (blk+2, w)
    gy = Tv[2 : 2 + blk, :] - Tv[0:blk, :]
    s = jnp.abs(gx) + jnp.abs(gy)
    mag = jnp.minimum(((s << 8) - s) >> 1, 255)
    y0 = j * blk
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + y0
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    interior = ((ii >= 1) & (ii < h - 1)) & ((jj >= 1) & (jj < w - 1))
    edge_ref[0] = jnp.where(interior, mag, 0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("want_binary", "interpret"))
def fused_threshold_sobel(blurred: jnp.ndarray, thresholds: jnp.ndarray,
                          want_binary: bool = True, interpret: bool = False):
    """(N, H, W) uint8 + (N,) thresholds -> (binary, edges) in one HBM pass.

    ``want_binary=False`` skips the binary output entirely (it is only
    ``edges``' input), cutting the kernel to 2 B/pixel for consumers that
    want edges alone; returns ``(None, edges)``.
    """
    n, h, w = blurred.shape
    blk = _pick_block(h, w)
    t = thresholds.astype(jnp.int32)
    nb = h // blk
    top_spec, bot_spec = _halo_specs(blk, h, w)
    out_spec = pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, h, w), jnp.uint8)
    nouts = 2 if want_binary else 1
    outs = pl.pallas_call(
        functools.partial(_threshold_sobel_kernel, h=h, w=w, blk=blk,
                          want_binary=want_binary),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (N,) thresholds
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            top_spec,
            bot_spec,
        ],
        out_specs=[out_spec] * nouts,
        out_shape=[out_shape] * nouts,
        interpret=interpret,
    )(t, blurred, blurred, blurred)
    if want_binary:
        return outs[0], outs[1]
    return None, outs[0]


def _threshold_sobel_window_kernel(row0_ref, t_ref, x_ref, top_ref, bot_ref,
                                   *out_refs, h_total: int, w: int, blk: int,
                                   want_binary: bool):
    """`_threshold_sobel_kernel` over a halo-extended shard: the interior
    mask is taken at GLOBAL row coordinates (traced SMEM offset) so the
    zero border lands on the global frame edges, not the shard seams."""
    if want_binary:
        bin_ref, edge_ref = out_refs
    else:
        (edge_ref,) = out_refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(1)
    t = t_ref[i]
    top = jnp.where(j > 0, top_ref[0, 7:8, :].astype(jnp.int32), 0)
    bot = jnp.where(j < nb - 1, bot_ref[0, 0:1, :].astype(jnp.int32), 0)
    rows = jnp.concatenate([top, x_ref[0].astype(jnp.int32), bot], axis=0)
    b1 = ((t - rows) >> 31) & 1
    if want_binary:
        bin_ref[0] = ((b1[1 : 1 + blk] << 8) - b1[1 : 1 + blk]).astype(jnp.uint8)

    pb = jnp.pad(b1, ((0, 0), (1, 1)))
    Sv = pb[0:blk, :] + (pb[1 : 1 + blk, :] << 1) + pb[2 : 2 + blk, :]
    gx = Sv[:, 2 : 2 + w] - Sv[:, 0:w]
    Tv = pb[:, 0:w] + (pb[:, 1 : 1 + w] << 1) + pb[:, 2 : 2 + w]
    gy = Tv[2 : 2 + blk, :] - Tv[0:blk, :]
    s = jnp.abs(gx) + jnp.abs(gy)
    mag = jnp.minimum(((s << 8) - s) >> 1, 255)
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + j * blk + row0_ref[0]
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    interior = ((ii >= 1) & (ii < h_total - 1)) & ((jj >= 1) & (jj < w - 1))
    edge_ref[0] = jnp.where(interior, mag, 0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("h_total", "want_binary",
                                             "interpret"))
def fused_threshold_sobel_window(blurred: jnp.ndarray, thresholds: jnp.ndarray,
                                 row0, *, h_total: int,
                                 want_binary: bool = True,
                                 interpret: bool = False):
    """Shard-local fused threshold+sobel for spatially-sharded frames.

    ``blurred``: (N, h_loc + 2, W) uint8 — one shard's blurred rows plus one
    exchanged halo row each side.  ``row0``: traced int32 scalar, the GLOBAL
    row index of row 0 (``idx*h_loc - 1``).  Returns (binary, edges) at the
    extended geometry; callers slice ``[1:1+h_loc]``."""
    n, h_ext, w = blurred.shape
    blk, hp = _pad_blk(h_ext, w, 1)
    blurred = _pad_rows(blurred, hp)
    t = thresholds.astype(jnp.int32)
    nb = hp // blk
    top_spec, bot_spec = _halo_specs(blk, hp, w)
    out_spec = pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, hp, w), jnp.uint8)
    nouts = 2 if want_binary else 1
    row0v = jnp.asarray(row0, jnp.int32).reshape(1)
    outs = pl.pallas_call(
        functools.partial(_threshold_sobel_window_kernel, h_total=int(h_total),
                          w=w, blk=blk, want_binary=want_binary),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (N,) thresholds
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            top_spec,
            bot_spec,
        ],
        out_specs=[out_spec] * nouts,
        out_shape=[out_shape] * nouts,
        interpret=interpret,
    )(row0v, t, blurred, blurred, blurred)
    if want_binary:
        return outs[0][:, :h_ext], outs[1][:, :h_ext]
    return None, outs[0][:, :h_ext]


def preproc_available(h: int, w: int, radius: int = 2) -> bool:
    """Whether the grid-blocked fused kernels handle this frame geometry.
    Unlike the standalone stencils these cannot row-pad: the histogram
    contraction counts every resident row, so pad zeros would pollute
    bin 0 — h must divide into blocks exactly (``_pick_block``)."""
    return (
        _pick_block(h, w) >= 8
        and w >= 8
        and h * w <= 16 * 1024 * 1024
        and 1 <= radius <= _MAX_RADIUS
        and w % 128 == 0
        and w >= 128
    )


def window_available(h_loc: int, w: int, radius: int = 2) -> bool:
    """Geometry gate for the shard-window kernel pair
    (``fused_blur_hist_window`` / ``fused_threshold_sobel_window``): the
    extended shard heights must pad to a usable block and the histogram
    contraction keeps the fused pair's 128-lane width requirement.  The
    8-row halo views bound the radius at 6 (also the exact-magic range)."""
    return (
        1 <= radius <= _MAX_RADIUS
        and w % 128 == 0
        and 128 <= w
        and _pad_blk(h_loc + 2 * radius, w, 1)[0] >= 8
        and _pad_blk(h_loc + 2, w, 1)[0] >= 8
        and h_loc * w <= 16 * 1024 * 1024
    )


_MAX_RADIUS_STENCIL = 32  # 4 halo views/side; counts stay f32-exact (< 2^24)


def stencil_available(h: int, w: int, radius: int = 1) -> bool:
    """Geometry gate for the standalone blur/adaptive/sobel/morph/filter3
    kernels.  Unlike the fused pair these need no 128-divisible width (every
    block spans the full array width, a legal Mosaic BlockSpec — verified
    bit-exact at 816x612 on v5e) and no block-divisible height: awkward
    heights are zero-padded to a cheap block size (``_pad_blk``), exact
    because each kernel judges out-of-frame by absolute row vs the real h.
    Radii past the exact magic-division range run the f32-fixup division
    (``_fixup_div``)."""
    return (
        _pad_blk(h, w, _n_halo_views(radius))[0] >= 8
        and w >= 8
        and 1 <= radius <= _MAX_RADIUS_STENCIL
        and h * w <= 16 * 1024 * 1024
    )
