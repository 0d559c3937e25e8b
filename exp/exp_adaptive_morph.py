"""Experiment: fuse BASELINE config #2 (adaptive -> dilate -> erode).

The receipt chain `erode(dilate(adaptive_threshold(x, 15, 5)))` runs as
three Pallas dispatches today (~6 B/px of HBM + 3 tunnel round trips).
One overlapped-tile kernel computes the adaptive threshold on blk+4 rows,
dilate (3x3 max, frame-clipped) on blk+2, erode (3x3 min) on blk — all in
VMEM — and writes the final binary once (~2 B/px incl. halo views).

Two extra tricks over the standalone stencils:

  * the H axis is PADDED (bottom zero rows) to the cheapest block size:
    816 rows force blk=16 on the divisibility rule (48 halo rows per 16-row
    block = 4x read amplification); padding to 1024 rows runs blk=256 at
    1.19x.  Zero pad rows are exact: clipped-window count math uses the
    REAL h, and zero rows contribute nothing to window sums.
  * morphology is separable (max/min are associative) with op-neutral
    padding (0 for dilate, 1 for erode in the 0/1 domain) exactly like
    `morph_pallas`.

Exactness gate vs the public XLA ops on receipt.pgm + random frames.

RESULT (2026-08-18, TPU v5e, 256x816x612 batch): exact; fused 15.83 ms vs
the 3-kernel chain's 20.51 ms = 1.30x (12.5k -> 16.2k fps).  Below the
1.5x promotion bar set in TPU_QUEUE — the chain's stencil kernels already
stream well, so saving two HBM round trips buys less than modeled.
Parked: promote only if the receipt pipeline becomes a headline metric.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grayskull_tpu.kernels.preproc import (
    _fixup_div,
    _gather_rows,
    _halo_specs_multi,
    _magic_vec,
    _MAGIC_SHIFT,
    _MAX_RADIUS,
)


def _fill_band_off(band_ref, r: int, rows_out: int, hr: int, off: int):
    """band[out, in] = [in in out+hr-r+off .. out+hr+r+off] — the blur band
    with the output slab shifted ``off`` rows relative to the block."""
    o = jax.lax.broadcasted_iota(jnp.int32, band_ref.shape, 0)
    i_in = jax.lax.broadcasted_iota(jnp.int32, band_ref.shape, 1)
    band_ref[:] = ((i_in >= o + hr - r + off)
                   & (i_in <= o + hr + r + off)).astype(jnp.bfloat16)


def _adaptive_slab(rows, band, j, *, r, h, w, blk, nv, c):
    """Adaptive threshold 0/1 on rows y0-2 .. y0+blk+2 (slab of blk+4)."""
    xb = rows.astype(jnp.bfloat16)
    cs_col = jax.lax.dot_general(
        band, xb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (blk+4, w) exact vertical sums
    csi = cs_col.astype(jnp.int32)
    px = jnp.pad(csi, ((0, 0), (r, r)))
    cs_n = px[:, 0:w]
    for k in range(1, 2 * r + 1):
        cs_n = cs_n + px[:, k : k + w]
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk + 4, 1), 0) + j * blk - 2
    jjv = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    cyv = jnp.minimum(ii + r, h - 1) - jnp.maximum(ii - r, 0) + 1
    cxv = jnp.minimum(jjv + r, w - 1) - jnp.maximum(jjv - r, 0) + 1
    if r <= _MAX_RADIUS:
        cs = cs_n.astype(jnp.uint32)
        mean = ((((cs * _magic_vec(cyv, r)) >> _MAGIC_SHIFT)
                 * _magic_vec(cxv, r)) >> _MAGIC_SHIFT).astype(jnp.int32)
    else:
        mean = _fixup_div(_fixup_div(cs_n, cyv), cxv)
    src = rows[8 * nv - 2 : 8 * nv + blk + 2]
    # src > mean - c -> 1 (sign-bit select)
    return ((mean - c - src) >> 31) & 1, ii


def _adaptive_morph_kernel(c_ref, x_ref, *rest, r: int, h: int, w: int,
                           blk: int, nv: int):
    halo_refs, (out_ref, band_ref) = rest[: 2 * nv], rest[2 * nv :]
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        _fill_band_off(band_ref, r, blk + 4, hr=8 * nv, off=-2)

    rows = _gather_rows(x_ref, halo_refs, j, nb, nv=nv, blk=blk)
    a01, ii = _adaptive_slab(rows, band_ref[:], j, r=r, h=h, w=w, blk=blk,
                             nv=nv, c=c_ref[0])

    # dilate: 3x3 max, out-of-frame rows/cols neutral 0
    a01 = jnp.where((ii >= 0) & (ii < h), a01, 0)
    v = jnp.maximum(jnp.maximum(a01[0 : blk + 2], a01[1 : blk + 3]),
                    a01[2 : blk + 4])
    pd = jnp.pad(v, ((0, 0), (1, 1)))
    d01 = jnp.maximum(jnp.maximum(pd[:, 0:w], pd[:, 1 : 1 + w]),
                      pd[:, 2 : 2 + w])
    # erode: 3x3 min, out-of-frame rows/cols neutral 1
    ii2 = jax.lax.broadcasted_iota(jnp.int32, (blk + 2, 1), 0) + j * blk - 1
    d01 = jnp.where((ii2 >= 0) & (ii2 < h), d01, 1)
    v2 = jnp.minimum(jnp.minimum(d01[0:blk], d01[1 : blk + 1]),
                     d01[2 : blk + 2])
    pe = jnp.pad(v2, ((0, 0), (1, 1)), constant_values=1)
    e01 = jnp.minimum(jnp.minimum(pe[:, 0:w], pe[:, 1 : 1 + w]),
                      pe[:, 2 : 2 + w])
    out_ref[0] = ((e01 << 8) - e01).astype(jnp.uint8)


def _pick_blk_padded(h: int, w: int, nv: int):
    """(blk, padded_h) minimizing read volume: padded rows x (blk+16nv)/blk."""
    best = None
    for blk in (256, 128, 64, 32, 16, 8):
        # Mosaic keeps ~27 (blk, w)-f32 slabs live through the fused chain:
        # blk=256 at w=612 measured a 17.07M scoped stack (>16M limit), so
        # cap blk*w at 128k (~8.8M live) rather than 256k.
        if blk * w > 128 * 1024:
            continue
        hp = -(-h // blk) * blk
        cost = hp * (blk + 16 * nv) / blk
        if best is None or cost < best[2]:
            best = (blk, hp, cost)
    if best is None:
        raise ValueError(
            f"no strip height fits VMEM for w={w} (blk*w capped at 128k); "
            "use the XLA path for frames this wide")
    return best[:2]


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def adaptive_morph_pallas(imgs, radius=15, c=5, interpret=False):
    n, h, w = imgs.shape
    r = int(radius)
    nv = max(1, -(-(r + 2) // 8))  # r rows for adaptive + 2 for the morphs
    blk, hp = _pick_blk_padded(h, w, nv)
    if hp != h:
        imgs = jnp.pad(imgs, ((0, 0), (0, hp - h), (0, 0)))
    nb = hp // blk
    halo_specs = _halo_specs_multi(blk, hp, w, nv)
    cv = jnp.asarray(c, jnp.int32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_adaptive_morph_kernel, r=r, h=h, w=w, blk=blk,
                          nv=nv),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            *halo_specs,
        ],
        out_specs=pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, w), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((blk + 4, blk + 16 * nv), jnp.bfloat16)],
        interpret=interpret,
    )(cv, imgs, *([imgs] * (2 * nv)))
    return out[:, :h]


def check_exact(interpret):
    import grayskull_tpu as gs

    rng = np.random.default_rng(3)
    rec = np.asarray(gs.io.read_pgm("/root/reference/testdata/receipt.pgm"))
    cases = [
        (np.stack([rec, rng.integers(0, 256, rec.shape, np.uint8)]), 15, 5),
        (rng.integers(0, 256, (2, 64, 640), np.uint8), 15, 5),  # h % blk == 0
        (rng.integers(0, 256, (1, 40, 256), np.uint8), 3, 2),   # small r magic
        (rng.integers(0, 256, (1, 24, 128), np.uint8), 15, 5),  # h < window
    ]
    for frames, r, c in cases:
        x = jnp.asarray(frames)
        want = np.asarray(gs.erode(gs.dilate(gs.adaptive_threshold(x, r, c))))
        got = np.asarray(adaptive_morph_pallas(x, r, c, interpret=interpret))
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"{frames.shape} r={r}")
        print(f"  {frames.shape} r={r}: exact", flush=True)


def bench():
    import grayskull_tpu as gs
    from grayskull_tpu.profiling import timeit

    rng = np.random.default_rng(0)
    rec = np.asarray(gs.io.read_pgm("/root/reference/testdata/receipt.pgm"))
    x = jnp.asarray(np.broadcast_to(rec, (256, *rec.shape)).copy())

    def chain(v):
        return gs.erode(gs.dilate(gs.adaptive_threshold(v, 15, 5)))

    for name, fn in (("3-kernel chain", lambda: chain(x)),
                     ("fused", lambda: adaptive_morph_pallas(x, 15, 5))):
        ms = timeit(fn, iters=20) * 1e3
        print(f"  {name}: {ms:.2f} ms  ({256e3 / ms:.0f} fps)", flush=True)


if __name__ == "__main__":
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend: {jax.default_backend()}", flush=True)
    t0 = time.time()
    check_exact(interpret=not on_tpu)
    print(f"exactness: {time.time() - t0:.1f}s", flush=True)
    if on_tpu:
        bench()
