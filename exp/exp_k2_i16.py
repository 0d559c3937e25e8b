"""Experiment: int16 working values in the fused threshold+sobel kernel.

The shipped `_threshold_sobel_kernel` works in int32; its cost model says
the 3 lane-shifted slices (Tv offsets 1,2 + gx offset 2) dominate.  Lane
relayouts move bytes, so halving the element width should halve their
cost.  Mosaic's i16 support is narrow — add/sub/shift/compare only (mul,
abs, min/max abort or fail to legalize) — so the i16 variant:

  * binarizes with shift+negate (no i16 bitwise-and),
  * runs the [1,2,1] passes and diffs in i16,
  * widens gx/gy to i32 ONLY for the abs/min tail (after the relayouts).

Exactness gate vs the shipped kernel on tiled-lena + random frames.

RESULT (2026-08-18, TPU v5e): DEAD — `(t - rows) >> 15` emits arith.shrsi
on vector<8x128x2xi16>, which Mosaic fails to legalize (i16 shifts by a
VECTOR shift amount; the same failure killed exp_hist_build's v1/v2).
i16 stays usable only for shifted-slice ADDS; binarization needs i32.
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

from grayskull_tpu.kernels.preproc import _halo_specs, _pick_block


def _kernel_i16(t_ref, x_ref, top_ref, bot_ref, bin_ref, edge_ref,
                *, h, w, blk):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(1)
    t = t_ref[i].astype(jnp.int16)
    top = jnp.where(j > 0, top_ref[0, 7:8, :].astype(jnp.int16), 0)
    bot = jnp.where(j < nb - 1, bot_ref[0, 0:1, :].astype(jnp.int16), 0)
    rows = jnp.concatenate([top, x_ref[0].astype(jnp.int16), bot], axis=0)
    # (t - p) >> 15 is -1 iff p > t; negate for the 0/1 value (no i16 and)
    b1 = jnp.zeros_like(rows) - ((t - rows) >> 15)
    bin_ref[0] = ((b1[1 : 1 + blk] << 8) - b1[1 : 1 + blk]).astype(jnp.uint8)

    pb = jnp.pad(b1, ((0, 0), (1, 1)))
    Sv = pb[0:blk, :] + (pb[1 : 1 + blk, :] << 1) + pb[2 : 2 + blk, :]
    gx = (Sv[:, 2 : 2 + w] - Sv[:, 0:w]).astype(jnp.int32)  # widen AFTER the
    Tv = pb[:, 0:w] + (pb[:, 1 : 1 + w] << 1) + pb[:, 2 : 2 + w]
    gy = (Tv[2 : 2 + blk, :] - Tv[0:blk, :]).astype(jnp.int32)  # lane shifts
    s = jnp.abs(gx) + jnp.abs(gy)
    mag = jnp.minimum(((s << 8) - s) >> 1, 255)
    y0 = j * blk
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + y0
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    interior = ((ii >= 1) & (ii < h - 1)) & ((jj >= 1) & (jj < w - 1))
    edge_ref[0] = jnp.where(interior, mag, 0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def threshold_sobel_i16(blurred, thresholds, interpret=False):
    n, h, w = blurred.shape
    blk = _pick_block(h, w)
    t = thresholds.astype(jnp.int32)
    top_spec, bot_spec = _halo_specs(blk, h, w)
    out_spec = pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, h, w), jnp.uint8)
    return pl.pallas_call(
        functools.partial(_kernel_i16, h=h, w=w, blk=blk),
        grid=(n, h // blk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            top_spec,
            bot_spec,
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[out_shape, out_shape],
        interpret=interpret,
    )(t, blurred, blurred, blurred)


def check_exact(interpret):
    import grayskull_tpu as gs
    from grayskull_tpu.kernels.preproc import fused_threshold_sobel

    rng = np.random.default_rng(11)
    lena = np.asarray(gs.io.read_pgm("/root/reference/testdata/lena.pgm"))
    big = np.tile(lena, (4, 8))[:448, :1024]
    frames = jnp.asarray(np.stack([big, rng.integers(0, 256, big.shape,
                                                     np.uint8)]))
    ts = jnp.asarray([113, 40], jnp.int32)
    if interpret:
        # shipped kernel has no interpret knob; build the reference with the
        # public XLA ops instead
        want_bin = np.stack([np.asarray(gs.threshold(f, int(t)))
                             for f, t in zip(frames, ts)])
        want_edge = np.asarray(gs.sobel(jnp.asarray(want_bin)))
    else:
        wb, we = fused_threshold_sobel(frames, ts)
        want_bin, want_edge = np.asarray(wb), np.asarray(we)
    got_bin, got_edge = threshold_sobel_i16(frames, ts, interpret)
    np.testing.assert_array_equal(np.asarray(got_bin), want_bin)
    np.testing.assert_array_equal(np.asarray(got_edge), want_edge)
    print("  i16 variant: exact", flush=True)


def bench():
    from grayskull_tpu.kernels.preproc import fused_threshold_sobel
    from grayskull_tpu.profiling import timeit

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (256, 1024, 1024), np.uint8))
    ts = jnp.asarray(rng.integers(40, 200, (256,)), jnp.int32)
    for name, fn in (("shipped-i32", lambda: fused_threshold_sobel(x, ts)),
                     ("i16", lambda: threshold_sobel_i16(x, ts))):
        try:
            ms = timeit(fn, iters=20) * 1e3
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        print(f"  {name}: {ms:.2f} ms  ({256e3 / ms:.0f} fps)", flush=True)


if __name__ == "__main__":
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend: {jax.default_backend()}", flush=True)
    t0 = time.time()
    check_exact(interpret=not on_tpu)
    print(f"exactness: {time.time() - t0:.1f}s", flush=True)
    if on_tpu:
        bench()
