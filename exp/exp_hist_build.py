"""Experiment: one-hot BUILD diet for the fused blur+histogram kernel.

The shipped `_blur_hist_kernel` (kernels/preproc.py) builds its nibble
one-hots by concatenating the int32 hi/lo planes 16x each per 8-row group:
2 sides x 16 copies x 4 B = ~128 B/px of VMEM copy traffic against 1 B/px
of data.  The int8 MXU dot only bought ~5% over bf16, suggesting the build
(not the MACs) co-dominates.  Variants measured here:

  v0  shipped: concat([hi_i32]*16), concat([lo_i32]*16), 2 compares
  v1  single int16 replication of the BLURRED value (2 B copies, 4x fewer
      bytes), then hi/lo derived on the replicated (128, w) via i16
      shifts/subs (both Mosaic-legal; i16 multiply/abs are NOT)
  v2  broadcast-reshape build: broadcast_to((1,8,w)->(16,8,w)) then a
      leading-dims-collapse reshape to (128, w) — no explicit copies if
      Mosaic lowers it as a sublane-tile broadcast
  ablations: nodot (build one-hots, skip the MXU dot), nohist (blur only)
      to decompose kernel1 = blur + build + dot.

Exactness gate: every variant must reproduce ops.histogram(blur(x)) on
tiled-lena + random frames (interpret mode on CPU, compiled on TPU).
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
    _blur_block,
    _fill_band,
    _halo_specs,
    _pick_block,
)


def _build_v0(blurred, g, klass):
    hi_all = blurred >> 4
    lo_all = blurred & 15
    hi = jnp.concatenate([hi_all[g * 8 : (g + 1) * 8]] * 16, axis=0)
    lo = jnp.concatenate([lo_all[g * 8 : (g + 1) * 8]] * 16, axis=0)
    a = (hi == klass).astype(jnp.int8)
    b = (lo == klass).astype(jnp.int8)
    return a, b


def _build_v1(blurred, g, klass):
    seg = blurred[g * 8 : (g + 1) * 8].astype(jnp.int16)
    rep = jnp.concatenate([seg] * 16, axis=0)  # ONE replication, 2 B/copy
    k16 = klass.astype(jnp.int16)
    hi = rep >> 4  # i16 shift: legal
    lo = rep - (hi << 4)  # i16 sub/shift: legal (avoids i16 bitwise-and)
    a = (hi == k16).astype(jnp.int8)
    b = (lo == k16).astype(jnp.int8)
    return a, b


def _build_v2(blurred, g, klass):
    seg = blurred[g * 8 : (g + 1) * 8].astype(jnp.int16)
    rep = jnp.broadcast_to(seg[None], (16, 8, seg.shape[1])).reshape(
        128, seg.shape[1]
    )  # leading-dims collapse only: Mosaic-legal
    k16 = klass.astype(jnp.int16)
    hi = rep >> 4
    lo = rep - (hi << 4)
    a = (hi == k16).astype(jnp.int8)
    b = (lo == k16).astype(jnp.int8)
    return a, b


def _build_v3(blurred, g, klass):
    """int8 one-hot chunk concat: compare each class on the (8, w) int32
    planes FIRST, then concatenate the 16 int8 chunks — 32 B/px of copy
    traffic vs v0's 128 (int32 replication), identical compare count, and
    no i16 ops (v1's i16 shift fails to legalize: arith.shrsi on
    vector<8x128x2xi16>)."""
    hi_all = blurred[g * 8 : (g + 1) * 8] >> 4
    lo_all = blurred[g * 8 : (g + 1) * 8] & 15
    a = jnp.concatenate([(hi_all == c).astype(jnp.int8) for c in range(16)], axis=0)
    b = jnp.concatenate([(lo_all == c).astype(jnp.int8) for c in range(16)], axis=0)
    return a, b


def _build_v4(blurred, g, klass):
    """v3's chunk-concat build but bf16 one-hots (bf16 MXU dot): decides
    whether the int8 dot actually runs at 2x once the build is thin."""
    hi_all = blurred[g * 8 : (g + 1) * 8] >> 4
    lo_all = blurred[g * 8 : (g + 1) * 8] & 15
    a = jnp.concatenate([(hi_all == c).astype(jnp.bfloat16) for c in range(16)], axis=0)
    b = jnp.concatenate([(lo_all == c).astype(jnp.bfloat16) for c in range(16)], axis=0)
    return a, b


def _build_v5(blurred, g, klass):
    """v2's broadcast-collapse replication but staying in int32 (no i16 ops
    at all): if Mosaic lowers broadcast_to + leading-dim collapse as a
    sublane-tile broadcast, the replication is free and the only VPU work
    is the same 32 compares/px every variant pays."""
    seg = blurred[g * 8 : (g + 1) * 8]
    w = seg.shape[1]
    rep = jnp.broadcast_to(seg[None], (16, 8, w)).reshape(128, w)
    hi = rep >> 4
    lo = rep & 15
    a = (hi == klass).astype(jnp.int8)
    b = (lo == klass).astype(jnp.int8)
    return a, b


_BUILDS = {"v0": _build_v0, "v1": _build_v1, "v2": _build_v2,
           "v3": _build_v3, "v4": _build_v4, "v5": _build_v5}


def _kernel(x_ref, top_ref, bot_ref, blur_ref, hist_ref, acc_ref, band_ref,
            *, r, h, w, blk, build, mode):
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        _fill_band(band_ref, r, blk)

    blurred = _blur_block(x_ref, (top_ref, bot_ref), band_ref, j, nb,
                          r=r, h=h, w=w, blk=blk)
    blur_ref[0] = blurred.astype(jnp.uint8)

    if mode != "nohist":
        klass = jax.lax.broadcasted_iota(jnp.int32, (128, w), 0) >> 3
        acc = acc_ref[:]
        for g in range(blk // 8):
            a, b = _BUILDS[build](blurred, g, klass)
            if mode == "nodot":
                # keep the build live without the MXU dot: fold the one-hot
                # bytes into acc with a cheap vector add on a 128-col slice
                acc = acc + (a[:, :128].astype(jnp.int32)
                             + b[:, :128].astype(jnp.int32))
            else:
                acc = acc + jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
        acc_ref[:] = acc

    @pl.when(j == nb - 1)
    def _():
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


@functools.partial(jax.jit, static_argnames=("radius", "build", "mode",
                                             "interpret"))
def blur_hist_variant(imgs, radius=2, build="v0", mode="full",
                      interpret=False):
    n, h, w = imgs.shape
    r = int(radius)
    blk = _pick_block(h, w)
    nb = h // blk
    top_spec, bot_spec = _halo_specs(blk, h, w)
    blurred, hist = pl.pallas_call(
        functools.partial(_kernel, r=r, h=h, w=w, blk=blk, build=build,
                          mode=mode),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            top_spec,
            bot_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, 16), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
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
    return blurred, hist.reshape(n, 256)


def _hist_only_kernel(x_ref, hist_ref, acc_ref, *, w, blk, build):
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    vals = x_ref[0].astype(jnp.int32)
    klass = jax.lax.broadcasted_iota(jnp.int32, (128, w), 0) >> 3
    acc = acc_ref[:]
    for g in range(blk // 8):
        a, b = _BUILDS[build](vals, g, klass)
        acc = acc + jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
        )
    acc_ref[:] = acc

    @pl.when(j == nb - 1)
    def _():
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


@functools.partial(jax.jit, static_argnames=("build", "interpret"))
def hist_pallas(imgs, build="v0", interpret=False):
    """Histogram WITHOUT the blur — candidate fast path for the standalone
    gs.histogram / gs.otsu_threshold ops (currently the XLA nibble matmul:
    ~18.5k 1MP fps, 7.9%% of measured HBM bandwidth)."""
    n, h, w = imgs.shape
    blk = _pick_block(h, w)
    hist = pl.pallas_call(
        functools.partial(_hist_only_kernel, w=w, blk=blk, build=build),
        grid=(n, h // blk),
        in_specs=[pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 16, 16), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 16, 16), jnp.int32),
        scratch_shapes=[pltpu.VMEM((128, 128), jnp.int32)],
        interpret=interpret,
    )(imgs)
    return hist.reshape(n, 256)


def check_exact(interpret):
    """All variants must match ops.blur + ops.histogram bit-exactly."""
    import grayskull_tpu as gs

    rng = np.random.default_rng(7)
    lena = np.asarray(gs.io.read_pgm("/root/reference/testdata/lena.pgm"))
    big = np.tile(lena, (4, 8))[:448, :1024]  # (448, 1024)
    frames = np.stack([big, rng.integers(0, 256, big.shape, np.uint8)])
    want_blur = np.asarray(gs.blur(frames, 2))
    want_hist = np.asarray(gs.histogram(want_blur))
    alive = []
    for build in _BUILDS:
        try:
            blurred, hist = blur_hist_variant(jnp.asarray(frames), 2, build,
                                              "full", interpret)
            np.testing.assert_array_equal(np.asarray(blurred), want_blur,
                                          err_msg=build)
            np.testing.assert_array_equal(np.asarray(hist), want_hist,
                                          err_msg=build)
            ho = hist_pallas(jnp.asarray(frames), build, interpret)
            np.testing.assert_array_equal(
                np.asarray(ho), np.asarray(gs.histogram(frames)),
                err_msg=f"hist-only {build}")
        except AssertionError:
            raise  # inexact variants are bugs, not compile casualties
        except Exception as e:  # noqa: BLE001 — Mosaic legalization failures
            print(f"  {build}: COMPILE-FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            continue
        alive.append(build)
        print(f"  {build}: exact (+hist-only)", flush=True)
    return alive


def bench(alive):
    from grayskull_tpu.profiling import timeit

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (256, 1024, 1024), np.uint8))
    results = {}
    for build in alive:
        for mode in ("full", "nodot") if build == "v0" else ("full",):
            key = f"{build}-{mode}"
            try:
                ms = timeit(lambda: blur_hist_variant(x, 2, build, mode),
                            iters=20) * 1e3
            except Exception as e:  # noqa: BLE001 — a variant may not compile
                print(f"  {key}: FAILED {type(e).__name__}: {e}", flush=True)
                continue
            results[key] = ms
            print(f"  {key}: {ms:.2f} ms  ({256e3 / ms:.0f} fps)", flush=True)
    ms = timeit(lambda: blur_hist_variant(x, 2, "v0", "nohist"), iters=20) * 1e3
    results["blur-only"] = ms
    print(f"  blur-only: {ms:.2f} ms", flush=True)
    for build in alive:
        try:
            ms = timeit(lambda: hist_pallas(x, build), iters=20) * 1e3
        except Exception as e:  # noqa: BLE001
            print(f"  hist-only-{build}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        results[f"hist-only-{build}"] = ms
        print(f"  hist-only-{build}: {ms:.2f} ms  ({256e3 / ms:.0f} fps)",
              flush=True)
    return results


if __name__ == "__main__":
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend: {jax.default_backend()}", flush=True)
    t0 = time.time()
    alive = check_exact(interpret=not on_tpu)
    print(f"exactness: {time.time() - t0:.1f}s  alive={alive}", flush=True)
    if on_tpu:
        bench(alive)
