"""Round-3 roofline instrumentation for the headline preproc pipeline.

Questions (VERDICT r2 weak #1):
  1. What HBM bandwidth can this chip actually sustain?  (pure-copy and
     2-in/1-out triad Pallas kernels — the "measured achievable" number the
     roofline column should use instead of the 819 GB/s spec sheet)
  2. Where does the fused pipeline's time go?  (kernel1 blur+hist vs the
     otsu sweep vs kernel2 threshold+sobel, plus blur-only / hist-only
     ablations of kernel1)
  3. Does an int8 MXU contraction beat bf16 for the nibble histogram?
  4. How much does batch size (dispatch amortization) matter?

Run on the real TPU:  PYTHONPATH=/root/repo:/root/.axon_site python exp/exp_roofline.py
"""

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from grayskull_tpu.kernels.preproc import (  # noqa: E402
    _halo16, _magic_vec, _pick_block, _MAGIC_SHIFT, fused_blur_hist,
    fused_threshold_sobel,
)
from grayskull_tpu.ops.histogram import otsu_from_histogram  # noqa: E402
from grayskull_tpu.pipelines.preproc import preprocess  # noqa: E402
from grayskull_tpu.profiling import timeit  # noqa: E402


# ---------------------------------------------------------------- bandwidth
def _copy_kernel(x_ref, o_ref):
    o_ref[0] = x_ref[0]


@jax.jit
def hbm_copy(x):
    n, h, w = x.shape
    blk = _pick_block(h, w)
    return pl.pallas_call(
        _copy_kernel,
        grid=(n, h // blk),
        in_specs=[pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
    )(x)


def _triad_kernel(x_ref, y_ref, o_ref):
    # Mosaic vector arithmetic needs i16/i32 — cast u8 operands up and back
    o_ref[0] = (x_ref[0].astype(jnp.int32) + y_ref[0].astype(jnp.int32)).astype(jnp.uint8)


@jax.jit
def hbm_triad(x, y):
    n, h, w = x.shape
    blk = _pick_block(h, w)
    return pl.pallas_call(
        _triad_kernel,
        grid=(n, h // blk),
        in_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
    )(x, y)


# ------------------------------------------------------- kernel1 ablations
def _blur_only_kernel(x_ref, halo_ref, blur_ref, band_ref, *, r, h, w, blk):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o = jax.lax.broadcasted_iota(jnp.int32, (blk, blk + 16), 0)
        i_in = jax.lax.broadcasted_iota(jnp.int32, (blk, blk + 16), 1)
        band_ref[:] = ((i_in >= o + 8 - r) & (i_in <= o + 8 + r)).astype(jnp.bfloat16)

    rows = jnp.concatenate(
        [halo_ref[0, 0, :8, :], x_ref[0], halo_ref[0, 0, 8:, :]], axis=0
    )
    xb = rows.astype(jnp.int32).astype(jnp.bfloat16)
    cs_col = jax.lax.dot_general(
        band_ref[:], xb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    small = 255 * (2 * r + 1) ** 2 <= 32767
    csi = cs_col.astype(jnp.int16 if small else jnp.int32)
    px = jnp.pad(csi, ((0, 0), (r, r)))
    cs_n = px[:, 0:w]
    for k in range(1, 2 * r + 1):
        cs_n = cs_n + px[:, k : k + w]
    cs = cs_n.astype(jnp.int32).astype(jnp.uint32)
    y0 = j * blk
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + y0
    jjv = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    cyv = jnp.minimum(ii + r, h - 1) - jnp.maximum(ii - r, 0) + 1
    cxv = jnp.minimum(jjv + r, w - 1) - jnp.maximum(jjv - r, 0) + 1
    blurred = ((((cs * _magic_vec(cyv, r)) >> _MAGIC_SHIFT)
                * _magic_vec(cxv, r)) >> _MAGIC_SHIFT).astype(jnp.int32)
    blur_ref[0] = blurred.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("radius",))
def blur_only(imgs, radius=2):
    n, h, w = imgs.shape
    r = int(radius)
    blk = _pick_block(h, w)
    halo = _halo16(imgs, blk)
    return pl.pallas_call(
        functools.partial(_blur_only_kernel, r=r, h=h, w=w, blk=blk),
        grid=(n, h // blk),
        in_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 16, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((blk, blk + 16), jnp.bfloat16)],
    )(imgs, halo)


def _hist_kernel(x_ref, hist_ref, acc_ref, *, w, blk, dtype):
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    blurred = x_ref[0].astype(jnp.int32)
    klass = jax.lax.broadcasted_iota(jnp.int32, (128, w), 0) >> 3
    acc = acc_ref[:]
    hi_all = blurred >> 4
    lo_all = blurred & 15
    for g in range(blk // 8):
        hi = jnp.concatenate([hi_all[g * 8 : (g + 1) * 8]] * 16, axis=0)
        lo = jnp.concatenate([lo_all[g * 8 : (g + 1) * 8]] * 16, axis=0)
        a = (hi == klass).astype(dtype)
        b = (lo == klass).astype(dtype)
        c = jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32 if dtype == jnp.bfloat16 else jnp.int32,
        )
        acc = acc + c.astype(acc.dtype)
    acc_ref[:] = acc

    @pl.when(j == nb - 1)
    def _():
        hist_ref[0] = acc_ref[:].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("use_int8",))
def hist_only(imgs, use_int8=False):
    n, h, w = imgs.shape
    blk = _pick_block(h, w)
    dtype = jnp.int8 if use_int8 else jnp.bfloat16
    return pl.pallas_call(
        functools.partial(_hist_kernel, w=w, blk=blk, dtype=dtype),
        grid=(n, h // blk),
        in_specs=[pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128, 128), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 128, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((128, 128), jnp.float32 if dtype == jnp.bfloat16 else jnp.int32)
        ],
    )(imgs)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    out = {}
    n, h, w = 256, 1024, 1024
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (h, w), dtype=np.uint8)
    batch_np = np.stack([np.roll(frame, 13 * i, axis=1) for i in range(n)])
    batch = jnp.asarray(batch_np)
    # device-produced second operand (avoid host-roundtrip layout penalties)
    batch2 = hbm_copy(batch)

    MB = n * h * w
    it = 30

    # health check first (known baseline ~15k fps when the tunnel is healthy)
    dt = timeit(preprocess, batch, iters=it)
    out["health_preprocess_fps"] = n / dt

    dt = timeit(hbm_copy, batch, iters=it)
    out["copy_gbps"] = 2 * MB / dt / 1e9
    dt = timeit(hbm_triad, batch, batch2, iters=it)
    out["triad_gbps"] = 3 * MB / dt / 1e9

    # stage timings
    blurred, hist = fused_blur_hist(batch, 2)
    t = otsu_from_histogram(hist, h * w)
    dt1 = timeit(fused_blur_hist, batch, 2, iters=it)
    out["k1_blur_hist_ms"] = dt1 * 1e3
    out["k1_fps"] = n / dt1
    dto = timeit(otsu_from_histogram, hist, h * w, iters=it)
    out["otsu_ms"] = dto * 1e3
    dt2 = timeit(fused_threshold_sobel, blurred, t, iters=it)
    out["k2_thresh_sobel_ms"] = dt2 * 1e3
    out["k2_fps"] = n / dt2
    out["k2_gbps"] = 3 * MB / dt2 / 1e9

    # kernel1 ablations
    dtb = timeit(blur_only, batch, 2, iters=it)
    out["blur_only_ms"] = dtb * 1e3
    out["blur_only_gbps"] = 2 * MB / dtb / 1e9
    dth = timeit(hist_only, batch, iters=it)
    out["hist_only_bf16_ms"] = dth * 1e3
    try:
        hi8 = hist_only(batch, use_int8=True)
        hb = hist_only(batch)
        ok = bool(jnp.array_equal(hi8, hb))
        dt8 = timeit(hist_only, batch, True, iters=it)
        out["hist_only_int8_ms"] = dt8 * 1e3
        out["hist_int8_exact"] = ok
    except Exception as e:  # noqa: BLE001
        out["hist_only_int8_error"] = repr(e)[:200]

    # batch scaling (dispatch amortization)
    for nn in (64, 512):
        b2 = jnp.asarray(np.stack([np.roll(frame, 7 * i, axis=1) for i in range(nn)]))
        dt = timeit(preprocess, b2, iters=max(4, it // (nn // 64)))
        out[f"preprocess_fps_n{nn}"] = nn / dt

    # re-measure health at the end (tunnel drift check)
    dt = timeit(preprocess, batch, iters=it)
    out["health_preprocess_fps_end"] = n / dt

    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 2)
    print(json.dumps(out, indent=2))
    with open("/root/repo/exp/results_roofline.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
