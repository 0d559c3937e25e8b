"""Streaming config sweep + MXU column-sum blur."""
import functools
import sys
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from grayskull_tpu.profiling import timeit
import exp_pipeline_v2 as V2

S = 18


def _copy2_kernel(x_ref, o1_ref, o2_ref):
    o1_ref[...] = x_ref[...]
    o2_ref[...] = x_ref[...]


@functools.partial(jax.jit, static_argnames=("bn", "bh"))
def copy2(imgs, bn=1, bh=256):
    n, h, w = imgs.shape
    spec = pl.BlockSpec((bn, bh, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _copy2_kernel,
        grid=(n // bn, h // bh),
        in_specs=[spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((n, h, w), jnp.uint8)] * 2,
    )(imgs)


def _magic_vec(count_vec, r):
    m = jnp.full_like(count_vec, (1 << S) // (2 * r + 1) + 1)
    for d in range(r + 1, 2 * r + 1):
        m = jnp.where(count_vec == d, (1 << S) // d + 1, m)
    return m


def _blur_mxu_kernel(x_ref, halo_ref, blur_ref, hist_ref, acc_ref, band_ref, *, r, h, w, blk, mode):
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        # banded column-sum matrix: band[out, in8] = 1 if in8 in [out+8-r, out+8+r]
        o = jax.lax.broadcasted_iota(jnp.int32, (blk, blk + 16), 0)
        iidx = jax.lax.broadcasted_iota(jnp.int32, (blk, blk + 16), 1)
        band_ref[:] = ((iidx >= o + 8 - r) & (iidx <= o + 8 + r)).astype(jnp.bfloat16)

    rows = jnp.concatenate([halo_ref[0, 0, :8, :], x_ref[0], halo_ref[0, 0, 8:, :]], axis=0)
    xb = rows.astype(jnp.int32).astype(jnp.bfloat16)  # (blk+16, w); no direct u8->bf16 cast
    cs_col = jax.lax.dot_general(
        band_ref[:], xb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (blk, w) exact column sums
    csi = cs_col.astype(jnp.int16)  # <= 255*(2r+1) fits for r<=5
    px = jnp.pad(csi, ((0, 0), (r, r)))
    cs_n = px[:, 0:w]
    for k in range(1, 2 * r + 1):
        cs_n = cs_n + px[:, k : k + w]
    cs = cs_n.astype(jnp.int32)
    y0 = j * blk
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + y0
    jjv = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    cyv = jnp.minimum(ii + r, h - 1) - jnp.maximum(ii - r, 0) + 1
    cxv = jnp.minimum(jjv + r, w - 1) - jnp.maximum(jjv - r, 0) + 1
    blurred = (((cs * _magic_vec(cyv, r)) >> S) * _magic_vec(cxv, r)) >> S
    blur_ref[0] = blurred.astype(jnp.uint8)

    if mode == "bluronly":
        @pl.when(j == nb - 1)
        def _():
            hist_ref[0] = jnp.zeros((16, 16), jnp.int32)
        return

    klass = jax.lax.broadcasted_iota(jnp.int32, (128, w), 0) >> 3
    acc = acc_ref[:]
    hi_all = blurred >> 4
    lo_all = blurred & 15
    for g in range(blk // 8):
        hi = jnp.concatenate([hi_all[g * 8 : (g + 1) * 8]] * 16, axis=0)
        lo = jnp.concatenate([lo_all[g * 8 : (g + 1) * 8]] * 16, axis=0)
        a = (hi == klass).astype(jnp.bfloat16)
        b = (lo == klass).astype(jnp.bfloat16)
        c = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = acc + c
    acc_ref[:] = acc

    @pl.when(j == nb - 1)
    def _():
        accv = acc_ref[:]
        xid = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        yid = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        masked = jnp.where((xid & 7) == (yid & 7), accv, 0.0)
        pid = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
        pcol = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1) >> 3
        p = (pid == pcol).astype(jnp.float32)
        t1 = jax.lax.dot_general(p, masked, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        m = jax.lax.dot_general(t1, p, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        hist_ref[0] = m.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("radius", "blk", "mode"))
def blur_hist_mxu2(imgs, radius=2, blk=256, mode="full"):
    n, h, w = imgs.shape
    r = int(radius)
    halo = V2._halo16(imgs, blk)
    nb = h // blk
    blurred, hist = pl.pallas_call(
        functools.partial(_blur_mxu_kernel, r=r, h=h, w=w, blk=blk, mode=mode),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 16, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
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
            pltpu.VMEM((128, 128), jnp.float32),
            pltpu.VMEM((blk, blk + 16), jnp.bfloat16),
        ],
    )(imgs, halo)
    return blurred, hist.reshape(n, 256)


def main():
    n, h, w = 256, 1024, 1024
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (n, h, w), dtype=np.uint8))
    us = lambda dt: dt / n * 1e6
    print("backend:", jax.default_backend())

    from grayskull_tpu.kernels.preproc import fused_blur_hist as old_k1
    b_ref, h_ref = old_k1(imgs[:8], 2)
    b2, h2 = blur_hist_mxu2(imgs[:8], 2, 256, "full")
    print("mxu2 k1: blur", np.array_equal(np.asarray(b2), np.asarray(b_ref)),
          "hist", np.array_equal(np.asarray(h2), np.asarray(h_ref)))

    for name, fn in [
        ("copy2 (1,256) blocks ", lambda: copy2(imgs, 1, 256)),
        ("copy2 (1,512) blocks ", lambda: copy2(imgs, 1, 512)),
        ("copy2 (2,256) blocks ", lambda: copy2(imgs, 2, 256)),
        ("copy2 (1,1024) frame ", lambda: copy2(imgs, 1, 1024)),
        ("copy2 (4,128) blocks ", lambda: copy2(imgs, 4, 128)),
        ("k1 mxu2 bluronly     ", lambda: blur_hist_mxu2(imgs, 2, 256, "bluronly")),
        ("k1 mxu2 full         ", lambda: blur_hist_mxu2(imgs, 2, 256, "full")),
    ]:
        dt = timeit(fn, iters=20)
        print(f"{name}: {us(dt):8.1f} us/frame  ({n/dt:8.0f} fps)")


if __name__ == "__main__":
    main()
