"""k2 ablations + blur magic-vector diet."""
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

def _magic_vec(count_vec, r):
    m = jnp.full_like(count_vec, (1 << S) // (2 * r + 1) + 1)
    for d in range(r + 1, 2 * r + 1):
        m = jnp.where(count_vec == d, (1 << S) // d + 1, m)
    return m


def _blur_hist_diet_kernel(x_ref, halo_ref, blur_ref, hist_ref, acc_ref, *, r, h, w, blk, mode):
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dt = jnp.int16 if 255 * (2 * r + 1) ** 2 <= 32767 else jnp.int32
    top = halo_ref[0, 0, 8 - r : 8, :]
    bot = halo_ref[0, 0, 8 : 8 + r, :]
    rows = jnp.concatenate([top, x_ref[0], bot], axis=0).astype(dt)
    px = jnp.pad(rows, ((0, 0), (r, r)))
    rs = px[:, 0:w]
    for k in range(1, 2 * r + 1):
        rs = rs + px[:, k : k + w]
    cs_n = rs[0:blk, :]
    for k in range(1, 2 * r + 1):
        cs_n = cs_n + rs[k : k + blk, :]
    cs = cs_n.astype(jnp.int32)
    # magic division with tiny per-row / per-col magic vectors
    y0 = j * blk
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + y0
    jjv = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    cyv = jnp.minimum(ii + r, h - 1) - jnp.maximum(ii - r, 0) + 1   # (blk, 1)
    cxv = jnp.minimum(jjv + r, w - 1) - jnp.maximum(jjv - r, 0) + 1  # (1, w)
    m_cy = _magic_vec(cyv, r)
    m_cx = _magic_vec(cxv, r)
    blurred = (((cs * m_cy) >> S) * m_cx) >> S
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
def blur_hist_diet(imgs, radius=2, blk=256, mode="full"):
    n, h, w = imgs.shape
    r = int(radius)
    halo = V2._halo16(imgs, blk)
    nb = h // blk
    blurred, hist = pl.pallas_call(
        functools.partial(_blur_hist_diet_kernel, r=r, h=h, w=w, blk=blk, mode=mode),
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
        scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32)],
    )(imgs, halo)
    return blurred, hist.reshape(n, 256)


def _k2_kernel(t_ref, x_ref, halo_ref, bin_ref, edge_ref, *, h, w, blk, mode):
    i = pl.program_id(0)
    j = pl.program_id(1)
    if mode == "passthrough":
        bin_ref[0] = x_ref[0]
        edge_ref[0] = x_ref[0]
        return
    t = t_ref[i]
    if mode == "binonly":
        x = x_ref[0].astype(jnp.int32)
        b = ((t - x) >> 31) & 255
        bin_ref[0] = b.astype(jnp.uint8)
        edge_ref[0] = b.astype(jnp.uint8)
        return
    top = halo_ref[0, 0, 7:8, :]
    bot = halo_ref[0, 0, 8:9, :]
    rows = jnp.concatenate([top, x_ref[0], bot], axis=0).astype(jnp.int32)
    b = ((t - rows) >> 31) & 255
    bin_ref[0] = b[1 : 1 + blk].astype(jnp.uint8)
    pb = jnp.pad(b, ((0, 0), (1, 1)))

    def sh(dy, dx):
        return pb[1 + dy : 1 + dy + blk, 1 + dx : 1 + dx + w]

    gx = -sh(-1, -1) + sh(-1, 1) - 2 * sh(0, -1) + 2 * sh(0, 1) - sh(1, -1) + sh(1, 1)
    gy = -sh(-1, -1) - 2 * sh(-1, 0) - sh(-1, 1) + sh(1, -1) + 2 * sh(1, 0) + sh(1, 1)
    mag = jnp.minimum((jnp.abs(gx) + jnp.abs(gy)) >> 1, 255)
    y0 = j * blk
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + y0
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    interior = ((ii >= 1) & (ii < h - 1)) & ((jj >= 1) & (jj < w - 1))
    edge_ref[0] = jnp.where(interior, mag, 0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("blk", "mode"))
def k2_t(blurred, thresholds, blk=256, mode="full"):
    n, h, w = blurred.shape
    halo = V2._halo16(blurred, blk)
    t = thresholds.astype(jnp.int32)
    nb = h // blk
    return pl.pallas_call(
        functools.partial(_k2_kernel, h=h, w=w, blk=blk, mode=mode),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 16, w), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
            jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
        ],
    )(t, blurred, halo)


def main():
    n, h, w = 256, 1024, 1024
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (n, h, w), dtype=np.uint8))
    us = lambda dt: dt / n * 1e6
    print("backend:", jax.default_backend())

    from grayskull_tpu.kernels.preproc import fused_blur_hist as old_k1
    from grayskull_tpu.kernels.preproc import fused_threshold_sobel as old_k2
    from grayskull_tpu.ops.histogram import otsu_from_histogram
    b_ref, h_ref = old_k1(imgs[:8], 2)
    t_ref = otsu_from_histogram(h_ref, h * w)
    bin_ref, e_ref = old_k2(b_ref, t_ref)
    b2, h2 = blur_hist_diet(imgs[:8], 2, 256, "full")
    print("diet k1: blur", np.array_equal(np.asarray(b2), np.asarray(b_ref)),
          "hist", np.array_equal(np.asarray(h2), np.asarray(h_ref)))
    b3, e3 = k2_t(b_ref, t_ref, 256, "full")
    print("k2: bin", np.array_equal(np.asarray(b3), np.asarray(bin_ref)),
          "edge", np.array_equal(np.asarray(e3), np.asarray(e_ref)))

    tt = t_ref[:1].repeat(n)
    for name, fn in [
        ("k1 diet bluronly ", lambda: blur_hist_diet(imgs, 2, 256, "bluronly")),
        ("k1 diet full     ", lambda: blur_hist_diet(imgs, 2, 256, "full")),
        ("k2 passthrough   ", lambda: k2_t(imgs, tt, 256, "passthrough")),
        ("k2 binonly       ", lambda: k2_t(imgs, tt, 256, "binonly")),
        ("k2 full          ", lambda: k2_t(imgs, tt, 256, "full")),
    ]:
        dt = timeit(fn, iters=5)
        print(f"{name}: {us(dt):8.1f} us/frame  ({n/dt:8.0f} fps)")


if __name__ == "__main__":
    main()
