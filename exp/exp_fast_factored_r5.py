"""r5: A/B the factored-lane-shift FAST body against the r5a bitmask body.

The r5b cumulative profile (exp/results_orb_r5b.json) put the FAST kernel at
4.8 ms of the 10.3 ms batch-16 ORB pipeline — the single largest stage.  The
body kept ~35 full-block int32 intermediates live (16 materialized circle
views + masks), which spill through VMEM, and paid 16+6 lane-misaligned
slices (each a vector relayout).  The factored body slices the 7 distinct
lane offsets once, consumes each circle view immediately (live set ~8
values), and factors the NMS to 3 lane columns.

Both variants run in THIS process (CLAUDE.md: tunnel drift), the old body
monkeypatched in from the pre-factoring definition.  Also re-times the
end-to-end ORB pipeline with the winner in place.

Run: python exp/exp_fast_factored_r5.py   (TPU)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import grayskull_tpu as gs
from grayskull_tpu.kernels import fast as kfast
from grayskull_tpu.ops.features import orb_extract
from grayskull_tpu.pipelines.preproc import preprocess
from grayskull_tpu.profiling import timeit

OUT = {"backend": jax.default_backend()}

frame = gs.io.read_pgm("/root/reference/testdata/lena.pgm")
reps = (1024 // frame.shape[0] + 1, 1024 // frame.shape[1] + 1)
mp = np.tile(frame, reps)[:1024, :1024]
big = jnp.asarray(np.stack([np.roll(mp, 13 * i, axis=1) for i in range(256)]))
dt = timeit(preprocess, big, iters=8, repeat=3)
OUT["health_preprocess_1MP_fps"] = 256 / dt
print("health:", round(OUT["health_preprocess_1MP_fps"]), flush=True)

scene = gs.io.read_pgm("/root/reference/testdata/aruco.pgm")
nb = 16
batch = jnp.asarray(np.stack([np.roll(scene, 5 * i, axis=1)
                              for i in range(nb)]))
thr = jnp.asarray(20, jnp.int32)


# --- old (r5a) body: materialized views + per-view packing ---------------
def _old_body(thr_v, x_ref, top_ref, bot_ref, blk, wp, h, w):
    j = pl.program_id(1)
    nbk = pl.num_programs(1)
    top = jnp.where(j > 0, top_ref[0, 4:8, :].astype(jnp.int32), 0)
    bot = jnp.where(j < nbk - 1, bot_ref[0, 0:4, :].astype(jnp.int32), 0)
    rows = jnp.concatenate([top, x_ref[0].astype(jnp.int32), bot], axis=0)
    rp = jnp.pad(rows, ((0, 0), (3, 3)))
    ext = blk + 2
    p = rows[3 : 3 + ext, :]

    def view(k):
        return rp[3 + _CDY[k] : 3 + _CDY[k] + ext,
                  3 + _CDX[k] : 3 + _CDX[k] + wp]

    views = [view(k) for k in range(16)]
    d = p - thr_v
    bright = [v > p + thr_v for v in views]
    dark = [(~b) & ((d < 0) | (v < d)) for v, b in zip(views, bright)]
    bb = jnp.zeros((ext, wp), jnp.int32)
    dd = jnp.zeros((ext, wp), jnp.int32)
    for k in range(16):
        bb = bb | (bright[k].astype(jnp.int32) << k)
        dd = dd | (dark[k].astype(jnp.int32) << k)

    def run9(m):
        x = m | ((m & 0x1FF) << 16)
        m1 = x & (x >> 1)
        m2 = m1 & (m1 >> 2)
        m4 = m2 & (m2 >> 4)
        return (m4 & (x >> 8)) != 0

    corner = run9(bb) | run9(dd)
    min_diff = jnp.abs(views[0] - p)
    for v in views[1:]:
        min_diff = jnp.minimum(min_diff, jnp.abs(v - p))
    y0 = j * blk
    yy = jax.lax.broadcasted_iota(jnp.int32, (ext, wp), 0) + (y0 - 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (ext, wp), 1)
    interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    s = jnp.where(corner & interior, min_diff, 0)
    sp = jnp.pad(s, ((0, 0), (1, 1)))
    smid = s[1 : 1 + blk]
    is_max = smid > 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            is_max &= ~(sp[1 + dy : 1 + dy + blk, 1 + dx : 1 + dx + wp]
                        > smid)
    ym = jax.lax.broadcasted_iota(jnp.int32, (blk, wp), 0) + y0
    xm = jax.lax.broadcasted_iota(jnp.int32, (blk, wp), 1)
    idx = ym * w + xm
    key = jnp.where(is_max, ((jnp.int32(h * w) - idx) << 8) | smid, 0)
    return smid, key


from jax.experimental import pallas as pl  # noqa: E402

_CDX = kfast._CDX
_CDY = kfast._CDY

new_body = kfast._fast_block_body

variants = [("factored", new_body), ("r5a_materialized", _old_body)]
results = {}
for name, body in variants:
    kfast._fast_block_body = body
    f = jax.jit(lambda b: kfast._fast_call(b, thr, False, compact=True))
    out = jax.block_until_ready(f(batch))
    t = timeit(f, batch, iters=10, repeat=3) * 1e3
    results[name] = (t, out)
    OUT[f"kernel_{name}_ms"] = t
    print(f"{name}: {t:.2f} ms", flush=True)
kfast._fast_block_body = new_body

# bit-exactness across variants on hardware
flips = 0
for a, b in zip(results["factored"][1], results["r5a_materialized"][1]):
    flips += int(jnp.sum(jnp.asarray(np.asarray(a) != np.asarray(b))))
OUT["variant_flips"] = flips
print("variant flips:", flips, flush=True)

# end-to-end with the winner (module default = factored)
f = jax.jit(lambda b: orb_extract(b, 500, 20))
kps = jax.block_until_ready(f(batch))
t = timeit(f, batch, iters=10, repeat=3) * 1e3
nk = int(jnp.sum(kps.n))
OUT["orb_e2e_ms"] = t
OUT["orb_kps_per_sec"] = nk / (t / 1e3)
print("orb e2e:", round(t, 2), "ms ", round(OUT["orb_kps_per_sec"]),
      "kps/s", flush=True)

with open("exp/results_fast_factored_r5.json", "w") as fh:
    json.dump(OUT, fh, indent=1)
print(json.dumps(OUT, indent=1))
