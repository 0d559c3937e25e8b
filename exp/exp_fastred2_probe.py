"""Probe: per-2x2-block NMS-survivor counts on the reference test images.

exp_fastred_r4 (keep-1 per 2x2 block) died because two exactly-tied adjacent
survivors are common (2.5-8% of blocks).  A keep-TOP-2 reduction only needs
<= 2 survivors per block; this probe counts how often 3- and 4-survivor
blocks occur — if never on real frames, a gated top-2 reduction halves the
amk emission input exactly.  Also probes 4x4 blocks at keep-2 and keep-4.

Run: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python exp/exp_fastred2_probe.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import grayskull_tpu as gs
from grayskull_tpu.ops.features import fast_scoremap

REF = os.environ.get("GRAYSKULL_REF", "/root/reference")
IMAGES = ["aruco.pgm", "lena.pgm", "document.pgm", "receipt.pgm"]


def survivors(img, thr=20):
    import jax.numpy as jnp

    h, w = img.shape
    s = np.asarray(fast_scoremap(jnp.asarray(img), thr)).astype(np.int32)
    sp = np.pad(s, 1)
    is_max = s > 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            is_max &= ~(sp[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w] > s)
    ys = np.arange(h)[:, None]
    xs = np.arange(w)[None, :]
    interior = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    return is_max & interior


def block_counts(mask, bh, bw):
    h, w = mask.shape
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw
    m = np.zeros((hp, wp), np.int32)
    m[:h, :w] = mask
    c = m.reshape(hp // bh, bh, wp // bw, bw).sum(axis=(1, 3))
    return np.bincount(c.reshape(-1), minlength=17)


def main():
    for name in IMAGES:
        img = gs.io.read_pgm(os.path.join(REF, "testdata", name))
        mask = survivors(np.asarray(img))
        tot = int(mask.sum())
        b22 = block_counts(mask, 2, 2)
        b44 = block_counts(mask, 4, 4)
        print(f"{name}: survivors={tot}")
        print(f"  2x2 blocks by count: " +
              " ".join(f"{k}:{int(v)}" for k, v in enumerate(b22) if v and k))
        print(f"  4x4 blocks by count: " +
              " ".join(f"{k}:{int(v)}" for k, v in enumerate(b44) if v and k))
        print(f"  2x2 keep-2 exact: {bool((b22[3:] == 0).all())}   "
              f"4x4 keep-4 exact: {bool((b44[5:] == 0).all())}")


if __name__ == "__main__":
    main()
