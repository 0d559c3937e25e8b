#!/usr/bin/env python3
"""Extract public constant data tables from the reference into binary data files.

Two tables are required for output parity and are pure data (not code):

* the 256-pair BRIEF sampling pattern (grayskull.h:541-605) — the well-known ORB
  test-pair layout;
* the frontal-face LBP cascade (examples/nanomagick/frontalface.h) — itself
  auto-generated from OpenCV's public ``lbpcascade_frontalface.xml``.

Run: ``python tools/extract_tables.py [reference_dir]``.  Outputs go to
``grayskull_tpu/data/`` as .npy/.npz (binary, versioned in-repo so the framework
is standalone).
"""

import os
import re
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "..", "grayskull_tpu", "data")


def extract_brief(header_path):
    src = open(header_path).read()
    m = re.search(r"gs_brief_pattern\[256\]\[4\]\s*=\s*\{(.*?)\};", src, re.S)
    assert m, "brief pattern not found"
    nums = [int(v) for v in re.findall(r"-?\d+", m.group(1))]
    arr = np.array(nums, np.int32).reshape(256, 4)
    np.save(os.path.join(DATA, "brief_pattern.npy"), arr)
    print(f"brief_pattern.npy: {arr.shape} {arr.dtype}")


def _c_array(src, name, dtype):
    m = re.search(re.escape(name) + r"\s*\[\]\s*=\s*\{(.*?)\};", src, re.S)
    assert m, f"{name} not found"
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    toks = [t.strip() for t in body.split(",") if t.strip()]
    if np.issubdtype(np.dtype(dtype), np.floating):
        vals = [float(t.rstrip("f")) for t in toks]
    else:
        vals = [int(t, 0) for t in toks]
    return np.array(vals, dtype)


def extract_cascade(cascade_path):
    src = open(cascade_path).read()
    feats = _c_array(src, "frontalface_features", np.int8).reshape(-1, 4)
    out = dict(
        window_w=np.uint16(24),
        window_h=np.uint16(24),
        features=feats,
        weak_feature_idx=_c_array(src, "frontalface_weak_feature_idx", np.uint16),
        weak_left_val=_c_array(src, "frontalface_weak_left_val", np.float32),
        weak_right_val=_c_array(src, "frontalface_weak_right_val", np.float32),
        weak_subset_offset=_c_array(src, "frontalface_weak_subset_offset", np.uint16),
        weak_num_subsets=_c_array(src, "frontalface_weak_num_subsets", np.uint16),
        subsets=_c_array(src, "frontalface_subsets", np.int32),
        stage_weak_start=_c_array(src, "frontalface_stage_weak_start", np.uint16),
        stage_nweaks=_c_array(src, "frontalface_stage_nweaks", np.uint16),
        stage_threshold=_c_array(src, "frontalface_stage_threshold", np.float32),
    )
    # window dims from the struct literal if present
    m = re.search(r"frontalface\s*=\s*\{\s*(\d+)\s*,\s*(\d+)", src)
    if m:
        out["window_w"] = np.uint16(int(m.group(1)))
        out["window_h"] = np.uint16(int(m.group(2)))
    np.savez(os.path.join(DATA, "frontalface.npz"), **out)
    print(
        f"frontalface.npz: window {out['window_w']}x{out['window_h']}, "
        f"{len(out['features'])} features, {len(out['weak_feature_idx'])} weaks, "
        f"{len(out['stage_threshold'])} stages, {len(out['subsets'])} subset words"
    )


if __name__ == "__main__":
    ref = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    os.makedirs(DATA, exist_ok=True)
    extract_brief(os.path.join(ref, "grayskull.h"))
    extract_cascade(os.path.join(ref, "examples", "nanomagick", "frontalface.h"))
