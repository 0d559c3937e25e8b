"""LBP cascade loading — the ``gs_lbp_cascade`` data model
(/root/reference/grayskull.h:54-64) with two loaders:

* :func:`load_frontalface` — the bundled frontal-face cascade
  (data/frontalface.npz, derived from OpenCV's public
  ``lbpcascade_frontalface.xml`` like the reference's generated header);
* :func:`load_opencv_xml` — parse any OpenCV LBP cascade XML directly, so users
  can bring other cascades (eyes, plates, …) without a C code-generation step.
"""

from __future__ import annotations

import functools
import os
import xml.etree.ElementTree as ET

import numpy as np

from .core import LbpCascade

__all__ = ["load_frontalface", "load_opencv_xml"]

_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


@functools.lru_cache(maxsize=1)
def load_frontalface() -> LbpCascade:
    """The 24x24 / 136-feature / 139-weak / 20-stage frontal-face cascade.

    Memoized: :class:`LbpCascade` equality is identity (its arrays are static
    data), so every jit/kernel cache keyed on the cascade — the per-scale
    detector executables above all — needs callers to pass the SAME object.
    Returning a singleton makes the no-cascade-argument path
    (``detect_faces(img)``) hit those caches across calls.
    """
    z = np.load(os.path.join(_DATA_DIR, "frontalface.npz"))
    return LbpCascade(
        window_w=int(z["window_w"]),
        window_h=int(z["window_h"]),
        features=z["features"],
        weak_feature_idx=z["weak_feature_idx"],
        weak_left_val=z["weak_left_val"],
        weak_right_val=z["weak_right_val"],
        weak_subset_offset=z["weak_subset_offset"],
        weak_num_subsets=z["weak_num_subsets"],
        subsets=z["subsets"],
        stage_weak_start=z["stage_weak_start"],
        stage_nweaks=z["stage_nweaks"],
        stage_threshold=z["stage_threshold"],
    )


def load_opencv_xml(path: str) -> LbpCascade:
    """Parse an OpenCV LBP cascade XML (``<featureType>LBP</featureType>``)."""
    root = ET.parse(path).getroot()
    cascade = root.find("cascade")
    if cascade is None:
        raise ValueError("not an OpenCV cascade file")
    ftype = cascade.findtext("featureType", "").strip()
    if ftype != "LBP":
        raise ValueError(f"featureType is {ftype!r}, only LBP is supported")
    window_w = int(cascade.findtext("width"))
    window_h = int(cascade.findtext("height"))

    features = []
    for rect in cascade.find("features"):
        vals = rect.findtext("rect").split()
        features.append([int(v) for v in vals[:4]])
    features = np.array(features, np.int8)

    weak_feature_idx = []
    weak_left = []
    weak_right = []
    subset_offset = []
    subset_count = []
    subsets = []
    stage_start = []
    stage_nweaks = []
    stage_threshold = []
    for stage in cascade.find("stages"):
        stage_threshold.append(float(stage.findtext("stageThreshold")))
        stage_start.append(len(weak_feature_idx))
        weaks = stage.find("weakClassifiers")
        stage_nweaks.append(len(weaks))
        for weak in weaks:
            nodes = weak.findtext("internalNodes").split()
            # left-node, right-node, featureIdx, then 8x int32 subset words
            weak_feature_idx.append(int(nodes[2]))
            words = [int(v) for v in nodes[3:]]
            subset_offset.append(len(subsets))
            subset_count.append(len(words))
            subsets.extend(words)
            leaf = weak.findtext("leafValues").split()
            weak_left.append(float(leaf[0]))
            weak_right.append(float(leaf[1]))

    return LbpCascade(
        window_w=window_w,
        window_h=window_h,
        features=features,
        weak_feature_idx=np.array(weak_feature_idx, np.uint16),
        weak_left_val=np.array(weak_left, np.float32),
        weak_right_val=np.array(weak_right, np.float32),
        weak_subset_offset=np.array(subset_offset, np.uint16),
        weak_num_subsets=np.array(subset_count, np.uint16),
        subsets=np.array(subsets, np.int32),
        stage_weak_start=np.array(stage_start, np.uint16),
        stage_nweaks=np.array(stage_nweaks, np.uint16),
        stage_threshold=np.array(stage_threshold, np.float32),
    )
