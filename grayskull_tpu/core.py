"""Core types and array conventions for grayskull-tpu.

The reference library (``/root/reference/grayskull.h:14-64``) models an image as a
caller-owned row-major ``uint8`` buffer with ``w, h`` dims, and returns sparse results
(blobs, keypoints, matches, detections) through caller-provided fixed-size C arrays.

The TPU-native equivalents:

* An image is a ``jnp.uint8`` array of shape ``(H, W)`` (single frame) or ``(N, H, W)``
  (a batch).  All ops are pure functions; batched execution is ``jax.vmap`` over the
  leading axis (see :func:`batched`).
* Sparse results are fixed-capacity struct-of-array tables with an explicit valid
  count — mirroring the reference's silent capacity saturation (e.g. keypoint caps at
  ``grayskull.h:530``, blob label caps at ``grayskull.h:348``, detection caps at
  ``grayskull.h:819-823``) but with static shapes so everything jits.

Coordinate convention matches the reference: ``x`` is the column (fast axis), ``y``
the row.  A ``Rect`` is ``(x, y, w, h)`` like ``gs_rect`` (grayskull.h:19-22).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Rect",
    "Point",
    "Blobs",
    "Keypoints",
    "Matches",
    "Rects",
    "Contour",
    "MAX_LABELS",
    "as_image",
    "is_batched",
    "batched",
    "on_tpu",
]

# gs_label is uint16 in the reference (grayskull.h:27); label 0 is background.
MAX_LABELS = 65535


def on_tpu() -> bool:
    """True when jitted code will actually execute on a TPU.

    The single dispatch gate for every Pallas / MXU-shaped fast path
    (blobs, integral, features, histogram, lbp, preproc).  Checks both the
    backend AND the default device: with a TPU present but
    ``jax_default_device`` pinned to CPU (the test suite does this), jitted
    code runs on CPU and the TPU-shaped formulations must not be selected.
    """
    default_dev = jax.config.jax_default_device
    return jax.default_backend() == "tpu" and (
        default_dev is None or getattr(default_dev, "platform", "tpu") == "tpu"
    )


class Rect(NamedTuple):
    """``gs_rect`` (grayskull.h:19-22): x, y, w, h (ints or int arrays)."""

    x: Any
    y: Any
    w: Any
    h: Any


class Point(NamedTuple):
    """``gs_point`` (grayskull.h:23-26)."""

    x: Any
    y: Any


class Blobs(NamedTuple):
    """Fixed-capacity blob table — ``gs_blob[]`` (grayskull.h:29-34) as struct-of-arrays.

    ``n`` is the number of valid rows (rows ``[0, n)`` are valid, in the reference's
    compaction order).  ``label`` reproduces the reference's creation-order label
    numbering (see ops/blobs.py).
    """

    n: jnp.ndarray  # () int32 — number of valid blobs
    label: jnp.ndarray  # (cap,) int32
    area: jnp.ndarray  # (cap,) int32
    box: Rect  # each (cap,) int32
    centroid: Point  # each (cap,) int32


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint table — ``gs_keypoint[]`` (grayskull.h:42-47)."""

    n: jnp.ndarray  # () int32
    x: jnp.ndarray  # (cap,) int32
    y: jnp.ndarray  # (cap,) int32
    response: jnp.ndarray  # (cap,) int32
    angle: jnp.ndarray  # (cap,) float32
    descriptor: jnp.ndarray  # (cap, 8) uint32


class Matches(NamedTuple):
    """Fixed-capacity match table — ``gs_match[]`` (grayskull.h:49-52)."""

    n: jnp.ndarray  # () int32
    idx1: jnp.ndarray  # (cap,) int32
    idx2: jnp.ndarray  # (cap,) int32
    distance: jnp.ndarray  # (cap,) int32


class Rects(NamedTuple):
    """Fixed-capacity rect table (LBP detections — grayskull.h:815-835)."""

    n: jnp.ndarray  # () int32
    x: jnp.ndarray  # (cap,) int32
    y: jnp.ndarray  # (cap,) int32
    w: jnp.ndarray  # (cap,) int32
    h: jnp.ndarray  # (cap,) int32


class Contour(NamedTuple):
    """``gs_contour`` (grayskull.h:36-40) result plus the visited mask."""

    box: Rect  # scalars int32
    start: Point  # scalars int32
    length: jnp.ndarray  # () int32
    visited: jnp.ndarray  # (H, W) uint8 mask (255 on contour)


def as_image(x) -> jnp.ndarray:
    """Coerce input to a uint8 image array of shape (H, W) or (N, H, W)."""
    arr = jnp.asarray(x)
    if arr.dtype != jnp.uint8:
        raise TypeError(f"grayskull-tpu images are uint8, got {arr.dtype}")
    if arr.ndim not in (2, 3):
        raise ValueError(f"expected (H, W) or (N, H, W) image, got shape {arr.shape}")
    return arr


def is_batched(img) -> bool:
    return jnp.ndim(img) == 3


def batched(fn, in_axes=0):
    """vmap helper: lift a single-image op to batches when the input is (N, H, W).

    Usage::

        @batched
        def op(img, ...): ...   # written for (H, W)

    The wrapper dispatches on ndim so the same callable serves both layouts.
    """

    @functools.wraps(fn)
    def wrapper(img, *args, **kwargs):
        if jnp.ndim(img) == 3:
            return jax.vmap(lambda im: fn(im, *args, **kwargs))(img)
        return fn(img, *args, **kwargs)

    return wrapper


@dataclasses.dataclass(frozen=True)
class LbpCascade:
    """``gs_lbp_cascade`` (grayskull.h:54-64) as host-side numpy arrays.

    All arrays are static data (hashable via id) so a cascade can close over a jitted
    detector.  Layout mirrors the reference's flat arrays:

    * ``features``: (nfeatures, 4) int8  — x, y, w, h of the LBP block grid origin cell
    * ``weak_feature_idx``: (nweaks,) uint16
    * ``weak_left_val`` / ``weak_right_val``: (nweaks,) float32
    * ``weak_subset_offset`` / ``weak_num_subsets``: (nweaks,) uint16
    * ``subsets``: (total_subsets,) int32 bitmasks
    * ``stage_weak_start`` / ``stage_nweaks``: (nstages,) uint16
    * ``stage_threshold``: (nstages,) float32
    """

    window_w: int
    window_h: int
    features: np.ndarray
    weak_feature_idx: np.ndarray
    weak_left_val: np.ndarray
    weak_right_val: np.ndarray
    weak_subset_offset: np.ndarray
    weak_num_subsets: np.ndarray
    subsets: np.ndarray
    stage_weak_start: np.ndarray
    stage_nweaks: np.ndarray
    stage_threshold: np.ndarray

    @property
    def nfeatures(self) -> int:
        return len(self.features)

    @property
    def nweaks(self) -> int:
        return len(self.weak_feature_idx)

    @property
    def nstages(self) -> int:
        return len(self.stage_threshold)

    def __hash__(self):  # static-arg friendly
        return hash((self.window_w, self.window_h, self.nfeatures, self.nweaks, self.nstages))

    def __eq__(self, other):
        return self is other
