"""Op layer: batched, jit-friendly equivalents of every ``gs_*`` kernel."""

from .pixel import (  # noqa: F401
    BLUR_BOX_KERNEL,
    BLUR_GAUSSIAN_KERNEL,
    EMBOSS_KERNEL,
    SHARPEN_KERNEL,
    adaptive_threshold,
    blur,
    blur_box,
    blur_gaussian,
    copy,
    crop,
    dilate,
    downsample,
    emboss,
    erode,
    filter2d,
    resize,
    resize_nn,
    sharpen,
    sobel,
    threshold,
)
from .histogram import histogram, otsu_threshold  # noqa: F401
from .blobs import blob_corners, blobs, label_components  # noqa: F401
from .contour import trace_contour  # noqa: F401
from .integral import integral, integral_sum  # noqa: F401
from .template import find_best_match, match_template  # noqa: F401
from .warp import perspective_correct  # noqa: F401

__all__ = [
    "blob_corners",
    "blobs",
    "label_components",
    "trace_contour",
    "find_best_match",
    "integral",
    "integral_sum",
    "match_template",
    "perspective_correct",
    "BLUR_BOX_KERNEL",
    "BLUR_GAUSSIAN_KERNEL",
    "EMBOSS_KERNEL",
    "SHARPEN_KERNEL",
    "adaptive_threshold",
    "blur",
    "blur_box",
    "blur_gaussian",
    "copy",
    "crop",
    "dilate",
    "downsample",
    "emboss",
    "erode",
    "filter2d",
    "histogram",
    "otsu_threshold",
    "resize",
    "resize_nn",
    "sharpen",
    "sobel",
    "threshold",
]
