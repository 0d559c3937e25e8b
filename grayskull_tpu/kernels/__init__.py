"""Pallas TPU kernels for the hot paths.

Each module pairs with an ``ops``/``pipelines`` dispatcher that gates on
backend + geometry and falls back to the XLA formulation elsewhere:

* :mod:`.preproc` — fused blur + MXU nibble histogram, threshold + sobel
* :mod:`.integral` — single-pass integral image (triangular MXU scans)
* :mod:`.fast` — FAST-9 scoremap + NMS + packed scan-order corner keys
* :mod:`.lbp` — full-cascade LBP evaluation over window strips, any stride
* :mod:`.ccl` — serpentine-strip connected components (VMEM fixpoints)
* :mod:`.warp` — gather-free quad-warp corner sampler (one-hot selects)
* :mod:`.patches` — keypoint 48x48 patch extractor (window one-hot selects)
* :mod:`.resize` — fused bilinear resize (band one-hot sampler, in-kernel lerp)
"""

from .ccl import ccl_pallas_available, ccl_serpentine  # noqa: F401
from .fast import (fast_pallas, fast_pallas_available,  # noqa: F401
                   fast_pallas_compact, fast_pallas_lean)
from .integral import integral_pallas, integral_pallas_available  # noqa: F401
from .lbp import lbp_eval_scale, lbp_pad_for, lbp_pallas_available  # noqa: F401
from .patches import extract_patches_batched, patches_pallas_available  # noqa: F401
from .preproc import (adaptive_pallas, blur_pallas, filter3_pallas,  # noqa: F401
                      fused_blur_hist, fused_threshold_sobel, morph_pallas,
                      preproc_available, sobel_pallas, stencil_available)
from .resize import resize_pallas, resize_pallas_available  # noqa: F401
from .warp import quad_sample, quad_sample_available  # noqa: F401

__all__ = [
    "ccl_pallas_available",
    "ccl_serpentine",
    "extract_patches_batched",
    "fast_pallas",
    "fast_pallas_available",
    "fast_pallas_compact",
    "fast_pallas_lean",
    "fused_blur_hist",
    "fused_threshold_sobel",
    "integral_pallas",
    "integral_pallas_available",
    "lbp_eval_scale",
    "lbp_pad_for",
    "lbp_pallas_available",
    "patches_pallas_available",
    "preproc_available",
    "stencil_available",
    "blur_pallas",
    "adaptive_pallas",
    "sobel_pallas",
    "morph_pallas",
    "filter3_pallas",
    "quad_sample",
    "quad_sample_available",
    "resize_pallas",
    "resize_pallas_available",
]
