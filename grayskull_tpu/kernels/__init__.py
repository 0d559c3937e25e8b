"""Pallas TPU kernels for the hot paths."""

from .preproc import fused_blur_hist, fused_threshold_sobel, preproc_available  # noqa: F401

__all__ = ["fused_blur_hist", "fused_threshold_sobel", "preproc_available"]
