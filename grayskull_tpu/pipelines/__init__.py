"""L4 pipelines: compositions matching the reference's example applications."""

from .scan import scan, preprocess_binarize  # noqa: F401

__all__ = ["scan", "preprocess_binarize"]
