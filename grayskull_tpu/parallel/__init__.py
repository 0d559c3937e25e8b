"""Multi-chip scaling: mesh construction, sharded batch ops, spatial sharding
with ICI halo exchange.

The reference is single-threaded scalar C with no concurrency anywhere; these
are the TPU-native parallel axes designed for this framework (SURVEY.md §2.3):

* **data** — frame batches sharded across chips (embarrassingly parallel);
* **space** — the H axis of large frames sharded across chips, with
  ``lax.ppermute`` halo exchanges sized to each stencil's radius and ``psum``
  reductions for global statistics (histograms/Otsu).
"""

from .mesh import make_mesh  # noqa: F401
from .halo import bottom_halo, exchange_halo  # noqa: F401
from .sharded import (  # noqa: F401
    integral_sharded,
    match_template_sharded,
    scan_sharded,
    preprocess_sharded,
    preprocess_spatial_shardmap,
)
from .sparse import (  # noqa: F401
    blobs_sharded,
    detect_faces_sharded,
    label_components_sharded,
    lbp_detect_sharded,
    match_orb_sharded,
    orb_extract_spatial,
    scan_spatial_shardmap,
)

__all__ = [
    "make_mesh",
    "bottom_halo",
    "exchange_halo",
    "integral_sharded",
    "match_template_sharded",
    "scan_sharded",
    "preprocess_sharded",
    "preprocess_spatial_shardmap",
    "blobs_sharded",
    "detect_faces_sharded",
    "label_components_sharded",
    "match_orb_sharded",
    "orb_extract_spatial",
    "scan_spatial_shardmap",
    "lbp_detect_sharded",
]
