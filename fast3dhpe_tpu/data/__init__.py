"""Data pipeline: index builders, host loaders, device preprocessing, ETL.

Split of responsibilities (vs. the reference's per-sample host cv2 work in
DataLoader workers [ref: tools/load.py:118-132]):
  - index builders (host): glob + JSON parsing -> numpy record lists
  - host loader threads: JPEG decode + tiny per-sample affine params
  - device pipeline: batched warp, occlusion, normalization and target
    rendering fused under one jit
"""

from .mads import (  # noqa: F401
    build_mads_index,
    build_mads_stereo_index,
    MADS_FLIP_PAIRS,
    MADS_PARENT_IDS,
)
from .mpii import build_mpii_index, MPII_FLIP_PAIRS  # noqa: F401
from .loader import Stereo3DLoader, Mono2DLoader, load_data  # noqa: F401
from .stream import LoadMADSData  # noqa: F401
