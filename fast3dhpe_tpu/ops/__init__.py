"""Device-side ops: heatmap processing, warping, occlusion augmentation.

These are the operations the reference performs per-sample on the host CPU
(cv2/numpy) or with per-joint Python loops (torch); here they are batched,
jit-compiled XLA/Pallas programs.
"""

from .heatmap import (  # noqa: F401
    soft_argmax,
    hard_argmax,
    render_gaussian_heatmaps,
)
from .warp import affine_warp  # noqa: F401
from .occlusion import cutout, hide_n_seek  # noqa: F401
