"""Host-side utilities: logging, plotting, GIF rendering."""

from .logging import setup_logger  # noqa: F401
from .runtime import enable_compilation_cache  # noqa: F401
from .visualize import (  # noqa: F401
    plot_pose_2d, plot_pose_3d, plot_loss, save_gif, MADS_CONNECTIONS)
