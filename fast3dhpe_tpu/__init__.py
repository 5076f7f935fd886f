"""fast3dhpe_tpu — TPU-native stereo 3D human pose estimation framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of
eddie0509tw/Fast-3D-Human-Pose-Estimation (reference mounted at
/root/reference):

- PoseResNet (ResNet encoder + deconv decoder) 2D heatmap network
- CDRNet: camera-disentangled multi-view fusion (FTL) + soft-argmax +
  differentiable DLT triangulation, end-to-end trainable
- MADS stereo / MPII data pipelines with on-device preprocessing
- Data-parallel training over a `jax.sharding.Mesh`

Layout:
  geometry/  pure-jnp camera math (projection, triangulation, DLT/SII)
  ops/       device kernels (affine warp, soft-argmax, heatmap render, occlusion)
  models/    flax.linen networks, losses, metrics
  parallel/  mesh construction + sharding helpers
  data/      dataset index builders, host loader, ETL
  train/     optimizer, train loops, checkpointing (+ .pth import)
  apps/      CLI entry points mirroring the reference's scripts
"""

__version__ = "0.1.0"

from .config import load_config, config_from_dict, Config  # noqa: F401


def __getattr__(name):
    """Lazy top-level conveniences (avoid importing jax-heavy modules on
    bare `import fast3dhpe_tpu`)."""
    if name in ("PoseResNet", "CDRNet", "CanonicalFusion"):
        from . import models
        return getattr(models, name)
    if name in ("load_data", "LoadMADSData"):
        from . import data
        return getattr(data, name)
    if name == "make_mesh":
        from .parallel import make_mesh
        return make_mesh
    raise AttributeError(name)
