"""PoseResNet: the single-view 2D heatmap network (Simple Baselines).

[ref: models/poseresnet.py] encoder -> decoder; (B, 256, 256, 3) ->
(B, 64, 64, J) heatmaps. Encoder-only pretrained loading (decoder re-init)
is handled by the checkpoint importer (train/checkpoint.py), mirroring
PoseResNet.init_weights [ref: models/poseresnet.py:23-38].
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .resnet import ResNetEncoder
from .decoder import PoseDecoder
from .layers import bn_row_mask


class PoseResNet(nn.Module):
    num_joints: int = 19
    num_layers: int = 101
    dtype: Any = jnp.float32
    # fuse bandwidth-bound eval-mode Bottlenecks into Pallas kernels
    fused_inference: bool = False
    # rematerialize encoder blocks in the backward pass (training
    # bandwidth lever — see docs/PERFORMANCE.md train-step roofline)
    remat: bool = False
    # None = full per-block recompute; "convs" = save conv outputs,
    # recompute only BN/ReLU chains (models/resnet.py remat_policy)
    remat_policy: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, row_valid=None):
        """row_valid: optional (B,) 0/1 — train-mode BN batch statistics
        are restricted to valid rows (padded loader rows excluded)."""
        mask = bn_row_mask(row_valid)
        features = ResNetEncoder(num_layers=self.num_layers,
                                 dtype=self.dtype,
                                 fused_inference=self.fused_inference,
                                 remat=self.remat,
                                 remat_policy=self.remat_policy,
                                 name="encoder")(x, train, mask)
        heatmaps = PoseDecoder(num_joints=self.num_joints,
                               dtype=self.dtype, name="decoder")(
            features, train, mask)
        return heatmaps

    @classmethod
    def from_config(cls, cfg, dtype=jnp.float32):
        return cls(num_joints=cfg.MODEL.NUM_JOINTS,
                   num_layers=cfg.MODEL.NUM_LAYERS, dtype=dtype)
