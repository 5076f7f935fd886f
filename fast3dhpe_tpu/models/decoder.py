"""Deconvolutional heatmap decoder.

[ref: models/decoder.py] 3 x (ConvTranspose2d k4 s2 p1 + BN + ReLU):
C_in -> 256 -> 256 -> 256, spatial x8 (8x8 -> 64x64), then a 1x1 conv to
NUM_JOINTS heatmap channels. Init matches the reference's init_weights
(normal std=0.001 deconvs, zero-bias final conv)
[ref: models/decoder.py:48-73].
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import conv2d, batch_norm, ConvTranspose2dTorch


class PoseDecoder(nn.Module):
    num_joints: int
    num_deconv_filters: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, bn_mask=None):
        x = x.astype(self.dtype)
        for i in (1, 2, 3):
            x = ConvTranspose2dTorch(
                features=self.num_deconv_filters,
                dtype=self.dtype, name=f"deconv{i}")(x)
            x = batch_norm(train, f"deconv{i}_bn", self.dtype)(
                x, mask=bn_mask)
            x = nn.relu(x)
        x = conv2d(self.num_joints, 1, 1, 0, "final_layer", self.dtype,
                   use_bias=True,
                   kernel_init=nn.initializers.normal(stddev=0.001))(x)
        return x
