"""ResNet feature encoder (18/34/50/101/152), NHWC, flax.linen.

TPU-first re-design of the reference encoder [ref: models/encoder.py]:
NHWC layout for MXU-friendly convolutions, configurable compute dtype
(bf16 with fp32 params/accumulation), and batch-stat handling that is
sync-BN under a global-view pjit program.

Known deviation, deliberate: the reference's BasicBlock applies its stride
to BOTH 3x3 convs [ref: models/encoder.py:9-14], which makes the residual
addition shape-mismatch and crash for any strided BasicBlock stage — i.e.
the reference's ResNet-18/34 configs are dead/broken code (only Bottleneck
depths 50/101/152 are usable there). We implement the canonical BasicBlock
(stride on the first conv only) so depths 18/34 actually work.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import conv2d, batch_norm, max_pool_torch

# depth -> (block type, per-stage block counts) [ref: models/encoder.py:83-87]
RESNET_SPEC = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}

BASIC_EXPANSION = 1
BOTTLENECK_EXPANSION = 4


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block. [ref: models/encoder.py:4-35, corrected]"""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = conv2d(self.planes, 3, self.stride, 1, "conv1", self.dtype)(x)
        out = batch_norm(train, "bn1", self.dtype)(out)
        out = nn.relu(out)
        out = conv2d(self.planes, 3, 1, 1, "conv2", self.dtype)(out)
        out = batch_norm(train, "bn2", self.dtype)(out)
        if self.downsample:
            residual = conv2d(self.planes * BASIC_EXPANSION, 1, self.stride,
                              0, "downsample_conv", self.dtype)(x)
            residual = batch_norm(train, "downsample_bn", self.dtype)(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) residual block.
    [ref: models/encoder.py:38-76]"""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = conv2d(self.planes, 1, 1, 0, "conv1", self.dtype)(x)
        out = batch_norm(train, "bn1", self.dtype)(out)
        out = nn.relu(out)
        out = conv2d(self.planes, 3, self.stride, 1, "conv2", self.dtype)(out)
        out = batch_norm(train, "bn2", self.dtype)(out)
        out = nn.relu(out)
        out = conv2d(self.planes * BOTTLENECK_EXPANSION, 1, 1, 0,
                     "conv3", self.dtype)(out)
        out = batch_norm(train, "bn3", self.dtype)(out)
        if self.downsample:
            residual = conv2d(self.planes * BOTTLENECK_EXPANSION, 1,
                              self.stride, 0, "downsample_conv", self.dtype)(x)
            residual = batch_norm(train, "downsample_bn", self.dtype)(residual)
        return nn.relu(out + residual)


class ResNetEncoder(nn.Module):
    """ResNet backbone: (B, H, W, 3) -> (B, H/32, W/32, C_out).

    C_out = 512 * expansion (2048 for depths >= 50).
    [ref: models/encoder.py:79-131]
    """
    num_layers: int = 101
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_name, stage_sizes = RESNET_SPEC[self.num_layers]
        block_cls = BasicBlock if block_name == "basic" else Bottleneck
        expansion = (BASIC_EXPANSION if block_name == "basic"
                     else BOTTLENECK_EXPANSION)

        x = x.astype(self.dtype)
        x = conv2d(64, 7, 2, 3, "conv1", self.dtype)(x)
        x = batch_norm(train, "bn1", self.dtype)(x)
        x = nn.relu(x)
        x = max_pool_torch(x, 3, 2, 1)

        inplanes = 64
        for stage, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), stage_sizes), start=1):
            stride = 1 if stage == 1 else 2
            for i in range(blocks):
                s = stride if i == 0 else 1
                downsample = (i == 0 and
                              (s != 1 or inplanes != planes * expansion))
                x = block_cls(planes=planes, stride=s, downsample=downsample,
                              dtype=self.dtype,
                              name=f"layer{stage}_{i}")(x, train=train)
                inplanes = planes * expansion
        return x
