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

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
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
    def __call__(self, x, train: bool = False, bn_mask=None):
        # conv outputs carry a checkpoint_name so the selective remat
        # policy (ResNetEncoder.remat_policy="convs") can save exactly
        # them; a no-op under plain jit / full remat
        residual = x
        out = conv2d(self.planes, 3, self.stride, 1, "conv1", self.dtype)(x)
        out = checkpoint_name(out, "conv_out")
        out = batch_norm(train, "bn1", self.dtype)(out, mask=bn_mask)
        out = nn.relu(out)
        out = conv2d(self.planes, 3, 1, 1, "conv2", self.dtype)(out)
        out = checkpoint_name(out, "conv_out")
        out = batch_norm(train, "bn2", self.dtype)(out, mask=bn_mask)
        if self.downsample:
            residual = conv2d(self.planes * BASIC_EXPANSION, 1, self.stride,
                              0, "downsample_conv", self.dtype)(x)
            residual = checkpoint_name(residual, "conv_out")
            residual = batch_norm(train, "downsample_bn",
                                  self.dtype)(residual, mask=bn_mask)
        return nn.relu(out + residual)


def _bn(dtype):
    """BatchNorm2d(momentum=0.1 torch, eps=1e-5) with call-time mode."""
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=dtype,
                        param_dtype=jnp.float32)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) residual block.
    [ref: models/encoder.py:38-76]

    With fused_inference=True, eval-mode stride-1 bf16 blocks at
    bandwidth-bound shapes run as ONE Pallas kernel
    (ops/pallas_bottleneck.py) that keeps the whole block's activations
    in VMEM — the small-channel stages are HBM-bound under XLA (each conv
    round-trips its activations; see docs/PERFORMANCE.md). The parameter
    tree is identical either way (setup-style names match the round-1
    compact-style names), so checkpoints are interchangeable.
    """
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    fused_inference: bool = False

    def setup(self):
        self.conv1 = conv2d(self.planes, 1, 1, 0, None, self.dtype)
        self.bn1 = _bn(self.dtype)
        self.conv2 = conv2d(self.planes, 3, self.stride, 1, None, self.dtype)
        self.bn2 = _bn(self.dtype)
        self.conv3 = conv2d(self.planes * BOTTLENECK_EXPANSION, 1, 1, 0,
                            None, self.dtype)
        self.bn3 = _bn(self.dtype)
        if self.downsample:
            self.downsample_conv = conv2d(
                self.planes * BOTTLENECK_EXPANSION, 1, self.stride, 0,
                None, self.dtype)
            self.downsample_bn = _bn(self.dtype)

    def _fusable(self, x, train: bool) -> bool:
        if (not self.fused_inference or train or self.is_initializing()
                or self.stride != 1 or x.dtype != jnp.bfloat16):
            return False
        B, H, W, Cin = x.shape
        P = self.planes
        cout = P * BOTTLENECK_EXPANSION
        # per-cell VMEM (bf16): in/out double-buffered + patches + hidden
        vmem = 2 * H * W * (2 * Cin + 2 * cout + 9 * P + P)
        # only worthwhile where XLA is bandwidth-bound (large plane,
        # narrow channels); stage3/4 already run near peak natively
        return vmem < 13 * 2 ** 20 and H * W >= 1024

    def _fused(self, x):
        import jax
        from ..ops.pallas_bottleneck import fused_bottleneck, fold_bn
        p = self.variables["params"]
        st = self.variables["batch_stats"]

        def bn_fold(name):
            return fold_bn(p[name]["scale"], p[name]["bias"],
                           st[name]["mean"], st[name]["var"])

        s1, b1 = bn_fold("bn1")
        s2, b2 = bn_fold("bn2")
        s3, b3 = bn_fold("bn3")
        w1 = p["conv1"]["kernel"][0, 0]              # (Cin, P)
        w2 = p["conv2"]["kernel"]                    # (3, 3, P, P)
        w3 = p["conv3"]["kernel"][0, 0]              # (P, 4P)
        if self.downsample:
            wd = p["downsample_conv"]["kernel"][0, 0]
            sd, bd = bn_fold("downsample_bn")
        else:
            wd = sd = bd = None
        return fused_bottleneck(
            x, w1, s1, b1, w2, s2, b2, w3, s3, b3, wd, sd, bd,
            samples_per_cell=1,
            interpret=jax.default_backend() != "tpu")

    def __call__(self, x, train: bool = False, bn_mask=None):
        if self._fusable(x, train):
            return self._fused(x)
        residual = x
        out = checkpoint_name(self.conv1(x), "conv_out")
        out = self.bn1(out, use_running_average=not train, mask=bn_mask)
        out = nn.relu(out)
        out = checkpoint_name(self.conv2(out), "conv_out")
        out = self.bn2(out, use_running_average=not train, mask=bn_mask)
        out = nn.relu(out)
        out = checkpoint_name(self.conv3(out), "conv_out")
        out = self.bn3(out, use_running_average=not train, mask=bn_mask)
        if self.downsample:
            residual = checkpoint_name(self.downsample_conv(x), "conv_out")
            residual = self.downsample_bn(residual,
                                          use_running_average=not train,
                                          mask=bn_mask)
        return nn.relu(out + residual)


class ResNetEncoder(nn.Module):
    """ResNet backbone: (B, H, W, 3) -> (B, H/32, W/32, C_out).

    C_out = 512 * expansion (2048 for depths >= 50).
    [ref: models/encoder.py:79-131]
    """
    num_layers: int = 101
    dtype: Any = jnp.float32
    # fuse bandwidth-bound eval-mode Bottlenecks into Pallas kernels
    fused_inference: bool = False
    # rematerialize each residual block in the backward pass instead of
    # saving its activations — a bandwidth lever for the train step,
    # which runs at ~97% of the HBM roofline (docs/PERFORMANCE.md)
    remat: bool = False
    # with remat=True: None = recompute EVERYTHING from the block input
    # (measured +19% bytes accessed — recompute round-trips HBM, r3
    # anti-finding); "convs" = save the tagged conv outputs and
    # recompute only the BN/ReLU elementwise chains in backward (the
    # convs, the expensive part, are never re-run)
    remat_policy: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False, bn_mask=None):
        """bn_mask: optional (B, 1, 1, 1) bool — restricts train-mode BN
        batch statistics to valid rows (layers.bn_row_mask)."""
        block_name, stage_sizes = RESNET_SPEC[self.num_layers]
        is_bottleneck = block_name == "bottleneck"
        block_cls = Bottleneck if is_bottleneck else BasicBlock
        if self.remat:
            policy = None
            if self.remat_policy == "convs":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "conv_out")
            elif self.remat_policy is not None:
                raise ValueError(
                    f"unknown remat_policy {self.remat_policy!r}")
            # static_argnums counts (self, x, train) -> train is 2
            block_cls = nn.remat(block_cls, static_argnums=(2,),
                                 policy=policy)
        expansion = (BASIC_EXPANSION if block_name == "basic"
                     else BOTTLENECK_EXPANSION)

        x = x.astype(self.dtype)
        x = conv2d(64, 7, 2, 3, "conv1", self.dtype)(x)
        x = batch_norm(train, "bn1", self.dtype)(x, mask=bn_mask)
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
                kwargs = {}
                if is_bottleneck:   # NOT `block_cls is Bottleneck`:
                    # nn.remat rebinds block_cls to a wrapper class
                    kwargs["fused_inference"] = self.fused_inference
                x = block_cls(planes=planes, stride=s, downsample=downsample,
                              dtype=self.dtype,
                              name=f"layer{stage}_{i}", **kwargs)(
                    x, train, bn_mask)
                inplanes = planes * expansion
        return x
