"""Layer primitives with exact PyTorch-semantics parity.

The reference's networks are built from Conv2d / BatchNorm2d / ReLU /
MaxPool2d / ConvTranspose2d; these helpers pin down the JAX equivalents
(NHWC layouts, matching padding and transposed-conv semantics) so torch
checkpoints import bit-accurately.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def conv2d(features, kernel_size, strides=1, padding=0, name=None,
           dtype=jnp.float32, use_bias=False,
           kernel_init=nn.initializers.he_normal(),
           bias_init=nn.initializers.zeros_init()):
    """Conv2d(k, s, p, bias) with torch-style symmetric integer padding.

    Weight layout is flax-standard HWIO; the checkpoint importer transposes
    torch's OIHW (2, 3, 1, 0).
    """
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    if isinstance(strides, int):
        strides = (strides, strides)
    return nn.Conv(
        features=features,
        kernel_size=kernel_size,
        strides=strides,
        padding=((padding, padding), (padding, padding)),
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=kernel_init,
        bias_init=bias_init,
        name=name,
    )


def bn_row_mask(row_valid, ndim: int = 4):
    """(B,) 0/1 row-validity -> a BN `mask` broadcastable to an NHWC batch.

    Padded loader rows (batch["row_valid"] == 0, see train/steps.py) must
    not enter BatchNorm batch statistics: the loss and metrics already
    exclude them, and flax's BatchNorm accepts a `mask` that restricts the
    mean/var reductions the same way — matching the reference, whose torch
    DataLoader simply yields a smaller final batch. A degenerate all-invalid
    mask (possible only as a zero-record multi-host shard's LOCAL view; the
    global batch always has a valid row, and under pjit the BN reduction is
    global) falls back to the full batch instead of producing empty-set NaN
    statistics.
    """
    if row_valid is None:
        return None
    m = jnp.asarray(row_valid) > 0
    m = m | ~jnp.any(m)
    return m.reshape(m.shape + (1,) * (ndim - 1))


def batch_norm(train: bool, name=None, dtype=jnp.float32):
    """BatchNorm2d(momentum=0.1, eps=1e-5) over NHWC.

    flax momentum convention is (1 - torch momentum) [ref momentum 0.1:
    models/encoder.py:11]. Under a global-view pjit program the batch
    statistics are computed over the full global batch — cross-replica
    sync-BN for free, an upgrade over the reference's single-device BN.
    """
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class ConvTranspose2dTorch(nn.Module):
    """ConvTranspose2d(kernel, stride, padding) with exact torch semantics.

    torch's ConvTranspose2d is the gradient of Conv2d; the verified JAX
    equivalent is lax.conv_transpose with transpose_kernel=True and
    per-side spatial padding (k - 1 - p). The kernel parameter is stored as
    (kh, kw, O, I) = torch's (I, O, kh, kw) transposed (2, 3, 1, 0).

    [ref: models/decoder.py:23-37 uses k=4, s=2, p=1 throughout]
    """
    features: int
    kernel_size: Tuple[int, int] = (4, 4)
    strides: Tuple[int, int] = (2, 2)
    padding: int = 1
    dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.normal(stddev=0.001)

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init,
            (kh, kw, self.features, in_features), jnp.float32)
        pad_h = kh - 1 - self.padding
        pad_w = kw - 1 - self.padding
        return jax.lax.conv_transpose(
            x.astype(self.dtype), kernel.astype(self.dtype),
            strides=self.strides,
            padding=((pad_h, pad_h), (pad_w, pad_w)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
        )


def max_pool_torch(x, window: int = 3, stride: int = 2, padding: int = 1):
    """MaxPool2d(kernel, stride, padding) — pads with -inf like torch."""
    return nn.max_pool(
        x, (window, window), strides=(stride, stride),
        padding=((padding, padding), (padding, padding)))
