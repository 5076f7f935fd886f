"""Int8 quantization primitives for the serving path.

The int8 MXU probe (scripts/int8_probe.py, docs/PERFORMANCE.md) measured
that XLA lowers int8 convs with ``preferred_element_type=int32`` onto the
v5e's quantized MXU path for real: 246 TOP/s on a 4096 matmul (above the
197 TFLOP/s bf16 *peak*) and 1.4-1.7x end-to-end at CDRNet conv shapes,
requant epilogue included. These helpers are the building blocks the
quantized model walkers (models/quantized.py) are assembled from.

Scheme (standard TPU-serving PTQ):
- weights: per-output-channel symmetric int8, BN folded in first;
- activations: per-tensor symmetric int8, scale calibrated offline
  (max-abs over calibration batches, optional percentile clip);
- accumulation: int32 (``preferred_element_type``), dequant + bias +
  ReLU + requant ride the conv epilogue (XLA fuses the elementwise
  tail into the conv — the probe's measured ratios include it).

Zero-points are always 0 (symmetric), so torch-style zero padding in
convs pads with the true zero and ReLU commutes with (de)quantization.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

INT8_MAX = 127.0


def fold_bn(kernel, scale, bias, mean, var, eps: float = 1e-5,
            out_axis: int = -1):
    """Fold inference-mode BatchNorm into the preceding conv.

    y = g*(conv(x) - mean)/sqrt(var+eps) + beta  ==  conv'(x) + b' with
    conv' = conv * (g/sqrt(var+eps)) per output channel.

    Args:
      kernel: conv kernel; ``out_axis`` indexes its output-channel axis
        (-1 for HWIO convs, 2 for the (kh, kw, O, I) transposed kernels).
    Returns:
      (folded_kernel, folded_bias) — bias is (K,) fp32.
    """
    g = (scale / jnp.sqrt(var + eps)).astype(jnp.float32)
    shape = [1] * kernel.ndim
    shape[out_axis] = -1
    return (kernel.astype(jnp.float32) * g.reshape(shape),
            (bias - mean * g).astype(jnp.float32))


def quantize_kernel(kernel, out_axis: int = -1):
    """Per-output-channel symmetric int8 weight quantization.

    Returns (q_int8, scale) with scale shaped (K,); all-zero channels
    get scale 1 to avoid divide-by-zero (their q is all-zero anyway).
    """
    kernel = kernel.astype(jnp.float32)
    axes = tuple(i for i in range(kernel.ndim)
                 if i != out_axis % kernel.ndim)
    amax = jnp.max(jnp.abs(kernel), axis=axes)
    s = jnp.where(amax > 0, amax / INT8_MAX, 1.0).astype(jnp.float32)
    shape = [1] * kernel.ndim
    shape[out_axis] = -1
    q = jnp.clip(jnp.round(kernel / s.reshape(shape)),
                 -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, s


def requant(y_fp, s_out):
    """fp -> int8 at per-tensor scale s_out (symmetric, round-to-even)."""
    return jnp.clip(jnp.round(y_fp / s_out),
                    -INT8_MAX, INT8_MAX).astype(jnp.int8)


def dequant(x8, s):
    return x8.astype(jnp.float32) * s


def conv_i8(x8, w8, stride: int = 1, pad: int = 0):
    """int8 x int8 -> int32 NHWC conv with torch-style symmetric padding."""
    dn = lax.conv_dimension_numbers(x8.shape, w8.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x8, w8, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=dn, preferred_element_type=jnp.int32)


def conv_transpose_i8(x8, w8, stride: int = 2, pad: int = 1):
    """int8 ConvTranspose2d(k, s, p) with exact torch semantics.

    Mirrors models/layers.ConvTranspose2dTorch: kernel stored
    (kh, kw, O, I), transpose_kernel=True, per-side padding k-1-p.
    """
    kh, kw = w8.shape[0], w8.shape[1]
    ph, pw = kh - 1 - pad, kw - 1 - pad
    return lax.conv_transpose(
        x8, w8, (stride, stride), ((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
        preferred_element_type=jnp.int32)


def max_pool_i8(x8, window: int = 3, stride: int = 2, padding: int = 1):
    """MaxPool2d on int8. Padding value -128 never beats a real cell
    (torch pads with -inf); post-ReLU inputs are >= 0 anyway."""
    return lax.reduce_window(
        x8, jnp.int8(-128), lax.max, (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)))


def abs_stat(t, percentile=None):
    """Calibration statistic of |t|: max-abs, or an upper quantile to
    clip activation outliers (percentile in (0, 100])."""
    a = jnp.abs(t.astype(jnp.float32))
    if percentile is None or percentile >= 100:
        return jnp.max(a)
    return jnp.quantile(a.reshape(-1), percentile / 100.0)
