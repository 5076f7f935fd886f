"""Heatmap encode/decode ops.

- soft_argmax: spatial softmax + center of mass, the differentiable keypoint
  decode in CDRNet's hot path [ref: models/cdrnet.py:120-149].
- hard_argmax: argmax decode used by the naive baseline and PCK metric
  [ref: tools/utils.py:30-58].
- render_gaussian_heatmaps: training-target generation; the reference
  renders per-joint windows on the host with numpy [ref: dataset/base.py:100-158],
  here the full (B, J) batch is one broadcast jnp expression on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def soft_argmax(heatmaps):
    """Spatial softmax + center of mass. [ref: models/cdrnet.py:120-149]

    Args:
      heatmaps: (..., H, W, J) raw (pre-softmax) heatmaps, NHWC-style.
    Returns:
      (..., J, 2) expected (x, y) coordinates in heatmap pixels.
    """
    *lead, H, W, J = heatmaps.shape
    flat = heatmaps.reshape(*lead, H * W, J)
    flat = flat - jax.lax.stop_gradient(jnp.max(flat, axis=-2, keepdims=True))
    p = jnp.exp(flat)
    p = p / jnp.sum(p, axis=-2, keepdims=True)
    p = p.reshape(*lead, H, W, J)

    xs = jnp.arange(W, dtype=p.dtype)
    ys = jnp.arange(H, dtype=p.dtype)
    cx = jnp.einsum("...hwj,w->...j", p, xs)
    cy = jnp.einsum("...hwj,h->...j", p, ys)
    return jnp.stack([cx, cy], axis=-1)


@jax.jit
def hard_argmax(heatmaps):
    """Argmax heatmap decode. [ref: tools/utils.py:30-58]

    Args:
      heatmaps: (..., H, W, J).
    Returns:
      preds: (..., J, 2) (x, y) of the max; zeroed where max <= 0
        (matching the reference's pred_mask).
      maxvals: (..., J) the max values.
    """
    *lead, H, W, J = heatmaps.shape
    flat = heatmaps.reshape(*lead, H * W, J)
    idx = jnp.argmax(flat, axis=-2)                     # (..., J), y*W + x
    maxvals = jnp.max(flat, axis=-2)
    x = (idx % W).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / W)
    preds = jnp.stack([x, y], axis=-1)
    mask = (maxvals > 0.0).astype(jnp.float32)[..., None]
    return preds * mask, maxvals


@partial(jax.jit, static_argnames=("heatmap_size", "image_size", "sigma"))
def render_gaussian_heatmaps(joints, joints_vis, heatmap_size, image_size,
                             sigma: int = 3):
    """Render unnormalized gaussian target heatmaps + target weights.

    Vectorized parity implementation of BaseDataset.generate_target
    [ref: dataset/base.py:100-158], including its quirks:
      * mu = int(x / stride + 0.5) with python int() truncation toward zero;
      * the gaussian is written only inside the (6*sigma+1)^2 window around
        mu (values outside are exactly 0 even though exp() is tiny);
      * target_weight is zeroed (and no gaussian drawn) when the window lies
        entirely outside the heatmap.

    Args:
      joints: (..., J, 2+) joint positions in *image* pixels.
      joints_vis: (..., J) or (..., J, 1+) visibility (first column used).
      heatmap_size: (W_hm, H_hm) — width first, as in the reference config.
      image_size: (W_img, H_img).
      sigma: gaussian sigma in heatmap pixels.
    Returns:
      target: (..., H_hm, W_hm, J) heatmaps (NHWC-style).
      target_weight: (..., J) 0/1 weights.
    """
    W_hm, H_hm = heatmap_size
    W_img, H_img = image_size
    stride_x = W_img / W_hm
    stride_y = H_img / H_hm
    tmp_size = sigma * 3

    joints = jnp.asarray(joints, jnp.float32)
    vis = jnp.asarray(joints_vis, jnp.float32)
    if vis.ndim == joints.ndim:          # (..., J, C) -> first column
        vis = vis[..., 0]

    # int() truncation toward zero, like the reference's int(x/stride + 0.5)
    mu_x = jnp.trunc(joints[..., 0] / stride_x + 0.5)
    mu_y = jnp.trunc(joints[..., 1] / stride_y + 0.5)

    # window bounds [ref: base.py:119-128]
    ul_x, ul_y = mu_x - tmp_size, mu_y - tmp_size
    br_x, br_y = mu_x + tmp_size + 1, mu_y + tmp_size + 1
    out_of_bounds = ((ul_x >= W_hm) | (ul_y >= H_hm) | (br_x < 0) | (br_y < 0))

    weight = jnp.where(out_of_bounds, 0.0, vis)

    xs = jnp.arange(W_hm, dtype=jnp.float32)
    ys = jnp.arange(H_hm, dtype=jnp.float32)
    # (..., J, H, W) distances from the integer center
    dx = xs[None, :] - mu_x[..., None, None]            # (..., J, 1, W)
    dy = ys[:, None] - mu_y[..., None, None]            # (..., J, H, 1)
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    in_window = (jnp.abs(dx) <= tmp_size) & (jnp.abs(dy) <= tmp_size)
    g = jnp.where(in_window, g, 0.0)
    g = g * (weight[..., None, None] > 0.5)

    # (..., J, H, W) -> (..., H, W, J)
    target = jnp.moveaxis(g, -3, -1)
    return target, weight
