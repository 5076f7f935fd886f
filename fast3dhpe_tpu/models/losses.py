"""Loss functions as pure, fully-vectorized jnp functions.

The reference implements these as nn.Modules with per-joint Python loops
[ref: models/loss.py]; since every joint contributes a mean of the same
size, sum-over-joints / num_joints equals one global mean — the loops
collapse into single fused reductions.

All three accept:
  pred, target: (B, J, ...) — heatmaps (B, J, H, W)/(B, H, W, J) for the MSE
    losses, or coordinates (B, J, D) for the smooth/MPJPE losses, matching
    how the reference training loops call them.
  target_weight: (B, J) or (B, J, 1) per-joint weights, multiplied into
    both pred and target exactly as the reference does.
"""

from __future__ import annotations

import jax.numpy as jnp


def _apply_weight(pred, target, target_weight):
    if target_weight is None:
        return pred, target
    w = jnp.asarray(target_weight)
    # normalize to (B, J, 1, ..., 1) broadcastable over trailing dims
    w = w.reshape(w.shape[0], w.shape[1], *([1] * (pred.ndim - 2)))
    return pred * w, target * w


def _as_bj_first(x, layout):
    """Accept either (B, J, H, W) or NHWC (B, H, W, J) heatmaps."""
    if layout == "NHWC":
        return jnp.moveaxis(x, -1, 1)
    return x


def joints_mse_loss(pred, target, target_weight=None, layout="BJHW"):
    """0.5 * MSE averaged over joints. [ref: models/loss.py:5-31]"""
    pred = _as_bj_first(jnp.asarray(pred), layout)
    target = _as_bj_first(jnp.asarray(target), layout)
    pred = pred.reshape(pred.shape[0], pred.shape[1], -1)
    target = target.reshape(target.shape[0], target.shape[1], -1)
    pred, target = _apply_weight(pred, target, target_weight)
    return 0.5 * jnp.mean((pred - target) ** 2)


def joints_mse_smooth_loss(pred, target, target_weight=None,
                           threshold: float = 400.0, layout="BJHW"):
    """Squared error with soft clamping of large residuals.
    [ref: models/loss.py:34-67]

    diff^2 values above `threshold` are compressed to
    (diff^2)^0.1 * threshold^0.9.
    """
    pred = _as_bj_first(jnp.asarray(pred), layout)
    target = _as_bj_first(jnp.asarray(target), layout)
    pred, target = _apply_weight(pred, target, target_weight)
    diff = (pred - target) ** 2
    compressed = jnp.power(jnp.maximum(diff, 1e-30), 0.1) * threshold ** 0.9
    diff = jnp.where(diff > threshold, compressed, diff)
    return jnp.mean(diff)


def mpjpe_loss(pred, target, target_weight=None):
    """Mean per-joint position error. [ref: models/loss.py:70-98]

    pred/target: (B, J, D) coordinates. Per-joint euclidean distance
    sqrt(sum_d diff^2 + 1e-15), averaged over batch and joints.
    """
    pred = jnp.asarray(pred)
    target = jnp.asarray(target)
    pred, target = _apply_weight(pred, target, target_weight)
    d = jnp.sqrt(jnp.sum((pred - target) ** 2, axis=-1) + 1e-15)
    return jnp.mean(d)


def make_loss(loss_type: str, use_target_weight: bool, layout="BJHW"):
    """Loss factory mirroring the reference dispatch [ref: train.py:53-60].

    Returns fn(pred, target, target_weight, sample_mask=None) -> scalar.

    sample_mask: optional (B,) 0/1 per-row validity. The loaders pad the
    final partial batch (static shapes for jit); masked rows contribute
    zero residual and the mean is renormalized to the VALID rows only, so
    the result equals the reference's mean over its smaller final batch
    [ref: train.py:84-107 iterates un-padded torch batches]. Under a
    data-parallel mesh the mask is batch-sharded with the rest of the
    batch, so sum(mask) is the GLOBAL valid count and the normalization
    stays exact across hosts.
    """
    def wrap(fn):
        def call(pred, target, target_weight=None, sample_mask=None):
            tw = target_weight if use_target_weight else None
            if sample_mask is None:
                return fn(pred, target, tw)
            m = jnp.asarray(sample_mask, jnp.float32)       # (B,)
            if tw is None:
                tw_m = m[:, None]                           # (B, 1) broadcasts
            else:
                tw_a = jnp.asarray(tw)
                tw_m = tw_a * m.reshape((-1,) + (1,) * (tw_a.ndim - 1))
            scale = m.shape[0] / jnp.maximum(jnp.sum(m), 1.0)
            return fn(pred, target, tw_m) * scale
        return call

    if loss_type == "JointsMSE":
        return wrap(lambda p, t, w: joints_mse_loss(p, t, w, layout=layout))
    if loss_type == "JointsMSESmooth":
        return wrap(lambda p, t, w: joints_mse_smooth_loss(p, t, w,
                                                           layout=layout))
    if loss_type == "MPJPE":
        return wrap(mpjpe_loss)
    raise NotImplementedError(f"Unknown loss type {loss_type!r}")
