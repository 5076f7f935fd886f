"""Evaluation metrics as jit-safe jnp functions.

The reference computes PCK and MPJPE on the host with numpy per training
step [ref: models/metrics.py, called from train.py:99-100] — a device->host
sync every step. Here both metrics are jnp programs that run inside the
compiled step; only scalars cross the host boundary.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.heatmap import hard_argmax


def pck_counts(output, target, thr: float = 0.05, row_mask=None):
    """Per-joint PCK hit / valid counts — the accumulatable form.

    Summing (hits, cnt) over an epoch and finishing with pck_from_counts
    gives a per-SAMPLE-exact epoch accuracy (invariant to batch size and
    final-batch padding), unlike averaging per-batch accuracies.

    Args:
      output, target: (B, H, W, J) heatmaps (NHWC).
      row_mask: optional (B,) 0/1 validity — padded rows are excluded.
    Returns:
      hits: (J,) float32; cnt: (J,) float32; pred: (B, J, 2).
    """
    pred, _ = hard_argmax(output)
    gt, _ = hard_argmax(target)
    H, W = output.shape[-3], output.shape[-2]
    norm = jnp.array([H, W], jnp.float32) / 10.0

    valid = (gt[..., 0] > 1) & (gt[..., 1] > 1)          # (B, J)
    if row_mask is not None:
        valid = valid & (jnp.asarray(row_mask) > 0)[:, None]
    d = jnp.linalg.norm((pred - gt) / norm, axis=-1)     # (B, J)
    hit = (d < thr) & valid
    return (jnp.sum(hit, axis=0).astype(jnp.float32),
            jnp.sum(valid, axis=0).astype(jnp.float32), pred)


def pck_from_counts(hits, cnt):
    """(avg_acc, per_joint) from accumulated pck_counts sums.

    Per-joint accuracy is -1 where no valid samples; the average covers
    joints with any valid sample (the reference's dists == -1 convention
    [ref: models/metrics.py:21-62])."""
    hits = jnp.asarray(hits, jnp.float32)
    cnt = jnp.asarray(cnt, jnp.float32)
    per_joint = jnp.where(cnt > 0, hits / jnp.maximum(cnt, 1.0), -1.0)
    has_valid = cnt > 0
    n_valid_joints = jnp.sum(has_valid)
    avg = jnp.where(
        n_valid_joints > 0,
        jnp.sum(jnp.where(has_valid, per_joint, 0.0)) / jnp.maximum(
            n_valid_joints, 1),
        0.0)
    return avg, per_joint


def pck_accuracy(output, target, thr: float = 0.05, row_mask=None):
    """PCK@thr on heatmaps via argmax decode of pred AND ground truth.
    [ref: models/metrics.py:6-62]

    Joints whose decoded ground-truth coords are <= 1 in either axis are
    excluded (the reference's dists == -1 convention). Normalization is
    [H, W] / 10 applied to (x, y) — preserving the reference's quirk of
    dividing x by H/10 and y by W/10 (identical for square heatmaps).

    Args:
      output, target: (B, H, W, J) heatmaps (NHWC).
      row_mask: optional (B,) 0/1 validity — padded rows are excluded.
    Returns:
      avg_acc: scalar mean accuracy over joints with any valid sample.
      per_joint: (J,) accuracy per joint, -1 where no valid samples.
      pred: (B, J, 2) decoded predictions.
    """
    hits, cnt, pred = pck_counts(output, target, thr, row_mask)
    avg, per_joint = pck_from_counts(hits, cnt)
    return avg, per_joint, pred


def calc_mpjpe(pred_2ds, pred_3d, gt_3d, gt_2d_left, gt_2d_right,
               target_weight=None):
    """Mean 2D pixel error (avg of views) and 3D MPJPE (mm).
    [ref: models/metrics.py:65-97]

    The reference multiplies predictions AND targets by target_weight and
    then averages the norms over ALL joints — invisible joints contribute
    zero error but still count in the denominator. Preserved for parity.

    Args:
      pred_2ds: (B, V=2, J, 2) predicted 2D keypoints.
      pred_3d: (B, J, 3).
      gt_3d: (B, J, 3).
      gt_2d_left, gt_2d_right: (B, J, 2).
      target_weight: optional (B, J) or (B, J, 1).
    Returns:
      (error_2d, error_3d) scalars.
    """
    pred_l = jnp.asarray(pred_2ds)[:, 0]
    pred_r = jnp.asarray(pred_2ds)[:, 1]
    pred_3d = jnp.asarray(pred_3d)
    gt_3d = jnp.asarray(gt_3d)
    gt_l = jnp.asarray(gt_2d_left)
    gt_r = jnp.asarray(gt_2d_right)

    if target_weight is not None:
        w = jnp.asarray(target_weight)
        if w.ndim == 2:
            w = w[..., None]
        pred_l, pred_r = pred_l * w, pred_r * w
        pred_3d, gt_3d = pred_3d * w, gt_3d * w
        gt_l, gt_r = gt_l * w, gt_r * w

    e2d_l = jnp.mean(jnp.linalg.norm(pred_l - gt_l, axis=-1))
    e2d_r = jnp.mean(jnp.linalg.norm(pred_r - gt_r, axis=-1))
    e3d = jnp.mean(jnp.linalg.norm(pred_3d - gt_3d, axis=-1))
    return (e2d_l + e2d_r) / 2.0, e3d


def per_sample_mpjpe(pred_2ds, pred_3d, gt_3d, gt_2d_left, gt_2d_right,
                     target_weight=None):
    """Per-sample (B,) 2D / 3D errors with the same weighting semantics as
    calc_mpjpe — used by the batched inference apps, which must average
    per FRAME like the reference's one-frame-at-a-time loop
    [ref: inference.py:138-149]."""
    pred_l = jnp.asarray(pred_2ds)[:, 0]
    pred_r = jnp.asarray(pred_2ds)[:, 1]
    pred_3d = jnp.asarray(pred_3d)
    gt_3d = jnp.asarray(gt_3d)
    gt_l = jnp.asarray(gt_2d_left)
    gt_r = jnp.asarray(gt_2d_right)

    if target_weight is not None:
        w = jnp.asarray(target_weight)
        if w.ndim == 2:
            w = w[..., None]
        pred_l, pred_r = pred_l * w, pred_r * w
        pred_3d, gt_3d = pred_3d * w, gt_3d * w
        gt_l, gt_r = gt_l * w, gt_r * w

    e2d_l = jnp.mean(jnp.linalg.norm(pred_l - gt_l, axis=-1), axis=-1)
    e2d_r = jnp.mean(jnp.linalg.norm(pred_r - gt_r, axis=-1), axis=-1)
    e3d = jnp.mean(jnp.linalg.norm(pred_3d - gt_3d, axis=-1), axis=-1)
    return (e2d_l + e2d_r) / 2.0, e3d
