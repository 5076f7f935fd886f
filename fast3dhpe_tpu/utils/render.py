"""Shared per-frame visualization flow for the inference + baseline apps.

The reference renders each frame's 2D overlay + 3D skeleton plot,
progressively rewrites test.jpg, and accumulates the frames into an
animated GIF — identically in both apps [ref: inference.py:91-109,
baseline.py:85-101]. Here the flow is shared: prediction runs in
device-sized batches through the estimator's `predict_batch` (one
dispatch per batch instead of the reference's one-frame-at-a-time model
calls — on a ~20 ms-RPC link per-frame dispatch dominated the render
path); matplotlib/cv2 rendering stays per-frame on host.
"""

from __future__ import annotations

import numpy as np

from ..geometry.camera import project_points_np
from .visualize import plot_pose_2d, plot_pose_3d


def render_prediction_frames(predict_batch, stream, max_frames: int,
                             out_jpg: str = "test.jpg",
                             batch_size: int = 32):
    """Render reference-style visualization frames (RGB arrays).

    Args:
      predict_batch: callable(img_l, img_r, proj) -> (pred_2d (B,2,J,2),
        pred_3d (B,J,3)) — CDRNetInferencer.predict_batch or
        BaselineEstimator.predict_batch.
      stream: LoadMADSData for the movement.
      max_frames: stop after this many frames.
      out_jpg: the reference's progressive test.jpg path; the LAST frame
        is written there [ref: inference.py:103-109, baseline.py:94-101].
      batch_size: prediction batch size.
    Returns:
      list of stacked (2D overlay above 3D plot) RGB uint8 arrays.
    """
    import cv2
    frames = []
    for batch in stream.batches(batch_size):
        if len(frames) >= max_frames:
            break
        pred_2d, pred_3d = predict_batch(
            batch["img_l"], batch["img_r"], batch["proj"])
        pred_2d = np.asarray(pred_2d)
        pred_3d = np.asarray(pred_3d)
        P = batch["proj"]
        poses = np.nan_to_num(batch["pose_3d"]).astype(np.float32)
        # GT projection in numpy: per-frame jnp here costs ~20 ms RPC
        # per op on the relay
        gts_l = project_points_np(poses, P[:, 0])
        gts_r = project_points_np(poses, P[:, 1])
        for i in range(batch["n_valid"]):
            if len(frames) >= max_frames:
                break
            img_l, img_r = batch["img_l"][i], batch["img_r"][i]

            img_2d = plot_pose_2d((gts_l[i], gts_r[i]),
                                  (pred_2d[i, 0], pred_2d[i, 1]),
                                  (img_l.copy(), img_r.copy()))
            img_2d = cv2.cvtColor(img_2d, cv2.COLOR_BGR2RGB)
            img_3d = plot_pose_3d(poses[i], pred_3d[i])
            ratio = img_2d.shape[1] / img_3d.shape[1]
            img_3d = cv2.resize(img_3d,
                                (int(img_3d.shape[1] * ratio),
                                 int(img_3d.shape[0] * ratio)))
            frames.append(np.vstack((img_2d, img_3d)))
    if frames:
        cv2.imwrite(out_jpg, cv2.cvtColor(frames[-1], cv2.COLOR_RGB2BGR))
    return frames
