"""Naive stereo baseline: independent 2D PoseResNet per view + hard-argmax
+ closed-form triangulation. [ref: baseline.py]

Deliberate fix vs the reference: baseline.py:54 casts predicted pixel
coordinates to uint8, silently truncating any coordinate > 255 — we keep
float coordinates (the x4 heatmap->image scaling makes 256 reachable).
"""

from __future__ import annotations

import argparse
import os
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import load_config
from ..models import PoseResNet
from ..models.metrics import per_sample_mpjpe
from ..ops.heatmap import hard_argmax
from ..ops.warp import normalize_imagenet
from ..geometry.triangulation import dlt_triangulate
from ..geometry.camera import project_points
from ..data.stream import LoadMADSData
from ..train.checkpoint import load_variables
from ..utils.logging import setup_logger


class BaselineEstimator:
    """Both views through one stacked PoseResNet batch, then closed-form
    triangulation of the hard-argmax keypoints — all under one jit."""

    def __init__(self, config, weights_root: str = "weights",
                 dtype=jnp.float32):
        self.config = config
        self.model = PoseResNet.from_config(config, dtype=dtype)
        weight_path = os.path.join(weights_root, config.MODEL.NAME)
        # the reference baseline loads latest.pth [ref: baseline.py:30-34]
        for cand in ("latest.pth", "latest", "best.pth", "best"):
            p = os.path.join(weight_path, cand)
            if os.path.exists(p):
                self.variables = load_variables(p)
                break
        else:
            raise FileNotFoundError(f"No checkpoint under {weight_path}")

        model = self.model
        img_size = config.MODEL.IMAGE_SIZE[0]
        hm_size = config.MODEL.EXTRA.HEATMAP_SIZE[0]
        scale = img_size / hm_size                       # x4 upscale

        image_size = tuple(config.MODEL.IMAGE_SIZE)

        @jax.jit
        def _predict(variables, img_l, img_r, trans=None):
            B = img_l.shape[0]
            if trans is not None:
                # raw frames: affine crop on device (host only decodes)
                from ..ops.warp import affine_warp
                img_l = affine_warp(img_l, trans, image_size)
                img_r = affine_warp(img_r, trans, image_size)
            x = jnp.concatenate([normalize_imagenet(img_l),
                                 normalize_imagenet(img_r)], axis=0)
            hm = model.apply(variables, x, train=False)
            preds, _ = hard_argmax(hm)                   # (2B, J, 2)
            preds = preds * scale
            return preds[:B], preds[B:]

        self._predict = _predict

        @jax.jit
        def _predict_eval(variables, img_l, img_r, trans, proj,
                          pose_3d, vis):
            # whole per-batch eval as ONE dispatch (unjitted jnp math
            # costs ~20 ms RPC per op through the axon relay)
            kp_l, kp_r = _predict(variables, img_l, img_r, trans)
            B, J = kp_l.shape[0], kp_l.shape[1]
            kp = jnp.stack([kp_l, kp_r], axis=1)
            proj_j = jnp.broadcast_to(proj[:, None], (B, J, 2, 3, 4))
            pred_3d = dlt_triangulate(proj_j, jnp.swapaxes(kp, 1, 2))
            gt_l = project_points(pose_3d, proj[:, 0])
            gt_r = project_points(pose_3d, proj[:, 1])
            return per_sample_mpjpe(kp, pred_3d, pose_3d, gt_l, gt_r, vis)

        self._predict_eval = _predict_eval

    def predict_batch(self, img_l, img_r, proj, trans=None):
        """Returns (pred_2d (B, 2, J, 2), pred_3d (B, J, 3)).

        With trans (B, 2, 3), frames are RAW and cropped on device
        (stream.batches(device_warp=True)).

        Triangulation [ref: baseline.py:84 -> tools/common.py:51-71] is one
        batched DLT over all (B, J) joints: the reference's closed-form M
        equals the DLT system up to a row sign, which leaves the singular
        vectors unchanged.
        """
        if trans is not None:
            kp_l, kp_r = self._predict(self.variables, jnp.asarray(img_l),
                                       jnp.asarray(img_r),
                                       jnp.asarray(trans))
        else:
            kp_l, kp_r = self._predict(self.variables, jnp.asarray(img_l),
                                       jnp.asarray(img_r))
        B, J = kp_l.shape[0], kp_l.shape[1]
        kp = jnp.stack([kp_l, kp_r], axis=1)             # (B, 2, J, 2)
        proj = jnp.asarray(proj)                         # (B, 2, 3, 4)
        proj_j = jnp.broadcast_to(proj[:, None], (B, J, 2, 3, 4))
        pred_3d = dlt_triangulate(proj_j, jnp.swapaxes(kp, 1, 2))
        return kp, pred_3d

    def evaluate_movement(self, stream: LoadMADSData,
                          batch_size: int = 32) -> Tuple[float, float]:
        tot2, tot3, n = 0.0, 0.0, 0
        identity = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
        for batch in stream.batches(batch_size, device_warp=True):
            pose_3d = batch["pose_3d"]
            vis = np.logical_and.reduce(
                ~np.isnan(pose_3d), axis=2).astype(np.float32)
            pose_3d = np.nan_to_num(pose_3d).astype(np.float32)
            trans = batch.get("trans")
            if trans is None:     # frames already cropped on host
                trans = np.broadcast_to(identity, (pose_3d.shape[0], 2, 3))
            e2, e3 = self._predict_eval(
                self.variables, jnp.asarray(batch["img_l"]),
                jnp.asarray(batch["img_r"]), jnp.asarray(trans),
                jnp.asarray(batch["proj"]), jnp.asarray(pose_3d),
                jnp.asarray(vis))
            k = batch["n_valid"]
            tot2 += float(np.asarray(e2)[:k].sum())
            tot3 += float(np.asarray(e3)[:k].sum())
            n += k
        return tot2 / max(n, 1), tot3 / max(n, 1)


def main():
    from ..utils.runtime import enable_compilation_cache
    enable_compilation_cache()   # warm runs skip the remote XLA compile
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str,
                        default="configs/mads_2d.yaml")
    parser.add_argument("--movement", type=str, default="HipHop")
    parser.add_argument("--data_path", type=str,
                        default="data/MADS_extract/valid")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--weights_root", type=str, default="weights")
    args = parser.parse_args()

    logger = setup_logger()
    config = load_config(args.config_path)
    stream = LoadMADSData(args.data_path, config.MODEL.IMAGE_SIZE,
                          args.movement)
    logger.info("%d frames in %s", len(stream), args.movement)

    estimator = BaselineEstimator(config, weights_root=args.weights_root)
    e2, e3 = estimator.evaluate_movement(stream, args.batch_size)
    print("MPJPE2D: ", e2)
    print("MPJPE3D: ", e3)


if __name__ == "__main__":
    main()
