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

        # gather-from-HBM wrapper + masked accumulator shared with the
        # CDRNet inferencer (apps.eval_loop)
        from .eval_loop import make_cached_eval, accum_eval
        self._predict_eval_cached = make_cached_eval(_predict_eval)
        self._accum_eval = accum_eval

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
                          batch_size: int = 32,
                          device_cache_bytes: int = 0
                          ) -> Tuple[float, float]:
        """Sequence-average MPJPE2D/MPJPE3D [ref: baseline.py:133-134].

        Device-side accumulation + optional HBM frame cache, shared loop
        with CDRNetInferencer.evaluate_movement (apps.eval_loop)."""
        from .eval_loop import evaluate_stream
        return evaluate_stream(self.variables, self._predict_eval,
                               self._predict_eval_cached, stream,
                               batch_size, device_cache_bytes)

    def render_frames(self, stream: LoadMADSData, max_frames: int,
                      out_jpg: str = "test.jpg", batch_size: int = 32):
        """Reference-style per-frame 2D overlay + 3D skeleton frames and
        progressive test.jpg — the baseline app's render flow
        [ref: baseline.py:85-101]; shared implementation with the CDRNet
        inferencer (utils.render)."""
        from ..utils.render import render_prediction_frames
        return render_prediction_frames(self.predict_batch, stream,
                                        max_frames, out_jpg, batch_size)


def main():
    from ..utils.runtime import enable_compilation_cache
    enable_compilation_cache()   # warm runs skip the remote XLA compile
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str,
                        default="configs/mads_2d.yaml")
    parser.add_argument("--movement", type=str, default="HipHop")
    parser.add_argument("--save_frames", type=int, default=None,
                        help="Number of frames to render into a gif "
                             "(reference baseline's viz flow)")
    parser.add_argument("--data_path", type=str,
                        default="data/MADS_extract/valid")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--device_cache_mb", type=int, default=2048,
                        help="HBM budget for the resident frame cache "
                             "(0 disables; falls back to streaming)")
    parser.add_argument("--weights_root", type=str, default="weights")
    args = parser.parse_args()

    logger = setup_logger()
    config = load_config(args.config_path)
    stream = LoadMADSData(args.data_path, config.MODEL.IMAGE_SIZE,
                          args.movement)
    logger.info("%d frames in %s", len(stream), args.movement)

    estimator = BaselineEstimator(config, weights_root=args.weights_root)
    e2, e3 = estimator.evaluate_movement(
        stream, args.batch_size,
        device_cache_bytes=args.device_cache_mb << 20)
    print("MPJPE2D: ", e2)
    print("MPJPE3D: ", e3)

    if args.save_frames:
        from ..utils import save_gif
        frames = estimator.render_frames(stream, args.save_frames)
        save_gif(frames, f"{args.movement}.gif")
        logger.info("Wrote %s.gif (%d frames)", args.movement, len(frames))


if __name__ == "__main__":
    main()
