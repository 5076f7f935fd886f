"""Visual check of the stereo pipeline's P <- T @ P composition.
[ref: display_data_3d.py]

Reprojects the GT 3D pose through the affine-composed projection matrices
onto the warped stereo images and draws the joints — if the composition
math is right, dots land on the body in both views.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..config import load_config
from ..data.loader import Stereo3DLoader
from ..utils.visualize import MADS_CONNECTIONS
from .display_data_2d import denormalize


def draw_pose(img_u8, pose_2d, weight):
    import cv2
    img = np.ascontiguousarray(img_u8)
    for j, (x, y) in enumerate(np.asarray(pose_2d)):
        color = (0, 255, 0) if weight[j] > 0 else (0, 0, 255)
        if 0 <= x < img.shape[1] and 0 <= y < img.shape[0]:
            cv2.circle(img, (int(x), int(y)), 3, color, -1)
    for a, b in MADS_CONNECTIONS:
        pa, pb = pose_2d[a], pose_2d[b]
        if weight[a] > 0 and weight[b] > 0:
            cv2.line(img, (int(pa[0]), int(pa[1])),
                     (int(pb[0]), int(pb[1])), (255, 200, 0), 1)
    return img


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str,
                        default="configs/mads_3d.yaml")
    parser.add_argument("--image_set", type=str, default="train")
    parser.add_argument("--num_samples", type=int, default=8)
    parser.add_argument("--out_dir", type=str, default="debug_vis")
    args = parser.parse_args()

    config = load_config(args.config_path)
    loader = Stereo3DLoader(config, args.image_set)
    os.makedirs(args.out_dir, exist_ok=True)

    import cv2
    written = 0
    for batch in loader:
        imgs = np.asarray(batch["image"])                # (B, 2, H, W, 3)
        t2d = np.asarray(batch["target_2d"])             # (B, 2, J, 2)
        w = np.asarray(batch["target_weight"])
        for i in range(min(batch["n_valid"], imgs.shape[0])):
            views = [draw_pose(denormalize(imgs[i, v]), t2d[i, v], w[i])
                     for v in range(2)]
            cv2.imwrite(os.path.join(args.out_dir,
                                     f"sample_3d_{written:03d}.jpg"),
                        np.concatenate(views, axis=1))
            written += 1
            if written >= args.num_samples:
                print(f"Wrote {written} overlays to {args.out_dir}")
                return
    print(f"Wrote {written} overlays to {args.out_dir}")


if __name__ == "__main__":
    main()
