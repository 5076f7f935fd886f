"""Visual data-pipeline check: heatmap targets over de-normalized images.
[ref: display_data_2d.py]

Writes a grid image per batch sample: the warped input with its generated
gaussian heatmaps alpha-blended — eyeballs the mono 2D pipeline (warp,
joint transform, target rendering).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..config import load_config
from ..data.loader import Mono2DLoader
from ..ops.warp import IMAGENET_MEAN, IMAGENET_STD


def denormalize(img):
    """Invert ImageNet normalization back to uint8."""
    x = np.asarray(img)
    x = (x * np.array(IMAGENET_STD) + np.array(IMAGENET_MEAN)) * 255.0
    return np.clip(x, 0, 255).astype(np.uint8)


def overlay_heatmaps(img_u8, heatmaps):
    """Blend the per-joint heatmap max over the resized image."""
    import cv2
    hm = np.asarray(heatmaps).max(axis=-1)               # (h, w)
    hm = cv2.resize(hm, (img_u8.shape[1], img_u8.shape[0]))
    hm = np.clip(hm * 255, 0, 255).astype(np.uint8)
    hm_color = cv2.applyColorMap(hm, cv2.COLORMAP_JET)
    return cv2.addWeighted(img_u8, 0.6, hm_color, 0.4, 0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str,
                        default="configs/mads_2d.yaml")
    parser.add_argument("--image_set", type=str, default="train")
    parser.add_argument("--num_samples", type=int, default=8)
    parser.add_argument("--out_dir", type=str, default="debug_vis")
    args = parser.parse_args()

    config = load_config(args.config_path)
    loader = Mono2DLoader(config, args.image_set)
    os.makedirs(args.out_dir, exist_ok=True)

    import cv2
    written = 0
    for batch in loader:
        imgs = np.asarray(batch["image"])
        targets = np.asarray(batch["target"])
        for i in range(int(np.asarray(batch["row_valid"]).sum())):
            vis = overlay_heatmaps(denormalize(imgs[i]), targets[i])
            cv2.imwrite(os.path.join(args.out_dir,
                                     f"sample_2d_{written:03d}.jpg"), vis)
            written += 1
            if written >= args.num_samples:
                print(f"Wrote {written} overlays to {args.out_dir}")
                return
    print(f"Wrote {written} overlays to {args.out_dir}")


if __name__ == "__main__":
    main()
