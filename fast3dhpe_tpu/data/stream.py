"""Streaming MADS inference iterator. [ref: tools/load.py:16-102]

Iterates a movement's frames: crops/resizes both views to the model input
size and rewrites the intrinsics K <- [[trans @ K]; [0, 0, 1]] so
projection matrices built downstream live in cropped-image coordinates.

Unlike the reference (one frame at a time), `batches()` yields
device-ready stereo batches for high-throughput evaluation.
"""

from __future__ import annotations

import copy
import glob
import json
import os
from typing import Dict, Iterator, List

import numpy as np

from ..geometry.affine import (get_affine_transform,
                               update_intrinsics_with_affine)
from .loader import _imread


class LoadMADSData:
    """Frame-by-frame iterator, API-compatible with the reference."""

    def __init__(self, data_path: str, image_size, movement: str = "HipHop"):
        self.metadata = self._gen_metadata(data_path, movement)
        self.image_size = tuple(image_size)

    def __len__(self):
        return len(self.metadata)

    def __iter__(self):
        self._count = 0
        return self

    def __next__(self):
        if self._count >= len(self.metadata):
            raise StopIteration
        meta = copy.deepcopy(self.metadata[self._count])
        self._count += 1
        left_img, right_img, meta = self._load_frame(meta)
        return left_img, right_img, meta

    def _load_frame(self, meta):
        left_img = _imread(meta["left_img_path"])
        right_img = _imread(meta["right_img_path"])

        h, w = left_img.shape[:2]
        c = np.array([w / 2, h / 2])
        trans = get_affine_transform(c, 1, 0, min(h, w), self.image_size)

        left_img = self._warp(left_img, trans)
        right_img = self._warp(right_img, trans)

        # correct intrinsics for the crop [ref: tools/load.py:60-67]
        for cam in ("cam_left", "cam_right"):
            K = np.array(meta[cam]["intrinsics"])
            meta[cam]["intrinsics"] = update_intrinsics_with_affine(K, trans)
        return left_img, right_img, meta

    def _warp(self, img, trans):
        try:
            import cv2
            return cv2.warpAffine(
                img, trans,
                (int(self.image_size[0]), int(self.image_size[1])),
                flags=cv2.INTER_LINEAR)
        except ImportError:
            from ..ops.warp import affine_warp
            return np.asarray(
                affine_warp(img[None], trans, self.image_size)[0]
            ).astype(np.uint8)

    def batches(self, batch_size: int) -> Iterator[Dict]:
        """Batched streaming: yields dicts of stacked frames + projection
        matrices + GT — the TPU-friendly eval path."""
        from ..geometry.camera import get_projection_matrix

        n = len(self.metadata)
        for start in range(0, n, batch_size):
            metas = [copy.deepcopy(m)
                     for m in self.metadata[start:start + batch_size]]
            n_valid = len(metas)
            while len(metas) < batch_size:
                metas.append(copy.deepcopy(metas[-1]))
            frames_l, frames_r, Ps, poses = [], [], [], []
            for meta in metas:
                l, r, meta = self._load_frame(meta)
                frames_l.append(l)
                frames_r.append(r)
                P = np.stack([
                    np.asarray(get_projection_matrix(
                        meta["cam_left"]["intrinsics"],
                        meta["cam_left"]["rotation"],
                        meta["cam_left"]["translation"]))[:3],
                    np.asarray(get_projection_matrix(
                        meta["cam_right"]["intrinsics"],
                        meta["cam_right"]["rotation"],
                        meta["cam_right"]["translation"]))[:3],
                ])
                Ps.append(P)
                poses.append(np.array(meta["pose_3d"], dtype=np.float64))
            yield {
                "img_l": np.stack(frames_l),
                "img_r": np.stack(frames_r),
                "proj": np.stack(Ps).astype(np.float32),
                "pose_3d": np.stack(poses),
                "n_valid": n_valid,
            }

    @staticmethod
    def _gen_metadata(data_path: str, movement: str) -> List[Dict]:
        left_img_paths = sorted(glob.glob(
            os.path.join(data_path, movement, "**/left/*.jpg")))
        right_img_paths = sorted(glob.glob(
            os.path.join(data_path, movement, "**/right/*.jpg")))
        gt_pose_paths = sorted(glob.glob(
            os.path.join(data_path, movement, "**/pose/*.json")))
        assert len(left_img_paths) == len(right_img_paths) \
            == len(gt_pose_paths), \
            "Number of images and ground truths must match"

        metadata = []
        for left, right, pose_path in zip(left_img_paths, right_img_paths,
                                          gt_pose_paths):
            with open(pose_path, "r") as f:
                data = json.load(f)
            metadata.append({
                "cam_left": data["calibs_info"]["cam_left"],
                "cam_right": data["calibs_info"]["cam_right"],
                "left_img_path": left,
                "right_img_path": right,
                "pose_3d": data["pose_3d"],
            })
        return metadata
