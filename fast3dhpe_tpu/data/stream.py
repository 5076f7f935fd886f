"""Streaming MADS inference iterator. [ref: tools/load.py:16-102]

Iterates a movement's frames: crops/resizes both views to the model input
size and rewrites the intrinsics K <- [[trans @ K]; [0, 0, 1]] so
projection matrices built downstream live in cropped-image coordinates.

Unlike the reference (one frame at a time), `batches()` yields
device-ready stereo batches for high-throughput evaluation: frames are
decoded by the shared batch decoder (native C++ when uniform-size),
prefetched one batch ahead, and with `device_warp=True` the affine crop
itself moves onto the TPU (the host then only decodes JPEGs — same
split as the training pipeline).
"""

from __future__ import annotations

import copy
import glob
import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List

import numpy as np

from ..geometry.affine import (get_affine_transform,
                               update_intrinsics_with_affine)
from .loader import _imread, _BatchDecoder, _prefetch


class LoadMADSData:
    """Frame-by-frame iterator, API-compatible with the reference."""

    def __init__(self, data_path: str, image_size, movement: str = "HipHop"):
        self.metadata = self._gen_metadata(data_path, movement)
        self.image_size = tuple(image_size)
        self._pool = ThreadPoolExecutor(max_workers=4)
        self._decoder = _BatchDecoder(self._pool)

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

    def _batch_proj(self, metas, transes) -> np.ndarray:
        """Crop-corrected (B, 2, 3, 4) projection matrices for a batch.
        [ref: tools/load.py:60-67] K fix composed with each frame's trans.

        Pure numpy ON PURPOSE: this is host-side batch assembly, and the
        jnp geometry.get_projection_matrix would pay ~20 ms RPC per op
        through the axon relay — 64 per-record calls made a first cut of
        the streaming eval loop ~300x slower than its model step."""
        B = len(metas)
        K = np.empty((B, 2, 3, 3))
        Rt = np.empty((B, 2, 3, 4))
        for i, (meta, trans) in enumerate(zip(metas, transes)):
            for v, cam in enumerate(("cam_left", "cam_right")):
                K[i, v] = update_intrinsics_with_affine(
                    np.array(meta[cam]["intrinsics"]), trans)
                Rt[i, v, :, :3] = np.array(meta[cam]["rotation"])
                Rt[i, v, :, 3:] = np.array(
                    meta[cam]["translation"]).reshape(3, 1)
        return np.einsum("bvij,bvjk->bvik", K, Rt).astype(np.float32)

    def batches(self, batch_size: int,
                device_warp: bool = False) -> Iterator[Dict]:
        """Batched streaming: yields dicts of stacked frames + projection
        matrices + GT — the TPU-friendly eval path. Decoding runs through
        the shared batch decoder and one batch is prefetched in a
        background thread.

        device_warp=False: frames are affine-cropped on host (cv2) to
        image_size — what render paths want. device_warp=True: frames are
        yielded RAW (requires a uniform-size sequence; falls back to host
        warp otherwise) plus a "trans" (B, 2, 3) key, and the consumer
        warps on device (apps.inference does, via ops.warp.affine_warp —
        parity-tested against cv2). Projections are crop-corrected either
        way."""

        def gen():
            n = len(self.metadata)
            for start in range(0, n, batch_size):
                metas = [copy.deepcopy(m)
                         for m in self.metadata[start:start + batch_size]]
                n_valid = len(metas)
                while len(metas) < batch_size:
                    metas.append(copy.deepcopy(metas[-1]))
                raw_l = self._decoder([m["left_img_path"] for m in metas])
                raw_r = self._decoder([m["right_img_path"] for m in metas])
                transes = []
                for l in raw_l:
                    h, w = l.shape[:2]
                    c = np.array([w / 2, h / 2])
                    transes.append(get_affine_transform(
                        c, 1, 0, min(h, w), self.image_size))
                poses = np.stack([np.array(m["pose_3d"], dtype=np.float64)
                                  for m in metas])
                batch = {
                    "proj": self._batch_proj(metas, transes),
                    "pose_3d": poses,
                    "n_valid": n_valid,
                }
                uniform = (len({i.shape for i in raw_l} |
                               {i.shape for i in raw_r}) == 1)
                if device_warp and uniform:
                    batch["img_l"] = np.stack(raw_l)
                    batch["img_r"] = np.stack(raw_r)
                    batch["trans"] = np.stack(transes).astype(np.float32)
                else:
                    batch["img_l"] = np.stack([
                        self._warp(i, t) for i, t in zip(raw_l, transes)])
                    batch["img_r"] = np.stack([
                        self._warp(i, t) for i, t in zip(raw_r, transes)])
                yield batch

        return _prefetch(gen())

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
