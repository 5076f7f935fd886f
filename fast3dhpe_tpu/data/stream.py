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
from typing import Dict, Iterator, List

import numpy as np

from ..geometry.affine import (get_affine_transform,
                               update_intrinsics_with_affine)
from .loader import _imread, _BatchDecoder, _prefetch, shared_decode_pool


class LoadMADSData:
    """Frame-by-frame iterator, API-compatible with the reference.

    Decode threads come from the process-level shared pool
    (loader.shared_decode_pool) — one stream is created per movement /
    epoch by `inference --movement all` and the bench loops, so
    per-instance pools would accumulate until GC. `close()` exists for
    API symmetry but owns nothing."""

    def __init__(self, data_path: str, image_size, movement: str = "HipHop"):
        self.metadata = self._gen_metadata(data_path, movement)
        self.image_size = tuple(image_size)
        self._pool = shared_decode_pool()
        self._decoder = _BatchDecoder(self._pool)
        # device-warp eligibility is probed ONCE per sequence (first
        # batch): deciding per batch would alternate raw/host-warped
        # batch shapes on mixed-size sequences, forcing a fresh remote
        # XLA compile of the eval graph (minutes on this relay) at every
        # flip. None = not probed yet.
        self._uniform_size = None
        self._device_cache = None
        self._device_cache_failed = False

    def close(self):
        """No-op (decode threads belong to the shared process pool)."""

    def build_device_cache(self, budget_bytes: int):
        """Decode the whole movement once into device HBM
        (data.device_cache.DeviceFrameCache); batches() then yields index
        batches and the consumer gathers frames on device — no per-batch
        frame bytes on the host->device link. Movements larger than the
        budget keep a PARTIAL cache (cache.partial): resident frames
        still serve index batches, the rest stream. Returns the cache,
        or None (mixed frame sizes / nothing fits -> streaming
        fallback)."""
        if self._device_cache is None and not self._device_cache_failed:
            from .device_cache import DeviceFrameCache
            # interleave pairs so a budget cut keeps both views of a
            # frame together (pair_stride=2)
            paths = [p for m in self.metadata
                     for p in (m["left_img_path"], m["right_img_path"])]
            # pad_frames_to buckets the resident array's N so jitted
            # consumers (the whole-movement eval scan) reuse one
            # compiled graph across movements of different lengths
            cache = DeviceFrameCache.build(paths, self._decoder,
                                           budget_bytes,
                                           allow_partial=True,
                                           pair_stride=2,
                                           pad_frames_to=64)
            if cache is None:
                self._device_cache_failed = True
            self._device_cache = cache
        return self._device_cache

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

    def batches(self, batch_size: int, device_warp: bool = False,
                device_cache_bytes: int = 0) -> Iterator[Dict]:
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
        way.

        device_cache_bytes > 0: the movement's frames are made resident in
        device HBM once (build_device_cache) and batches carry
        "frames"/"idx_l"/"idx_r" instead of image arrays — the consumer
        gathers + warps on device (apps.inference._predict_eval_cached).
        Over-budget movements keep a PARTIAL cache: resident frames
        yield index batches first, then the misses stream (consumers
        dispatch per batch kind). Falls back to the device_warp/host
        path when no cache can be built at all."""
        if device_cache_bytes:
            cache = self.build_device_cache(device_cache_bytes)
            if cache is not None and not cache.partial:
                return self.cached_batches(batch_size, cache)
            if cache is not None and cache.partial:
                # partial cache: resident frames serve index batches, the
                # rest stream — eval metrics are order-invariant, and the
                # consumer (apps.inference.evaluate_movement) already
                # dispatches per batch kind
                resident = [m for m in self.metadata
                            if cache.has(m["left_img_path"])
                            and cache.has(m["right_img_path"])]
                misses = [m for m in self.metadata
                          if not (cache.has(m["left_img_path"])
                                  and cache.has(m["right_img_path"]))]

                def chain():
                    if resident:
                        for b in self.cached_batches(batch_size, cache,
                                                      metas=resident):
                            yield b
                    if misses:
                        for b in self._stream_batches(batch_size,
                                                      device_warp,
                                                      misses):
                            yield b

                return chain()
        return self._stream_batches(batch_size, device_warp,
                                    self.metadata)

    def _stream_batches(self, batch_size: int, device_warp: bool,
                        metadata: List[Dict]) -> Iterator[Dict]:
        """Streamed (non-resident) batches over `metadata`."""

        def gen():
            n = len(metadata)
            for start in range(0, n, batch_size):
                metas = [copy.deepcopy(m)
                         for m in metadata[start:start + batch_size]]
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
                shapes = {i.shape for i in raw_l} | {i.shape for i in raw_r}
                if self._uniform_size is None:
                    # probe once; the first batch's verdict holds for the
                    # whole sequence (one eval-graph shape, one compile)
                    self._uniform_size = (next(iter(shapes))
                                          if len(shapes) == 1 else False)
                # a batch deviating from the probed shape host-warps to the
                # fixed output size instead of minting a new raw shape
                # (bounds the compile count at 2 graphs per sequence)
                this_uniform = (self._uniform_size
                                and shapes == {self._uniform_size})
                if device_warp and this_uniform:
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

    def cached_batches(self, batch_size: int, cache,
                        metas=None) -> Iterator[Dict]:
        """Index batches over resident frames: per-batch host work is a
        few KB of indices/affines/projections — no image bytes. `metas`
        restricts to a subset (partial cache: the resident records)."""
        metadata = self.metadata if metas is None else metas

        def gen():
            n = len(metadata)
            h, w = (int(cache.frames.shape[1]), int(cache.frames.shape[2]))
            c = np.array([w / 2, h / 2])
            trans0 = get_affine_transform(c, 1, 0, min(h, w),
                                          self.image_size)
            for start in range(0, n, batch_size):
                metas = metadata[start:start + batch_size]
                n_valid = len(metas)
                while len(metas) < batch_size:
                    metas = metas + [metas[-1]]
                transes = [trans0] * len(metas)
                yield {
                    "frames": cache.frames,
                    "idx_l": cache.rows(
                        [m["left_img_path"] for m in metas]),
                    "idx_r": cache.rows(
                        [m["right_img_path"] for m in metas]),
                    "trans": np.stack(transes).astype(np.float32),
                    "proj": self._batch_proj(metas, transes),
                    "pose_3d": np.stack(
                        [np.array(m["pose_3d"], dtype=np.float64)
                         for m in metas]),
                    "n_valid": n_valid,
                }

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
