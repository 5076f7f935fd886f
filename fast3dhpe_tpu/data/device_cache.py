"""Device-resident decoded-frame cache: batch assembly by on-device gather.

The round-2 measurement (docs/PERFORMANCE.md) showed the end-to-end train
and eval loops running ~10x below their compiled step rates: every batch
shipped ~9.4 MB of raw uint8 frames across the host->device link, and on
this relay the link (~23 MB/s) — not the step — set the loop rate. The
reference has the same structure at much lower absolute cost (its torch
DataLoader feeds a CPU/CUDA-local model [ref: tools/load.py:118-132]).

This module removes the per-step frame traffic entirely for datasets that
fit a byte budget: frames are decoded ONCE on host, uploaded ONCE
(chunked) into device HBM as a single (N, H, W, 3) uint8 array, and every
batch is assembled on device with jnp.take on an int32 index vector — the
only per-step host->device traffic is the indices plus the per-sample
affine/projection scalars (a few KB). Augmentation randomness stays fresh:
the cache stores RAW (pre-warp) frames, so the downstream device preprocess
(ops.warp + occlusion + normalization) sees exactly the bytes the uncached
path would, making cached epochs bit-identical to uncached ones (guarded by
tests/test_device_cache.py).

Sizing: synthetic MADS trees fit trivially; real MADS is ~7-16 GB of
decoded frames vs 16 GB of v5e HBM, so the budget (DATASET.
DEVICE_CACHE_BYTES) caps the resident set and the loaders fall back to the
streaming host path when the dataset exceeds it.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def _concat_chunks(chunks):
    return jnp.concatenate(chunks, axis=0)


class DeviceFrameCache:
    """Uniform-size uint8 frames resident on device, addressable by row.

    Build with :meth:`build` (returns None when the frames don't fit the
    byte budget or don't share one size — callers fall back to the host
    streaming path). `frames` is the (N, H, W, 3) device array; pass it to
    a jitted consumer as an ARGUMENT (never close over it: baked-in
    constants blow the relay's compile-request size limit) and gather with
    `jnp.take(frames, idx, axis=0)`.
    """

    def __init__(self, frames, row_of: Dict[str, int],
                 partial: bool = False):
        self.frames = frames
        self._row_of = row_of
        #: True when only a prefix of the dataset's frames is resident
        #: (budget-capped build) — callers route the misses through the
        #: host upload lane (see loader partial-cache batches).
        self.partial = partial

    @property
    def nbytes(self) -> int:
        return int(np.prod(self.frames.shape))

    def has(self, path: str) -> bool:
        return path in self._row_of

    def rows(self, paths: Sequence[str]) -> np.ndarray:
        """int32 row indices for a batch of frame paths."""
        return np.asarray([self._row_of[p] for p in paths], np.int32)

    @classmethod
    def build(cls, paths: Sequence[str], decode_batch,
              budget_bytes: int, mesh=None, chunk_frames: int = 64,
              allow_partial: bool = False,
              pair_stride: int = 1,
              pad_frames_to: int = 1) -> Optional["DeviceFrameCache"]:
        """Decode `paths` (deduplicated, order-preserving) and upload.

        Args:
          paths: frame paths; duplicates collapse to one row.
          decode_batch: callable(list[str]) -> list[np.uint8 HxWx3]
            (the loaders' _BatchDecoder — native C++ when uniform JPEGs).
          budget_bytes: hard cap on resident bytes; 0/None disables.
          mesh: if given, the frame array is replicated over the mesh so a
            batch-sharded index gather yields a batch-sharded result.
          chunk_frames: frames per host->device transfer. Chunking bounds
            both the host RAM spike and the per-request transfer size on
            relay-style links.
          allow_partial: when the dataset exceeds the budget, cache the
            largest prefix of `paths` that fits instead of failing — the
            caller serves the remaining frames through its host path
            (cache.partial is True). Real-MADS-scale datasets (~7-16 GB
            decoded vs 16 GB HBM shared with model state) land here.
          pair_stride: round the partial prefix DOWN to a multiple of
            this many unique paths, so grouped frames (a stereo pair's
            left+right, adjacent in `paths`) are either both resident or
            both missing.
          pad_frames_to: round the resident row count UP to this
            multiple with zero frames (full caches within budget only).
            Jitted consumers specialize on the frame array's shape; a
            per-movement N means a full remote recompile per movement
            (minutes on a relay link) where a bucketed N reuses one
            graph for ≤ pad_frames_to-1 frames of HBM slack.
        Returns:
          DeviceFrameCache, or None (over budget with allow_partial=False
          / mixed frame sizes / nothing fits) — callers must fall back to
          host streaming.
        """
        if not budget_bytes:
            return None
        unique: List[str] = list(dict.fromkeys(paths))
        if not unique:
            return None
        probe = decode_batch(unique[:1])[0]
        h, w, c = probe.shape
        total = len(unique) * h * w * c
        partial = total > budget_bytes
        if partial:
            if not allow_partial:
                return None
            n_fit = budget_bytes // (h * w * c)
            n_fit -= n_fit % max(pair_stride, 1)
            if n_fit <= 0:
                return None
            unique = unique[:n_fit]

        sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            sharding = NamedSharding(mesh, PartitionSpec())  # replicated

        chunks = []
        start = 0
        while start < len(unique):
            batch_paths = unique[start:start + chunk_frames]
            if start == 0:
                rest = (decode_batch(batch_paths[1:])
                        if len(batch_paths) > 1 else [])
                decoded = [probe] + rest
            else:
                decoded = decode_batch(batch_paths)
            # mixed sizes -> fallback; check BEFORE np.stack, which
            # raises ValueError on ragged inputs (MPII-style variable
            # frames must reach the documented None return, not a crash)
            if any(d.shape != (h, w, c) for d in decoded):
                return None
            arr = np.stack(decoded)
            chunks.append(jax.device_put(arr, sharding)
                          if sharding is not None else jax.device_put(arr))
            start += chunk_frames

        pad_rows = 0
        if pad_frames_to > 1 and not partial:
            pad_rows = (-len(unique)) % pad_frames_to
            if (budget_bytes and
                    (len(unique) + pad_rows) * h * w * c > budget_bytes):
                pad_rows = 0                 # shape bucketing is a perf
        if pad_rows:                         # opt — never break budget
            pad = np.zeros((pad_rows, h, w, c), np.uint8)
            chunks.append(jax.device_put(pad, sharding)
                          if sharding is not None else jax.device_put(pad))

        if len(chunks) == 1:
            frames = chunks[0]
        else:
            concat = jax.jit(_concat_chunks)
            if sharding is not None:
                concat = jax.jit(_concat_chunks, out_shardings=sharding)
            frames = concat(chunks)
            # free the chunk buffers promptly (the concat doubled residency)
            for ch in chunks:
                ch.delete()
        row_of = {p: i for i, p in enumerate(unique)}
        return cls(frames, row_of, partial=partial)
