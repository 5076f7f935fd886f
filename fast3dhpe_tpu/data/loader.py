"""Host loaders: decode + per-sample randomness, feeding the device pipeline.

Replaces the reference's torch DataLoader with 8 worker processes
[ref: tools/load.py:118-132]. Responsibilities are split TPU-first:
host threads only decode JPEGs and draw per-sample affine randomness
(exact reference distributions [ref: dataset/base.py:74-86]); the batched
warp / occlusion / normalization / target math runs on device
(data/device_pipeline.py). A background prefetch thread keeps one batch
in flight.

Padding: the final partial batch is padded by repeating the last record
(static shapes for jit); every batch carries a "row_valid" (B,) 0/1 mask
that the train/eval steps use to exclude padded rows from gradients and
metrics. The mask is batch-sharded like the data, so its sum is the
GLOBAL valid count under a mesh — multi-host correct.

Multi-host: when jax.process_count() > 1, each process keeps only its
[process_index::process_count] slice of the record index
(parallel.distributed.shard_records_for_host) and all processes run the
same number of per-epoch batches (computed from the LARGEST shard, short
shards padding with row_valid=0 rows) so the SPMD steps stay in lockstep.
"""

from __future__ import annotations

import math
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional

import numpy as np

import jax

from ..geometry.affine import (
    get_affine_transform, affine_transform_points, fliplr_joints)
from .mads import (build_mads_index, build_mads_stereo_index,
                   MADS_FLIP_PAIRS)
from .mpii import build_mpii_index, MPII_FLIP_PAIRS
from .device_pipeline import (preprocess_stereo_batch,
                              preprocess_stereo_batch_cached,
                              preprocess_stereo_batch_partial,
                              preprocess_mono_batch,
                              preprocess_mono_batch_cached,
                              preprocess_mono_batch_partial)


_SHARED_POOL = None
_SHARED_POOL_LOCK = threading.Lock()


def shared_decode_pool(max_workers: int = 4) -> ThreadPoolExecutor:
    """Process-level decode thread pool, shared by short-lived consumers.

    Streaming iterators (data.stream.LoadMADSData) are created once per
    movement/epoch; giving each its own executor accumulated 4-thread
    pools until GC. One lazily-created shared pool serves them all for
    the life of the process (daemon threads — nothing to shut down)."""
    global _SHARED_POOL
    with _SHARED_POOL_LOCK:
        if _SHARED_POOL is None:
            _SHARED_POOL = ThreadPoolExecutor(
                max_workers=max_workers,
                thread_name_prefix="f3d-decode-shared")
        return _SHARED_POOL


def _imread(path: str) -> np.ndarray:
    """BGR uint8 read, matching the reference's cv2.imread channel order
    (the pretrained stats are computed on BGR frames too — parity over
    plumage)."""
    try:
        import cv2
        img = cv2.imread(path, getattr(cv2, "IMREAD_COLOR", 1))
        if img is None:
            raise ValueError(f"Fail to read {path}")
        return img
    except ImportError:
        from PIL import Image
        img = np.asarray(Image.open(path).convert("RGB"))
        return img[:, :, ::-1]  # RGB -> BGR


def _prefetch(gen: Iterator, depth: int = 2) -> Iterator:
    """Run `gen` in a background thread with a bounded queue.

    Abandoning the iterator early (loops do, with max_steps_per_epoch)
    must not leak the worker: the worker's puts poll a stop event, and the
    consumer's finally sets it — so a closed/garbage-collected iterator
    releases the thread and its buffered batches promptly.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()
    error_box: List = []

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in gen:
                if not _put(item):
                    return
        except BaseException as e:  # propagate into the consumer
            error_box.append(e)
        finally:
            _put(sentinel)

    t = threading.Thread(target=worker, daemon=True, name="f3d-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if error_box:
                    raise error_box[0]
                return
            yield item
    finally:
        stop.set()


class _BatchDecoder:
    """Batch JPEG decode: native C++ arena decoder when all frames share
    one size (probed once), threaded cv2/PIL otherwise."""

    def __init__(self, pool: ThreadPoolExecutor):
        self._pool = pool
        self._native_hw = None    # (h, w) once probed; False = unusable

    def __call__(self, paths: List[str]) -> List[np.ndarray]:
        from . import native_jpeg
        if self._native_hw is None and native_jpeg.available():
            self._native_hw = native_jpeg.probe(paths[0]) or False
        if self._native_hw:
            h, w = self._native_hw
            try:
                arr = native_jpeg.decode_batch(paths, h, w)
                if arr is not None:
                    return list(arr)
            except ValueError:
                self._native_hw = False   # mixed sizes -> fallback
        return list(self._pool.map(_imread, paths))


def _train_scale_rot(rng: np.random.RandomState, sf: float, rf: float):
    """Reference's random scale/rotation draws [ref: dataset/base.py:74-78]."""
    s = np.clip(rng.randn() * sf + 1, 1 - sf, 1 + sf)
    r = np.clip(rng.randn() * rf, -rf * 2, rf * 2) \
        if rng.random_sample() <= 0.6 else 0.0
    return s, r


def _shard_for_host(records):
    """Multi-host: keep this process's slice; return (local_records,
    global_count, filler_record).

    The filler backs lockstep batches beyond this host's shard —
    including the case where the shard is EMPTY (more processes than
    records): such a host must keep dispatching lockstep SPMD steps or
    the other hosts deadlock in the collectives. The filler is kept
    OUTSIDE self.records so it can never be counted valid; filler rows
    always carry row_valid=0."""
    if jax.process_count() > 1:
        from ..parallel.distributed import shard_records_for_host
        local = shard_records_for_host(records)
        filler = local[0] if local else (records[0] if records else None)
        return local, len(records), filler
    return records, len(records), records[0] if records else None


def _num_lockstep_batches(global_n: int, batch_size: int) -> int:
    """Per-epoch batch count every host runs (from the largest shard)."""
    max_shard = math.ceil(global_n / max(jax.process_count(), 1))
    return math.ceil(max_shard / batch_size)


def _row_mask(n_valid: int, batch_size: int) -> np.ndarray:
    m = np.zeros((batch_size,), np.float32)
    m[:n_valid] = 1.0
    return m


def _partial_epoch_schedule(records, batch_size, nb, rng, resident,
                            train):
    """PARTIAL-device-cache epoch schedule: yields (n_valid, recs_cached,
    recs_upload) with FIXED lane sizes so every batch compiles to one
    static shape.

    Records are split by `resident(rec)`. Each batch carries exactly n_c
    cached rows + n_u upload rows with n_c + n_u = batch_size; the
    upload lane absorbs all misses, any cached records beyond the cached
    lane's capacity, and the final-batch padding (pads sit at the END of
    the upload pool, so the row_valid prefix mask stays correct). Train
    epochs permute both pools; eval keeps natural order. Every real
    record appears exactly once per epoch, like the plain permutation —
    the only distributional deviation is stratified (fixed per-batch
    cached/uncached mix) instead of fully exchangeable batching."""
    cached_rows, miss_rows = [], []
    for i, r in enumerate(records):
        (cached_rows if resident(r) else miss_rows).append(i)
    B = batch_size
    n_pad = nb * B - len(records)
    n_u = min(B, -(-(len(miss_rows) + n_pad) // nb))
    n_c = B - n_u
    if train:
        cached_rows = list(np.asarray(cached_rows, np.int64)[
            rng.permutation(len(cached_rows))])
        miss_rows = list(np.asarray(miss_rows, np.int64)[
            rng.permutation(len(miss_rows))])
    # cached pool keeps exactly nb*n_c records; the rest move to the
    # upload pool (a cached record can always be served by upload)
    upool = miss_rows + cached_rows[nb * n_c:]
    cpool = cached_rows[:nb * n_c]
    assert len(cpool) == nb * n_c and len(upool) == nb * n_u - n_pad
    pad_rec = upool[-1] if upool else (cpool[-1] if cpool else 0)
    first_pad = len(upool)
    upool = upool + [pad_rec] * n_pad
    for b in range(nb):
        recs_c = [records[i] for i in cpool[b * n_c:(b + 1) * n_c]]
        uslice = upool[b * n_u:(b + 1) * n_u]
        recs_u = [records[i] for i in uslice]
        # pads are the upload pool's tail -> prefix mask stays valid
        n_valid = n_c + n_u - sum(
            1 for k in range(len(uslice)) if b * n_u + k >= first_pad)
        yield n_valid, recs_c, recs_u


class Stereo3DLoader:
    """MADS stereo batches for CDRNet training/eval.

    Yields device-ready dicts (see preprocess_stereo_batch) carrying a
    "row_valid" (B,) mask; padded rows repeat the last record (static
    shapes for jit) and are masked out by the train/eval steps.
    """

    def __init__(self, cfg, image_set: str, mesh=None, seed: int = 0,
                 decode_threads: int = 4, cache_bytes: int = 0,
                 device_cache_bytes: int = 0, return_masks: bool = False):
        """cache_bytes > 0 enables an in-RAM cache of decoded uint8 frames
        (exact numerics — frames are cached pre-warp). Epochs after the
        first skip JPEG decode entirely for cached frames; on this class of
        host the decode is otherwise the training bottleneck (the device
        step is ~25x faster than single-core JPEG decode of a batch).

        device_cache_bytes > 0 additionally keeps the decoded frames
        RESIDENT IN DEVICE HBM (data/device_cache.py): batches are then
        assembled on device by index gather, so after the one-time upload
        no frame bytes cross the host->device link at all — the loop runs
        at the compiled step rate instead of the link rate. Falls back to
        the host path when the dataset exceeds the budget, frames are not
        uniform-size, or the run is multi-process (per-host shards can't
        be replicated)."""
        self.cfg = cfg
        self.image_set = image_set
        self.train = image_set == cfg.DATASET.TRAIN_SET
        records = build_mads_stereo_index(cfg.DATASET.ROOT, image_set)
        self.records, self._global_num, self._filler = _shard_for_host(records)
        self.batch_size = (cfg.TRAIN.BATCH_SIZE if self.train
                           else cfg.TEST.BATCH_SIZE)
        self.image_size = tuple(cfg.MODEL.IMAGE_SIZE)
        self.occlusion = cfg.DATASET.OCCLUSION
        self.scale_factor = cfg.DATASET.SCALE_FACTOR
        self.rot_factor = cfg.DATASET.ROT_FACTOR
        self.mesh = mesh
        self.seed = seed
        self._epoch = 0
        self._pool = ThreadPoolExecutor(max_workers=decode_threads)
        self._decode_paths = _BatchDecoder(self._pool)
        self._cache_budget = cache_bytes
        self._cache_used = 0
        self._cache = {}         # path -> uint8 array
        self._device_cache_budget = device_cache_bytes
        self._device_cache = None
        self._device_cache_failed = False
        # include the occlusion keep-masks in each batch (inspection
        # tooling [ref: tools/visualize.py:35-63]); off in training
        self.return_masks = return_masks

    def close(self):
        """Shut down the decode pool. Loaders usually live for the whole
        process, but bench/sweep code creating several per run should
        release the threads promptly (the stream class had exactly this
        leak before moving to the shared pool)."""
        self._pool.shutdown(wait=False)

    def __len__(self):
        return _num_lockstep_batches(self._global_num, self.batch_size)

    @property
    def num_samples(self):
        return self._global_num

    def _decode_stereo(self, recs: List[dict]):
        """Decode both views; native C++ batch decoder when available
        (MADS frames share one size), threaded cv2/PIL otherwise; a
        byte-budgeted RAM cache skips re-decoding across epochs."""
        paths = ([r["image_left"] for r in recs]
                 + [r["image_right"] for r in recs])
        if not self._cache_budget:
            imgs = self._decode_paths(paths)
        else:
            unique_missing = [p for p in dict.fromkeys(paths)
                              if p not in self._cache]
            fresh = {}
            if unique_missing:
                decoded = self._decode_paths(unique_missing)
                fresh = dict(zip(unique_missing, decoded))
                for p, img in fresh.items():
                    if self._cache_used + img.nbytes <= self._cache_budget:
                        self._cache[p] = img
                        self._cache_used += img.nbytes
            imgs = [self._cache[p] if p in self._cache else fresh[p]
                    for p in paths]
        n = len(recs)
        return imgs[:n], imgs[n:]

    def _meta_arrays(self, recs: List[dict], rng: np.random.RandomState,
                     hw_list) -> dict:
        """Per-sample affine + projection/pose arrays (no frames).

        Draws the train-time scale/rot randomness in RECORD ORDER — the
        cached and uncached paths consume the RandomState identically, so
        a cached epoch is bit-identical to an uncached one at equal seed.
        """
        B = len(recs)
        trans = np.zeros((B, 2, 3), np.float64)
        for i, (rec, (h, w)) in enumerate(zip(recs, hw_list)):
            c = np.array([w / 2, h / 2])
            s, r = (1.0, 0.0)
            if self.train:
                s, r = _train_scale_rot(rng, self.scale_factor,
                                        self.rot_factor)
            trans[i] = get_affine_transform(c, s, r, min(h, w),
                                            self.image_size)
        return {
            "trans": trans.astype(np.float32),
            "P_l": np.stack([r["P_left"] for r in recs]).astype(np.float32),
            "P_r": np.stack([r["P_right"] for r in recs]).astype(np.float32),
            "pose_3d": np.stack([r["pose_3d"] for r in recs])
                .astype(np.float32),
            "joints_vis": np.stack([r["joints_vis"][:, 0] for r in recs])
                .astype(np.float32),
        }

    def _host_batch(self, recs: List[dict], rng: np.random.RandomState):
        imgs_l, imgs_r = self._decode_stereo(recs)
        hb = self._meta_arrays(recs, rng,
                               [im.shape[:2] for im in imgs_l])
        hb["img_l"] = np.stack(imgs_l)
        hb["img_r"] = np.stack(imgs_r)
        return hb

    def _epoch_rec_batches(self, rng):
        """Yields (n_valid, recs) with static-shape padding applied."""
        order = (rng.permutation(len(self.records)) if self.train
                 else np.arange(len(self.records)))
        B = self.batch_size
        for b in range(len(self)):
            idx = order[b * B:(b + 1) * B]
            n_valid = len(idx)
            recs = [self.records[i] for i in idx]
            if not recs:         # lockstep batch beyond this host's shard
                recs = [self._filler]     # row_valid=0: never counted
            while len(recs) < B:                        # pad final batch
                recs.append(recs[-1])
            yield n_valid, recs

    def ensure_device_cache(self):
        """Build the HBM frame cache once; record failure and fall back.

        When the dataset exceeds the budget (real-MADS scale: ~7-16 GB
        decoded vs 16 GB HBM shared with model state), a PARTIAL cache
        is built instead (single-process, no mesh): the largest prefix
        of records whose stereo pairs fit stays resident, and batches
        mix on-device gathers with a fixed-size host upload lane for the
        misses (see _epoch_partial_batches) — per-step link traffic
        drops by the cached fraction instead of all-or-nothing."""
        if self._device_cache is not None or self._device_cache_failed:
            return self._device_cache
        if not self._device_cache_budget:
            self._device_cache_failed = True
            return None
        if jax.process_count() > 1:
            # per-host record shards hold different frames; a replicated
            # global array can't be assembled host-locally
            self._device_cache_failed = True
            return None
        from .device_cache import DeviceFrameCache
        paths = [rec[k] for rec in self.records
                 for k in ("image_left", "image_right")]
        # partial lanes are sized per-epoch (n_c/n_u) — under a mesh the
        # lanes generally don't divide the device count, so partial mode
        # is single-device only; full caches still work under a mesh
        cache = DeviceFrameCache.build(
            paths, self._decode_paths, self._device_cache_budget,
            mesh=self.mesh, allow_partial=self.mesh is None,
            pair_stride=2)
        if cache is None:
            self._device_cache_failed = True
            return None
        self._device_cache = cache
        return cache

    def _epoch_partial_batches(self, rng, cache):
        """Partial-cache epoch schedule (records whose BOTH views are
        resident form the cached lane); see _partial_epoch_schedule."""
        return _partial_epoch_schedule(
            self.records, self.batch_size, len(self), rng,
            lambda r: (cache.has(r["image_left"])
                       and cache.has(r["image_right"])),
            self.train)

    @property
    def device_cached(self) -> bool:
        """True once frames are resident in HBM (after the first epoch
        of iteration with DEVICE_CACHE_BYTES set)."""
        return self._device_cache is not None

    def stacked_epoch(self):
        """One epoch's batches as STACKED host arrays for the scan-epoch
        train/eval path (whole epoch = one dispatch; see
        train/steps.make_train_epoch_cdr). Requires the device cache.

        Returns (cache, xs, epoch_index) where xs maps each batch key to
        a (S, B, ...) numpy array: idx_l/idx_r (S, B) int32, trans
        (S, B, 2, 3), P_l/P_r (S, B, 4, 4), pose_3d (S, B, J, 3),
        joints_vis (S, B, J), row_valid (S, B). Consumes the SAME
        RandomState sequence as one __iter__ epoch, so alternating
        stacked and per-batch epochs keeps the augmentation schedule.
        Occlusion PRNG differs from the per-batch path (fold_in(step)
        instead of a sequential split chain — a chain would cost one
        relay RPC per step, which is exactly what this path removes).
        """
        cache = self.ensure_device_cache()
        if cache is None:
            raise RuntimeError(
                "stacked_epoch requires the device frame cache "
                "(DEVICE_CACHE_BYTES) — use iteration for streaming")
        if cache.partial:
            # stacking an epoch would keep every miss frame resident for
            # the scan's duration — exactly the memory the partial cache
            # exists to avoid. Loops use the per-batch path instead.
            raise RuntimeError(
                "stacked_epoch requires a FULL device cache; this "
                "dataset exceeds DEVICE_CACHE_BYTES (partial cache) — "
                "use per-batch iteration")
        rng = np.random.RandomState(self.seed + self._epoch)
        epoch_index = self._epoch
        self._epoch += 1
        hw = cache.frames.shape[1:3]
        cols = {k: [] for k in ("idx_l", "idx_r", "trans", "P_l", "P_r",
                                "pose_3d", "joints_vis", "row_valid")}
        for n_valid, recs in self._epoch_rec_batches(rng):
            hb = self._meta_arrays(recs, rng, [hw] * len(recs))
            hb["idx_l"] = cache.rows([r["image_left"] for r in recs])
            hb["idx_r"] = cache.rows([r["image_right"] for r in recs])
            hb["row_valid"] = _row_mask(n_valid, self.batch_size)
            for k in cols:
                cols[k].append(hb[k])
        xs = {k: np.stack(v) for k, v in cols.items()}
        return cache, xs, epoch_index

    def __iter__(self):
        rng = np.random.RandomState(self.seed + self._epoch)
        key = jax.random.PRNGKey(self.seed * 10007 + self._epoch)
        self._epoch += 1
        cache = self.ensure_device_cache()
        occl = self.occlusion if self.train else None

        def gen_partial():
            """Partial-cache batches: fixed cached-gather + upload lanes
            (preprocess_stereo_batch_partial); only the miss lane's raw
            frames cross the host->device link."""
            nonlocal key
            hw = cache.frames.shape[1:3]
            for n_valid, recs_c, recs_u in self._epoch_partial_batches(
                    rng, cache):
                key, sub = jax.random.split(key)
                rv = _row_mask(n_valid, self.batch_size)
                recs = recs_c + recs_u
                imgs_l, imgs_r = (self._decode_stereo(recs_u)
                                  if recs_u else ([], []))
                hb = self._meta_arrays(recs, rng, [hw] * len(recs))
                up_shape = (0, *hw, 3) if not recs_u else None
                batch = preprocess_stereo_batch_partial(
                    sub, cache.frames,
                    cache.rows([r["image_left"] for r in recs_c]),
                    cache.rows([r["image_right"] for r in recs_c]),
                    (np.stack(imgs_l) if recs_u
                     else np.zeros(up_shape, np.uint8)),
                    (np.stack(imgs_r) if recs_u
                     else np.zeros(up_shape, np.uint8)),
                    hb["trans"], hb["P_l"], hb["P_r"], hb["pose_3d"],
                    hb["joints_vis"], image_size=self.image_size,
                    occlusion=occl, train=self.train,
                    return_masks=self.return_masks)
                batch["row_valid"] = rv
                yield batch

        def gen():
            nonlocal key
            from ..parallel import shard_batch
            for n_valid, recs in self._epoch_rec_batches(rng):
                key, sub = jax.random.split(key)
                rv = _row_mask(n_valid, self.batch_size)
                if cache is not None:
                    hb = self._meta_arrays(
                        recs, rng, [cache.frames.shape[1:3]] * len(recs))
                    hb["idx_l"] = cache.rows(
                        [r["image_left"] for r in recs])
                    hb["idx_r"] = cache.rows(
                        [r["image_right"] for r in recs])
                    if self.mesh is not None:
                        hb = shard_batch(self.mesh, hb)
                        rv = shard_batch(self.mesh, rv)
                    batch = preprocess_stereo_batch_cached(
                        sub, cache.frames, hb["idx_l"], hb["idx_r"],
                        hb["trans"], hb["P_l"], hb["P_r"], hb["pose_3d"],
                        hb["joints_vis"], image_size=self.image_size,
                        occlusion=occl, train=self.train,
                        return_masks=self.return_masks)
                else:
                    hb = self._host_batch(recs, rng)
                    if self.mesh is not None:
                        # shard the HOST batch (uint8 frames, 4x lighter
                        # than normalized float32) BEFORE the device
                        # preprocess, which then runs SPMD on the sharded
                        # arrays — under multiple processes the old
                        # preprocess-then-shard order forced a
                        # device->host->device round trip of the whole
                        # preprocessed batch every step
                        hb = shard_batch(self.mesh, hb)
                        rv = shard_batch(self.mesh, rv)
                    batch = preprocess_stereo_batch(
                        sub, hb["img_l"], hb["img_r"], hb["trans"],
                        hb["P_l"], hb["P_r"], hb["pose_3d"],
                        hb["joints_vis"], image_size=self.image_size,
                        occlusion=occl, train=self.train,
                        return_masks=self.return_masks)
                batch["row_valid"] = rv
                yield batch

        if cache is not None and cache.partial:
            return _prefetch(gen_partial())
        return _prefetch(gen())


class Mono2DLoader:
    """Single-view batches for PoseResNet training/eval (MPII / MADS_2d).

    Per-sample flip/scale/rot randomness and the joint-coordinate affine
    happen on host exactly as the reference [ref: dataset/base.py:56-98].
    For fixed-size sources (MADS_2d) the image warp + normalization +
    heatmap render run as ONE jitted device program
    (device_pipeline.preprocess_mono_batch); variable-size sources (MPII)
    warp on host cv2 per sample, then render targets on device.
    """

    def __init__(self, cfg, image_set: str, mesh=None, seed: int = 0,
                 decode_threads: int = 4,
                 device_preprocess: Optional[bool] = None,
                 device_cache_bytes: int = 0):
        self.cfg = cfg
        self.image_set = image_set
        self.train = image_set == cfg.DATASET.TRAIN_SET
        dataset_type = cfg.DATASET.TYPE
        if dataset_type == "MPII":
            records = build_mpii_index(cfg.DATASET.ROOT, image_set,
                                       cfg.MODEL.NUM_JOINTS)
            self.flip_pairs = MPII_FLIP_PAIRS
        elif dataset_type == "MADS_2d":
            records = build_mads_index(cfg.DATASET.ROOT, image_set)
            self.flip_pairs = MADS_FLIP_PAIRS
        else:
            raise NotImplementedError(dataset_type)
        self.records, self._global_num, self._filler = _shard_for_host(records)
        self.dataset_type = dataset_type
        # device warp is the default for BOTH sources: MADS frames are
        # uniform-size; MPII's variable-size frames are zero-padded to a
        # bucketed batch max (pad reads are zero — exactly cv2's
        # BORDER_CONSTANT, so the warp is unchanged; bucketing bounds the
        # number of distinct compiled shapes). device_preprocess=False
        # restores the reference-exact host cv2 path.
        self.device_preprocess = (device_preprocess
                                  if device_preprocess is not None
                                  else True)
        # pad-to-bucket only needed for variable-size sources
        self.pad_bucket = 128 if dataset_type == "MPII" else None
        self.batch_size = (cfg.TRAIN.BATCH_SIZE if self.train
                           else cfg.TEST.BATCH_SIZE)
        self.image_size = tuple(cfg.MODEL.IMAGE_SIZE)
        self.heatmap_size = tuple(cfg.MODEL.EXTRA.HEATMAP_SIZE)
        self.sigma = cfg.MODEL.EXTRA.SIGMA
        self.flip = cfg.DATASET.FLIP
        self.scale_factor = cfg.DATASET.SCALE_FACTOR
        self.rot_factor = cfg.DATASET.ROT_FACTOR
        self.mesh = mesh
        self.seed = seed
        self._epoch = 0
        self._pool = ThreadPoolExecutor(max_workers=decode_threads)
        self._decode_paths = _BatchDecoder(self._pool)
        self._device_cache_budget = device_cache_bytes
        self._device_cache = None
        self._device_cache_failed = False

    def close(self):
        """Shut down the decode pool (see Stereo3DLoader.close)."""
        self._pool.shutdown(wait=False)

    def __len__(self):
        return _num_lockstep_batches(self._global_num, self.batch_size)

    @property
    def num_samples(self):
        return self._global_num

    def _prepare_sample(self, rec, aug, img, hw=None):
        """aug: (scale_mult, rot_deg, do_flip) drawn on the main thread —
        RandomState is not thread-safe, so randomness never crosses into
        the worker pool. `img` is the pre-decoded frame (batch-decoded,
        native C++ path for fixed-size sources), or None in the
        device-cache path (frames stay resident on device; `hw` supplies
        the uniform frame size and the flip runs on device).

        Returns (img, trans, joints_t, vis, do_flip): `img` is host-warped
        for the host path, the raw (possibly flipped) frame for the device
        path, or None for the cached path; joints are always transformed
        to output coords on host (they depend on per-sample python RNG
        exactly as the reference).
        """
        h, w = img.shape[:2] if img is not None else hw

        if self.dataset_type == "MPII":
            c = rec["center"].copy()
            s = rec["scale"].copy()
            joints = rec["joints"][:, :2].copy()
            vis = rec["joints_vis"].copy()
        else:
            c = np.array([w / 2, h / 2])
            s = np.array([1.0, 1.0])
            joints = rec["joints"][:, :2].copy()
            vis = rec["joints_vis"].copy()
        origin_size = (200 if self.dataset_type == "MPII"  # scale units
                       else min(h, w))

        s_mult, r, do_flip = aug
        s = s * s_mult
        if do_flip:
            if img is not None:
                img = img[:, ::-1, :]
            joints3 = np.concatenate(
                [joints, np.zeros((joints.shape[0], 1))], axis=1)
            joints3, vis = fliplr_joints(joints3, vis, w, self.flip_pairs)
            joints = joints3[:, :2]
            c[0] = w - c[0] - 1

        trans = get_affine_transform(c, s, r, origin_size, self.image_size)
        # transform only visible joints [ref: dataset/base.py:94-96]
        visible = vis[:, 0] > 0
        joints_t = joints.copy()
        if visible.any():
            joints_t[visible] = affine_transform_points(
                joints[visible], trans)
        if img is not None and not self.device_preprocess:
            img = self._warp_host(img, trans)
        return img, trans.astype(np.float32), joints_t, vis[:, 0], do_flip

    def _bucket_pad(self, imgs: List[np.ndarray]) -> np.ndarray:
        """Zero-pad a variable-size raw batch to the batch max rounded up
        to `pad_bucket` multiples, so the device warp sees one of a small
        set of static shapes (each distinct shape compiles once).

        Zero padding is semantically exact: cv2.warpAffine reads 0 beyond
        the true frame (BORDER_CONSTANT default) and ops.warp.affine_warp
        zero-fills out-of-bounds samples — padded pixels only ever supply
        the zeros both would produce anyway."""
        b = self.pad_bucket
        hb = -(-max(im.shape[0] for im in imgs) // b) * b
        wb = -(-max(im.shape[1] for im in imgs) // b) * b
        out = np.zeros((len(imgs), hb, wb, imgs[0].shape[2]),
                       imgs[0].dtype)
        for i, im in enumerate(imgs):
            out[i, :im.shape[0], :im.shape[1]] = im
        return out

    def _warp_host(self, img, trans):
        try:
            import cv2
            return cv2.warpAffine(
                img, trans,
                (int(self.image_size[0]), int(self.image_size[1])),
                flags=cv2.INTER_LINEAR)
        except ImportError:
            from ..ops.warp import affine_warp
            out = affine_warp(img[None], trans, self.image_size)
            return np.asarray(out[0]).astype(np.uint8)

    def _draw_augs(self, rng, recs):
        augs = []
        for _ in recs:
            if self.train:
                s_mult, r = _train_scale_rot(rng, self.scale_factor,
                                             self.rot_factor)
                do_flip = self.flip and rng.random_sample() <= 0.5
            else:
                s_mult, r, do_flip = 1.0, 0.0, False
            augs.append((s_mult, r, do_flip))
        return augs

    def _epoch_rec_batches(self, rng):
        order = (rng.permutation(len(self.records)) if self.train
                 else np.arange(len(self.records)))
        B = self.batch_size
        for b in range(len(self)):
            idx = list(order[b * B:(b + 1) * B])
            n_valid = len(idx)
            recs = [self.records[i] for i in idx]
            if not recs:         # lockstep batch beyond this host's shard
                recs = [self._filler]     # row_valid=0: never counted
            while len(recs) < B:
                recs.append(recs[-1])
            yield n_valid, recs

    def _epoch_host_batches(self, rng):
        for n_valid, recs in self._epoch_rec_batches(rng):
            augs = self._draw_augs(rng, recs)
            imgs_raw = self._decode_paths([r["image"] for r in recs])
            samples = list(self._pool.map(
                lambda ra: self._prepare_sample(ra[0], ra[1], ra[2]),
                zip(recs, augs, imgs_raw)))
            if self.device_preprocess and self.pad_bucket:
                imgs = self._bucket_pad([s[0] for s in samples])
            else:
                imgs = np.stack([np.ascontiguousarray(s[0])
                                 for s in samples])
            trans = np.stack([s[1] for s in samples])
            joints = np.stack([s[2] for s in samples]).astype(np.float32)
            vis = np.stack([s[3] for s in samples]).astype(np.float32)
            yield n_valid, imgs, trans, joints, vis

    def ensure_device_cache(self):
        """Build the HBM frame cache once (uniform-size sources only —
        MPII's variable frames make build() return None and the host path
        stays); requires device_preprocess (the warp must run on device
        for frames to stay resident)."""
        if self._device_cache is not None or self._device_cache_failed:
            return self._device_cache
        if (not self._device_cache_budget or not self.device_preprocess
                or jax.process_count() > 1):
            self._device_cache_failed = True
            return None
        from .device_cache import DeviceFrameCache
        # over-budget datasets get a PARTIAL cache (single-device only;
        # see Stereo3DLoader.ensure_device_cache)
        cache = DeviceFrameCache.build(
            [rec["image"] for rec in self.records], self._decode_paths,
            self._device_cache_budget, mesh=self.mesh,
            allow_partial=self.mesh is None)
        if cache is None:
            self._device_cache_failed = True
            return None
        self._device_cache = cache
        return cache

    def _epoch_partial_batches(self, rng, cache):
        return _partial_epoch_schedule(
            self.records, self.batch_size, len(self), rng,
            lambda r: cache.has(r["image"]), self.train)

    @property
    def device_cached(self) -> bool:
        return self._device_cache is not None

    def stacked_epoch(self):
        """One epoch as STACKED host arrays for the scan-epoch 2D path
        (train/steps.make_train_epoch_2d); requires the device cache.
        Returns (cache, xs, epoch_index) with xs keys idx (S, B) int32,
        flip (S, B) bool, trans (S, B, 2, 3), joints (S, B, J, 2),
        vis (S, B, J), row_valid (S, B). Consumes the same RandomState
        sequence as one __iter__ epoch."""
        cache = self.ensure_device_cache()
        if cache is None:
            raise RuntimeError(
                "stacked_epoch requires the device frame cache "
                "(DEVICE_CACHE_BYTES) — use iteration for streaming")
        if cache.partial:
            # stacking an epoch would keep every miss frame resident for
            # the scan's duration — exactly the memory the partial cache
            # exists to avoid. Loops use the per-batch path instead.
            raise RuntimeError(
                "stacked_epoch requires a FULL device cache; this "
                "dataset exceeds DEVICE_CACHE_BYTES (partial cache) — "
                "use per-batch iteration")
        rng = np.random.RandomState(self.seed + self._epoch)
        epoch_index = self._epoch
        self._epoch += 1
        hw = (int(cache.frames.shape[1]), int(cache.frames.shape[2]))
        cols = {k: [] for k in ("idx", "flip", "trans", "joints", "vis",
                                "row_valid")}
        for n_valid, recs in self._epoch_rec_batches(rng):
            augs = self._draw_augs(rng, recs)
            samples = [self._prepare_sample(rec, aug, None, hw=hw)
                       for rec, aug in zip(recs, augs)]
            cols["idx"].append(cache.rows([r["image"] for r in recs]))
            cols["flip"].append(np.asarray([s[4] for s in samples], bool))
            cols["trans"].append(np.stack([s[1] for s in samples]))
            cols["joints"].append(
                np.stack([s[2] for s in samples]).astype(np.float32))
            cols["vis"].append(
                np.stack([s[3] for s in samples]).astype(np.float32))
            cols["row_valid"].append(_row_mask(n_valid, self.batch_size))
        xs = {k: np.stack(v) for k, v in cols.items()}
        return cache, xs, epoch_index

    def __iter__(self):
        rng = np.random.RandomState(self.seed + self._epoch)
        self._epoch += 1
        cache = self.ensure_device_cache()

        def partial_gen():
            """Partial-cache batches: cached-gather lane + raw-frame
            upload lane (preprocess_mono_batch_partial); both lanes flip
            on device, so the upload ships unflipped raw frames."""
            hw = (int(cache.frames.shape[1]), int(cache.frames.shape[2]))
            for n_valid, recs_c, recs_u in self._epoch_partial_batches(
                    rng, cache):
                recs = recs_c + recs_u
                augs = self._draw_augs(rng, recs)
                samples = [self._prepare_sample(rec, aug, None, hw=hw)
                           for rec, aug in zip(recs, augs)]
                idx = cache.rows([r["image"] for r in recs_c])
                up = (np.stack(self._decode_paths(
                          [r["image"] for r in recs_u]))
                      if recs_u else np.zeros((0, *hw, 3), np.uint8))
                flip = np.asarray([s[4] for s in samples], bool)
                trans = np.stack([s[1] for s in samples])
                joints = np.stack([s[2] for s in samples]) \
                    .astype(np.float32)
                vis = np.stack([s[3] for s in samples]).astype(np.float32)
                batch = preprocess_mono_batch_partial(
                    cache.frames, idx, up, flip, trans, joints, vis,
                    image_size=self.image_size,
                    heatmap_size=self.heatmap_size, sigma=self.sigma)
                batch["row_valid"] = _row_mask(n_valid, self.batch_size)
                yield batch

        def cached_gen():
            from ..parallel import shard_batch
            hw = (int(cache.frames.shape[1]), int(cache.frames.shape[2]))
            for n_valid, recs in self._epoch_rec_batches(rng):
                augs = self._draw_augs(rng, recs)
                samples = [self._prepare_sample(rec, aug, None, hw=hw)
                           for rec, aug in zip(recs, augs)]
                idx = cache.rows([r["image"] for r in recs])
                flip = np.asarray([s[4] for s in samples], bool)
                trans = np.stack([s[1] for s in samples])
                joints = np.stack([s[2] for s in samples]) \
                    .astype(np.float32)
                vis = np.stack([s[3] for s in samples]).astype(np.float32)
                rv = _row_mask(n_valid, self.batch_size)
                if self.mesh is not None:
                    idx, flip, trans, joints, vis, rv = shard_batch(
                        self.mesh, (idx, flip, trans, joints, vis, rv))
                batch = preprocess_mono_batch_cached(
                    cache.frames, idx, flip, trans, joints, vis,
                    image_size=self.image_size,
                    heatmap_size=self.heatmap_size, sigma=self.sigma)
                batch["row_valid"] = rv
                yield batch

        def gen():
            from ..ops.warp import normalize_imagenet
            from ..ops.heatmap import render_gaussian_heatmaps
            for n_valid, imgs, trans, joints, vis in \
                    self._epoch_host_batches(rng):
                rv = _row_mask(n_valid, self.batch_size)
                if self.mesh is not None:
                    # shard host arrays first; preprocess runs SPMD (see
                    # the stereo loader for why)
                    from ..parallel import shard_batch
                    imgs, trans, joints, vis, rv = shard_batch(
                        self.mesh, (imgs, trans, joints, vis, rv))
                if self.device_preprocess:
                    batch = preprocess_mono_batch(
                        imgs, trans, joints, vis,
                        image_size=self.image_size,
                        heatmap_size=self.heatmap_size, sigma=self.sigma)
                else:
                    target, weight = render_gaussian_heatmaps(
                        joints, vis, self.heatmap_size, self.image_size,
                        self.sigma)
                    batch = {
                        "image": normalize_imagenet(imgs),
                        "target": target,
                        "target_weight": weight,
                    }
                batch["row_valid"] = rv
                yield batch

        if cache is not None and cache.partial:
            return _prefetch(partial_gen())
        return _prefetch(cached_gen() if cache is not None else gen())


def load_data(config, mesh=None, seed: int = 0):
    """Dataset dispatch mirroring the reference [ref: tools/load.py:105-134].

    Returns (train_loader, valid_loader).
    """
    t = config.DATASET.TYPE
    kwargs = {}
    if t in ("MPII", "MADS_2d"):
        cls = Mono2DLoader
        kwargs["device_cache_bytes"] = config.DATASET.DEVICE_CACHE_BYTES
    elif t == "MADS_3d":
        cls = Stereo3DLoader
        kwargs["cache_bytes"] = config.DATASET.CACHE_BYTES
        kwargs["device_cache_bytes"] = config.DATASET.DEVICE_CACHE_BYTES
    else:
        raise NotImplementedError(t)
    train_loader = cls(config, config.DATASET.TRAIN_SET, mesh=mesh,
                       seed=seed, **kwargs)
    valid_loader = cls(config, config.DATASET.TEST_SET, mesh=mesh,
                       seed=seed + 1, **kwargs)
    return train_loader, valid_loader
