"""Batched on-device preprocessing for stereo MADS training.

The reference preprocesses per sample on host CPU inside DataLoader
workers: cv2.warpAffine both views, occlusion masking, torchvision
normalize, visibility bookkeeping [ref: dataset/mads_3d.py:175-228,
dataset/base.py:56-98]. Here the whole batch is ONE jitted device program:

  uint8 raw stereo batch -> affine warp -> (train) Cutout gating ->
  projection-matrix composition -> GT 2D reprojection -> visibility
  processing (boundary + occlusion) -> ImageNet normalization

Host work per sample is reduced to JPEG decode + drawing 3 random scalars.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.warp import affine_warp, normalize_imagenet
from ..ops.occlusion import cutout, hide_n_seek
from ..geometry.camera import project_points


def compose_projection_batched(P, trans):
    """P <- T @ P with T = eye(4), T[:2,:3] = trans, batched.
    [ref: dataset/mads_3d.py:223-226]

    Args:
      P: (B, 4, 4); trans: (B, 2, 3).
    Returns:
      (B, 4, 4).
    """
    P = jnp.asarray(P, jnp.float32)
    trans = jnp.asarray(trans, jnp.float32)
    B = P.shape[0]
    T = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    T = T.at[:, :2, :3].set(trans)
    return jnp.einsum("bij,bjk->bik", T, P)


def _check_boundary(pose_2d, height, width):
    """Zero-visibility + (-1,-1) coords for out-of-bounds joints.
    [ref: tools/utils.py:200-207]"""
    valid = ((pose_2d[..., 0] >= 0) & (pose_2d[..., 0] < width) &
             (pose_2d[..., 1] >= 0) & (pose_2d[..., 1] < height))
    pose_2d = jnp.where(valid[..., None], pose_2d, -1.0)
    return pose_2d, valid


def _check_occlusion(pose_2d, keep_mask):
    """Visibility from the occlusion keep-mask at each joint's pixel.
    [ref: tools/utils.py:184-197; -1 coords wrap to the last pixel exactly
    like numpy's negative indexing in the reference]"""
    x = pose_2d[..., 0].astype(jnp.int32)                # (B, J)
    y = pose_2d[..., 1].astype(jnp.int32)
    H, W = keep_mask.shape[-2:]
    x = jnp.where(x < 0, x + W, x)
    y = jnp.where(y < 0, y + H, y)
    x = jnp.clip(x, 0, W - 1)
    y = jnp.clip(y, 0, H - 1)
    vals = jnp.take_along_axis(
        keep_mask.reshape(keep_mask.shape[0], -1),
        y * W + x, axis=1)                               # (B, J)
    return vals


def _preprocess_stereo_core(key, img_l, img_r, trans, P_l, P_r, pose_3d,
                            joints_vis, image_size: Tuple[int, int],
                            occlusion: Optional[str] = None,
                            train: bool = False, occl_prob: float = 0.3,
                            return_masks: bool = False):
    """Full stereo preprocessing on device.

    Args:
      key: PRNG key (occlusion randomness).
      img_l, img_r: (B, H0, W0, 3) uint8 raw frames.
      trans: (B, 2, 3) per-sample affine (host draws scale/rot randomness).
      P_l, P_r: (B, 4, 4) raw projection matrices.
      pose_3d: (B, J, 3) world GT.
      joints_vis: (B, J) base visibility (NaN joints already zeroed).
      image_size: (W, H) output size.
      occlusion: None | "CUTOUT" | "HNS".
      train: occlusion + visibility processing only in training
        [ref: dataset/mads_3d.py:57-60, 218-221].
      return_masks: also return the occlusion keep-masks, for the
        mask-inspection view [ref: tools/visualize.py:35-63].
    Returns:
      dict: image (B, 2, H, W, 3) normalized; proj (B, 2, 3, 4) composed;
      target_3d (B, J, 3); target_2d (B, 2, J, 2); target_weight (B, J);
      (+ keep_mask (B, 2, H, W) bool if return_masks).
    """
    B = img_l.shape[0]
    W, H = image_size

    warped_l = affine_warp(img_l, trans, image_size)     # (B, H, W, 3) f32
    warped_r = affine_warp(img_r, trans, image_size)

    keep_l = jnp.ones((B, H, W), bool)
    keep_r = jnp.ones((B, H, W), bool)
    if train and occlusion not in (None, "None"):
        kg, kl, kr = jax.random.split(key, 3)
        occ_fn = cutout if occlusion == "CUTOUT" else hide_n_seek
        occ_l, mask_l = occ_fn(kl, warped_l)
        occ_r, mask_r = occ_fn(kr, warped_r)
        # per-sample gating with p=0.3 [ref: dataset/mads_3d.py:218-221]
        gate = jax.random.uniform(kg, (B,)) <= occl_prob
        warped_l = jnp.where(gate[:, None, None, None], occ_l, warped_l)
        warped_r = jnp.where(gate[:, None, None, None], occ_r, warped_r)
        keep_l = jnp.where(gate[:, None, None], mask_l, keep_l)
        keep_r = jnp.where(gate[:, None, None], mask_r, keep_r)

    P_l_new = compose_projection_batched(P_l, trans)
    P_r_new = compose_projection_batched(P_r, trans)

    target_2d_l = project_points(pose_3d, P_l_new[:, :3])
    target_2d_r = project_points(pose_3d, P_r_new[:, :3])

    weight = jnp.asarray(joints_vis, jnp.float32)
    if train:
        # process_vis [ref: dataset/mads_3d.py:92-121]
        target_2d_l, valid_l = _check_boundary(target_2d_l, H, W)
        target_2d_r, valid_r = _check_boundary(target_2d_r, H, W)
        weight = weight * valid_l * valid_r
        if occlusion not in (None, "None"):
            vis_l = _check_occlusion(target_2d_l, keep_l)
            vis_r = _check_occlusion(target_2d_r, keep_r)
            weight = weight * (vis_l & vis_r)

    image = jnp.stack([normalize_imagenet(warped_l),
                       normalize_imagenet(warped_r)], axis=1)
    proj = jnp.stack([P_l_new[:, :3], P_r_new[:, :3]], axis=1)
    target_2d = jnp.stack([target_2d_l, target_2d_r], axis=1)

    out = {
        "image": image,
        "proj": proj,
        "target_3d": jnp.asarray(pose_3d, jnp.float32),
        "target_2d": target_2d,
        "target_weight": weight,
    }
    if return_masks:
        out["keep_mask"] = jnp.stack([keep_l, keep_r], axis=1)
    return out


preprocess_stereo_batch = partial(jax.jit, static_argnames=(
    "image_size", "occlusion", "train", "return_masks"))(
    _preprocess_stereo_core)


@partial(jax.jit, static_argnames=("image_size", "occlusion", "train",
                                   "return_masks"))
def preprocess_stereo_batch_cached(key, frames, idx_l, idx_r, trans,
                                   P_l, P_r, pose_3d, joints_vis,
                                   image_size: Tuple[int, int],
                                   occlusion: Optional[str] = None,
                                   train: bool = False,
                                   occl_prob: float = 0.3,
                                   return_masks: bool = False):
    """preprocess_stereo_batch fed from a device-resident frame cache.

    frames is the (N, H0, W0, 3) uint8 resident array holding BOTH views'
    frames (data.device_cache.DeviceFrameCache.frames, passed as an
    argument — never closed over); idx_l / idx_r are (B,) int32 rows for
    the left/right frame of each sample. The batch is gathered on device
    and flows through the identical preprocessing core, so cached epochs
    are bit-identical to uncached ones; only ~KBs of indices/affines cross
    the host->device link per step.
    """
    img_l = jnp.take(frames, jnp.asarray(idx_l, jnp.int32), axis=0)
    img_r = jnp.take(frames, jnp.asarray(idx_r, jnp.int32), axis=0)
    return _preprocess_stereo_core(
        key, img_l, img_r, trans, P_l, P_r, pose_3d, joints_vis,
        image_size=image_size, occlusion=occlusion, train=train,
        occl_prob=occl_prob, return_masks=return_masks)


@partial(jax.jit, static_argnames=("image_size", "occlusion", "train",
                                   "return_masks"))
def preprocess_stereo_batch_partial(key, frames, idx_l, idx_r, up_l, up_r,
                                    trans, P_l, P_r, pose_3d, joints_vis,
                                    image_size: Tuple[int, int],
                                    occlusion: Optional[str] = None,
                                    train: bool = False,
                                    occl_prob: float = 0.3,
                                    return_masks: bool = False):
    """Stereo preprocess fed from a PARTIAL device frame cache.

    The batch is split into two fixed-size lanes (loader partial-cache
    schedule): the first idx_l.shape[0] rows gather both views from the
    resident `frames` array exactly like preprocess_stereo_batch_cached;
    the remaining up_l.shape[0] rows arrive as host-uploaded raw uint8
    frames (cache misses — the only frame bytes crossing the link). The
    two lanes are concatenated (cheap: one batch-sized buffer, no full
    -cache copy) and flow through the identical preprocessing core.
    trans/P/pose/joints_vis cover the full batch in lane order
    (cached rows first, upload rows after).
    """
    img_l = jnp.concatenate(
        [jnp.take(frames, jnp.asarray(idx_l, jnp.int32), axis=0),
         jnp.asarray(up_l)], axis=0)
    img_r = jnp.concatenate(
        [jnp.take(frames, jnp.asarray(idx_r, jnp.int32), axis=0),
         jnp.asarray(up_r)], axis=0)
    return _preprocess_stereo_core(
        key, img_l, img_r, trans, P_l, P_r, pose_3d, joints_vis,
        image_size=image_size, occlusion=occlusion, train=train,
        occl_prob=occl_prob, return_masks=return_masks)


def _preprocess_mono_core(img, trans, joints, joints_vis,
                          image_size: Tuple[int, int],
                          heatmap_size: Tuple[int, int], sigma: int = 3):
    """Mono 2D preprocessing: warp + normalize + gaussian target render.

    Host pre-applies flip and joint-coordinate transforms (they depend on
    per-sample python RNG exactly as in the reference); the image warp and
    the heatmap rendering are the heavy parts and run here.

    Args:
      img: (B, H0, W0, 3) uint8 (fixed-size sources, e.g. MADS frames);
        already flipped where the host chose to flip.
      trans: (B, 2, 3); joints: (B, J, 2) already transformed to output
        coords; joints_vis: (B, J).
    Returns:
      dict: image (B, H, W, 3); target (B, h, w, J); target_weight (B, J).
    """
    from ..ops.heatmap import render_gaussian_heatmaps

    warped = affine_warp(img, trans, image_size)
    target, weight = render_gaussian_heatmaps(
        joints, joints_vis, heatmap_size, image_size, sigma)
    return {
        "image": normalize_imagenet(warped),
        "target": target,
        "target_weight": weight,
    }


preprocess_mono_batch = partial(jax.jit, static_argnames=(
    "image_size", "heatmap_size", "sigma"))(_preprocess_mono_core)


@partial(jax.jit, static_argnames=("image_size", "heatmap_size", "sigma"))
def preprocess_mono_batch_cached(frames, idx, flip, trans, joints,
                                 joints_vis, image_size: Tuple[int, int],
                                 heatmap_size: Tuple[int, int],
                                 sigma: int = 3):
    """preprocess_mono_batch fed from a device-resident frame cache.

    frames (N, H0, W0, 3) uint8 resident array (argument, never closed
    over); idx (B,) int32 rows; flip (B,) bool — the horizontal flip the
    host path applies to the raw frame pre-warp [ref: dataset/base.py:80-86]
    runs here as an exact on-device mirror (joint coordinates were
    already flipped on host), so cached epochs match uncached ones
    bit-for-bit.
    """
    img = jnp.take(frames, jnp.asarray(idx, jnp.int32), axis=0)
    img = jnp.where(jnp.asarray(flip, bool)[:, None, None, None],
                    img[:, :, ::-1, :], img)
    return _preprocess_mono_core(img, trans, joints, joints_vis,
                                 image_size=image_size,
                                 heatmap_size=heatmap_size, sigma=sigma)


@partial(jax.jit, static_argnames=("image_size", "heatmap_size", "sigma"))
def preprocess_mono_batch_partial(frames, idx, up, flip, trans, joints,
                                  joints_vis, image_size: Tuple[int, int],
                                  heatmap_size: Tuple[int, int],
                                  sigma: int = 3):
    """Mono preprocess fed from a PARTIAL device frame cache (see
    preprocess_stereo_batch_partial): the first idx.shape[0] rows gather
    from the resident `frames`; the up.shape[0] miss rows arrive as raw
    host uploads. flip covers the full batch in lane order and mirrors
    on device for both lanes (the upload lane ships UNFLIPPED raw frames
    so RAM-cache hits stay flip-agnostic, exactly like the cached
    path)."""
    img = jnp.concatenate(
        [jnp.take(frames, jnp.asarray(idx, jnp.int32), axis=0),
         jnp.asarray(up)], axis=0)
    img = jnp.where(jnp.asarray(flip, bool)[:, None, None, None],
                    img[:, :, ::-1, :], img)
    return _preprocess_mono_core(img, trans, joints, joints_vis,
                                 image_size=image_size,
                                 heatmap_size=heatmap_size, sigma=sigma)
