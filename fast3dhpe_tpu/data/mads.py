"""MADS dataset index builders (single-view 2D and stereo 3D).

Host-side equivalents of MADS2DDataset._get_db [ref: dataset/mads.py:64-105]
and MADS3DDataset._get_db [ref: dataset/mads_3d.py:123-173]: glob the
extracted directory tree

    <root>/<image_set>/<movement>/<sequence>/{left,right,pose}/NNNN.{jpg,json}

parse per-frame calibration + 3D pose JSON, and produce record dicts. All
heavy work (decode, warp, target render) happens later, in the loader and
the device pipeline.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List

import numpy as np

from ..geometry.camera import project_3d_to_2d
from ..geometry.affine import compose_projection_with_affine  # noqa: F401

# MADS skeleton [ref: dataset/mads.py:17-20]
MADS_FLIP_PAIRS = [[2, 6], [3, 7], [4, 8], [5, 9], [10, 14],
                   [11, 15], [12, 16], [13, 17]]
MADS_PARENT_IDS = [0, 0, 1, 2, 3, 4, 1, 6, 7, 8, 0, 10, 11,
                   12, 0, 14, 15, 16, 0]


def _get_projection_matrix_np(K, R, T):
    """P = [K [R|T]; 0 0 0 1] in numpy. [ref: tools/common.py:28-32]"""
    P = np.asarray(K) @ np.hstack((np.asarray(R), np.asarray(T)))
    return np.vstack((P, np.array([0.0, 0.0, 0.0, 1.0])))


def _load_pose_json(path: str):
    with open(path, "r") as f:
        data = json.load(f)
    return data["calibs_info"], np.array(data["pose_3d"], dtype=np.float64)


def build_mads_index(root: str, image_set: str) -> List[Dict]:
    """Single-view (right camera) 2D records. [ref: dataset/mads.py:64-105]

    NaN joints are zeroed with visibility 0; GT 2D is the projection of the
    3D pose through the right camera.
    """
    right_img_paths = sorted(glob.glob(
        os.path.join(root, image_set, "**/**/right/*.jpg")))
    gt_pose_paths = sorted(glob.glob(
        os.path.join(root, image_set, "**/**/pose/*.json")))
    assert len(right_img_paths) == len(gt_pose_paths), \
        "Number of images and ground truths must match"
    if not right_img_paths:
        raise FileNotFoundError(
            f"No MADS frames under {os.path.join(root, image_set)} — "
            f"run apps/extract_data.py first (expected "
            f"<root>/<set>/<movement>/<seq>/right/*.jpg)")

    records = []
    for img_path, pose_path in zip(right_img_paths, gt_pose_paths):
        calibs_info, pose_3d = _load_pose_json(pose_path)
        K = np.array(calibs_info["cam_right"]["intrinsics"])
        R = np.array(calibs_info["cam_right"]["rotation"])
        T = np.array(calibs_info["cam_right"]["translation"])

        mask = np.isnan(pose_3d)
        pose_3d[mask] = 0
        joints_vis = np.ones_like(pose_3d)
        joints_vis[mask] = 0

        pose_2d = np.asarray(project_3d_to_2d(pose_3d, K, R, T),
                             dtype=np.float64)
        records.append({
            "image": img_path,
            "joints": pose_2d,          # (J, 3): x, y, depth
            "joints_vis": joints_vis,   # (J, 3)
        })
    return records


def build_mads_stereo_index(root: str, image_set: str) -> List[Dict]:
    """Stereo records with 4x4 projection matrices.
    [ref: dataset/mads_3d.py:123-173]"""
    left_img_paths = sorted(glob.glob(
        os.path.join(root, image_set, "**/**/left/*.jpg")))
    right_img_paths = sorted(glob.glob(
        os.path.join(root, image_set, "**/**/right/*.jpg")))
    gt_pose_paths = sorted(glob.glob(
        os.path.join(root, image_set, "**/**/pose/*.json")))
    assert len(left_img_paths) == len(right_img_paths) == len(gt_pose_paths), \
        "Number of images and ground truths must match"
    if not left_img_paths:
        raise FileNotFoundError(
            f"No MADS stereo frames under {os.path.join(root, image_set)} — "
            f"run apps/extract_data.py first (expected "
            f"<root>/<set>/<movement>/<seq>/{{left,right,pose}}/)")

    records = []
    for left, right, pose_path in zip(left_img_paths, right_img_paths,
                                      gt_pose_paths):
        calibs_info, pose_3d = _load_pose_json(pose_path)

        mask = np.isnan(pose_3d)
        pose_3d[mask] = 0
        joints_vis = np.ones_like(pose_3d)
        joints_vis[mask] = 0
        # a joint is visible only if all 3 coords were finite
        # [ref: dataset/mads_3d.py:156-158]
        joints_vis = np.logical_and.reduce(joints_vis, axis=1, keepdims=True)

        P_left = _get_projection_matrix_np(
            calibs_info["cam_left"]["intrinsics"],
            calibs_info["cam_left"]["rotation"],
            calibs_info["cam_left"]["translation"])
        P_right = _get_projection_matrix_np(
            calibs_info["cam_right"]["intrinsics"],
            calibs_info["cam_right"]["rotation"],
            calibs_info["cam_right"]["translation"])

        records.append({
            "image_left": left,
            "image_right": right,
            "P_left": P_left,           # (4, 4)
            "P_right": P_right,         # (4, 4)
            "joints_vis": joints_vis,   # (J, 1) bool-ish
            "pose_3d": pose_3d,         # (J, 3)
        })
    return records
