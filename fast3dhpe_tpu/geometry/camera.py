"""Camera projection math.

jnp re-design of /root/reference/tools/common.py:5-48. All functions are
batched over arbitrary leading axes and jit-safe (static shapes, no Python
control flow on data).
"""

from __future__ import annotations

import jax.numpy as jnp


def world_to_camera(points, R, T):
    """World -> camera frame. [ref: tools/common.py:5-16]

    Args:
      points: (..., N, 3) world points.
      R: (..., 3, 3) rotation.
      T: (..., 3, 1) translation.
    Returns:
      (..., N, 3) camera-frame points.
    """
    points = jnp.asarray(points, jnp.float32)
    R = jnp.asarray(R, jnp.float32)
    T = jnp.asarray(T, jnp.float32)
    return jnp.einsum("...ij,...nj->...ni", R, points) + jnp.swapaxes(T, -1, -2)


def camera_to_image(points, K):
    """Camera frame -> pixel coords. [ref: tools/common.py:19-25]

    Returns (..., N, 3): columns 0,1 are pixel x,y; column 2 is depth,
    matching the reference's convention of keeping z in the third column.
    """
    points = jnp.asarray(points, jnp.float32)
    K = jnp.asarray(K, jnp.float32)
    p = jnp.einsum("...ij,...nj->...ni", K, points)
    xy = p[..., :2] / p[..., 2:3]
    return jnp.concatenate([xy, p[..., 2:3]], axis=-1)


def get_projection_matrix(K, R, T):
    """P = [K [R|T]; 0 0 0 1], shape (..., 4, 4). [ref: tools/common.py:28-32]"""
    K = jnp.asarray(K, jnp.float32)
    R = jnp.asarray(R, jnp.float32)
    T = jnp.asarray(T, jnp.float32)
    Rt = jnp.concatenate([R, T], axis=-1)              # (..., 3, 4)
    P3 = jnp.einsum("...ij,...jk->...ik", K, Rt)       # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32), P3.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([P3, bottom], axis=-2)


def project_points_np(points_3d, P):
    """Pure-numpy twin of project_points, for HOST-side loops (per-frame
    jnp dispatch costs ~20 ms RPC per op through the axon relay). Same
    semantics: (..., N, 3) x (..., 3or4, 4) -> (..., N, 2)."""
    import numpy as np
    pts = np.asarray(points_3d, np.float32)
    P3 = np.asarray(P, np.float32)[..., :3, :]
    h = np.concatenate([pts, np.ones_like(pts[..., :1])], axis=-1)
    uvw = np.einsum("...ij,...nj->...ni", P3, h)
    with np.errstate(divide="ignore", invalid="ignore"):
        return uvw[..., :2] / uvw[..., 2:3]


def project_3d_to_2d(pose_3d, K, R, T):
    """World 3D -> pixel coords (..., N, 3). [ref: tools/common.py:35-40]"""
    return camera_to_image(world_to_camera(pose_3d, R, T), K)


def project_points(points_3d, P):
    """Project world points through a (3,4)-or-(4,4) projection matrix.

    jnp equivalent of MADS3DDataset._project_3d_to_2d
    [ref: dataset/mads_3d.py:85-90]. Batched over leading axes.

    Args:
      points_3d: (..., N, 3)
      P: (..., 3, 4) or (..., 4, 4); only the first 3 rows are used.
    Returns:
      (..., N, 2) pixel coordinates.
    """
    points_3d = jnp.asarray(points_3d, jnp.float32)
    P = jnp.asarray(P, jnp.float32)[..., :3, :]
    ones = jnp.ones(points_3d.shape[:-1] + (1,), jnp.float32)
    homo = jnp.concatenate([points_3d, ones], axis=-1)  # (..., N, 4)
    proj = jnp.einsum("...ij,...nj->...ni", P, homo)    # (..., N, 3)
    return proj[..., :2] / proj[..., 2:3]


def rodrigues(rvec):
    """Rotation vector -> rotation matrix (Rodrigues formula).

    Replaces cv2.Rodrigues used in the reference ETL
    [ref: extract_data.py:66-69] with a pure-jnp closed form, so the
    geometry path has no OpenCV dependency.

    Args:
      rvec: (..., 3) rotation vector.
    Returns:
      (..., 3, 3) rotation matrix.
    """
    rvec = jnp.asarray(rvec, jnp.float32)
    if rvec.shape[-1] != 3:
        raise ValueError(f"rvec must have trailing dim 3, got {rvec.shape}")
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)   # (..., 1)
    eps = 1e-12
    k = rvec / (theta + eps)                                 # (..., 3)
    zeros = jnp.zeros_like(k[..., 0])
    # skew-symmetric cross-product matrix, batched over leading axes
    K = jnp.stack([
        jnp.stack([zeros, -k[..., 2], k[..., 1]], axis=-1),
        jnp.stack([k[..., 2], zeros, -k[..., 0]], axis=-1),
        jnp.stack([-k[..., 1], k[..., 0], zeros], axis=-1),
    ], axis=-2)                                              # (..., 3, 3)
    I = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), K.shape)
    t = theta[..., None]                                     # (..., 1, 1)
    R = I + jnp.sin(t) * K + (1.0 - jnp.cos(t)) * (K @ K)
    return jnp.where(t < eps, I, R)
