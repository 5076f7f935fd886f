"""Multi-view triangulation: closed-form, differentiable DLT, and SII.

TPU-first re-design of the reference's triangulation paths:

- closed-form 2-view triangulation [ref: tools/common.py:51-71] — the
  reference loops over joints and calls np.linalg.eig per point; here the
  whole joint set is one batched small-matrix SVD.
- differentiable DLT [ref: models/cdrnet.py:151-179] — the reference loops
  over 19 joints calling torch.svd per joint; here all B*J systems are
  solved by one batched one-sided Jacobi SVD (ops/small_svd.py), with
  XLA's generic `svd` kept as a cross-check method.
- SII (shifted inverse iterations) [ref: models/cdrnet.py:181-222] — the
  SVD-free fallback; the reference's random torch.rand init is replaced by
  a deterministic init (or an explicit PRNG key), since data-dependent RNG
  inside jit must be keyed.

Gradients flow through all three (jnp.linalg.eigh/svd are differentiable),
preserving CDRNet's end-to-end trainable 3D path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def pinv_projection(P):
    """Pseudo-inverse of (..., 3, 4) projection matrices, SVD-based.

    Matches torch.linalg.pinv in the reference [ref: models/cdrnet.py:236-237],
    computed with the batched one-sided Jacobi SVD (ops/small_svd.py):
    1.5ms vs 169ms for XLA's generic svd at batch 64x2 on TPU, and MORE
    accurate (1.9e-7 vs 4.5e-5 rel error on real-scale P).

    Two alternatives were evaluated and rejected:
    - closed form P^T (P P^T)^{-1}: real MADS projection matrices have
      entries up to ~1e6; squaring the condition number costs ~20% relative
      error in fp32, which the FTL feeds into the fusion features.
    - jnp.linalg.pinv with default rcond: real P has singular values
      spanning ~[1, 2e6] and the default relative cutoff (~5e-6) silently
      truncates the smallest one, corrupting the result entirely. All
      singular values must be kept (torch semantics).

    Returns (..., 4, 3).
    """
    from ..ops.small_svd import pinv_small
    P = jnp.asarray(P, jnp.float32)
    return pinv_small(P)


def _dlt_system(proj, points):
    """Assemble the DLT linear system A (..., 2V, 4).

    A rows per view v: [y_v * P_v[2] - P_v[1] ; x_v * P_v[2] - P_v[0]]
    — written as points * P[2] - P[:2] exactly as the reference does
    [ref: models/cdrnet.py:169-173], so row order/sign match for parity.

    Args:
      proj: (..., V, 3, 4) projection matrices.
      points: (..., V, 2) pixel coordinates.
    """
    proj = jnp.asarray(proj, jnp.float32)
    points = jnp.asarray(points, jnp.float32)
    # (..., V, 2, 4) = (..., V, 1, 4) * (..., V, 2, 1) - (..., V, 2, 4)
    A = proj[..., 2:3, :] * points[..., :, None] - proj[..., :2, :]
    return A.reshape(A.shape[:-3] + (-1, 4))             # (..., 2V, 4)


def _dehomogenize(v, eps: float = 1e-9):
    """(..., 4) homogeneous -> (..., 3). Sign of v cancels out.

    |w| is floored at eps: an UNTRAINED stereo net predicts near-identical
    keypoints in both views, whose rays triangulate at infinity (w -> 0).
    The reference divides unguarded [ref: models/cdrnet.py:176-178] and
    relies on torch not differentiating unused outputs during its 2D-only
    warmup; under jax.grad the resulting inf gradient would multiply the
    warmup's zero cotangent into NaN (0 * inf) and poison the shared
    encoder. The floor leaves every sane triangulation untouched (unit-norm
    v puts |w| ~ 1e-4..1 for real poses).
    """
    w = v[..., 3:4]
    w_safe = jnp.where(jnp.abs(w) < eps,
                       jnp.where(w < 0, -eps, eps), w)
    return v[..., :3] / w_safe


@partial(jax.jit, static_argnames=("method",))
def dlt_triangulate(proj, points, method: str = "jacobi"):
    """Differentiable DLT triangulation, batched over all leading axes.

    [ref: models/cdrnet.py:151-179 (svd), 181-222 (sii alternative)]

    Args:
      proj: (..., V, 3, 4) per-view projection matrices.
      points: (..., V, 2) per-view 2D detections.
      method:
        "jacobi" (default): smallest right singular vector via the batched
          one-sided Jacobi SVD (ops/small_svd.py) — the SAME estimator as
          the reference's torch.svd, 270x faster than XLA's generic svd on
          TPU for these tiny systems and more accurate in fp32 (0.005mm vs
          0.18mm on pathologically-scaled synthetic rigs).
        "svd": XLA's jnp.linalg.svd — kept for cross-validation.
        "sii": shifted inverse iterations [ref: models/cdrnet.py:181-222]
          — SVD-free, pure solve/matmul (see sii_triangulate).
        ("eigh" of A^T A was evaluated and rejected: cond(A^T A) =
        cond(A)^2 makes XLA's fp32 eigh produce >10mm errors.)
    Returns:
      (..., 3) triangulated world points.
    """
    if method == "sii":
        return sii_triangulate(proj, points)
    A = _dlt_system(proj, points)                        # (..., 2V, 4)
    if method == "jacobi":
        from ..ops.small_svd import smallest_right_singular_vector
        homo = smallest_right_singular_vector(A)
    elif method == "svd":
        # 2V >= 4 rows, so the reduced SVD keeps all 4 right singular
        # vectors; full_matrices=False is required for JAX to differentiate.
        _, _, vh = jnp.linalg.svd(A, full_matrices=False)
        homo = -vh[..., -1, :]                           # (..., 4)
    else:
        raise ValueError(f"unknown DLT method {method!r}")
    return _dehomogenize(homo)


@partial(jax.jit, static_argnames=("num_iterations",))
def sii_triangulate(proj, points, num_iterations: int = 2, key=None,
                    shift: float = 1e-6):
    """Shifted-inverse-iteration triangulation (SVD/eigh-free).
    [ref: models/cdrnet.py:181-222 — dead code in the reference]

    Pure matmul/solve — maps cleanly onto the MXU. The reference initializes
    with torch.rand [ref: models/cdrnet.py:210]; under jit RNG must be keyed,
    so the default is a deterministic all-ones init (converges equally for
    these well-conditioned systems) and a PRNG `key` can be passed to
    reproduce randomized starts.

    fp32 conditioning (measured on synthetic camera-scale rigs, P entries
    up to ~1e6): the normal matrix AtA has cond(A)^2 ~ 1e17+, and its
    sigma_3^2/trace sits at 4e-8..4e-4 — AT the fp32 formation-noise floor,
    so both the reference's raw formulation (zero pivots -> NaNs in the
    LU solve) and a row-normalized variant (shift lands above sigma_3^2,
    iteration stalls at metre-scale errors) fail. The fix is Hartley-style
    COLUMN equilibration: scale each column of A to unit norm (a diagonal
    change of homogeneous coordinates — exact-data null vector unchanged,
    mapped back by the same diagonal), which lifts sigma_3^2/trace to
    3e-2..2e-1. The shift is then RELATIVE to the (equilibrated) trace
    of 4. Under ~1px detection noise this weighted DLT differs from the
    raw-DLT estimate by ~1mm — a different legitimate estimator, not an
    error.

    Args:
      proj: (..., V, 3, 4); points: (..., V, 2).
      shift: relative spectral shift (x trace(M) = 4).
    Returns:
      (..., 3).
    """
    A = _dlt_system(proj, points)                        # (..., 2V, 4)
    colnorm = jnp.linalg.norm(A, axis=-2, keepdims=True)  # (..., 1, 4)
    D = 1.0 / jnp.maximum(colnorm, 1e-30)
    An = A * D
    M = jnp.einsum("...ki,...kj->...ij", An, An)
    B = M + (4.0 * shift) * jnp.eye(4, dtype=M.dtype)

    if key is None:
        b = jnp.ones(M.shape[:-2] + (4,), M.dtype)
    else:
        b = jax.random.uniform(key, M.shape[:-2] + (4,), M.dtype)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)

    def body(_, b):
        b = jnp.linalg.solve(B, b[..., None])[..., 0]
        return b / jnp.linalg.norm(b, axis=-1, keepdims=True)

    b = jax.lax.fori_loop(0, num_iterations, body, b)
    return _dehomogenize(-b * D[..., 0, :])


@jax.jit
def triangulate_closed_form(P1, P2, pts1, pts2):
    """Closed-form two-view triangulation. [ref: tools/common.py:51-71]

    The reference builds, per point, M = [[y1*P1[2]-P1[1]; P1[0]-x1*P1[2]],
    [y2*P2[2]-P2[1]; P2[0]-x2*P2[2]]] and takes the eigenvector of M^T M
    with the smallest eigenvalue. Here the entire joint set is one batched
    symmetric eigendecomposition.

    Args:
      P1, P2: (4, 4) or (3, 4) projection matrices (rows 0..2 used).
      pts1, pts2: (N, 2) pixel coordinates in each view.
    Returns:
      (N, 3) world points.
    """
    def rows(P, pts):
        P = jnp.asarray(P, jnp.float32)
        pts = jnp.asarray(pts, jnp.float32)
        r0 = pts[:, 1:2] * P[2][None, :] - P[1][None, :]   # y*P2 - P1
        r1 = P[0][None, :] - pts[:, 0:1] * P[2][None, :]   # P0 - x*P2
        return jnp.stack([r0, r1], axis=1)                  # (N, 2, 4)

    M = jnp.concatenate([rows(P1, pts1), rows(P2, pts2)], axis=1)  # (N, 4, 4)
    # Smallest-singular-vector via the batched Jacobi SVD of M directly:
    # far better conditioned in fp32 than eig(M^T M) (cond squares under
    # the square) and ~100x faster than XLA's generic svd on TPU.
    from ..ops.small_svd import smallest_right_singular_vector
    homo = smallest_right_singular_vector(M)
    return _dehomogenize(homo)
