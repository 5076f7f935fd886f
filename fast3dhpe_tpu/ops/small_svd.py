"""Batched one-sided Jacobi SVD for tiny matrices (DLT / pinv hot path).

XLA's generic jnp.linalg.svd on (B, 4, 4) batches costs hundreds of ms on
TPU (iterative Golub-Kahan with scalar-heavy control), which made the
reference-parity DLT [ref: models/cdrnet.py:151-179] and projection pinv
[ref: models/cdrnet.py:236-237] dominate CDRNet inference. One-sided
Jacobi is a fixed unrolled schedule of column rotations — every operation
is a batched elementwise op or tiny einsum, no per-matrix control flow —
and converges quadratically (SWEEPS=10 reaches fp32 roundoff for n<=4).

Produces the same estimator as the reference (full SVD; smallest right
singular vector for DLT), with high relative accuracy (a known property of
one-sided Jacobi), and is differentiable by construction (plain jnp ops).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_SWEEPS = 10


def _rotate_pair(W, V, p, q):
    """One Jacobi rotation orthogonalizing columns p, q of W (batched).

    W: (..., m, n) working matrix (columns converge to u_i * sigma_i).
    V: (..., n, n) accumulated right singular vectors.
    """
    wp = W[..., :, p]
    wq = W[..., :, q]
    alpha = jnp.sum(wp * wp, axis=-1)
    beta = jnp.sum(wq * wq, axis=-1)
    gamma = jnp.sum(wp * wq, axis=-1)

    # Rotation angle via atan2: theta = 0.5 * atan2(2*gamma, alpha - beta).
    # The textbook zeta = (beta-alpha)/(2*gamma) formulation was evaluated
    # and rejected: as the sweep converges gamma -> 0 and the VJP of the
    # 1/gamma intermediate overflows fp32 (0 * inf = NaN in the backward
    # pass) even though the forward value is fine. atan2's gradient is
    # bounded by 1/r; the only singular point (0, 0) — an already-diagonal
    # pair — is guarded to a zero rotation.
    # gamma' = 0.5*sin(2t)*(alpha-beta) + cos(2t)*gamma = 0
    #   =>  2t = atan2(-2*gamma, alpha - beta)
    denom = alpha - beta
    degenerate = (gamma * gamma + denom * denom) < 1e-30
    theta = jnp.where(
        degenerate, 0.0,
        0.5 * jnp.arctan2(-2.0 * gamma,
                          jnp.where(degenerate, 1.0, denom)))
    c = jnp.cos(theta)
    s = jnp.sin(theta)

    c = c[..., None]
    s = s[..., None]
    new_wp = c * wp - s * wq
    new_wq = s * wp + c * wq
    W = W.at[..., :, p].set(new_wp)
    W = W.at[..., :, q].set(new_wq)

    vp = V[..., :, p]
    vq = V[..., :, q]
    V = V.at[..., :, p].set(c * vp - s * vq)
    V = V.at[..., :, q].set(s * vp + c * vq)
    return W, V


@partial(jax.jit, static_argnames=("sweeps",))
def jacobi_svd(A, sweeps: int = _SWEEPS):
    """One-sided Jacobi SVD of small batched matrices.

    Args:
      A: (..., m, n) with m >= n, n small (<= ~8).
    Returns:
      U: (..., m, n) left singular vectors (columns).
      S: (..., n) singular values, descending.
      V: (..., n, n) right singular vectors (columns).
    """
    A = jnp.asarray(A)
    n = A.shape[-1]
    # normalize overall scale for fp32 headroom (P entries reach ~1e6)
    scale = jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True)
    scale = jnp.where(scale == 0.0, 1.0, scale)
    W = A / scale
    V = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype),
                         A.shape[:-2] + (n, n))
    V = V + jnp.zeros_like(V)  # materialize (broadcast_to is read-only)

    for _ in range(sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                W, V = _rotate_pair(W, V, p, q)

    # sqrt(sum + tiny) instead of jnp.linalg.norm: the norm's gradient at an
    # exactly-zero column (rank-deficient input) is 0/0 = NaN.
    S = jnp.sqrt(jnp.sum(W * W, axis=-2) + 1e-30)        # (..., n)
    # sort descending
    order = jnp.argsort(-S, axis=-1)
    S_sorted = jnp.take_along_axis(S, order, axis=-1)
    V_sorted = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    W_sorted = jnp.take_along_axis(W, order[..., None, :], axis=-1)
    U = W_sorted / jnp.where(S_sorted[..., None, :] == 0.0, 1.0,
                             S_sorted[..., None, :])
    return U, S_sorted * scale[..., 0], V_sorted


@jax.jit
def smallest_right_singular_vector(A):
    """v_min of A (..., m, n): the DLT solution vector.

    Only V is needed; singular values decide which column.
    """
    _, _, V = jacobi_svd(A)
    return V[..., :, -1]


@jax.jit
def pinv_small(A):
    """Pseudo-inverse of small batched (..., m, n) matrices via Jacobi SVD.

    Keeps ALL singular values (rtol=0 semantics — required for projection
    matrices whose sigma spread exceeds fp32-default cutoffs; see
    geometry/triangulation.pinv_projection).
    """
    transpose = A.shape[-2] < A.shape[-1]
    if transpose:                  # wide: pinv(A) = pinv(A^T)^T
        A = jnp.swapaxes(A, -1, -2)
    U, S, V = jacobi_svd(A)
    S_inv = jnp.where(S == 0.0, 0.0, 1.0 / S)
    out = jnp.einsum("...ij,...j,...kj->...ik", V, S_inv, U)
    if transpose:
        out = jnp.swapaxes(out, -1, -2)
    return out
