"""Tests for the batched one-sided Jacobi SVD (ops/small_svd.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast3dhpe_tpu.ops.small_svd import (
    jacobi_svd, pinv_small, smallest_right_singular_vector)

rng = np.random.RandomState(0)


class TestJacobiSVD:
    @pytest.mark.parametrize("shape", [(30, 4, 4), (8, 19, 4, 4), (50, 4, 3)])
    def test_reconstruction_and_singular_values(self, shape):
        A = rng.randn(*shape).astype(np.float32)
        U, S, V = jacobi_svd(jnp.asarray(A))
        U, S, V = map(np.asarray, (U, S, V))
        # singular values match LAPACK (descending)
        S_ref = np.linalg.svd(A.astype(np.float64), compute_uv=False)
        np.testing.assert_allclose(S, S_ref, rtol=1e-5, atol=1e-5)
        # A = U diag(S) V^T
        recon = np.einsum("...ij,...j,...kj->...ik", U, S, V)
        np.testing.assert_allclose(recon, A, atol=1e-5)
        # V orthogonal
        n = shape[-1]
        VtV = np.einsum("...ji,...jk->...ik", V, V)
        np.testing.assert_allclose(
            VtV, np.broadcast_to(np.eye(n), VtV.shape), atol=1e-5)

    def test_large_scale_matrices(self):
        """Projection-matrix-scale entries (~1e6) keep full accuracy."""
        A = (rng.randn(20, 4, 4) * np.array([1e3, 1e3, 1e3, 1e6])) \
            .astype(np.float32)
        U, S, V = jacobi_svd(jnp.asarray(A))
        S_ref = np.linalg.svd(A.astype(np.float64), compute_uv=False)
        np.testing.assert_allclose(np.asarray(S), S_ref, rtol=1e-4)

    def test_pinv_matches_numpy_fp64(self):
        for shape in [(10, 3, 4), (10, 4, 3), (5, 4, 4)]:
            A = rng.randn(*shape).astype(np.float32)
            got = np.asarray(pinv_small(jnp.asarray(A)))
            ref = np.linalg.pinv(A.astype(np.float64))
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_pinv_realistic_projections(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from test_model_parity import stereo_projections
        P = stereo_projections(3)
        got = np.asarray(pinv_small(jnp.asarray(P, jnp.float32)))
        ref = np.linalg.pinv(P.astype(np.float64))
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5

    def test_smallest_rsv_nullvector(self):
        # construct rank-3 4x4 matrices with known null vector
        B = 16
        basis = rng.randn(B, 3, 4).astype(np.float32)
        coeffs = rng.randn(B, 4, 3).astype(np.float32)
        A = coeffs @ basis                                # rank <= 3
        v = np.asarray(smallest_right_singular_vector(jnp.asarray(A)))
        # A v ~ 0
        Av = np.einsum("bij,bj->bi", A, v)
        assert np.abs(Av).max() < 1e-4 * np.abs(A).max()
        assert np.allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)

    def test_differentiable(self):
        A = jnp.asarray(rng.randn(4, 4, 4).astype(np.float32))

        def loss(A):
            v = smallest_right_singular_vector(A)
            return jnp.sum((v[..., :3] / v[..., 3:]) ** 2)

        g = jax.grad(loss)(A)
        assert np.isfinite(np.asarray(g)).all()

    def test_matches_xla_svd_dlt(self):
        """jacobi and XLA svd DLT agree on noisy systems."""
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from test_geometry import two_view_setup
        from fast3dhpe_tpu.geometry import dlt_triangulate
        P1, P2, X, uv1, uv2 = two_view_setup(7)
        uv1 = uv1 + rng.randn(*uv1.shape) * 2.0
        uv2 = uv2 + rng.randn(*uv2.shape) * 2.0
        proj = np.stack([P1[:3], P2[:3]])[None].repeat(X.shape[0], 0)
        pts = np.stack([uv1, uv2], axis=1)
        a = np.asarray(dlt_triangulate(proj, pts, method="jacobi"))
        b = np.asarray(dlt_triangulate(proj, pts, method="svd"))
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=0.5)
