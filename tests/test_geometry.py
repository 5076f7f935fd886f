"""Golden-value tests for the geometry layer.

Oracles are tiny NumPy implementations transcribed from the reference's
documented behavior (tools/common.py, dataset/transforms.py,
models/cdrnet.py geometry methods), plus cv2/torch cross-checks where those
libraries are available on the host.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast3dhpe_tpu.geometry import (
    world_to_camera, camera_to_image, get_projection_matrix,
    project_3d_to_2d, project_points, rodrigues,
    triangulate_closed_form, dlt_triangulate, sii_triangulate,
    pinv_projection,
    get_affine_transform, affine_transform_points, fliplr_joints,
    compose_projection_with_affine, update_intrinsics_with_affine,
)

rng = np.random.RandomState(0)


def random_camera(seed=0):
    r = np.random.RandomState(seed)
    K = np.array([[1100.0, 2.0, 512.0], [0.0, 1090.0, 380.0], [0.0, 0.0, 1.0]])
    axis = r.randn(3)
    axis /= np.linalg.norm(axis)
    angle = r.uniform(0.1, 1.0)
    # numpy rodrigues oracle
    kx, ky, kz = axis
    Kx = np.array([[0, -kz, ky], [kz, 0, -kx], [-ky, kx, 0]])
    R = np.eye(3) + np.sin(angle) * Kx + (1 - np.cos(angle)) * (Kx @ Kx)
    T = r.randn(3, 1) * 100 + np.array([[0.0], [0.0], [3000.0]])
    return K, R, T, axis * angle


class TestCamera:
    def test_world_to_camera(self):
        K, R, T, _ = random_camera(1)
        pts = rng.randn(19, 3) * 500
        # oracle: homogeneous Rt transform [ref tools/common.py:5-16]
        expected = (R @ pts.T + T).T
        got = np.asarray(world_to_camera(pts, R, T))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-3)

    def test_project_3d_to_2d_matches_composed_P(self):
        K, R, T, _ = random_camera(2)
        pts = rng.randn(19, 3) * 300 + np.array([0, 0, 100.0])
        p1 = np.asarray(project_3d_to_2d(pts, K, R, T))
        P = np.asarray(get_projection_matrix(K, R, T))
        assert P.shape == (4, 4)
        np.testing.assert_allclose(P[3], [0, 0, 0, 1])
        p2 = np.asarray(project_points(pts, P))
        np.testing.assert_allclose(p1[:, :2], p2, rtol=1e-4, atol=1e-2)

    def test_projection_roundtrip(self):
        # a world point projected in two views triangulates back
        K, R, T, _ = random_camera(3)
        P = np.asarray(get_projection_matrix(K, R, T))
        pts = rng.randn(10, 3) * 200 + np.array([0, 0, 50.0])
        uv = np.asarray(project_points(pts, P))
        # depth positive for sanity
        cam = (R @ pts.T + T).T
        assert (cam[:, 2] > 0).all()
        assert np.isfinite(uv).all()

    def test_rodrigues_against_scipy(self):
        scipy = pytest.importorskip("scipy.spatial.transform")
        for seed in range(5):
            _, _, _, rvec = random_camera(seed)
            R_expected = scipy.Rotation.from_rotvec(rvec).as_matrix()
            R_got = np.asarray(rodrigues(rvec))
            np.testing.assert_allclose(R_got, R_expected, atol=1e-5)

    def test_rodrigues_zero(self):
        np.testing.assert_allclose(np.asarray(rodrigues(np.zeros(3))),
                                   np.eye(3), atol=1e-6)

    def test_rodrigues_batched(self):
        """(..., 3) -> (..., 3, 3), each leading element independent
        (round-1 advisor: the old impl silently used only rvec[0])."""
        scipy = pytest.importorskip("scipy.spatial.transform")
        rvecs = np.stack([random_camera(s)[3] for s in range(6)])
        rvecs = rvecs.reshape(2, 3, 3)
        R = np.asarray(rodrigues(rvecs))
        assert R.shape == (2, 3, 3, 3)
        for i in range(2):
            for j in range(3):
                expected = scipy.Rotation.from_rotvec(
                    rvecs[i, j]).as_matrix()
                np.testing.assert_allclose(R[i, j], expected, atol=1e-5)

    def test_batched_project_points(self):
        K, R, T, _ = random_camera(4)
        P = np.asarray(get_projection_matrix(K, R, T))[:3]
        pts = rng.randn(4, 19, 3) * 200 + np.array([0, 0, 2000.0])
        batched = np.asarray(project_points(pts, np.broadcast_to(P, (4, 3, 4))))
        for b in range(4):
            single = np.asarray(project_points(pts[b], P))
            np.testing.assert_allclose(batched[b], single, rtol=1e-5, atol=1e-3)


def two_view_setup(seed=0, n=19):
    r = np.random.RandomState(seed)
    K1, R1, T1, _ = random_camera(seed * 2 + 10)
    K2, R2, T2, _ = random_camera(seed * 2 + 11)
    P1 = np.asarray(get_projection_matrix(K1, R1, T1))
    P2 = np.asarray(get_projection_matrix(K2, R2, T2))
    X = r.randn(n, 3) * 300 + np.array([0, 0, 200.0])
    uv1 = np.asarray(project_points(X, P1))
    uv2 = np.asarray(project_points(X, P2))
    return P1, P2, X, uv1, uv2


class TestTriangulation:
    def test_closed_form_recovers_points(self):
        P1, P2, X, uv1, uv2 = two_view_setup(0)
        X_hat = np.asarray(triangulate_closed_form(P1, P2, uv1, uv2))
        np.testing.assert_allclose(X_hat, X, rtol=1e-3, atol=0.5)

    def test_closed_form_matches_reference_oracle(self):
        """Oracle: per-point eig of M^T M [ref tools/common.py:51-71]."""
        P1, P2, X, uv1, uv2 = two_view_setup(1, n=8)
        expected = []
        for pt1, pt2 in zip(uv1, uv2):
            M1 = np.array([pt1[1] * P1[2] - P1[1], P1[0] - pt1[0] * P1[2]])
            M2 = np.array([pt2[1] * P2[2] - P2[1], P2[0] - pt2[0] * P2[2]])
            M = np.vstack((M1, M2))
            e, v = np.linalg.eig(M.T @ M)
            pt3 = v[:, np.argmin(e)]
            expected.append((pt3 / pt3[-1])[:3])
        expected = np.array(expected)
        got = np.asarray(triangulate_closed_form(P1, P2, uv1, uv2))
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=0.5)

    def test_dlt_svd_recovers_points(self):
        P1, P2, X, uv1, uv2 = two_view_setup(2)
        proj = np.stack([P1[:3], P2[:3]])[None].repeat(X.shape[0], 0)
        pts = np.stack([uv1, uv2], axis=1)
        X_hat = np.asarray(dlt_triangulate(proj, pts, method="svd"))
        np.testing.assert_allclose(X_hat, X, rtol=1e-3, atol=0.5)

    def test_sii_matches_fp64_oracle(self):
        """Implementation parity of SII vs an fp64 numpy oracle of the same
        algorithm (deterministic ones init, column-equilibrated AtA,
        relative shift 1e-6 [ref models/cdrnet.py:181-222, dead code
        there — its raw-AtA fp32 formulation NaNs, see the docstring]),
        plus accuracy against the Jacobi-SVD DLT and ground truth."""
        for seed in (4, 5, 6):
            P1, P2, X, uv1, uv2 = two_view_setup(seed)
            proj = np.stack([P1[:3], P2[:3]])[None].repeat(X.shape[0], 0)
            pts = np.stack([uv1, uv2], axis=1)

            A = proj[:, :, 2:3, :] * pts[..., None] - proj[:, :, :2, :]
            A = A.reshape(A.shape[0], -1, 4).astype(np.float64)
            D = 1.0 / np.maximum(
                np.linalg.norm(A, axis=-2, keepdims=True), 1e-30)
            An = A * D
            M = np.einsum("bki,bkj->bij", An, An)
            B = M + 4e-6 * np.eye(4)
            b = np.ones((A.shape[0], 4))
            b /= np.linalg.norm(b, axis=-1, keepdims=True)
            for _ in range(2):
                b = np.linalg.solve(B, b[..., None])[..., 0]
                b /= np.linalg.norm(b, axis=-1, keepdims=True)
            homo = -b * D[:, 0, :]
            expected = homo[:, :3] / homo[:, 3:]

            s = np.asarray(sii_triangulate(proj, pts, num_iterations=2))
            np.testing.assert_allclose(s, expected, rtol=1e-3, atol=1e-2)

            # accuracy: agrees with the Jacobi DLT and the true points
            # (the round-1 row-normalized variant was off by metres here,
            # and the reference's raw-AtA fp32 formulation NaNs)
            jac = np.asarray(dlt_triangulate(proj, pts, method="jacobi"))
            np.testing.assert_allclose(s, jac, rtol=1e-3, atol=0.05)
            np.testing.assert_allclose(s, X, rtol=1e-3, atol=0.05)

    def test_sii_noisy_detections(self):
        """Under ~1px detection noise SII stays within a few mm of the
        Jacobi DLT (different legitimate weighting, not an error)."""
        r = np.random.RandomState(3)
        P1, P2, X, uv1, uv2 = two_view_setup(6)
        proj = np.stack([P1[:3], P2[:3]])[None].repeat(X.shape[0], 0)
        pts = np.stack([uv1 + r.randn(*uv1.shape),
                        uv2 + r.randn(*uv2.shape)], axis=1)
        jac = np.asarray(dlt_triangulate(proj, pts, method="jacobi"))
        s = np.asarray(sii_triangulate(proj, pts, num_iterations=2))
        assert np.isfinite(s).all()
        assert np.abs(s - jac).max() < 5.0

    def test_dlt_matches_torch_reference_impl(self):
        """Cross-check against the reference's torch svd DLT formulation."""
        torch = pytest.importorskip("torch")
        P1, P2, X, uv1, uv2 = two_view_setup(5, n=6)
        uv1 = uv1 + rng.randn(*uv1.shape) * 2.0
        uv2 = uv2 + rng.randn(*uv2.shape) * 2.0
        proj = np.stack([P1[:3], P2[:3]])[None].repeat(X.shape[0], 0)
        pts = np.stack([uv1, uv2], axis=1)

        # oracle: [ref models/cdrnet.py:151-179]
        pm = torch.tensor(proj, dtype=torch.float64)
        pt = torch.tensor(pts, dtype=torch.float64)
        B, V = pm.shape[:2]
        A = pm[:, :, 2:3].expand(B, V, 2, 4) * pt.view(-1, V, 2, 1)
        A = A - pm[:, :, :2]
        _, _, vh = torch.svd(A.view(B, -1, 4))
        homo = -vh[:, :, 3]
        expected = (homo.T[:-1] / homo.T[-1]).T.numpy()

        got = np.asarray(dlt_triangulate(proj, pts, method="svd"))
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=0.5)

    def test_pinv_projection_matches_numpy(self):
        P = rng.randn(7, 3, 4)
        got = np.asarray(pinv_projection(P))
        expected = np.linalg.pinv(P)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_dlt_is_differentiable(self):
        P1, P2, X, uv1, uv2 = two_view_setup(6, n=4)
        proj = jnp.asarray(np.stack([P1[:3], P2[:3]])[None].repeat(4, 0))
        pts = jnp.asarray(np.stack([uv1, uv2], axis=1))

        def loss(pts):
            return jnp.sum(dlt_triangulate(proj, pts, method="svd") ** 2)

        g = jax.grad(loss)(pts)
        assert np.isfinite(np.asarray(g)).all()
        # finite-difference check on one coordinate
        eps = 1e-3
        d = np.zeros(pts.shape)
        d[0, 0, 0] = eps
        fd = (loss(pts + d) - loss(pts - d)) / (2 * eps)
        np.testing.assert_allclose(float(g[0, 0, 0]), float(fd),
                                   rtol=0.15, atol=1e-2)


class TestAffine:
    def test_matches_cv2_getAffineTransform(self):
        cv2 = pytest.importorskip("cv2")
        for seed in range(5):
            r = np.random.RandomState(seed)
            c = r.uniform(100, 900, size=2)
            s = r.uniform(0.8, 1.3)
            rot = r.uniform(-40, 40)
            tr = get_affine_transform(c, s, rot, 768, (256, 256))
            # oracle via cv2 on the same 3 source/dst points
            from fast3dhpe_tpu.geometry.affine import (_get_dir, _get_3rd_point)
            scale_tmp = np.array([s, s]) * 768
            src_dir = _get_dir([0, scale_tmp[0] * -0.5], np.pi * rot / 180)
            dst_dir = np.array([0, 256 * -0.5], np.float32)
            src = np.zeros((3, 2), np.float32)
            dst = np.zeros((3, 2), np.float32)
            src[0], src[1] = c, c + src_dir
            dst[0] = [128, 128]
            dst[1] = np.array([128, 128], np.float32) + dst_dir
            src[2] = _get_3rd_point(src[0], src[1])
            dst[2] = _get_3rd_point(dst[0], dst[1])
            expected = cv2.getAffineTransform(np.float32(src), np.float32(dst))
            np.testing.assert_allclose(tr, expected, rtol=1e-4, atol=1e-4)

    def test_inverse_transform(self):
        c = np.array([500.0, 400.0])
        tr = get_affine_transform(c, 1.1, 25.0, 768, (256, 256))
        tr_inv = get_affine_transform(c, 1.1, 25.0, 768, (256, 256), inv=True)
        pts = rng.uniform(0, 256, size=(10, 2))
        back = affine_transform_points(affine_transform_points(pts, tr_inv), tr)
        np.testing.assert_allclose(back, pts, atol=1e-6)

    def test_identity_like_crop(self):
        # center crop of a square image to the same size = identity
        tr = get_affine_transform(np.array([128.0, 128.0]), 1.0, 0.0,
                                  256, (256, 256))
        pts = rng.uniform(0, 256, size=(5, 2))
        np.testing.assert_allclose(affine_transform_points(pts, tr), pts,
                                   atol=1e-5)

    def test_fliplr_joints(self):
        joints = rng.uniform(0, 255, size=(19, 3))
        vis = np.ones((19, 3))
        vis[4] = 0
        pairs = [[2, 6], [3, 7]]
        j2, v2 = fliplr_joints(joints, vis, 256, pairs)
        assert np.allclose(j2[2, 0], 256 - joints[6, 0] - 1)
        assert np.allclose(j2[6, 0], 256 - joints[2, 0] - 1)
        assert np.allclose(j2[4], 0)  # invisible joints zeroed on return

    def test_compose_projection_with_affine(self):
        """Warping the image and composing P commute: project-then-warp ==
        warp-P-then-project. [ref dataset/mads_3d.py:223-226]"""
        K, R, T, _ = random_camera(7)
        P = np.asarray(get_projection_matrix(K, R, T))
        tr = get_affine_transform(np.array([512.0, 384.0]), 1.0, 15.0,
                                  768, (256, 256))
        X = rng.randn(10, 3) * 200 + np.array([0, 0, 100.0])
        uv = np.asarray(project_points(X, P))
        uv_warped = affine_transform_points(uv, tr)
        P_new = compose_projection_with_affine(P, tr)
        uv_direct = np.asarray(project_points(X, P_new))
        np.testing.assert_allclose(uv_direct, uv_warped, rtol=1e-3, atol=0.1)

    def test_update_intrinsics_with_affine(self):
        """[ref tools/load.py:60-67]"""
        K, R, T, _ = random_camera(8)
        tr = get_affine_transform(np.array([512.0, 384.0]), 1.0, 0.0,
                                  768, (256, 256))
        K_new = update_intrinsics_with_affine(K, tr)
        assert K_new.shape == (3, 3)
        X = rng.randn(6, 3) * 100 + np.array([0, 0, 3000.0])
        uv_a = np.asarray(project_3d_to_2d(X, K_new, R, T))[:, :2]
        uv_b = affine_transform_points(
            np.asarray(project_3d_to_2d(X, K, R, T))[:, :2], tr)
        np.testing.assert_allclose(uv_a, uv_b, rtol=1e-3, atol=0.1)
