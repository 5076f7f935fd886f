"""MADS ETL tests with synthetic Bouguet-style .mat fixtures."""

import glob
import json
import os

import numpy as np
import pytest

scipy_io = pytest.importorskip("scipy.io")
cv2 = pytest.importorskip("cv2")

from fast3dhpe_tpu.data.extract import (
    parse_bouguet_calibs, parse_rectify_maps, rectify_image,
    MADSExtractor, extract_all)

rng = np.random.RandomState(0)


def write_calib_mats(d):
    """Synthetic Bouguet calibration files (left depth + right multiview)."""
    left = {
        "om": np.array([[0.01], [0.02], [0.03]]),
        "T": np.array([[100.0], [5.0], [20.0]]),
    }
    right = {
        "fc": np.array([[600.0], [610.0]]),
        "cc": np.array([[512.0], [384.0]]),
        "alpha_c": np.array([[0.001]]),
        "kc": np.array([[0.1, -0.05, 0.001, 0.002, 0.0]]),
        "om_ext": np.array([[0.02], [-0.01], [0.005]]),
        "T_ext": np.array([[-100.0], [4.0], [22.0]]),
    }
    lp = str(d / "Calib_C0_left.mat")
    rp = str(d / "Calib_Cam0.mat")
    scipy_io.savemat(lp, left)
    scipy_io.savemat(rp, right)
    return lp, rp


def write_rectify_mats(d, h=8, w=10):
    """Synthetic rectification maps: identity remap of the interior."""
    n = h * w
    interior = np.arange(n)
    data = {}
    for cam in ("left", "right"):
        data[f"ind_new_{cam}"] = interior.reshape(-1, 1)
        # 1-based source indices (parse subtracts 1); all weight on ind_1
        data[f"ind_1_{cam}"] = (interior + 1).reshape(1, -1)
        data[f"ind_2_{cam}"] = (interior + 1).reshape(1, -1)
        data[f"ind_3_{cam}"] = (interior + 1).reshape(1, -1)
        data[f"ind_4_{cam}"] = (interior + 1).reshape(1, -1)
        data[f"a1_{cam}"] = np.ones((1, n))
        data[f"a2_{cam}"] = np.zeros((1, n))
        data[f"a3_{cam}"] = np.zeros((1, n))
        data[f"a4_{cam}"] = np.zeros((1, n))
    lp = str(d / "rect_calib_left.mat")
    rp = str(d / "rect_calib_right.mat")
    scipy_io.savemat(lp, data)
    scipy_io.savemat(rp, data)
    return lp, rp


class TestCalibParsing:
    def test_parse_bouguet(self, tmp_path):
        lp, rp = write_calib_mats(tmp_path)
        calibs = parse_bouguet_calibs(lp, rp)
        K = calibs["left"]["intrinsics"]
        # right camera's K used for BOTH [ref extract_data.py:29-36]
        np.testing.assert_allclose(K, calibs["right"]["intrinsics"])
        assert K[0, 0] == pytest.approx(600.0)
        assert K[0, 1] == pytest.approx(0.001 * 600.0)
        assert K[1, 1] == pytest.approx(610.0)
        # rotations orthonormal; left rvec negated
        for cam in ("left", "right"):
            R = calibs[cam]["rotation"]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        R_left = calibs["left"]["rotation"]
        R_expected = cv2.Rodrigues(-np.array([0.01, 0.02, 0.03]))[0]
        np.testing.assert_allclose(R_left, R_expected, atol=1e-5)

    def test_rectify_identity_maps(self, tmp_path):
        lp, rp = write_rectify_mats(tmp_path, h=8, w=10)
        maps = parse_rectify_maps(lp, "left")
        img = rng.randint(0, 255, size=(8, 10, 3), dtype=np.uint8)
        out = rectify_image(img, maps)
        np.testing.assert_array_equal(out, img)

    def test_rectify_bilinear_weights(self, tmp_path):
        # 50/50 blend of two neighboring pixels (Fortran order)
        h, w, n = 4, 4, 16
        data = {}
        interior = np.arange(n)
        src = np.minimum(interior + 1, n - 1)
        for cam in ("left",):
            data[f"ind_new_{cam}"] = interior.reshape(-1, 1)
            data[f"ind_1_{cam}"] = (interior + 1).reshape(1, -1)
            data[f"ind_2_{cam}"] = (src + 1).reshape(1, -1)
            data[f"ind_3_{cam}"] = (interior + 1).reshape(1, -1)
            data[f"ind_4_{cam}"] = (interior + 1).reshape(1, -1)
            data[f"a1_{cam}"] = np.full((1, n), 0.5)
            data[f"a2_{cam}"] = np.full((1, n), 0.5)
            data[f"a3_{cam}"] = np.zeros((1, n))
            data[f"a4_{cam}"] = np.zeros((1, n))
        p = str(tmp_path / "r.mat")
        scipy_io.savemat(p, data)
        maps = parse_rectify_maps(p, "left")
        img = rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8)
        out = rectify_image(img, maps)
        flat = img.reshape(-1, 3, order="F").astype(np.float64)
        expected = (0.5 * flat[interior] + 0.5 * flat[src]).astype(np.uint8)
        np.testing.assert_array_equal(out.reshape(-1, 3, order="F"),
                                      expected)


class TestFullETL:
    def make_fixture(self, d, n_frames=3, n_videos=2, h=64, w=80):
        mv_dir = d / "depth" / "HipHop"
        cal_dir = d / "multi" / "HipHop"
        mv_dir.mkdir(parents=True)
        cal_dir.mkdir(parents=True)
        write_calib_mats(mv_dir)
        # right calib lives in the multiview tree
        right = {
            "fc": np.array([[600.0], [610.0]]),
            "cc": np.array([[512.0], [384.0]]),
            "alpha_c": np.array([[0.0]]),
            "kc": np.array([[0.0, 0.0, 0.0, 0.0, 0.0]]),
            "om_ext": np.array([[0.0], [0.0], [0.0]]),
            "T_ext": np.array([[-100.0], [0.0], [20.0]]),
        }
        scipy_io.savemat(str(cal_dir / "Calib_Cam0.mat"), right)
        write_rectify_mats(mv_dir, h=h, w=w)

        fourcc = cv2.VideoWriter_fourcc(*"MJPG")
        for v in range(n_videos):
            for side in ("Left", "Right"):
                path = str(mv_dir / f"vid{v}_{side}.avi")
                wr = cv2.VideoWriter(path, fourcc, 10, (w, h))
                for f in range(n_frames):
                    frame = np.full((h, w, 3), 30 * (f + 1), np.uint8)
                    wr.write(frame)
                wr.release()
            pose = np.zeros((1,), dtype=object)
            poses = np.empty((1, n_frames), dtype=object)
            for f in range(n_frames):
                poses[0, f] = rng.randn(19, 3) * 100
            scipy_io.savemat(str(mv_dir / f"vid{v}_GT.mat"),
                             {"GTpose2": poses})
        return str(d / "depth"), str(d / "multi")

    def test_extract_all(self, tmp_path):
        depth, multi = self.make_fixture(tmp_path)
        out = str(tmp_path / "out")
        extract_all(depth, multi, out, undistort=False,
                    rectify_stereo=False, movements=("HipHop",))

        # first video -> valid, second -> train [ref extract_data.py:263-269]
        assert os.path.isdir(os.path.join(out, "valid", "HipHop", "0"))
        assert os.path.isdir(os.path.join(out, "train", "HipHop", "1"))
        for split, vid in (("valid", "0"), ("train", "1")):
            base = os.path.join(out, split, "HipHop", vid)
            assert len(glob.glob(os.path.join(base, "left", "*.jpg"))) == 3
            assert len(glob.glob(os.path.join(base, "right", "*.jpg"))) == 3
            poses = sorted(glob.glob(os.path.join(base, "pose", "*.json")))
            assert len(poses) == 3
            with open(poses[0]) as f:
                data = json.load(f)
            assert "calibs_info" in data
            assert np.array(data["pose_3d"]).shape == (19, 3)
            K = np.array(data["calibs_info"]["cam_left"]["intrinsics"])
            assert K.shape == (3, 3)

        # the extracted tree is consumable by the index builders
        from fast3dhpe_tpu.data import build_mads_stereo_index
        recs = build_mads_stereo_index(out, "valid")
        assert len(recs) == 3
