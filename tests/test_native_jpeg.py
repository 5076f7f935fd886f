"""Native C++ batch JPEG decoder tests (builds the .so on first use)."""

import os

import numpy as np
import pytest

from fast3dhpe_tpu.data import native_jpeg

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(
    not native_jpeg.available(),
    reason="native decoder unavailable (no g++/libjpeg)")

rng = np.random.RandomState(0)


@pytest.fixture(scope="module")
def jpeg_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    paths = []
    for i in range(6):
        img = rng.randint(0, 256, size=(96, 128, 3), dtype=np.uint8)
        p = str(d / f"img_{i}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 92])
        paths.append(p)
    return paths


class TestNativeJpeg:
    def test_probe(self, jpeg_files):
        assert native_jpeg.probe(jpeg_files[0]) == (96, 128)

    def test_decode_matches_cv2(self, jpeg_files):
        got = native_jpeg.decode_batch(jpeg_files, 96, 128, n_threads=2)
        assert got is not None
        assert got.shape == (6, 96, 128, 3)
        for i, p in enumerate(jpeg_files):
            ref = cv2.imread(p, cv2.IMREAD_COLOR)
            # libjpeg vs cv2's bundled decoder may differ by a level or two
            # in IDCT rounding; require near-identical output
            diff = np.abs(got[i].astype(int) - ref.astype(int))
            assert diff.max() <= 2, diff.max()
            assert diff.mean() < 0.1

    def test_wrong_size_raises(self, jpeg_files):
        with pytest.raises(ValueError):
            native_jpeg.decode_batch(jpeg_files, 100, 100)

    def test_missing_file_raises(self, jpeg_files):
        with pytest.raises(ValueError):
            native_jpeg.decode_batch(["/nonexistent.jpg"], 96, 128)

    def test_loader_uses_native_path(self, tmp_path):
        """Stereo loader decodes through the native path on a synthetic
        MADS tree and produces the same batches as the fallback."""
        from fast3dhpe_tpu.data.synthetic import make_synthetic_mads
        from fast3dhpe_tpu.data.loader import Stereo3DLoader
        from fast3dhpe_tpu.config import config_from_dict
        root = str(tmp_path / "mads")
        make_synthetic_mads(root, n_frames=4)
        cfg = config_from_dict({
            "DATASET": {"TYPE": "MADS_3d", "ROOT": root,
                        "TRAIN_SET": "train", "TEST_SET": "valid",
                        "OCCLUSION": "None"},
            "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": 50, "NAME": "t",
                      "IMAGE_SIZE": [128, 128],
                      "EXTRA": {"HEATMAP_SIZE": [32, 32], "SIGMA": 2}},
            "TRAIN": {"BATCH_SIZE": 4}, "TEST": {"BATCH_SIZE": 4},
            "LOSS": {}})
        loader = Stereo3DLoader(cfg, "valid")
        b_native = next(iter(loader))
        assert loader._decode_paths._native_hw not in (None, False)

        loader2 = Stereo3DLoader(cfg, "valid")
        loader2._decode_paths._native_hw = False   # force cv2 fallback
        b_cv2 = next(iter(loader2))
        diff = np.abs(np.asarray(b_native["image"])
                      - np.asarray(b_cv2["image"]))
        assert diff.max() < 0.1             # normalized-unit tolerance
