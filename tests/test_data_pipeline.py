"""Data pipeline integration tests on a synthetic MADS-format tree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast3dhpe_tpu.config import config_from_dict
from fast3dhpe_tpu.data.synthetic import make_synthetic_mads, synthetic_rig
from fast3dhpe_tpu.data import (
    build_mads_index, build_mads_stereo_index, load_data, LoadMADSData)
from fast3dhpe_tpu.data.loader import Stereo3DLoader, Mono2DLoader
from fast3dhpe_tpu.geometry import project_points


@pytest.fixture(scope="module")
def mads_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mads")
    make_synthetic_mads(str(root), n_frames=6, nan_joint_every=3)
    return str(root)


def make_cfg(root, dataset_type="MADS_3d", batch=4, occl="CUTOUT"):
    return config_from_dict({
        "DATASET": {"TYPE": dataset_type, "ROOT": root,
                    "TRAIN_SET": "train", "TEST_SET": "valid",
                    "FLIP": True, "ROT_FACTOR": 30, "SCALE_FACTOR": 0.25,
                    "OCCLUSION": occl},
        "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": 50, "NAME": "t",
                  "IMAGE_SIZE": [256, 256],
                  "EXTRA": {"TARGET_TYPE": "gaussian", "SIGMA": 3,
                            "HEATMAP_SIZE": [64, 64]}},
        "TRAIN": {"BATCH_SIZE": batch, "EPOCH": 1, "LR": 1e-4,
                  "LR_STEP": [40], "LR_FACTOR": 0.1, "WARMUP": 0},
        "TEST": {"BATCH_SIZE": batch},
        "LOSS": {"USE_TARGET_WEIGHT": True, "TYPE": "JointsMSESmooth"},
    })


class TestIndexBuilders:
    def test_stereo_index(self, mads_root):
        recs = build_mads_stereo_index(mads_root, "train")
        assert len(recs) == 6
        r = recs[0]
        assert r["P_left"].shape == (4, 4)
        assert r["pose_3d"].shape == (19, 3)
        assert not np.isnan(r["pose_3d"]).any()      # NaNs zeroed
        # frame 0 has a NaN joint -> visibility zero
        assert r["joints_vis"].shape == (19, 1)
        assert r["joints_vis"].sum() == 18
        # frame 1 has no NaN
        assert recs[1]["joints_vis"].sum() == 19

    def test_mono_index(self, mads_root):
        recs = build_mads_index(mads_root, "valid")
        assert len(recs) == 6
        assert recs[0]["joints"].shape == (19, 3)

    def test_projection_consistency(self, mads_root):
        """GT 2D from the index projects consistently with the rig."""
        recs = build_mads_stereo_index(mads_root, "train")
        r = recs[1]
        uv = np.asarray(project_points(r["pose_3d"], r["P_right"]))
        uv2 = build_mads_index(mads_root, "train")[1]["joints"][:, :2]
        np.testing.assert_allclose(uv, uv2, atol=0.1)


class TestStereoLoader:
    def test_eval_batches(self, mads_root):
        cfg = make_cfg(mads_root)
        loader = Stereo3DLoader(cfg, "valid")
        batches = list(loader)
        assert len(batches) == 2                      # 6 samples / 4
        b = batches[0]
        assert b["image"].shape == (4, 2, 256, 256, 3)
        assert b["proj"].shape == (4, 2, 3, 4)
        assert b["target_2d"].shape == (4, 2, 19, 2)
        assert b["target_3d"].shape == (4, 19, 3)
        assert b["target_weight"].shape == (4, 19)
        np.testing.assert_array_equal(np.asarray(b["row_valid"]),
                                      [1, 1, 1, 1])
        np.testing.assert_array_equal(np.asarray(batches[1]["row_valid"]),
                                      [1, 1, 0, 0])   # padded
        # normalized images are roughly ImageNet-scaled
        img = np.asarray(b["image"])
        assert -4 < img.min() and img.max() < 4

    def test_gt2d_matches_projection_through_composed_P(self, mads_root):
        """target_2d == pose_3d projected through the composed P — the
        P <- T @ P math of the device pipeline [ref mads_3d.py:223-226]."""
        cfg = make_cfg(mads_root)
        b = next(iter(Stereo3DLoader(cfg, "valid")))
        uv = np.asarray(project_points(
            jnp.asarray(b["target_3d"]), jnp.asarray(b["proj"][:, 0])))
        np.testing.assert_allclose(uv, np.asarray(b["target_2d"][:, 0]),
                                   rtol=1e-3, atol=0.1)

    def test_dots_land_at_projections(self, mads_root):
        """The synthetic frames contain bright dots at the GT projections;
        after warping, the warped image must be bright at target_2d."""
        cfg = make_cfg(mads_root)
        b = next(iter(Stereo3DLoader(cfg, "valid")))
        img = np.asarray(b["image"][:, 0])            # (B, H, W, 3)
        uv = np.asarray(b["target_2d"][:, 0])         # (B, J, 2)
        w = np.asarray(b["target_weight"])
        hits = 0
        total = 0
        for i in range(img.shape[0]):
            for j in range(uv.shape[1]):
                if w[i, j] == 0:
                    continue
                x, y = int(round(uv[i, j, 0])), int(round(uv[i, j, 1]))
                if 1 <= x < 255 and 1 <= y < 255:
                    total += 1
                    patch = img[i, y - 1:y + 2, x - 1:x + 2]
                    if patch.max() > img[i].mean() + 1.0:
                        hits += 1
        assert total > 30
        assert hits / total > 0.9, (hits, total)

    def test_train_batches_with_occlusion(self, mads_root):
        cfg = make_cfg(mads_root)
        loader = Stereo3DLoader(cfg, "train", seed=3)
        b = next(iter(loader))
        assert b["image"].shape == (4, 2, 256, 256, 3)
        w = np.asarray(b["target_weight"])
        assert ((w == 0) | (w == 1)).all()

    def test_train_epochs_differ(self, mads_root):
        cfg = make_cfg(mads_root)
        loader = Stereo3DLoader(cfg, "train", seed=3)
        b1 = next(iter(loader))
        b2 = next(iter(loader))
        assert not np.allclose(np.asarray(b1["image"]),
                               np.asarray(b2["image"]))


class TestMonoLoader:
    def test_mads2d_batches(self, mads_root):
        cfg = make_cfg(mads_root, dataset_type="MADS_2d", occl="None")
        loader = Mono2DLoader(cfg, "valid")
        b = next(iter(loader))
        assert b["image"].shape == (4, 256, 256, 3)
        assert b["target"].shape == (4, 64, 64, 19)
        assert b["target_weight"].shape == (4, 19)
        # heatmap peaks where joints are visible
        t = np.asarray(b["target"])
        w = np.asarray(b["target_weight"])
        for j in range(19):
            if w[0, j] > 0:
                assert t[0, :, :, j].max() > 0.99

    def test_train_flip_scale(self, mads_root):
        cfg = make_cfg(mads_root, dataset_type="MADS_2d", occl="None")
        loader = Mono2DLoader(cfg, "train", seed=1)
        b = next(iter(loader))
        assert np.isfinite(np.asarray(b["image"])).all()

    def test_device_path_is_default_for_mads(self, mads_root):
        cfg = make_cfg(mads_root, dataset_type="MADS_2d", occl="None")
        assert Mono2DLoader(cfg, "valid").device_preprocess is True

    @pytest.mark.parametrize("image_set", ["valid", "train"])
    def test_device_vs_host_preprocess_parity(self, mads_root, image_set):
        """MADS_2d routed through the jitted device pipeline
        (preprocess_mono_batch: warp+normalize+render in one program)
        matches the host-cv2 path on identical per-sample transforms —
        targets/weights exactly (same joint math), images to warp
        tolerance (XLA gather vs cv2 INTER_LINEAR)."""
        cfg = make_cfg(mads_root, dataset_type="MADS_2d", occl="None")
        l_dev = Mono2DLoader(cfg, image_set, seed=5)
        l_host = Mono2DLoader(cfg, image_set, seed=5,
                              device_preprocess=False)
        n = 0
        for bd, bh in zip(l_dev, l_host):
            np.testing.assert_array_equal(np.asarray(bd["row_valid"]),
                                          np.asarray(bh["row_valid"]))
            np.testing.assert_allclose(np.asarray(bd["target"]),
                                       np.asarray(bh["target"]),
                                       atol=1e-5)
            np.testing.assert_array_equal(
                np.asarray(bd["target_weight"]),
                np.asarray(bh["target_weight"]))
            di = np.asarray(bd["image"])
            hi = np.asarray(bh["image"])
            # 1 uint8 LSB in normalized units ~ 1/(255*0.225) = 0.0174
            assert np.abs(di - hi).mean() < 0.01
            assert np.abs(di - hi).max() < 0.15
            n += 1
        assert n == len(l_dev)

    def test_load_data_dispatch(self, mads_root):
        cfg3 = make_cfg(mads_root)
        tr, va = load_data(cfg3)
        assert isinstance(tr, Stereo3DLoader)
        cfg2 = make_cfg(mads_root, dataset_type="MADS_2d", occl="None")
        tr, va = load_data(cfg2)
        assert isinstance(tr, Mono2DLoader)


class TestMultiHostSharding:
    def test_hosts_partition_records_in_lockstep(self, mads_root,
                                                 monkeypatch):
        """Simulated 2-process run: per-host shards are disjoint and
        covering, every host runs the SAME number of per-epoch batches
        (lockstep — unequal counts would deadlock the SPMD steps), and
        hosts beyond their shard emit row_valid=0 rows."""
        import fast3dhpe_tpu.data.loader as loader_mod
        cfg = make_cfg(mads_root, batch=4)
        cfg.DATASET.OCCLUSION = None

        all_paths = []
        lens = []
        for pi in range(2):
            monkeypatch.setattr(jax, "process_count", lambda: 2)
            monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
            loader = Stereo3DLoader(cfg, "valid")
            lens.append(len(loader))
            assert loader.num_samples == 6        # global, not shard
            all_paths.append([r["image_left"] for r in loader.records])
            batches = list(loader)
            assert len(batches) == len(loader)
            # shard of 3 -> 1 batch with one padded row
            assert sum(int(np.asarray(b["row_valid"]).sum())
                       for b in batches) == len(loader.records)
        assert lens[0] == lens[1]                  # lockstep
        assert not set(all_paths[0]) & set(all_paths[1])   # disjoint
        assert len(set(all_paths[0]) | set(all_paths[1])) == 6  # covering

    def test_empty_shard_host_emits_filler_batches(self, mads_root,
                                                   monkeypatch):
        """A host whose shard is EMPTY (more processes than records) must
        still emit its lockstep batches — all rows row_valid=0 — instead
        of crashing (regression: records[0] on an empty shard raised
        IndexError, which would deadlock the other hosts' collectives)."""
        cfg = make_cfg(mads_root, batch=4)
        cfg.DATASET.OCCLUSION = None
        # 8 processes, 6 valid records -> hosts 6 and 7 get empty shards
        monkeypatch.setattr(jax, "process_count", lambda: 8)
        monkeypatch.setattr(jax, "process_index", lambda: 7)
        loader = Stereo3DLoader(cfg, "valid")
        assert loader.records == [] and loader._filler is not None
        batches = list(loader)
        assert len(batches) == len(loader) >= 1    # lockstep count
        for b in batches:
            assert float(np.asarray(b["row_valid"]).sum()) == 0.0
            assert np.isfinite(np.asarray(b["image"])).all()
        # mono loader, same scenario
        cfg2 = make_cfg(mads_root, dataset_type="MADS_2d", occl="None",
                        batch=4)
        mono = Mono2DLoader(cfg2, "valid")
        assert mono.records == [] and mono._filler is not None
        mb = list(mono)
        assert len(mb) == len(mono) >= 1
        for b in mb:
            assert float(np.asarray(b["row_valid"]).sum()) == 0.0

    def test_single_process_is_identity(self, mads_root):
        loader = Stereo3DLoader(make_cfg(mads_root), "valid")
        assert len(loader.records) == 6


class TestStream:
    def test_frame_iterator(self, mads_root):
        import os
        stream = LoadMADSData(os.path.join(mads_root, "valid"),
                              (256, 256), "HipHop")
        assert len(stream) == 6
        frames = list(stream)
        assert len(frames) == 6
        left, right, meta = frames[0]
        assert left.shape == (256, 256, 3)
        K = np.array(meta["cam_left"]["intrinsics"])
        assert K.shape == (3, 3)
        np.testing.assert_allclose(K[2], [0, 0, 1])

    def test_batched_stream(self, mads_root):
        import os
        stream = LoadMADSData(os.path.join(mads_root, "valid"),
                              (256, 256), "HipHop")
        batches = list(stream.batches(4))
        assert len(batches) == 2
        assert batches[0]["img_l"].shape == (4, 256, 256, 3)
        assert batches[0]["proj"].shape == (4, 2, 3, 4)
        assert batches[1]["n_valid"] == 2

    def test_device_warp_batches_match_host_warp(self, mads_root):
        """batches(device_warp=True) yields RAW frames + trans such that
        the on-device affine crop reproduces the host cv2 crop (the
        serving fast path in apps.inference)."""
        import os
        from fast3dhpe_tpu.ops.warp import affine_warp
        stream = LoadMADSData(os.path.join(mads_root, "valid"),
                              (256, 256), "HipHop")
        host = next(stream.batches(4))
        dev = next(stream.batches(4, device_warp=True))
        assert "trans" in dev and dev["img_l"].shape[0] == 4
        # identical crop-corrected projections + GT either way
        np.testing.assert_allclose(dev["proj"], host["proj"], rtol=1e-6)
        np.testing.assert_allclose(dev["pose_3d"], host["pose_3d"])
        warped = np.asarray(affine_warp(dev["img_l"], dev["trans"],
                                        (256, 256)))
        # device warp parity vs cv2 INTER_LINEAR (sub-lsb rounding only)
        assert np.mean(np.abs(warped - host["img_l"].astype(np.float32))) \
            < 1.0
        assert np.max(np.abs(warped - host["img_l"].astype(np.float32))) \
            <= 2.0

    def test_stream_projection_roundtrip(self, mads_root):
        """Projecting GT 3D through the crop-corrected P lands on the
        rendered dots in the cropped frames."""
        import os
        stream = LoadMADSData(os.path.join(mads_root, "valid"),
                              (256, 256), "HipHop")
        b = next(stream.batches(4))
        finite = ~np.isnan(b["pose_3d"]).any(-1)
        uv = np.asarray(project_points(
            np.nan_to_num(b["pose_3d"]).astype(np.float32), b["proj"][:, 1]))
        img = b["img_r"].astype(np.float32)
        hits, total = 0, 0
        for i in range(4):
            for j in range(19):
                if not finite[i, j]:
                    continue
                x, y = int(round(uv[i, j, 0])), int(round(uv[i, j, 1]))
                if 1 <= x < 255 and 1 <= y < 255:
                    total += 1
                    if img[i, y - 1:y + 2, x - 1:x + 2].max() > 150:
                        hits += 1
        assert total > 30 and hits / total > 0.9, (hits, total)


class TestDecodedFrameCache:
    def test_cache_and_uncached_agree(self, mads_root):
        cfg = make_cfg(mads_root)
        l1 = Stereo3DLoader(cfg, "valid", cache_bytes=0)
        l2 = Stereo3DLoader(cfg, "valid", cache_bytes=1 << 30)
        b1 = list(l1)
        b2 = list(l2)           # fills the cache
        b3 = list(l2)           # served from cache
        for a, b in ((b1, b2), (b2, b3)):
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x["image"]),
                                              np.asarray(y["image"]))
        assert l2._cache_used > 0
        assert len(l2._cache) == 12      # 6 frames x 2 views

    def test_cache_budget_respected(self, mads_root):
        cfg = make_cfg(mads_root)
        one_frame = 384 * 512 * 3        # synthetic frame bytes
        loader = Stereo3DLoader(cfg, "valid",
                                cache_bytes=3 * one_frame + 10)
        list(loader)
        assert len(loader._cache) <= 3
        assert loader._cache_used <= 3 * one_frame + 10
        # batches still correct with a partial cache
        b = next(iter(loader))
        assert np.isfinite(np.asarray(b["image"])).all()


class TestLoaderWithMesh:
    def test_loader_shards_batches(self, mads_root):
        import jax
        from fast3dhpe_tpu.parallel import make_mesh
        assert len(jax.devices()) >= 8
        cfg = make_cfg(mads_root, batch=8)
        mesh = make_mesh(8)
        loader = Stereo3DLoader(cfg, "valid", mesh=mesh)
        b = next(iter(loader))
        sh = b["image"].sharding
        # batch axis split over the data axis of the mesh
        assert sh.is_fully_replicated is False
        assert b["image"].shape == (8, 2, 256, 256, 3)


class TestEmptyDataset:
    def test_missing_tree_raises_clear_error(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="extract_data"):
            build_mads_stereo_index(str(tmp_path), "train")
        with pytest.raises(FileNotFoundError, match="extract_data"):
            build_mads_index(str(tmp_path), "train")

    def test_overwrite_with_bad_dataset_keeps_checkpoint(self, tmp_path):
        """--overwrite must not clobber an existing weights dir when the
        dataset path is wrong: the destructive rmtree happens only after
        load_data succeeds (regression: a typo'd DATASET.ROOT used to
        delete the checkpoint before failing)."""
        import os
        from fast3dhpe_tpu.train import loop_cdr
        from fast3dhpe_tpu.config import config_from_dict
        cfg = config_from_dict({
            "DATASET": {"TYPE": "MADS_3d",
                        "ROOT": str(tmp_path / "no_such_root"),
                        "TRAIN_SET": "train", "TEST_SET": "valid"},
            "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": 18, "NAME": "keepme",
                      "PRETRAINED": "", "IMAGE_SIZE": [64, 64],
                      "EXTRA": {"TARGET_TYPE": "gaussian", "SIGMA": 1,
                                "HEATMAP_SIZE": [16, 16]}},
            "TRAIN": {"BATCH_SIZE": 2, "EPOCH": 1, "LR": 1e-3,
                      "LR_STEP": [1], "LR_FACTOR": 0.1},
            "TEST": {"BATCH_SIZE": 2},
            "LOSS": {"USE_TARGET_WEIGHT": True, "TYPE": "JointsMSESmooth"},
        })
        weights_root = tmp_path / "weights"
        model_dir = weights_root / "keepme"
        model_dir.mkdir(parents=True)
        (model_dir / "precious.ckpt").write_text("do not delete")
        with pytest.raises(FileNotFoundError, match="extract_data"):
            loop_cdr.run(cfg, overwrite=True,
                         weights_root=str(weights_root))
        assert (model_dir / "precious.ckpt").exists()
        # and without --overwrite the existing dir still raises first
        with pytest.raises(FileExistsError, match="overwrite"):
            loop_cdr.run(cfg, overwrite=False,
                         weights_root=str(weights_root))
