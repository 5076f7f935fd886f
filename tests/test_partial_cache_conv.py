"""Partial-cache training must converge like the full cache (CPU scale).

The partial cache's stratified batching (fixed per-batch cached/uncached
mix instead of exchangeable shuffling, loader._partial_epoch_schedule)
is a documented deviation from the reference's data order. TPU-scale
statistical validation: scripts/partial_cache_convergence.py (results in
BASELINE.md); this guards the same property at test scale.
"""

import numpy as np
import pytest

from fast3dhpe_tpu.config import config_from_dict
from fast3dhpe_tpu.data.loader import Stereo3DLoader
from fast3dhpe_tpu.data.synthetic import make_synthetic_mads


def _cfg(root, budget, name, epochs=4):
    return config_from_dict({
        "DATASET": {"TYPE": "MADS_3d", "ROOT": root,
                    "TRAIN_SET": "train", "TEST_SET": "valid",
                    "FLIP": True, "ROT_FACTOR": 30, "SCALE_FACTOR": 0.25,
                    "OCCLUSION": "CUTOUT",
                    "DEVICE_CACHE_BYTES": budget},
        "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": 18, "NAME": name,
                  "IMAGE_SIZE": [64, 64],
                  "EXTRA": {"TARGET_TYPE": "gaussian", "SIGMA": 3,
                            "HEATMAP_SIZE": [16, 16]}},
        # WARMUP > EPOCH: 2D-only training — post-warmup losses pass
        # through the untrained DLT and are chaos-scale, not comparable
        "TRAIN": {"BATCH_SIZE": 4, "EPOCH": epochs, "LR": 1e-3,
                  "LR_STEP": [40], "LR_FACTOR": 0.1, "WARMUP": 99,
                  "LOSS_3D_WEIGHT": 4},
        "TEST": {"BATCH_SIZE": 4},
        "LOSS": {"USE_TARGET_WEIGHT": True, "TYPE": "JointsMSE"},
    })


@pytest.mark.slow
class TestPartialCacheConvergence:
    def test_partial_and_full_cache_training_track(self, tmp_path):
        from fast3dhpe_tpu.train import loop_cdr

        root = str(tmp_path / "mads")
        # 256x192: the rig's 600-px focal needs >=192-px frames for the
        # joints to project in bounds (train-mode boundary check)
        make_synthetic_mads(root, n_frames=12, img_w=256, img_h=192)
        frame = 192 * 256 * 3
        budgets = {"full": 1 << 30,
                   "partial": 12 * frame}      # ~6 of 12 pairs resident

        hists = {}
        for mode, budget in budgets.items():
            cfg = _cfg(root, budget, f"pcc_{mode}")
            loader = Stereo3DLoader(cfg, "train", seed=0,
                                    device_cache_bytes=budget)
            cache = loader.ensure_device_cache()
            assert (cache.partial if mode == "partial"
                    else cache is not None and not cache.partial)
            del loader, cache
            hists[mode] = loop_cdr.run(
                cfg, overwrite=True, seed=0, scan_epochs=False,
                weights_root=str(tmp_path / "w"))

        for mode, h in hists.items():
            assert h["train_loss"][-1] < h["train_loss"][0], (mode, h)
        f, p = hists["full"]["train_loss"][-1], \
            hists["partial"]["train_loss"][-1]
        # same data, same step count, different batch composition: the
        # endpoints must agree to well within the epoch-to-epoch step
        assert abs(f - p) / max(f, p) < 0.5, (f, p, hists)
