"""REAL 2-process distributed execution (no monkeypatching).

Spawns two CPU processes that jax.distributed.initialize against a
localhost coordinator and run the actual CDR training loop over a mesh
spanning both processes (tests/distributed_child.py). This is the only
place the multi-host code paths execute for real:

  - parallel/distributed.init_distributed (jax.distributed.initialize)
  - per-host record shards + lockstep batch counts + row_valid=0 padding
    (data/loader.py) feeding jax.make_array_from_process_local_data
    global-batch assembly (parallel/mesh.shard_batch)
  - process-0-gated checkpoint writes (train/checkpoint.py): exactly one
    checkpoint tree appears, under process 0's root, written through
    orbax restricted to active_processes={0}

and the global metrics are asserted against a single-process run over
the same records (global batch 8 == 2 hosts x local batch 4; one
optimizer step per epoch either way, augmentation off, so the math is
identical up to float reassociation of the cross-shard sums).

Skips (with the reason recorded) if the sandbox forbids localhost
sockets. The reference has no distributed support at all
[ref: train.py:43 hardcodes one device]; this guards SURVEY §2.3's
multi-host row.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    try:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]
    except OSError as e:  # pragma: no cover - sandbox-dependent
        pytest.skip(f"localhost sockets unavailable: {e}")
    finally:
        s.close()


@pytest.mark.slow
def test_two_real_processes_match_single_process(tmp_path):
    from fast3dhpe_tpu.data.synthetic import make_synthetic_mads

    root = tmp_path / "mads"
    # 256x192 frames: the rig's fixed 600-px focal projects joints out
    # of bounds on smaller frames, zeroing every train target weight —
    # training would be vacuous (loss 0, grad 0) and the comparison moot
    make_synthetic_mads(str(root), n_frames=6, img_w=256, img_h=192)
    port = _free_port()
    coord = f"127.0.0.1:{port}"

    env = {k: v for k, v in os.environ.items()
           if not k.startswith("PYTEST") and k != "XLA_FLAGS"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs, outs, wroots = [], [], []
    for pid in range(2):
        out = tmp_path / f"hist_{pid}.json"
        wroot = tmp_path / f"w_host{pid}"
        outs.append(out)
        wroots.append(wroot)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "distributed_child.py"),
             str(pid), "2", coord, str(root), str(wroot), str(out)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    logs = []
    for p in procs:
        try:
            log, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(log)
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{log[-4000:]}"

    hists = [json.load(open(o)) for o in outs]
    # training must be non-vacuous (a mis-built fixture once zeroed every
    # target weight: loss 0, grad 0 — the comparison below held trivially)
    assert hists[0]["train_loss"][0] > 1e-5, hists[0]
    assert hists[0]["grad_norm"][0] > 1e-5, hists[0]
    # replicated state -> both hosts fetched identical global metrics
    # (throughput is wall-clock per host, not a replicated metric)
    for k in hists[0]:
        if k.endswith("_per_sec"):
            continue
        np.testing.assert_allclose(hists[0][k], hists[1][k], rtol=1e-5,
                                   err_msg=k)

    # process-0 gating: exactly one checkpoint tree, under rank 0's root
    assert (wroots[0] / "dist" / "latest").is_dir()
    assert (wroots[0] / "dist" / "latest" / "_CHECKPOINT_METADATA").exists() \
        or list((wroots[0] / "dist" / "latest").iterdir())
    assert not wroots[1].exists() or list(wroots[1].rglob("*")) == []

    # single-process run over the same records: global batch 8 == the
    # 2-host assembly (same valid rows per step, order interleaved)
    from fast3dhpe_tpu.config import config_from_dict
    from fast3dhpe_tpu.train import loop_cdr
    cfg = config_from_dict({
        "DATASET": {"TYPE": "MADS_3d", "ROOT": str(root),
                    "TRAIN_SET": "train", "TEST_SET": "valid",
                    "FLIP": False, "ROT_FACTOR": 0, "SCALE_FACTOR": 0,
                    "OCCLUSION": "None"},
        "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": 18, "NAME": "single",
                  "PRETRAINED": "", "IMAGE_SIZE": [64, 64],
                  "EXTRA": {"TARGET_TYPE": "gaussian", "SIGMA": 1,
                            "HEATMAP_SIZE": [16, 16]}},
        "TRAIN": {"BATCH_SIZE": 8, "EPOCH": 2, "LR": 1e-3,
                  "LR_STEP": [40], "LR_FACTOR": 0.1, "WARMUP": 1,
                  "LOSS_3D_WEIGHT": 4},
        "TEST": {"BATCH_SIZE": 8},
        "LOSS": {"USE_TARGET_WEIGHT": True, "TYPE": "JointsMSE"},
    })
    ref_hist = loop_cdr.run(cfg, overwrite=True, seed=0,
                            weights_root=str(tmp_path / "w_single"))
    # Warmup-epoch (2D-only) quantities are the sharp equality evidence:
    # the only difference is cross-shard float reassociation (measured
    # rel ~4e-7). Post-warmup / 3D quantities pass through the DLT of a
    # still-untrained net — ill-conditioned and ±1e6-clipped, so
    # reassociation amplifies (measured rel ~5e-3 on the 1e10-scale
    # loss); those get physics-scale tolerances instead.
    np.testing.assert_allclose(hists[0]["train_loss"][0],
                               ref_hist["train_loss"][0], rtol=1e-4,
                               err_msg="train_loss[warmup]")
    np.testing.assert_allclose(hists[0]["train_loss"][1:],
                               ref_hist["train_loss"][1:], rtol=5e-2,
                               err_msg="train_loss[post-warmup]")
    np.testing.assert_allclose(hists[0]["val_mpjpe_2d"],
                               ref_hist["val_mpjpe_2d"], rtol=1e-2,
                               err_msg="val_mpjpe_2d")
    np.testing.assert_allclose(hists[0]["val_loss"][0],
                               ref_hist["val_loss"][0], rtol=1e-2,
                               err_msg="val_loss[warmup]")
    # 3D quantities of a 2-epoch net are DLT triangulations of garbage
    # heatmaps, clipped at +-1e6 mm — chaotic under float reassociation
    # (direction, not correctness). Assert the same regime (decade), not
    # the value; the sharp equality evidence is the 2D set above.
    for k, a, b in (("val_mpjpe_3d", hists[0]["val_mpjpe_3d"],
                     ref_hist["val_mpjpe_3d"]),
                    ("val_loss[post]", hists[0]["val_loss"][1:],
                     ref_hist["val_loss"][1:])):
        a, b = np.asarray(a, float), np.asarray(b, float)
        assert np.isfinite(a).all() and (a > 0).all(), (k, a)
        assert np.abs(np.log10(a) - np.log10(b)).max() < 1.0, (k, a, b)
