"""AsyncCheckpointWriter: background checkpoint saves match inline saves,
coalesce per path, surface worker errors, and drain on wait().

The writer exists because a CDR-101 state fetch is ~540 MB — inline
saves stall the training loop for the whole device->host transfer
(docs/PERFORMANCE.md); the reference blocks on torch.save every epoch
[ref: train.py:150-159]."""

import os
import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast3dhpe_tpu.train.checkpoint import (
    AsyncCheckpointWriter, NullCheckpointWriter, SyncCheckpointWriter,
    make_checkpoint_writer, restore_checkpoint, save_checkpoint)


def tree_of(seed, n=8):
    rng = np.random.RandomState(seed)
    return {"params": {"w": jnp.asarray(rng.randn(n, n), jnp.float32),
                       "b": jnp.asarray(rng.randn(n), jnp.float32)},
            "step": jnp.asarray(seed, jnp.int32)}


def assert_tree_equal(a, b):
    ja, jb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(ja) == len(jb)
    for x, y in zip(ja, jb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestAsyncCheckpointWriter:
    def test_matches_inline_save(self, tmp_path):
        tree = tree_of(3)
        w = AsyncCheckpointWriter()
        w.save(str(tmp_path / "async"), tree)
        w.close()
        save_checkpoint(str(tmp_path / "sync"), tree)
        a = restore_checkpoint(str(tmp_path / "async"), tree)
        s = restore_checkpoint(str(tmp_path / "sync"), tree)
        assert_tree_equal(a, s)

    def test_last_write_wins_per_path(self, tmp_path):
        """Rolling-latest semantics: after a burst of saves to one path,
        the path holds the LAST submitted tree (intermediates may be
        coalesced away — that is the point)."""
        w = AsyncCheckpointWriter()
        path = str(tmp_path / "latest")
        for seed in range(6):
            w.save(path, tree_of(seed))
        w.close()
        assert_tree_equal(restore_checkpoint(path, tree_of(0)), tree_of(5))

    def test_multiple_paths_all_written(self, tmp_path):
        w = AsyncCheckpointWriter()
        trees = {str(tmp_path / f"ckpt{i}"): tree_of(i) for i in range(4)}
        for path, tree in trees.items():
            w.save(path, tree)
        w.close()
        for path, tree in trees.items():
            assert_tree_equal(restore_checkpoint(path, tree), tree)

    def test_worker_error_surfaces_in_wait(self, tmp_path):
        blocker = tmp_path / "a_file"
        blocker.write_text("not a directory")
        w = AsyncCheckpointWriter()
        # saving "under" a regular file must fail in the worker
        w.save(str(blocker / "ckpt"), tree_of(0))
        with pytest.raises(Exception):
            w.wait()
        # the writer stays usable after an error is consumed
        ok = str(tmp_path / "ok")
        w.save(ok, tree_of(1))
        w.close()
        assert_tree_equal(restore_checkpoint(ok, tree_of(1)), tree_of(1))

    def test_save_does_not_block_on_slow_write(self, tmp_path, monkeypatch):
        """save() must return before the write completes — that is the
        entire contract. Stall the worker's write and check save()'s
        latency, then that wait() really waited for it."""
        import fast3dhpe_tpu.train.checkpoint as ckpt_mod
        written = []
        gate = threading.Event()

        def slow_save(path, tree):
            gate.wait(timeout=30)
            written.append(path)

        monkeypatch.setattr(ckpt_mod, "save_checkpoint", slow_save)
        w = AsyncCheckpointWriter()
        t0 = time.time()
        w.save(str(tmp_path / "slow"), tree_of(0))
        assert time.time() - t0 < 1.0
        assert not written
        gate.set()
        w.close()
        assert written == [str(tmp_path / "slow")]

    def test_factory(self):
        assert isinstance(make_checkpoint_writer(True),
                          AsyncCheckpointWriter)
        assert isinstance(make_checkpoint_writer(False),
                          SyncCheckpointWriter)


class TestProcessZeroGating:
    """Multi-host safety: only process 0 may touch the shared checkpoint
    tree (N orbax writers racing on weights/<NAME>/latest would corrupt
    it). Simulated by monkeypatching jax.process_index — the decision
    under test (gate at writer construction) is host-local."""

    def test_factory_gates_nonzero_process(self, monkeypatch):
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        assert isinstance(make_checkpoint_writer(True),
                          NullCheckpointWriter)
        assert isinstance(make_checkpoint_writer(False),
                          NullCheckpointWriter)

    def test_null_writer_writes_nothing(self, tmp_path, monkeypatch):
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        w = make_checkpoint_writer(False)
        path = str(tmp_path / "ckpt")
        w.save(path, tree_of(0))
        w.wait()
        w.close()
        assert not os.path.exists(path)
        assert list(tmp_path.iterdir()) == []


@pytest.mark.slow
class TestLoopIntegration:
    def test_loop2d_async_checkpoint_resumable(self, tmp_path):
        """A 2D training run with async_checkpoint=True leaves best/latest
        checkpoints identical to the sync run (same seed, CPU devices are
        deterministic)."""
        from fast3dhpe_tpu.config import config_from_dict
        from fast3dhpe_tpu.data.synthetic import make_synthetic_mads
        from fast3dhpe_tpu.train import loop2d
        from fast3dhpe_tpu.train.checkpoint import load_variables

        root = tmp_path / "mads"
        make_synthetic_mads(str(root), n_frames=4, img_w=64, img_h=64)
        cfg = config_from_dict({
            "DATASET": {"TYPE": "MADS_2d", "ROOT": str(root),
                        "TRAIN_SET": "train", "TEST_SET": "valid",
                        "FLIP": True, "ROT_FACTOR": 30,
                        "SCALE_FACTOR": 0.25, "OCCLUSION": "None"},
            "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": 18,
                      "NAME": "async_ck", "PRETRAINED": "",
                      "IMAGE_SIZE": [64, 64],
                      "EXTRA": {"TARGET_TYPE": "gaussian", "SIGMA": 1,
                                "HEATMAP_SIZE": [16, 16]}},
            "TRAIN": {"BATCH_SIZE": 4, "EPOCH": 2, "LR": 1e-3,
                      "LR_STEP": [40], "LR_FACTOR": 0.1, "WARMUP": 0,
                      "LOSS_3D_WEIGHT": 4},
            "TEST": {"BATCH_SIZE": 4},
            "LOSS": {"USE_TARGET_WEIGHT": True, "TYPE": "JointsMSE"},
        })
        loop2d.run(cfg, overwrite=True, seed=0, async_checkpoint=True,
                   weights_root=str(tmp_path / "w_async"))
        cfg.MODEL.NAME = "sync_ck"
        loop2d.run(cfg, overwrite=True, seed=0, async_checkpoint=False,
                   weights_root=str(tmp_path / "w_sync"))
        a = load_variables(str(tmp_path / "w_async" / "async_ck" / "latest"))
        s = load_variables(str(tmp_path / "w_sync" / "sync_ck" / "latest"))
        assert_tree_equal(a["params"], s["params"])
        assert_tree_equal(a["batch_stats"], s["batch_stats"])

    def test_multihost_run_writes_exactly_one_checkpoint_tree(
            self, tmp_path, monkeypatch):
        """Simulated 2-process training: the loop run as process 1 writes
        NOTHING under weights_root. (Process 0's side — exactly one tree
        written while both processes train — can't be simulated with a
        monkeypatch: orbax consults jax.process_count() internally and
        needs the real distributed client; it is covered for real in
        tests/test_distributed_real.py.)"""
        from fast3dhpe_tpu.config import config_from_dict
        from fast3dhpe_tpu.data.synthetic import make_synthetic_mads
        from fast3dhpe_tpu.train import loop2d

        root = tmp_path / "mads"
        make_synthetic_mads(str(root), n_frames=4, img_w=64, img_h=64)
        cfg = config_from_dict({
            "DATASET": {"TYPE": "MADS_2d", "ROOT": str(root),
                        "TRAIN_SET": "train", "TEST_SET": "valid",
                        "FLIP": True, "ROT_FACTOR": 30,
                        "SCALE_FACTOR": 0.25, "OCCLUSION": "None"},
            "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": 18,
                      "NAME": "mh_gate", "PRETRAINED": "",
                      "IMAGE_SIZE": [64, 64],
                      "EXTRA": {"TARGET_TYPE": "gaussian", "SIGMA": 1,
                                "HEATMAP_SIZE": [16, 16]}},
            "TRAIN": {"BATCH_SIZE": 4, "EPOCH": 1, "LR": 1e-3,
                      "LR_STEP": [40], "LR_FACTOR": 0.1, "WARMUP": 0,
                      "LOSS_3D_WEIGHT": 4},
            "TEST": {"BATCH_SIZE": 4},
            "LOSS": {"USE_TARGET_WEIGHT": True, "TYPE": "JointsMSE"},
        })
        monkeypatch.setattr(jax, "process_count", lambda: 2)

        monkeypatch.setattr(jax, "process_index", lambda: 1)
        w1 = tmp_path / "w_host1"
        loop2d.run(cfg, overwrite=True, seed=0, weights_root=str(w1))
        assert not w1.exists() or list(w1.rglob("*")) == []

        # sanity: back to a single-process world, the same run writes
        monkeypatch.setattr(jax, "process_count", lambda: 1)
        monkeypatch.setattr(jax, "process_index", lambda: 0)
        w0 = tmp_path / "w_host0"
        loop2d.run(cfg, overwrite=True, seed=0, weights_root=str(w0))
        assert (w0 / "mh_gate" / "latest").is_dir()
