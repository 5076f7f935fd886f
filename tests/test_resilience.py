"""run_with_retries: auto-resume policy after retryable backend crashes.

Unit-level (fake run_fn) — the retry filter and resume/overwrite
hand-off are pure host logic; the loops' actual resume path is covered
by tests/test_end_to_end.py's resume tests.
"""

import os

import pytest

from fast3dhpe_tpu.train.resilience import (run_with_retries, is_retryable,
                                            wait_for_backend)


class FakeCfg:
    class MODEL:
        NAME = "retry_model"


def _unavailable():
    return RuntimeError(
        "UNAVAILABLE: TPU worker process crashed or restarted. This can "
        "be caused by a kernel fault")


class TestRetryFilter:
    def test_unavailable_is_retryable(self):
        assert is_retryable(_unavailable())

    def test_numerical_errors_are_not(self):
        assert not is_retryable(FloatingPointError("overflow"))
        assert not is_retryable(ValueError("nan loss"))
        assert not is_retryable(KeyboardInterrupt())


class TestRunWithRetries:
    def test_success_passes_through(self):
        calls = []

        def run(cfg, **kw):
            calls.append(kw)
            return {"ok": True}

        out = run_with_retries(run, FakeCfg(), retries=2,
                               retry_backoff_s=0, overwrite=True, seed=3)
        assert out == {"ok": True}
        assert len(calls) == 1 and calls[0]["overwrite"] is True

    def test_crash_then_resume_with_checkpoint(self, tmp_path):
        wroot = str(tmp_path / "weights")
        os.makedirs(os.path.join(wroot, "retry_model", "latest"))
        calls = []

        def run(cfg, **kw):
            calls.append(dict(kw))
            if len(calls) == 1:
                raise _unavailable()
            return {"resumed": kw["resume"]}

        out = run_with_retries(run, FakeCfg(), retries=2, retry_backoff_s=0,
                               weights_root=wroot, overwrite=True)
        assert out == {"resumed": True}
        assert calls[0]["overwrite"] is True
        assert calls[1]["resume"] is True and calls[1]["overwrite"] is False

    def test_crash_before_first_checkpoint_restarts_fresh(self, tmp_path):
        wroot = str(tmp_path / "weights")      # no latest/ dir
        calls = []

        def run(cfg, **kw):
            calls.append(dict(kw))
            if len(calls) == 1:
                raise _unavailable()
            return {}

        run_with_retries(run, FakeCfg(), retries=1, retry_backoff_s=0,
                         weights_root=wroot, overwrite=True)
        assert calls[1]["resume"] is False
        assert calls[1]["overwrite"] is True

    def test_retries_disabled_under_multiprocess(self, monkeypatch):
        """A local in-process resume cannot rejoin a multi-host collective
        gang (the other hosts are still blocked in the dead step) — under
        process_count > 1 the wrapper must NOT retry; whole-job restart
        with --resume is the multi-host recovery path."""
        import jax
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        calls = []

        def run(cfg, **kw):
            calls.append(1)
            raise _unavailable()

        with pytest.raises(RuntimeError, match="UNAVAILABLE"):
            run_with_retries(run, FakeCfg(), retries=3)
        assert len(calls) == 1          # no local retry attempted

    def test_retries_exhausted_raises(self):
        def run(cfg, **kw):
            raise _unavailable()

        with pytest.raises(RuntimeError, match="UNAVAILABLE"):
            run_with_retries(run, FakeCfg(), retries=2, retry_backoff_s=0)

    def test_non_retryable_raises_immediately(self):
        calls = []

        def run(cfg, **kw):
            calls.append(1)
            raise ValueError("bad loss")

        with pytest.raises(ValueError):
            run_with_retries(run, FakeCfg(), retries=5)
        assert len(calls) == 1

    def test_degrade_ladder_segments_then_per_batch(self):
        """A workload-shaped crash (the CDR-101 segment compile killed
        the TPU worker on every attempt, r4) re-crashes identical
        retries forever. The wrapper degrades in two stages: retry 2
        drops segments (keeping scan-epoch amortization — the 101 epoch
        graph compiles where its segment graph does not), retry 3 drops
        to per-batch."""
        calls = []

        def run(cfg, **kw):
            calls.append((kw.get("scan_epochs"), kw.get("segments")))
            if kw.get("segments") is not False:
                raise _unavailable()      # segment compile kills backend
            return {"ok": True}

        out = run_with_retries(run, FakeCfg(), retries=3,
                               retry_backoff_s=0, overwrite=True)
        assert out == {"ok": True}
        # attempt 0 + retry 1 keep the caller's path; retry 2 degrades
        assert calls == [(None, None), (None, None), (None, False)]

    def test_degrade_ladder_reaches_per_batch(self):
        """If even the scan-EPOCH graph kills the backend, retry 3 must
        reach the per-batch floor."""
        calls = []

        def run(cfg, **kw):
            calls.append((kw.get("scan_epochs"), kw.get("segments")))
            if kw.get("scan_epochs") is not False:
                raise _unavailable()
            return {"ok": True}

        out = run_with_retries(run, FakeCfg(), retries=3,
                               retry_backoff_s=0, overwrite=True)
        assert out == {"ok": True}
        assert calls == [(None, None), (None, None), (None, False),
                         (False, False)]

    def test_probes_backend_before_reentry(self):
        """After the backoff, the wrapper must not re-enter until the
        backend answers a probe (r4: a >12-min worker outage outlived
        the whole 45/90/135s backoff budget and killed the run)."""
        probes, calls = [], []

        def probe():
            probes.append(1)
            if len(probes) <= 3:            # worker down for 3 polls
                raise _unavailable()

        def run(cfg, **kw):
            calls.append(1)
            if len(calls) == 1:
                raise _unavailable()
            return {}

        run_with_retries(run, FakeCfg(), retries=1, retry_backoff_s=0,
                         _sleep=lambda s: None, _probe=probe)
        assert len(calls) == 2              # re-entered only once healthy
        assert len(probes) == 4             # 3 failures + 1 success

    def test_backoff_scales_linearly_per_attempt(self):
        """The relay's TPU worker takes minutes to restart — immediate
        retries burn every attempt against the still-dead backend. The
        wrapper must wait retry_backoff_s * attempt between re-entries."""
        waits, calls = [], []

        def run(cfg, **kw):
            calls.append(1)
            if len(calls) <= 2:
                raise _unavailable()
            return {}

        run_with_retries(run, FakeCfg(), retries=3, retry_backoff_s=45,
                         _sleep=waits.append)
        assert waits == [45, 90]


class TestWaitForBackend:
    def test_returns_true_when_healthy(self):
        assert wait_for_backend(_probe=lambda: None,
                                _sleep=lambda s: None) is True

    def test_polls_until_healthy(self):
        probes, waits = [], []

        def probe():
            probes.append(1)
            if len(probes) <= 2:
                raise _unavailable()

        assert wait_for_backend(deadline_s=600, poll_s=30,
                                _probe=probe, _sleep=waits.append) is True
        assert len(probes) == 3
        assert waits == [30, 30]

    def test_deadline_returns_false(self):
        waits = []

        def probe():
            raise _unavailable()

        assert wait_for_backend(deadline_s=60, poll_s=25,
                                _probe=probe, _sleep=waits.append) is False
        # 25 + 25 + clamped 10 = 60s of waiting, then one final probe
        assert waits == [25, 25, 10]

    def test_non_retryable_probe_error_raises(self):
        """A broken client (not an outage) must propagate, not spin."""
        def probe():
            raise ValueError("bad client state")

        with pytest.raises(ValueError):
            wait_for_backend(_probe=probe, _sleep=lambda s: None)


class TestBenchRetries:
    """bench._with_retries: the driver runs bench.py unattended at round
    end — a transient relay crash must re-run the (stateless)
    measurement, and non-retryable errors must propagate unchanged."""

    def _bench(self):
        import importlib
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        return importlib.import_module("bench")

    def test_retries_then_succeeds(self, monkeypatch):
        bench = self._bench()
        waits = []
        monkeypatch.setattr(bench.time, "sleep", waits.append)
        calls = []

        def fn():
            calls.append(1)
            if len(calls) <= 2:
                raise _unavailable()
            return 42

        assert bench._with_retries(fn, retries=3, backoff_s=10) == 42
        assert len(calls) == 3
        assert waits == [10, 20]   # linear backoff per attempt

    def test_non_retryable_propagates(self, monkeypatch):
        bench = self._bench()
        monkeypatch.setattr(bench.time, "sleep",
                            lambda s: pytest.fail("slept on non-retryable"))

        def fn():
            raise ValueError("nan loss")

        with pytest.raises(ValueError):
            bench._with_retries(fn, retries=3)

    def test_exhausted_retries_raise(self, monkeypatch):
        bench = self._bench()
        monkeypatch.setattr(bench.time, "sleep", lambda s: None)
        calls = []

        def fn():
            calls.append(1)
            raise _unavailable()

        with pytest.raises(RuntimeError):
            bench._with_retries(fn, retries=2)
        assert len(calls) == 3
