"""Crash-resilient training: retry a loop from its last checkpoint.

The reference has no failure handling at all — a crash loses the run
[ref: train.py:72-164 propagates everything]. On shared/preemptible TPU
stacks the backend itself can die mid-run (observed on this relay as
`JaxRuntimeError: UNAVAILABLE: TPU worker process crashed or
restarted`). Both training loops already checkpoint a rolling "latest"
(optimizer state + step + best metric included) and support
`resume=True`; this wrapper turns that into automatic recovery: on an
UNAVAILABLE-class backend failure it re-enters the loop with
resume=True, losing at most `checkpoint_every - 1` epochs of work.

Deliberately app-layer policy (not buried in the loops): the loops stay
pure train logic; apps opt in with `--retries N`.
"""

from __future__ import annotations

import logging
from typing import Callable

#: substrings identifying retryable backend-infrastructure failures (the
#: compute itself is deterministic — numerical errors must NOT retry)
_RETRYABLE = ("UNAVAILABLE", "worker process crashed",
              "socket closed", "DEADLINE_EXCEEDED")


def is_retryable(exc: BaseException) -> bool:
    msg = str(exc)
    return any(s in msg for s in _RETRYABLE)


def _default_probe():
    # device_put + host fetch forces a full round-trip through the
    # backend; block_until_ready alone does NOT wait on this relay
    # (CLAUDE.md), and a dead worker raises UNAVAILABLE right here.
    import jax
    import numpy as np
    float(jax.device_put(np.float32(1.0)))


def wait_for_backend(deadline_s: float = 600.0, poll_s: float = 30.0,
                     logger: logging.Logger = None,
                     _sleep=None, _probe=None) -> bool:
    """Poll the backend with a trivial device round-trip until it answers.

    A crashed relay worker takes MINUTES to restart (observed: >12 min,
    r4 — a 600-epoch launch burned all 3 retries in 4.5 min of linear
    backoff against a worker that came back fine later). Blind backoff
    either wastes wall clock or gives up too early; probing converts
    "retry and hope" into "retry when the backend actually answers".

    Returns True once a probe succeeds, False if the deadline passes
    with the backend still down (the caller may attempt anyway — the
    probe is advisory). Non-retryable probe errors propagate: a broken
    client is a bug, not an outage.
    """
    log = logger or logging.getLogger("fast3dhpe")
    import time
    probe = _probe or _default_probe
    sleep = _sleep or time.sleep
    waited = 0.0
    while True:
        try:
            probe()
            return True
        except Exception as e:                # noqa: BLE001 — filtered
            if not is_retryable(e):
                raise
            if waited >= deadline_s:
                log.warning(
                    "backend still down after %.0fs of probing (%s); "
                    "attempting anyway", waited,
                    str(e).splitlines()[0][:80])
                return False
            step = min(poll_s, deadline_s - waited)
            log.info("backend down (%s); re-probing in %.0fs "
                     "(%.0f/%.0fs)", str(e).splitlines()[0][:80],
                     step, waited, deadline_s)
            sleep(step)
            waited += step


def run_with_retries(run_fn: Callable, config, retries: int = 0,
                     logger: logging.Logger = None,
                     retry_backoff_s: float = 45.0,
                     backend_wait_s: float = 600.0,
                     _sleep=None, _probe=None,
                     **kwargs):
    """Call `run_fn(config, **kwargs)` (loop2d.run / loop_cdr.run),
    retrying with resume=True after retryable backend crashes.

    Args:
      run_fn: a training loop entry point accepting (config, **kwargs)
        with `resume` and `overwrite` keyword options.
      retries: max automatic re-entries (0 = plain call).
      retry_backoff_s: base wait before re-entering, scaled linearly per
        attempt (45/90/135s...). A crashed TPU worker takes minutes to
        restart; retrying immediately burns every attempt against the
        still-restarting backend (observed: 3 retries spent in <10 s,
        then the run died while the worker came back fine later).
      backend_wait_s: after the backoff, probe the backend with a tiny
        device round-trip for up to this long before re-entering
        (wait_for_backend); 0 disables. Added after an outage outlived
        the whole linear-backoff budget (r4: >12 min worker restart vs
        4.5 min of 45/90/135s backoffs).
      _sleep, _probe: test seams (time.sleep / device round-trip).
      kwargs: forwarded to run_fn; `resume`/`overwrite` of the FIRST
        attempt come from here, later attempts force resume=True.
    Returns:
      run_fn's history dict (of the attempt that completed).

    Degrade-on-retry: a crash can be triggered by the WORKLOAD, not the
    infrastructure — observed on this relay: the CDRNet-101
    scan-SEGMENT compile crashed the TPU worker on 5/5 attempts, so
    every retry re-entered the identical compile and died before step 1
    with nothing to resume. From the second retry onward the loop is
    re-entered with scan_epochs=False (the per-batch path, smallest
    graphs): if the crash was workload-shaped, the degraded path
    completes; if it was genuinely transient, the first same-shape
    retry already caught it. Callers that pass their own scan_epochs
    keep it for the first retry and are still degraded after.

    Why the ladder has no intermediate segment sizes (r5 decision):
    scripts/segment_probe.py mapped the CDR-101 segment compile cliff —
    E=8 compiles where E=25 crashes, but the E=8 compile takes 36.6 min
    on this relay while scan-epoch compiles in ~1 min at ~same
    steady-state throughput for sub-1000-epoch runs. A retry ladder
    must REDUCE compile cost at every step (a retry that pays a
    half-hour compile before its first checkpoint risks a second crash
    with nothing banked), so segments degrade straight to scan-epoch;
    --segment_epochs remains an explicit opt-in for marathon runs
    (docs/PERFORMANCE.md "segment execution probed").
    """
    log = logger or logging.getLogger("fast3dhpe")
    import jax
    if retries and jax.process_count() > 1:
        # Single-process policy only: a local retry re-enters the loop
        # with the OTHER hosts still blocked inside the dead step's
        # collectives — the resumed host would issue fresh collectives
        # against a desynchronized gang and hang or corrupt the run.
        # Multi-host recovery must restart ALL processes from the shared
        # checkpoint (the job scheduler's restart policy + --resume).
        log.warning("--retries disabled under multi-process execution "
                    "(%d processes): in-process resume cannot rejoin the "
                    "collective gang; rely on whole-job restart with "
                    "--resume", jax.process_count())
        retries = 0
    attempt = 0
    while True:
        try:
            return run_fn(config, **kwargs)
        except Exception as e:                # noqa: BLE001 — filtered
            if attempt >= retries or not is_retryable(e):
                raise
            attempt += 1
            # resume only if a rolling checkpoint exists yet; a crash
            # before the first save restarts fresh (overwrite)
            import os
            latest = os.path.join(kwargs.get("weights_root", "weights"),
                                  config.MODEL.NAME, "latest")
            has_ckpt = os.path.isdir(latest)
            wait = retry_backoff_s * attempt
            log.warning(
                "Backend failure (%s); %s in %.0fs (attempt %d/%d)",
                str(e).splitlines()[0][:120],
                "resuming from last checkpoint" if has_ckpt
                else "no checkpoint yet - restarting fresh",
                wait, attempt, retries)
            if wait > 0:
                import time
                (_sleep or time.sleep)(wait)
            if backend_wait_s > 0:
                # don't re-enter until the backend actually answers (or
                # the probe deadline passes — then try our luck anyway)
                wait_for_backend(backend_wait_s, logger=log,
                                 _sleep=_sleep, _probe=_probe)
            kwargs = dict(kwargs, resume=has_ckpt,
                          overwrite=not has_ckpt)
            if attempt >= 2 and kwargs.get("scan_epochs") is not False:
                # two-stage ladder: segments off first (keeps scan-epoch
                # amortization — CDR-101's SEGMENT graph is what crashed
                # this relay's worker while its epoch graph compiles),
                # then fully per-batch
                if kwargs.get("segments") is not False:
                    log.warning("degrading to scan-epoch execution "
                                "(segments=False): repeated crashes "
                                "suggest the segment compile itself "
                                "kills the backend")
                    kwargs["segments"] = False
                else:
                    log.warning("degrading to per-batch execution "
                                "(scan_epochs=False)")
                    kwargs["scan_epochs"] = False
