"""Profiling: step-time/throughput meter + jax.profiler trace hooks.

The reference's only timing surface is tqdm progress bars
[ref: train.py:83-107]; here the north-star metric (stereo pairs/s) is a
first-class meter, and device traces can be captured for xprof/perfetto.

IMPORTANT on this platform: the axon relay's block_until_ready does NOT
wait for device completion (see bench.py) — `sync` fetches a scalar from
the tree to force real completion before timestamps are taken.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np

import jax


def sync(tree) -> None:
    """Force device completion by fetching one scalar per leaf subtree."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(jax.device_get(leaves[0].ravel()[0]))


def measure_scan_floor(iters: int = 50) -> float:
    """Per-iteration fixed cost (seconds) of a serializing lax.scan with
    a trivial body, measured exactly like the model-timing scans (jit,
    warm run, then one timed dispatch fetching a scalar).

    On this platform host-side timing of a scan is an UPPER BOUND that
    includes ~1.3-1.45 ms/iteration of scan/dispatch machinery
    (docs/PERFORMANCE.md); subtract this floor — measured at the SAME
    iteration count — to estimate true model latency. Shared by bench.py
    --latency and scripts/bottleneck_variant_bench.py so both report on
    one baseline."""
    import jax.numpy as jnp
    x0 = jnp.zeros((8, 128), jnp.float32)

    def run_n(x):
        def body(carry, _):
            return carry * 1.0000001 + 1e-9, ()
        x, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(x)

    g = jax.jit(run_n)
    float(g(x0))                       # compile + warm
    t0 = time.perf_counter()
    float(g(x0))
    return (time.perf_counter() - t0) / iters


class ThroughputMeter:
    """Rolling samples/sec + step-time statistics."""

    def __init__(self, window: int = 50):
        self.window = window
        self.reset()

    def reset(self):
        self._times = []
        self._counts = []
        self._last: Optional[float] = None

    def start(self):
        self._last = time.perf_counter()

    def step(self, n_samples: int, result=None):
        """Record one step of n_samples; pass the step output as `result`
        to synchronize on it."""
        if result is not None:
            sync(result)
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            self._counts.append(n_samples)
            if len(self._times) > self.window:
                self._times.pop(0)
                self._counts.pop(0)
        self._last = now

    @property
    def samples_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return sum(self._counts) / sum(self._times)

    @property
    def mean_step_ms(self) -> float:
        if not self._times:
            return 0.0
        return 1e3 * sum(self._times) / len(self._times)


class StepTracer:
    """Captures a jax.profiler device trace of steps 1..4 of a loop.

    Shared by both training loops (was copy-pasted in each). Profiling
    must never kill a run: every jax.profiler call is guarded, and a
    failure permanently disables the tracer.
    """

    def __init__(self, trace_dir, logger):
        self.trace_dir = trace_dir
        self.logger = logger
        self.on = False
        self.done = trace_dir is None

    def maybe(self, step_i, m):
        if self.done:
            return
        try:
            if not self.on and step_i == 1:
                jax.profiler.start_trace(self.trace_dir)
                self.on = True
            elif self.on and step_i >= 4:
                self.finish(m)
        except Exception as e:
            self.logger.warning("device trace failed: %s", e)
            self.done = True

    def finish(self, m):
        if not self.on:
            return
        try:
            if m is not None:
                jax.device_get(m["loss"])   # flush before stopping
            jax.profiler.stop_trace()
            self.logger.info("Wrote device trace to %s", self.trace_dir)
        except Exception as e:
            self.logger.warning("device trace failed: %s", e)
        self.on = False
        self.done = True


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device trace."""
    with jax.profiler.TraceAnnotation(name):
        yield
