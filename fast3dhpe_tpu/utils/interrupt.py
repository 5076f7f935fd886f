"""Graceful-shutdown helper for the training loops.

The reference has no failure handling at all [ref SURVEY §5: "training
crashes propagate"]. Production training on preemptible TPU VMs receives
SIGTERM before eviction; converting it into KeyboardInterrupt lets the
loops save a final `latest` checkpoint (params + optimizer + step + best
metric) so --resume continues exactly where the preemption hit.
"""

from __future__ import annotations

import contextlib
import signal
import threading


@contextlib.contextmanager
def interruptible():
    """Within the block, SIGTERM raises KeyboardInterrupt (main thread
    only — elsewhere signal handlers cannot be installed; no-op then)."""
    if threading.current_thread() is not threading.main_thread():
        yield
        return
    old = signal.getsignal(signal.SIGTERM)

    def _handler(signum, frame):
        raise KeyboardInterrupt("SIGTERM")

    signal.signal(signal.SIGTERM, _handler)
    try:
        yield
    finally:
        signal.signal(signal.SIGTERM, old)
