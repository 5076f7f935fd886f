"""Process-level JAX runtime setup: persistent compilation cache.

The reference has no compile step at all (torch eager [ref: train.py:43]);
on TPU the remote XLA compile of the CDRNet-101 training graph takes
minutes per process. A persistent on-disk cache makes every run after the
first load its executables in under a second (measured on the axon relay:
169 s cold -> 0.4 s warm), which matters for the CLI apps — each
train/inference invocation is a fresh process.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

_ENV_DIR = "FAST3DHPE_XLA_CACHE_DIR"
_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "fast3dhpe_tpu", "xla")
_enabled_dir: Optional[str] = None


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Turn on JAX's persistent compilation cache. Idempotent.

    Resolution order: explicit `cache_dir` arg, then $FAST3DHPE_XLA_CACHE_DIR
    (set to "0" or "" to disable), then ~/.cache/fast3dhpe_tpu/xla.
    Returns the directory in use, or None if disabled/unavailable.
    """
    global _enabled_dir
    if cache_dir is None:
        env = os.environ.get(_ENV_DIR)
        if env is not None:
            if env in ("", "0", "off", "none"):
                return None
            cache_dir = env
        else:
            cache_dir = _DEFAULT_DIR
    if _enabled_dir == cache_dir:
        return _enabled_dir
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # jax pins its cache object to the directory active at the FIRST
        # compile; if compiles already happened, reset so the new dir
        # actually takes effect
        if _enabled_dir is not None and _enabled_dir != cache_dir:
            from jax._src import compilation_cache as _cc
            _cc.reset_cache()
        # default min_compile_time (1 s) skips trivial graphs; cache only
        # the expensive ones
        _enabled_dir = cache_dir
    except Exception as e:  # never let cache setup break a run
        logging.getLogger("fast3dhpe").warning(
            "compilation cache unavailable (%s): %s", cache_dir, e)
        return None
    return _enabled_dir
