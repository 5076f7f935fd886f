"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count) since only one real TPU chip is
attached; set env BEFORE jax initializes its backends.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The hosting environment pins JAX_PLATFORMS=axon via sitecustomize; the env
# var alone is not enough — override through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: the suite's wall time is dominated by local
# XLA compiles of the big train/eval graphs — cache them across runs.
# Disable with FAST3DHPE_XLA_CACHE_DIR=0.
from fast3dhpe_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

if os.environ.get("FAST3DHPE_XLA_CACHE_DIR") is None:
    os.environ["FAST3DHPE_XLA_CACHE_DIR"] = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".xla_cache")
enable_compilation_cache()

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_PATH)
