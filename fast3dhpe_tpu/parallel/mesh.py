"""Device mesh + sharding utilities.

Design (per the scaling-book recipe): pick a mesh, annotate input/output
shardings, let XLA insert collectives. For this model family (ResNet-scale,
~45M params) the batch ("data") axis is the parallelism axis; parameters
are replicated. The mesh optionally carries a trailing "model" axis
(size 1 by default) so tensor-parallel shardings can be introduced later
without changing call sites.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def local_mesh_devices(n_devices: Optional[int] = None):
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return devices


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1) -> Mesh:
    """1-D (or 2-D) mesh: ("data",) or ("data", "model").

    Args:
      n_devices: total devices to use (default: all).
      model_parallel: size of the model axis (1 = pure data parallel).
    """
    devices = local_mesh_devices(n_devices)
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel="
                         f"{model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays onto the mesh, batch-sharded on axis 0.

    Batch sizes must be divisible by the data-axis size (static shapes —
    the loaders pad/trim accordingly). Under multiple processes each host
    supplies its LOCAL rows of the global batch
    (jax.make_array_from_process_local_data assembles the global array);
    the loaders shard their record index per host accordingly.
    """
    sharding = batch_sharding(mesh)

    if jax.process_count() > 1:
        def put(x):
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
    else:
        def put(x):
            return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def spatial_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for an image batch with HEIGHT split over the model axis.

    (B, V, H, W, 3) stereo -> P("data", None, "model"); (B, H, W, 3)
    mono -> P("data", "model"). Trailing dims replicated.
    """
    if ndim == 5:
        spec = P(DATA_AXIS, None, MODEL_AXIS)
    elif ndim == 4:
        spec = P(DATA_AXIS, MODEL_AXIS)
    else:
        raise ValueError(f"expected a 4-D/5-D image batch, got ndim={ndim}")
    return NamedSharding(mesh, spec)


def shard_batch_spatial(mesh: Mesh, batch):
    """Like shard_batch, but ALSO splits the image height over "model".

    Spatial partitioning for latency-bound small-batch serving: with
    batch 1 on an N-chip slice, pure data parallelism leaves N-1 chips
    idle. Annotating the conv stack's H axis onto the model axis makes
    XLA partition every conv spatially and insert the halo exchanges
    (collective-permutes of the 3x3/7x7 borders) over ICI — no model
    code changes, per the standard GSPMD recipe. The reference has no
    analogue (single device [ref: train.py:43]); this is the TPU-native
    answer to its frame-at-a-time streaming inference
    [ref: tools/load.py:30-72].

    `batch` is a dict; leaves named "image" shard (B, V, H, W, 3) as
    P("data", None, "model") (mono (B, H, W, 3) as P("data", "model"));
    all other leaves shard P("data"). H should be divisible by the
    model-axis size (256 / {2,4,8} is). Numerics match the unsharded
    forward up to float reassociation — soft-argmax reductions and BN
    (eval mode) are global under jit. Guarded by
    tests/test_train_steps.py::TestSpatialSharding.
    """
    data_sh = batch_sharding(mesh)

    def put(key, x):
        if key == "image":
            return jax.device_put(x, spatial_sharding(mesh, np.ndim(x)))
        return jax.device_put(x, data_sh)

    return {k: jax.tree_util.tree_map(lambda x, k=k: put(k, x), v)
            for k, v in batch.items()}


def shard_stacked(mesh: Mesh, tree, lead: int = 1):
    """Place stacked-epoch arrays on the mesh with the BATCH axis sharded
    over "data". `lead` = number of leading scan axes before the batch
    axis: 1 for (S, B, ...) single-epoch stacks, 2 for (E, S, B, ...)
    multi-epoch segments (train/steps.make_segment_cdr)."""
    sharding = NamedSharding(mesh, P(*([None] * lead), DATA_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. params) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
