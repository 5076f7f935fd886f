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
