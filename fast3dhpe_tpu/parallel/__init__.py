"""Mesh construction + sharding helpers (the runtime substrate).

The reference is single-device [ref: train.py:43 hardcodes cuda:0]; here
data parallelism over a `jax.sharding.Mesh` is first-class: inputs are
batch-sharded, parameters replicated, and XLA inserts the psum gradient
all-reduce over ICI. The mesh carries a spare "model" axis so tensor
sharding can be added without API changes.
"""

from .mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_batch_spatial,
    spatial_sharding,
    shard_stacked,
    replicate,
    local_mesh_devices,
)
