"""Multi-host (multi-slice) initialization + per-host data sharding.

The reference has no distributed support [ref: train.py:43 hardcodes one
device]. For multi-host TPU pods: call `init_distributed()` once per
process before any jax call; collectives ride ICI within a slice and DCN
across hosts, all inserted by XLA from the sharding annotations — no
hand-written transport.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    No-op in single-process runs."""
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None:
        return
    # `x if x is not None else env` — NOT `x or env`: an explicit 0 is a
    # valid process_id and must not be overridden by the env var.
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_records_for_host(records: Sequence, process_index: Optional[int]
                           = None, process_count: Optional[int] = None
                           ) -> List:
    """Partition a dataset index across hosts (each host decodes only its
    shard; the global batch is assembled by the sharding annotations)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(records)[pi::pc]
