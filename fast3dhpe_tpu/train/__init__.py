"""Training: train state, optimizer/schedule, loops, checkpointing."""

from .checkpoint import (  # noqa: F401
    torch_state_dict_to_flax,
    load_torch_checkpoint,
    merge_encoder_only,
    save_checkpoint,
    restore_checkpoint,
)
from .resilience import run_with_retries  # noqa: F401
