"""Train state + optimizer construction.

Unlike the reference (Adam + MultiStepLR, no optimizer checkpointing
[ref: train.py:62-65]), the state here is a single pytree carrying
params / BN batch_stats / optimizer state / step, so it shards, jits and
checkpoints as one unit.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @property
    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(self.batch_stats if new_batch_stats is None
                         else new_batch_stats),
            opt_state=new_opt_state,
        )

    @classmethod
    def create(cls, variables: Dict[str, Any],
               tx: optax.GradientTransformation) -> "TrainState":
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            tx=tx,
        )


def multistep_lr(base_lr: float, lr_steps, lr_factor: float,
                 steps_per_epoch: int) -> optax.Schedule:
    """Adam + MultiStepLR schedule: LR drops by `lr_factor` at each epoch in
    `lr_steps`, stepped per-epoch in the reference [ref: train.py:62-65,
    scheduler.step() at train.py:111] — mapped here onto optimizer steps.
    """
    boundaries = {int(e) * steps_per_epoch: lr_factor for e in lr_steps}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = multistep_lr(cfg.TRAIN.LR, cfg.TRAIN.LR_STEP,
                            cfg.TRAIN.LR_FACTOR, steps_per_epoch)
    return optax.adam(schedule)


def global_grad_norm(grads) -> jnp.ndarray:
    """L2 norm over the concatenation of all gradients — the quantity the
    reference logs [ref: train_cdr.py:129-130]."""
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))


def clip_grads_by_norm(grads, max_norm: float, enable) -> Any:
    """Conditionally clip by global norm (traced-boolean `enable`).

    Matches torch.nn.utils.clip_grad_norm_ applied only after the CDR
    warmup [ref: train_cdr.py:132-133] without recompiling at the
    warmup boundary.
    """
    norm = global_grad_norm(grads)
    factor = jnp.where(
        jnp.asarray(enable) & (norm > max_norm),
        max_norm / (norm + 1e-6), 1.0)
    return jax.tree_util.tree_map(lambda g: g * factor, grads), norm
