"""2D backbone training loop (MPII / MADS_2d). [ref: train.py:17-164]

Differences from the reference, all deliberate:
  - per-step PCK is computed on device inside the compiled step (the
    reference syncs heatmaps to host numpy every step [ref: train.py:99]);
  - checkpoints include optimizer state + step (orbax), saved as
    weights/<NAME>/{best,latest};
  - the interactive overwrite prompt [ref: train.py:21-31] is a flag.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Dict, Optional


import jax
import jax.numpy as jnp

from ..config import Config
from ..models import PoseResNet, make_loss
from ..data import load_data
from .state import TrainState, make_optimizer
from .steps import make_train_step_2d, make_eval_step_2d
from .checkpoint import (save_checkpoint, load_torch_checkpoint,
                         merge_encoder_only)
from ..utils.logging import setup_logger


def _prepare_model_dir(model_path: str, overwrite: bool, logger) -> None:
    if os.path.exists(model_path):
        if not overwrite:
            raise FileExistsError(
                f"Model dir {model_path} exists; pass overwrite=True "
                f"(--overwrite) to replace it")
        logger.info("Overwriting existing model dir %s", model_path)
        shutil.rmtree(model_path)
    os.makedirs(model_path, exist_ok=True)


def _state_tree(state: TrainState) -> Dict:
    return {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}


def run(config: Config, mesh=None, overwrite: bool = False,
        weights_root: str = "weights", max_epochs: Optional[int] = None,
        max_steps_per_epoch: Optional[int] = None, seed: int = 0,
        compute_dtype: str = "float32", plot_dir: Optional[str] = None,
        resume: bool = False) -> Dict:
    """Train PoseResNet; returns a history dict (losses/accs per epoch).

    compute_dtype: "float32" or "bfloat16" (params/BN stats stay fp32).
    plot_dir: if set, write loss/accuracy curves there after training
    (the reference's plot_loss calls are commented out [ref train.py:160-163]).
    resume: continue from weights/<NAME>/latest (params + optimizer state +
    step — true resume, which the reference cannot do [ref SURVEY §5]).
    """
    logger = setup_logger()
    model_path = os.path.join(weights_root, config.MODEL.NAME)
    if not resume:
        _prepare_model_dir(model_path, overwrite, logger)

    train_loader, valid_loader = load_data(config, mesh=mesh, seed=seed)
    logger.info("Train samples: %d, valid samples: %d",
                train_loader.num_samples, valid_loader.num_samples)

    model = PoseResNet.from_config(config, dtype=jnp.dtype(compute_dtype))
    sample_shape = (1, config.MODEL.IMAGE_SIZE[1],
                    config.MODEL.IMAGE_SIZE[0], 3)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros(sample_shape, jnp.float32), train=False)
    if config.MODEL.PRETRAINED:
        logger.info("Loading pretrained encoder from %s",
                    config.MODEL.PRETRAINED)
        pretrained = load_torch_checkpoint(config.MODEL.PRETRAINED)
        variables = merge_encoder_only(variables, pretrained)

    steps_per_epoch = len(train_loader)
    tx = make_optimizer(config, steps_per_epoch)
    state = TrainState.create(variables, tx)

    start_epoch = 0
    if resume:
        from .checkpoint import restore_checkpoint
        restored = restore_checkpoint(os.path.join(model_path, "latest"),
                                      _state_tree(state))
        if restored is not None:
            state = state.replace(
                step=jnp.asarray(restored["step"]),
                params=restored["params"],
                batch_stats=restored["batch_stats"],
                opt_state=restored["opt_state"])
            start_epoch = int(restored["step"]) // max(steps_per_epoch, 1)
            logger.info("Resumed from step %d (epoch %d)",
                        int(restored["step"]), start_epoch)
        else:
            os.makedirs(model_path, exist_ok=True)
            logger.info("No checkpoint to resume; starting fresh")

    if mesh is not None:
        from ..parallel import replicate
        state = replicate(mesh, state)

    loss_fn = make_loss(config.LOSS.TYPE, config.LOSS.USE_TARGET_WEIGHT,
                        layout="NHWC")
    train_step = make_train_step_2d(model, loss_fn)
    eval_step = make_eval_step_2d(model, loss_fn)

    n_epochs = max_epochs if max_epochs is not None else config.TRAIN.EPOCH
    history = {"train_loss": [], "val_loss": [], "train_acc": [],
               "val_acc": []}
    best_acc = -1.0

    for epoch in range(start_epoch, n_epochs):
        t0 = time.time()
        tl, ta, n = 0.0, 0.0, 0
        for i, batch in enumerate(train_loader):
            if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                break
            batch.pop("n_valid", None)
            state, m = train_step(state, batch)
            tl += float(m["loss"])
            ta += float(m["acc"])
            n += 1
        tl, ta = tl / max(n, 1), ta / max(n, 1)

        vl, va, nv = 0.0, 0.0, 0
        for i, batch in enumerate(valid_loader):
            if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                break
            batch.pop("n_valid", None)
            m = eval_step(state, batch)
            vl += float(m["loss"])
            va += float(m["acc"])
            nv += 1
        vl, va = vl / max(nv, 1), va / max(nv, 1)

        history["train_loss"].append(tl)
        history["val_loss"].append(vl)
        history["train_acc"].append(ta)
        history["val_acc"].append(va)
        logger.info("epoch %d/%d  train loss %.5f acc %.4f | "
                    "val loss %.5f acc %.4f  (%.1fs)",
                    epoch + 1, n_epochs, tl, ta, vl, va, time.time() - t0)

        if va > best_acc:
            best_acc = va
            save_checkpoint(os.path.join(model_path, "best"),
                            _state_tree(state))
            logger.info("Saved new best (val acc %.4f)", va)
        save_checkpoint(os.path.join(model_path, "latest"),
                        _state_tree(state))

    if plot_dir:
        from ..utils import plot_loss
        plot_loss(history["train_loss"], plot_dir, "Training Loss")
        plot_loss(history["val_loss"], plot_dir, "Validation Loss")
        plot_loss(history["train_acc"], plot_dir, "Training Accuracy")
        plot_loss(history["val_acc"], plot_dir, "Validation Accuracy")
    logger.info("Training is done!")
    return history
