"""CDRNet stereo fine-tune loop (MADS_3d). [ref: train_cdr.py:17-237]

Reference semantics preserved: 2D-only warmup for TRAIN.WARMUP epochs,
then loss = LOSS_3D_WEIGHT * crit(0.1 * 3D) + sum of 2D losses, grad-norm
clipping at 100 post-warmup, best checkpoint on val 3D MPJPE only after
warmup. The warmup switch is a traced boolean (no recompile at the
boundary).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..models import CDRNet, make_loss
from ..data import load_data
from .state import TrainState, make_optimizer
from .steps import make_train_step_cdr, make_eval_step_cdr
from .checkpoint import (save_checkpoint, load_torch_checkpoint,
                         merge_encoder_only)
from .loop2d import _prepare_model_dir, _state_tree
from ..utils.logging import setup_logger

SCALE_3D = 0.1      # [ref: train_cdr.py:74]
BASE_JOINT = 1      # [ref: train_cdr.py:73]


def run(config: Config, mesh=None, overwrite: bool = False,
        weights_root: str = "weights", max_epochs: Optional[int] = None,
        max_steps_per_epoch: Optional[int] = None, seed: int = 0,
        compute_dtype: str = "float32", plot_dir: Optional[str] = None,
        resume: bool = False) -> Dict:
    """Train CDRNet; returns history (losses + val MPJPE per epoch).

    compute_dtype: "float32" or "bfloat16" (params/BN stats stay fp32).
    resume: continue from weights/<NAME>/latest (true resume incl.
    optimizer state + step; warmup accounting follows the restored epoch).
    """
    logger = setup_logger()
    model_path = os.path.join(weights_root, config.MODEL.NAME)
    if not resume:
        _prepare_model_dir(model_path, overwrite, logger)

    train_loader, valid_loader = load_data(config, mesh=mesh, seed=seed)
    logger.info("Train samples: %d, valid samples: %d",
                train_loader.num_samples, valid_loader.num_samples)

    model = CDRNet.from_config(config, dtype=jnp.dtype(compute_dtype))
    H, W = config.MODEL.IMAGE_SIZE[1], config.MODEL.IMAGE_SIZE[0]
    dummy_imgs = jnp.zeros((1, 2, H, W, 3), jnp.float32)
    dummy_proj = jnp.broadcast_to(
        jnp.asarray([[600.0, 0, 128, 0], [0, 600.0, 128, 0],
                     [0, 0, 1, 3000.0]], jnp.float32), (1, 2, 3, 4))
    variables = model.init(jax.random.PRNGKey(seed), dummy_imgs, dummy_proj,
                           train=False)
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

    loss_fn = make_loss(config.LOSS.TYPE, config.LOSS.USE_TARGET_WEIGHT)
    nj = config.MODEL.NUM_JOINTS
    w3d = config.TRAIN.LOSS_3D_WEIGHT
    train_step = make_train_step_cdr(model, loss_fn, loss_3d_weight=w3d,
                                     scale_3d=SCALE_3D,
                                     base_joint=BASE_JOINT, num_joints=nj)
    eval_step = make_eval_step_cdr(model, loss_fn, loss_3d_weight=w3d,
                                   scale_3d=SCALE_3D, base_joint=BASE_JOINT,
                                   num_joints=nj)

    n_epochs = max_epochs if max_epochs is not None else config.TRAIN.EPOCH
    warmup = config.TRAIN.WARMUP
    history = {"train_loss": [], "val_loss": [], "val_mpjpe_3d": [],
               "val_mpjpe_2d": [], "grad_norm": []}
    best_err = float("inf")

    for epoch in range(start_epoch, n_epochs):
        t0 = time.time()
        use_3d = jnp.asarray(epoch >= warmup)

        tl, gn, n = 0.0, 0.0, 0
        for i, batch in enumerate(train_loader):
            if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                break
            batch.pop("n_valid", None)
            state, m = train_step(state, batch, use_3d)
            tl += float(m["loss"])
            gn += float(m["grad_norm"])
            n += 1
        tl, gn = tl / max(n, 1), gn / max(n, 1)

        vl, e2, e3, nv = 0.0, 0.0, 0.0, 0
        for i, batch in enumerate(valid_loader):
            if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                break
            batch.pop("n_valid", None)
            m = eval_step(state, batch, use_3d)
            vl += float(m["loss"])
            e2 += float(m["mpjpe_2d"])
            e3 += float(m["mpjpe_3d"])
            nv += 1
        vl = vl / max(nv, 1)
        e2, e3 = e2 / max(nv, 1), e3 / max(nv, 1)

        history["train_loss"].append(tl)
        history["val_loss"].append(vl)
        history["val_mpjpe_2d"].append(e2)
        history["val_mpjpe_3d"].append(e3)
        history["grad_norm"].append(gn)
        logger.info("epoch %d/%d%s  train loss %.5f |grad| %.2f | "
                    "val loss %.5f MPJPE2D %.2fpx MPJPE3D %.2fmm  (%.1fs)",
                    epoch + 1, n_epochs,
                    " [warmup]" if epoch < warmup else "",
                    tl, gn, vl, e2, e3, time.time() - t0)

        # best only post-warmup [ref: train_cdr.py:223-228]
        if e3 < best_err and epoch > warmup:
            best_err = e3
            save_checkpoint(os.path.join(model_path, "best"),
                            _state_tree(state))
            logger.info("Saved new best (val 3D MPJPE %.2fmm)", e3)
        save_checkpoint(os.path.join(model_path, "latest"),
                        _state_tree(state))

    if plot_dir:
        from ..utils import plot_loss
        plot_loss(history["train_loss"], plot_dir, "Training Loss")
        plot_loss(history["val_loss"], plot_dir, "Validation Loss")
        plot_loss(history["val_mpjpe_3d"], plot_dir, "MPJPE")
    logger.info("Training is done!")
    return history
