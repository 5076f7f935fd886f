"""2D backbone training loop (MPII / MADS_2d). [ref: train.py:17-164]

Differences from the reference, all deliberate:
  - per-step metrics are computed on device inside the compiled step and
    ACCUMULATED on device; the host fetches once per epoch (and once per
    --log_every window) instead of the reference's per-step numpy sync
    [ref: train.py:99] — on a ~20ms-RPC link a per-step float() fetch
    would halve the loop throughput;
  - padded final batches are masked out of gradients and metrics via the
    loaders' row_valid mask; val statistics are per-sample-exact
    (invariant to TEST.BATCH_SIZE);
  - checkpoints include optimizer state + step + the best metric (orbax),
    saved as weights/<NAME>/{best,latest}; --resume keeps the historical
    best instead of overwriting it with the first post-resume epoch;
  - the interactive overwrite prompt [ref: train.py:21-31] is a flag.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Dict, Optional


import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import PoseResNet, make_loss
from ..models.metrics import pck_from_counts
from ..data import load_data
from .state import TrainState, make_optimizer, multistep_lr
from .steps import (make_train_step_2d, make_eval_step_2d,
                    make_train_epoch_2d, make_eval_epoch_2d,
                    make_segment_2d)
from .checkpoint import (load_variables, make_checkpoint_writer,
                         merge_encoder_only, restore_checkpoint_compat)
from ..utils.logging import setup_logger
from ..utils.profiling import StepTracer, ThroughputMeter
from ..utils.interrupt import interruptible


def _prepare_model_dir(model_path: str, overwrite: bool, logger,
                       check_only: bool = False) -> None:
    """check_only=True validates the overwrite flag WITHOUT deleting —
    the loops call that first, defer the destructive rmtree until after
    load_data succeeds, and so never clobber an existing checkpoint over
    a typo'd dataset path.

    Process-0-gated like the checkpoint writers: only process 0 may
    delete/create the (shared) model dir; other hosts would race the
    rmtree/makedirs."""
    if jax.process_index() != 0:
        return
    if os.path.exists(model_path):
        if not overwrite:
            raise FileExistsError(
                f"Model dir {model_path} exists; pass overwrite=True "
                f"(--overwrite) to replace it")
        if check_only:
            return
        logger.info("Overwriting existing model dir %s", model_path)
        shutil.rmtree(model_path)
    if not check_only:
        os.makedirs(model_path, exist_ok=True)


def _state_tree(state: TrainState, best_metric: float = 0.0) -> Dict:
    return {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step,
            "best_metric": jnp.asarray(best_metric, jnp.float32)}


@jax.jit
def _tree_add(a, b):
    """Device-side metric accumulation — one tiny fused program per step,
    dispatched asynchronously (never blocks the loop)."""
    return jax.tree_util.tree_map(jnp.add, a, b)


def _stack_segment(xs_list, E_full):
    """Stack E epochs of stacked-epoch metadata into one (E_full, S, ...)
    tree for a segment dispatch, padding ragged segments by repeating
    the last epoch (cond-skipped on device via epoch_valid — see
    steps.make_segment_cdr). Returns (seq, epoch_valid, n_valid)."""
    n_valid = int(sum(x["row_valid"].sum() for x in xs_list))
    E = len(xs_list)
    xs_list = xs_list + [xs_list[-1]] * (E_full - E)
    epoch_valid = np.arange(E_full) < E
    seq = {k: np.stack([x[k] for x in xs_list]) for k in xs_list[0]}
    return seq, epoch_valid, n_valid


def _restore_state(model_path, state, logger):
    """Resume from <model_path>/latest; returns (state, start_step,
    best_metric or None)."""
    restored = restore_checkpoint_compat(
        os.path.join(model_path, "latest"), _state_tree(state),
        optional_keys=("best_metric",))
    if restored is None:
        os.makedirs(model_path, exist_ok=True)
        logger.info("No checkpoint to resume; starting fresh")
        return state, 0, None
    state = state.replace(
        step=jnp.asarray(restored["step"]),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"])
    best = restored.get("best_metric")
    best = float(best) if best is not None else None
    logger.info("Resumed from step %d (best metric %s)",
                int(restored["step"]), best)
    return state, int(restored["step"]), best


def run(config: Config, mesh=None, overwrite: bool = False,
        weights_root: str = "weights", max_epochs: Optional[int] = None,
        max_steps_per_epoch: Optional[int] = None, seed: int = 0,
        compute_dtype: str = "float32", plot_dir: Optional[str] = None,
        resume: bool = False, log_every: Optional[int] = None,
        trace_dir: Optional[str] = None,
        scan_epochs: Optional[bool] = None,
        segments: Optional[bool] = None,
        checkpoint_every: int = 1,
        segment_epochs: Optional[int] = None,
        async_checkpoint: bool = False,
        early_stop_patience: Optional[int] = None) -> Dict:
    """Train PoseResNet; returns a history dict (losses/accs per epoch).

    early_stop_patience: if set, stop once val PCK has not improved for
    this many epochs (segment-granularity on the segment path) — see
    loop_cdr.run. Checkpoints are still written at the stop point.
    segments: None (auto) / False — see loop_cdr.run: False keeps
    scan-EPOCH dispatches without batching inter-checkpoint spans into
    one segment graph.
    segment_epochs: epochs per segment graph, decoupled from the
    checkpoint cadence (see loop_cdr.run; default checkpoint_every,
    clamped to it).

    async_checkpoint: fetch+write checkpoints on a background thread so
    the ~540 MB device->host state transfer overlaps training instead of
    stalling it (checkpoint.AsyncCheckpointWriter; saves are drained at
    completion and on interrupt). Off by default: multi-host runs and
    test determinism want the inline path.

    scan_epochs: run each epoch as one lax.scan dispatch when the device
    frame cache holds the dataset (see loop_cdr.run).

    compute_dtype: "float32" or "bfloat16" (params/BN stats stay fp32).
    plot_dir: if set, write loss/accuracy curves there after training
    (the reference's plot_loss calls are commented out [ref train.py:160-163]).
    resume: continue from weights/<NAME>/latest (params + optimizer state +
    step + best metric — true resume, which the reference cannot do
    [ref SURVEY §5]).
    log_every: if set, log per-step loss/acc/grad-norm/lr + live imgs/s
    every N steps (reference parity: the tqdm pbar [ref: train.py:83-107]).
    trace_dir: if set, capture a jax.profiler device trace of a few
    early steady-state steps there (view with xprof/tensorboard).
    """
    logger = setup_logger()
    model_path = os.path.join(weights_root, config.MODEL.NAME)
    if not resume:
        _prepare_model_dir(model_path, overwrite, logger, check_only=True)

    train_loader, valid_loader = load_data(config, mesh=mesh, seed=seed)
    logger.info("Train samples: %d, valid samples: %d",
                train_loader.num_samples, valid_loader.num_samples)
    if not resume:
        _prepare_model_dir(model_path, overwrite, logger)

    model = PoseResNet.from_config(config, dtype=jnp.dtype(compute_dtype))
    sample_shape = (1, config.MODEL.IMAGE_SIZE[1],
                    config.MODEL.IMAGE_SIZE[0], 3)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros(sample_shape, jnp.float32), train=False)
    if config.MODEL.PRETRAINED:
        logger.info("Loading pretrained encoder from %s",
                    config.MODEL.PRETRAINED)
        # accepts a reference torch .pth or a native orbax dir
        pretrained = load_variables(config.MODEL.PRETRAINED)
        variables = merge_encoder_only(variables, pretrained)

    steps_per_epoch = len(train_loader)
    tx = make_optimizer(config, steps_per_epoch)
    schedule = multistep_lr(config.TRAIN.LR, config.TRAIN.LR_STEP,
                            config.TRAIN.LR_FACTOR, steps_per_epoch)
    state = TrainState.create(variables, tx)

    start_epoch = 0
    best_acc = -1.0
    if resume:
        state, start_step, best = _restore_state(model_path, state, logger)
        start_epoch = start_step // max(steps_per_epoch, 1)
        if best is not None:
            best_acc = best

    if mesh is not None:
        from ..parallel import replicate
        state = replicate(mesh, state)

    loss_fn = make_loss(config.LOSS.TYPE, config.LOSS.USE_TARGET_WEIGHT,
                        layout="NHWC")
    train_step = make_train_step_2d(model, loss_fn)
    eval_step = make_eval_step_2d(model, loss_fn)

    # scan-epoch path: whole epoch as one dispatch when the dataset's
    # frames are resident in HBM (see loop_cdr.run docstring)
    scan_allowed = (scan_epochs is not False and log_every is None
                    and trace_dir is None)
    if scan_epochs and not scan_allowed:
        logger.info("scan_epochs=True ignored: log_every/trace_dir need "
                    "the per-batch loop")
    train_epoch_fn = eval_epoch_fn = segment_fn = None
    if scan_allowed and (scan_epochs
                         or config.DATASET.DEVICE_CACHE_BYTES):
        train_epoch_fn = make_train_epoch_2d(
            model, loss_fn, config.MODEL.IMAGE_SIZE,
            config.MODEL.EXTRA.HEATMAP_SIZE, config.MODEL.EXTRA.SIGMA)
        eval_epoch_fn = make_eval_epoch_2d(
            model, loss_fn, config.MODEL.IMAGE_SIZE,
            config.MODEL.EXTRA.HEATMAP_SIZE, config.MODEL.EXTRA.SIGMA)
        # segment path (see loop_cdr.run): the whole inter-checkpoint
        # span as one dispatch when both loaders cache
        tprobe = train_loader.ensure_device_cache()
        vprobe = valid_loader.ensure_device_cache()
        if (segments is not False
                and tprobe is not None and not tprobe.partial
                and vprobe is not None and not vprobe.partial):
            segment_fn = make_segment_2d(
                model, loss_fn, config.MODEL.IMAGE_SIZE,
                config.MODEL.EXTRA.HEATMAP_SIZE,
                config.MODEL.EXTRA.SIGMA)

    def _try_stacked(loader):
        if train_epoch_fn is None:
            return None
        probe = loader.ensure_device_cache()
        if probe is None or probe.partial:
            return None
        cache, xs, ep_idx = loader.stacked_epoch()
        if max_steps_per_epoch is not None:
            xs = {k: v[:max_steps_per_epoch] for k, v in xs.items()}
        n_steps = xs["idx"].shape[0]
        n_valid = int(xs["row_valid"].sum())
        if mesh is not None:
            from ..parallel import shard_stacked
            xs = shard_stacked(mesh, xs)
        return cache, xs, n_steps, n_valid, ep_idx

    n_epochs = max_epochs if max_epochs is not None else config.TRAIN.EPOCH
    best_state, best_dirty = state, False
    # early-stop bookkeeping (0-based epoch of the last val best; a
    # resume restarts the patience window from the resumed epoch)
    last_best_epoch = start_epoch - 1
    ckpt = make_checkpoint_writer(async_checkpoint)
    ev_stacked_saved = None
    history = {"train_loss": [], "val_loss": [], "train_acc": [],
               "val_acc": [], "train_imgs_per_sec": []}
    meter = ThroughputMeter(window=max(50, 2 * (log_every or 1)))
    global_step = start_epoch * steps_per_epoch
    tracer = StepTracer(trace_dir, logger)

    def _epoch_slice(xs):
        if max_steps_per_epoch is not None:
            xs = {k: v[:max_steps_per_epoch] for k, v in xs.items()}
        return xs

    def _run_segments():
        """Segment path (see loop_cdr._run_segments): each span between
        checkpoint boundaries is one dispatch; best val-PCK state is
        selected on device (steps.make_segment_2d)."""
        nonlocal state, best_state, best_dirty, best_acc, global_step, \
            last_best_epoch
        vcache, vxs, _ = valid_loader.stacked_epoch()
        vxs = _epoch_slice(vxs)
        if mesh is not None:
            from ..parallel import shard_stacked
            vxs = shard_stacked(mesh, vxs)
        best_acc_dev = jnp.asarray(best_acc, jnp.float32)
        # fixed segment length: pad ragged segments with cond-skipped
        # epochs so one compiled graph serves every dispatch (see
        # loop_cdr._run_segments)
        seg_len = max(1, min(segment_epochs or checkpoint_every,
                             checkpoint_every))
        E_full = min(seg_len, n_epochs) or 1
        epoch = start_epoch
        while epoch < n_epochs:
            # segments tile the seg_len grid; saves stay on the
            # checkpoint_every grid (see loop_cdr._run_segments)
            boundary = min((epoch // seg_len + 1) * seg_len,
                           (epoch // checkpoint_every + 1)
                           * checkpoint_every, n_epochs)
            E = boundary - epoch
            t0 = time.time()
            meter.reset()
            meter.start()
            xs_list = []
            for _ in range(E):
                tcache, xs, _ = train_loader.stacked_epoch()
                xs_list.append(_epoch_slice(xs))
            seq, epoch_valid, n_imgs = _stack_segment(xs_list, E_full)
            S = seq["idx"].shape[1]
            if mesh is not None:
                from ..parallel import shard_stacked
                seq = shard_stacked(mesh, seq, lead=2)
            state, best_state, best_acc_dev, ms = segment_fn(
                state, best_state, best_acc_dev, tcache.frames,
                vcache.frames, seq, vxs, jnp.asarray(epoch_valid))
            msh = jax.device_get(ms)     # the segment's one true sync
            meter.step(n_imgs)
            global_step += E * S
            seg_ips = meter.samples_per_sec
            dt = (time.time() - t0) / E
            for j in range(E):
                tl = float(msh["train"]["loss"][j]) / max(S, 1)
                ta = float(msh["train"]["acc"][j]) / max(S, 1)
                nv = max(float(msh["eval"]["n"][j]), 1.0)
                vl = float(msh["eval"]["loss_sum"][j]) / nv
                va = float(msh["val_acc"][j])
                history["train_loss"].append(tl)
                history["val_loss"].append(vl)
                history["train_acc"].append(ta)
                history["val_acc"].append(va)
                history["train_imgs_per_sec"].append(seg_ips)
                logger.info("epoch %d/%d  train loss %.5f acc %.4f "
                            "(%.1f imgs/s) | val loss %.5f acc %.4f  "
                            "(%.1fs)", epoch + j + 1, n_epochs, tl, ta,
                            seg_ips, vl, va, dt)
                if bool(msh["improved"][j]):
                    logger.info("New best (val acc %.4f)", va)
                    last_best_epoch = epoch + j
            new_best = float(jax.device_get(best_acc_dev))
            if new_best > best_acc:
                best_acc = new_best
                best_dirty = True
            epoch = boundary
            stop = (early_stop_patience is not None
                    and (epoch - 1) - last_best_epoch
                    >= early_stop_patience)
            # save only on the checkpoint grid (or at the end/stop)
            if not stop and epoch % checkpoint_every != 0 \
                    and epoch != n_epochs:
                continue
            if best_dirty:
                ckpt.save(os.path.join(model_path, "best"),
                          _state_tree(best_state, best_acc))
                best_dirty = False
                logger.info("Saved best (val acc %.4f)", best_acc)
            ckpt.save(os.path.join(model_path, "latest"),
                      _state_tree(state, best_acc))
            if stop:
                logger.info(
                    "Early stop at epoch %d: no val improvement for %d "
                    "epochs (best acc %.4f at epoch %d)", epoch,
                    (epoch - 1) - last_best_epoch, best_acc,
                    last_best_epoch + 1)
                break

    try:
        with interruptible():   # SIGTERM -> KeyboardInterrupt
            epochs_iter = (range(0) if segment_fn is not None
                           else range(start_epoch, n_epochs))
            if segment_fn is not None:
                _run_segments()
            for epoch in epochs_iter:
                t0 = time.time()
                meter.reset()
                meter.start()
                stacked = _try_stacked(train_loader)
                if stacked is not None:
                    # scan-epoch: the whole epoch is one dispatch
                    cache, xs, n, pending, _ = stacked
                    state, ms = train_epoch_fn(state, cache.frames, xs)
                    tr = jax.device_get(ms)
                    global_step += n
                    meter.step(pending)
                else:
                    acc_tree, n, pending = None, 0, 0
                    for i, batch in enumerate(train_loader):
                        if max_steps_per_epoch is not None and \
                                i >= max_steps_per_epoch:
                            break
                        state, m = train_step(state, batch)
                        acc_tree = (m if acc_tree is None
                                    else _tree_add(acc_tree, m))
                        n += 1
                        global_step += 1
                        pending += batch["image"].shape[0]
                        tracer.maybe(i, m)
                        if log_every and (i + 1) % log_every == 0:
                            mm = jax.device_get(m)  # the only mid-epoch sync
                            # record throughput only across true sync
                            # points: per-step host timing measures
                            # dispatch, not compute, here (CLAUDE.md)
                            meter.step(pending)
                            pending = 0
                            logger.info(
                                "  step %d/%d loss %.5f acc %.4f "
                                "|grad| %.2f lr %.2e  %.1f imgs/s",
                                i + 1, steps_per_epoch,
                                float(mm["loss"]), float(mm["acc"]),
                                float(mm["grad_norm"]),
                                float(schedule(global_step)),
                                meter.samples_per_sec)
                    tracer.finish(m if n else None)
                    tr = (jax.device_get(acc_tree) if acc_tree is not None
                          else {"loss": 0.0, "acc": 0.0})
                    if pending:     # the device_get above was a real sync
                        meter.step(pending)
                tl, ta = float(tr["loss"]) / max(n, 1), float(tr["acc"]) / max(n, 1)
                train_ips = meter.samples_per_sec

                # eval metadata is epoch-invariant: stack + upload once
                if ev_stacked_saved is None:
                    ev_stacked_saved = _try_stacked(valid_loader)
                ev_stacked = ev_stacked_saved
                if ev_stacked is not None:
                    vcache, vxs, _, _, _ = ev_stacked
                    ev = jax.device_get(
                        eval_epoch_fn(state, vcache.frames, vxs))
                    vl = float(ev["loss_sum"]) / max(float(ev["n"]), 1.0)
                    va = float(pck_from_counts(ev["hits"], ev["cnt"])[0])
                else:
                    ev_acc = None
                    for i, batch in enumerate(valid_loader):
                        if max_steps_per_epoch is not None and \
                                i >= max_steps_per_epoch:
                            break
                        m = eval_step(state, batch)
                        part = {"loss_sum": m["loss_sum"],
                                "hits": m["hits"],
                                "cnt": m["cnt"], "n": m["n"]}
                        ev_acc = (part if ev_acc is None
                                  else _tree_add(ev_acc, part))
                    if ev_acc is not None:
                        ev = jax.device_get(ev_acc)
                        vl = float(ev["loss_sum"]) / max(float(ev["n"]),
                                                         1.0)
                        va = float(pck_from_counts(ev["hits"],
                                                   ev["cnt"])[0])
                    else:
                        vl, va = 0.0, 0.0

                history["train_loss"].append(tl)
                history["val_loss"].append(vl)
                history["train_acc"].append(ta)
                history["val_acc"].append(va)
                history["train_imgs_per_sec"].append(train_ips)
                logger.info("epoch %d/%d  train loss %.5f acc %.4f (%.1f imgs/s) | "
                            "val loss %.5f acc %.4f  (%.1fs)",
                            epoch + 1, n_epochs, tl, ta, train_ips, vl, va,
                            time.time() - t0)

                if va > best_acc:
                    # best state held on device (zero-copy reference),
                    # written at checkpoint boundaries — each fetch of a
                    # 101-depth state is ~540 MB off-device
                    best_acc = va
                    best_state, best_dirty = state, True
                    last_best_epoch = epoch
                    logger.info("New best (val acc %.4f)", va)
                stop = (early_stop_patience is not None
                        and epoch - last_best_epoch
                        >= early_stop_patience)
                if (epoch + 1) % checkpoint_every == 0 or \
                        epoch + 1 == n_epochs or stop:
                    if best_dirty:
                        ckpt.save(os.path.join(model_path, "best"),
                                  _state_tree(best_state, best_acc))
                        best_dirty = False
                        logger.info("Saved best (val acc %.4f)", best_acc)
                    ckpt.save(
                        os.path.join(model_path, "latest"),
                        _state_tree(state, best_acc))
                if stop:
                    logger.info(
                        "Early stop at epoch %d: no val improvement "
                        "for %d epochs (best acc %.4f at epoch %d)",
                        epoch + 1, epoch - last_best_epoch, best_acc,
                        last_best_epoch + 1)
                    break

    except KeyboardInterrupt:
        logger.warning("Interrupted — saving latest checkpoint "
                       "before exit (resume with --resume)")
        if best_dirty:
            ckpt.save(os.path.join(model_path, "best"),
                      _state_tree(best_state, best_acc))
        ckpt.save(os.path.join(model_path, "latest"),
                  _state_tree(state, best_acc))
        ckpt.wait()     # the process is about to exit — flush
        raise
    ckpt.wait()         # drain background saves; re-raise worker errors

    if plot_dir:
        from ..utils import plot_loss
        plot_loss(history["train_loss"], plot_dir, "Training Loss")
        plot_loss(history["val_loss"], plot_dir, "Validation Loss")
        plot_loss(history["train_acc"], plot_dir, "Training Accuracy")
        plot_loss(history["val_acc"], plot_dir, "Validation Accuracy")
    logger.info("Training is done!")
    return history
