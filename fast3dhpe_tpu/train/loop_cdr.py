"""CDRNet stereo fine-tune loop (MADS_3d). [ref: train_cdr.py:17-237]

Reference semantics preserved: 2D-only warmup for TRAIN.WARMUP epochs,
then loss = LOSS_3D_WEIGHT * crit(0.1 * 3D) + sum of 2D losses, grad-norm
clipping at 100 post-warmup, best checkpoint on val 3D MPJPE only after
warmup. The warmup switch is a traced boolean (no recompile at the
boundary).

Loop mechanics (deliberate upgrades over the reference):
  - metrics accumulate ON DEVICE; the host fetches once per epoch (and per
    --log_every window) — no per-step float() syncs;
  - padded final batches are masked out of gradients/metrics (row_valid);
    val MPJPE is per-FRAME-exact, invariant to TEST.BATCH_SIZE;
  - the best val metric is persisted in the checkpoint so --resume does
    not overwrite a better historical best.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import CDRNet, make_loss
from ..data import load_data
from .state import TrainState, make_optimizer, multistep_lr
from .steps import (make_train_step_cdr, make_eval_step_cdr,
                    make_train_epoch_cdr, make_eval_epoch_cdr,
                    make_segment_cdr)
from .checkpoint import (load_variables, make_checkpoint_writer,
                         merge_encoder_only)
from .loop2d import (_prepare_model_dir, _state_tree, _tree_add,
                     _restore_state, _stack_segment)
from ..utils.logging import setup_logger
from ..utils.profiling import StepTracer, ThroughputMeter
from ..utils.interrupt import interruptible

SCALE_3D = 0.1      # [ref: train_cdr.py:74]
BASE_JOINT = 1      # [ref: train_cdr.py:73]


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
    """Train CDRNet; returns history (losses + val MPJPE per epoch).

    async_checkpoint: fetch+write checkpoints on a background thread
    (see loop2d.run / checkpoint.AsyncCheckpointWriter) so the ~540 MB
    CDR-101 state fetch overlaps training instead of stalling it.

    compute_dtype: "float32" or "bfloat16" (params/BN stats stay fp32).
    resume: continue from weights/<NAME>/latest (true resume incl.
    optimizer state + step + best metric; warmup accounting follows the
    restored epoch).
    log_every: if set, log per-step loss/grad-norm/lr + live pairs/s every
    N steps (reference parity: the pbar [ref: train_cdr.py:129-141]).
    trace_dir: if set, capture a jax.profiler device trace of a few
    early steady-state steps there (view with xprof/tensorboard).
    scan_epochs: run each epoch as ONE lax.scan dispatch when the
    device frame cache holds the dataset (steps.make_train_epoch_cdr) —
    removes all per-batch host work. Default (None): auto-enable when
    the cache engages and no per-step hooks (log_every/trace_dir) are
    requested; False forces the per-batch loop.
    segments: whether scan-epoch execution may further batch a whole
    inter-checkpoint span (checkpoint_every epochs of train+eval+best-
    select) into ONE dispatch. Default (None): auto — enabled whenever
    both loaders fully cache. False keeps scan-EPOCH dispatches (one
    per epoch) without the segment graph: the CDR-101 segment compile
    is large enough to crash some backends (this relay's TPU worker,
    r4 — see CLAUDE.md) where the plain epoch graph still compiles.
    segment_epochs: epochs per segment GRAPH (default: checkpoint_every,
    clamped to it). Segment graph size and checkpoint cadence are
    different concerns: the dispatch-amortization win saturates after a
    handful of epochs per dispatch, while saves should stay rare (each
    CDR-101 save fetches ~540 MB). A smaller segment graph also
    compiles where the full-span one cannot — the E=25 CDR-101 segment
    crashes this relay's TPU worker (CLAUDE.md, r4) while small-E
    segments of the same model compile fine. Checkpoints still happen
    only at checkpoint_every boundaries.
    early_stop_patience: if set, stop once the post-warmup val 3D MPJPE
    has not improved for this many epochs — "train until the floor" runs
    without committing the whole schedule's wall clock up front. On the
    segment path the check runs at segment granularity (a few epochs of
    overshoot). The LR schedule still follows config.TRAIN.EPOCH.
    checkpoint_every: save the rolling "latest" checkpoint every N
    epochs (and always on the final epoch / interrupt). Saving CDR-101
    state fetches ~540 MB from device; on a slow link per-epoch saves
    can dominate the wall clock. The BEST state is held on device
    (immutable arrays — a zero-copy reference) when it improves and
    written out at the same checkpoint_every boundaries / at the end,
    so frequent early-training improvements don't each pay a fetch.
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

    model = CDRNet.from_config(config, dtype=jnp.dtype(compute_dtype))
    H, W = config.MODEL.IMAGE_SIZE[1], config.MODEL.IMAGE_SIZE[0]
    dummy_imgs = jnp.zeros((1, 2, H, W, 3), jnp.float32)
    dummy_proj = jnp.broadcast_to(
        jnp.asarray([[600.0, 0, 128, 0], [0, 600.0, 128, 0],
                     [0, 0, 1, 3000.0]], jnp.float32), (1, 2, 3, 4))
    variables = model.init(jax.random.PRNGKey(seed), dummy_imgs, dummy_proj,
                           train=False)
    if config.MODEL.PRETRAINED:
        # the reference's staged recipe: 2D backbone pretrain ->
        # encoder-only transfer -> CDR fine-tune [ref: train_cdr.py:46-49,
        # models/cdrnet.py:103-118]. PRETRAINED may be a reference torch
        # .pth OR a native orbax dir saved by the 2D loop.
        logger.info("Loading pretrained encoder from %s",
                    config.MODEL.PRETRAINED)
        pretrained = load_variables(config.MODEL.PRETRAINED)
        variables = merge_encoder_only(variables, pretrained)

    steps_per_epoch = len(train_loader)
    tx = make_optimizer(config, steps_per_epoch)
    schedule = multistep_lr(config.TRAIN.LR, config.TRAIN.LR_STEP,
                            config.TRAIN.LR_FACTOR, steps_per_epoch)
    state = TrainState.create(variables, tx)

    start_epoch = 0
    best_err = float("inf")
    if resume:
        state, start_step, best = _restore_state(model_path, state, logger)
        start_epoch = start_step // max(steps_per_epoch, 1)
        if best is not None and best > 0:
            best_err = best

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

    # scan-epoch path: whole epoch as one dispatch when the dataset's
    # frames are resident in HBM (auto; see docstring)
    scan_allowed = (scan_epochs is not False and log_every is None
                    and trace_dir is None)
    if scan_epochs and not scan_allowed:
        logger.info("scan_epochs=True ignored: log_every/trace_dir need "
                    "the per-batch loop")
    train_epoch_fn = eval_epoch_fn = segment_fn = None
    if scan_allowed and (scan_epochs
                         or config.DATASET.DEVICE_CACHE_BYTES):
        image_size = tuple(config.MODEL.IMAGE_SIZE)
        train_epoch_fn = make_train_epoch_cdr(
            model, loss_fn, image_size,
            occlusion=config.DATASET.OCCLUSION, loss_3d_weight=w3d,
            scale_3d=SCALE_3D, base_joint=BASE_JOINT, num_joints=nj)
        eval_epoch_fn = make_eval_epoch_cdr(
            model, loss_fn, image_size, loss_3d_weight=w3d,
            scale_3d=SCALE_3D, base_joint=BASE_JOINT, num_joints=nj)
        # segment path: when BOTH loaders cache, run the whole
        # inter-checkpoint span (checkpoint_every epochs, train + eval
        # each, best selected on device) as ONE dispatch — divides the
        # fixed per-epoch relay RPC cost by the segment length
        # (steps.make_segment_cdr). Logs/history appear per segment.
        tcache_probe = train_loader.ensure_device_cache()
        vcache_probe = valid_loader.ensure_device_cache()
        if (segments is not False
                and tcache_probe is not None and not tcache_probe.partial
                and vcache_probe is not None
                and not vcache_probe.partial):
            segment_fn = make_segment_cdr(
                model, loss_fn, image_size,
                occlusion=config.DATASET.OCCLUSION,
                warmup=config.TRAIN.WARMUP, seed=seed,
                loss_3d_weight=w3d, scale_3d=SCALE_3D,
                base_joint=BASE_JOINT, num_joints=nj)

    def _try_stacked(loader):
        """(cache, xs, n_steps, n_valid_pairs, epoch_idx) when the cache
        engages FULLY, else None (fall back to the per-batch loop — which
        still exploits a partial cache through its upload lane)."""
        if train_epoch_fn is None:
            return None
        probe = loader.ensure_device_cache()
        if probe is None or probe.partial:
            return None
        cache, xs, ep_idx = loader.stacked_epoch()
        if max_steps_per_epoch is not None:
            xs = {k: v[:max_steps_per_epoch] for k, v in xs.items()}
        n_steps = xs["idx_l"].shape[0]
        n_valid = int(xs["row_valid"].sum())
        if mesh is not None:
            from ..parallel import shard_stacked
            xs = shard_stacked(mesh, xs)
        return cache, xs, n_steps, n_valid, ep_idx

    n_epochs = max_epochs if max_epochs is not None else config.TRAIN.EPOCH
    warmup = config.TRAIN.WARMUP
    best_state, best_dirty = state, False
    # early-stop bookkeeping (0-based epoch of the last val-best; a
    # resume restarts the patience window from the resumed epoch)
    last_best_epoch = max(start_epoch - 1, warmup)
    ckpt = make_checkpoint_writer(async_checkpoint)
    ev_stacked_saved = None
    history = {"train_loss": [], "val_loss": [], "val_mpjpe_3d": [],
               "val_mpjpe_2d": [], "grad_norm": [],
               "train_pairs_per_sec": []}
    meter = ThroughputMeter(window=max(50, 2 * (log_every or 1)))
    global_step = start_epoch * steps_per_epoch
    tracer = StepTracer(trace_dir, logger)

    def _epoch_slice(xs):
        if max_steps_per_epoch is not None:
            xs = {k: v[:max_steps_per_epoch] for k, v in xs.items()}
        return xs

    def _run_segments():
        """Segment path: each span between checkpoint boundaries is one
        dispatch (steps.make_segment_cdr). The host stacks E epochs of
        metadata, dispatches, fetches one (E, ...) metric tree, then
        logs/saves. On interrupt mid-segment, up to E-1 epochs of work
        re-runs after --resume (the saved state is the last boundary)."""
        nonlocal state, best_state, best_dirty, best_err, global_step, \
            last_best_epoch
        vcache, vxs, _ = valid_loader.stacked_epoch()
        vxs = _epoch_slice(vxs)
        if mesh is not None:
            from ..parallel import shard_stacked
            vxs = shard_stacked(mesh, vxs)
        best_err_dev = jnp.asarray(best_err, jnp.float32)
        # every dispatch uses the SAME segment length E_full: ragged
        # final / resume-offset segments are padded with repeated (and
        # cond-skipped) epochs so one compiled graph serves the whole
        # run — a second length would recompile the largest program in
        # the codebase (minutes on the dev relay)
        seg_len = max(1, min(segment_epochs or checkpoint_every,
                             checkpoint_every))
        E_full = min(seg_len, n_epochs) or 1
        epoch = start_epoch
        while epoch < n_epochs:
            # never cross a checkpoint boundary: segments tile the
            # seg_len grid, saves happen on the checkpoint_every grid
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
            seq, epoch_valid, n_pairs = _stack_segment(xs_list, E_full)
            S = seq["idx_l"].shape[1]
            if mesh is not None:
                from ..parallel import shard_stacked
                seq = shard_stacked(mesh, seq, lead=2)
            state, best_state, best_err_dev, ms = segment_fn(
                state, best_state, best_err_dev, tcache.frames,
                vcache.frames, seq, vxs, jnp.asarray(epoch),
                jnp.asarray(epoch_valid))
            msh = jax.device_get(ms)     # the segment's one true sync
            meter.step(n_pairs)
            global_step += E * S
            seg_pps = meter.samples_per_sec
            dt = (time.time() - t0) / E
            for j in range(E):
                tl = float(msh["train"]["loss"][j]) / max(S, 1)
                gn = float(msh["train"]["grad_norm"][j]) / max(S, 1)
                nv = max(float(msh["eval"]["n"][j]), 1.0)
                vl = float(msh["eval"]["loss_sum"][j]) / nv
                e2 = float(msh["eval"]["e2_sum"][j]) / nv
                e3 = float(msh["eval"]["e3_sum"][j]) / nv
                history["train_loss"].append(tl)
                history["val_loss"].append(vl)
                history["val_mpjpe_2d"].append(e2)
                history["val_mpjpe_3d"].append(e3)
                history["grad_norm"].append(gn)
                history["train_pairs_per_sec"].append(seg_pps)
                logger.info(
                    "epoch %d/%d%s  train loss %.5f |grad| %.2f "
                    "(%.1f pairs/s) | val loss %.5f MPJPE2D %.2fpx "
                    "MPJPE3D %.2fmm  (%.1fs)",
                    epoch + j + 1, n_epochs,
                    " [warmup]" if epoch + j < warmup else "",
                    tl, gn, seg_pps, vl, e2, e3, dt)
                if bool(msh["improved"][j]):
                    logger.info("New best (val 3D MPJPE %.2fmm)", e3)
                    last_best_epoch = epoch + j
            new_best = float(jax.device_get(best_err_dev))
            if new_best < best_err:
                best_err = new_best
                best_dirty = True
            epoch = boundary
            stop = (early_stop_patience is not None
                    and epoch - 1 > warmup
                    and (epoch - 1) - last_best_epoch
                    >= early_stop_patience)
            # save only on the checkpoint grid (or at the end/stop):
            # with segment_epochs < checkpoint_every several segments
            # share one save
            if not stop and epoch % checkpoint_every != 0 \
                    and epoch != n_epochs:
                continue
            if best_dirty:
                ckpt.save(os.path.join(model_path, "best"),
                          _state_tree(best_state, best_err))
                best_dirty = False
                logger.info("Saved best (val 3D MPJPE %.2fmm)", best_err)
            ckpt.save(
                os.path.join(model_path, "latest"),
                _state_tree(state, best_err
                            if best_err != float("inf") else 0.0))
            if stop:
                logger.info(
                    "Early stop at epoch %d: no val improvement for %d "
                    "epochs (best %.2f mm at epoch %d)", epoch,
                    (epoch - 1) - last_best_epoch, best_err,
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
                use_3d = jnp.asarray(epoch >= warmup)

                meter.reset()
                meter.start()
                stacked = _try_stacked(train_loader)
                if stacked is not None:
                    # scan-epoch: the whole epoch is one dispatch
                    cache, xs, n, pending, ep_idx = stacked
                    epoch_key = jax.random.PRNGKey(seed * 10007 + ep_idx)
                    state, ms = train_epoch_fn(state, cache.frames, xs,
                                               epoch_key, use_3d)
                    tr = jax.device_get(ms)
                    global_step += n
                    meter.step(pending)
                else:
                    acc_tree, n, pending = None, 0, 0
                    for i, batch in enumerate(train_loader):
                        if max_steps_per_epoch is not None and \
                                i >= max_steps_per_epoch:
                            break
                        state, m = train_step(state, batch, use_3d)
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
                            # dispatch, not compute, on this platform
                            # (CLAUDE.md)
                            meter.step(pending)
                            pending = 0
                            logger.info(
                                "  step %d/%d loss %.5f (2d %.5f 3d %.5f) "
                                "|grad| %.2f lr %.2e  %.1f pairs/s",
                                i + 1, steps_per_epoch,
                                float(mm["loss"]), float(mm["loss_2d"]),
                                float(mm["loss_3d"]),
                                float(mm["grad_norm"]),
                                float(schedule(global_step)),
                                meter.samples_per_sec)
                    tracer.finish(m if n else None)
                    tr = (jax.device_get(acc_tree) if acc_tree is not None
                          else {"loss": 0.0, "grad_norm": 0.0})
                    if pending:     # the device_get above was a real sync
                        meter.step(pending)
                tl = float(tr["loss"]) / max(n, 1)
                gn = float(tr["grad_norm"]) / max(n, 1)
                train_pps = meter.samples_per_sec

                # eval metadata is epoch-invariant (no augmentation):
                # stack + upload it once, not once per epoch
                if ev_stacked_saved is None:
                    ev_stacked_saved = _try_stacked(valid_loader)
                ev_stacked = ev_stacked_saved
                if ev_stacked is not None:
                    vcache, vxs, _, _, _ = ev_stacked
                    ev = jax.device_get(
                        eval_epoch_fn(state, vcache.frames, vxs, use_3d))
                    nv = max(float(ev["n"]), 1.0)
                    vl = float(ev["loss_sum"]) / nv
                    e2 = float(ev["e2_sum"]) / nv
                    e3 = float(ev["e3_sum"]) / nv
                else:
                    ev_acc = None
                    for i, batch in enumerate(valid_loader):
                        if max_steps_per_epoch is not None and \
                                i >= max_steps_per_epoch:
                            break
                        m = eval_step(state, batch, use_3d)
                        part = {"loss_sum": m["loss_sum"],
                                "e2_sum": m["e2_sum"],
                                "e3_sum": m["e3_sum"], "n": m["n"]}
                        ev_acc = (part if ev_acc is None
                                  else _tree_add(ev_acc, part))
                    if ev_acc is not None:
                        ev = jax.device_get(ev_acc)
                        nv = max(float(ev["n"]), 1.0)
                        vl = float(ev["loss_sum"]) / nv
                        e2 = float(ev["e2_sum"]) / nv
                        e3 = float(ev["e3_sum"]) / nv
                    else:
                        vl, e2, e3 = 0.0, 0.0, 0.0

                history["train_loss"].append(tl)
                history["val_loss"].append(vl)
                history["val_mpjpe_2d"].append(e2)
                history["val_mpjpe_3d"].append(e3)
                history["grad_norm"].append(gn)
                history["train_pairs_per_sec"].append(train_pps)
                logger.info("epoch %d/%d%s  train loss %.5f |grad| %.2f "
                            "(%.1f pairs/s) | val loss %.5f MPJPE2D %.2fpx "
                            "MPJPE3D %.2fmm  (%.1fs)",
                            epoch + 1, n_epochs,
                            " [warmup]" if epoch < warmup else "",
                            tl, gn, train_pps, vl, e2, e3, time.time() - t0)

                # best only post-warmup [ref: train_cdr.py:223-228];
                # held on device, written at checkpoint boundaries
                if e3 < best_err and epoch > warmup:
                    best_err = e3
                    best_state, best_dirty = state, True
                    last_best_epoch = epoch
                    logger.info("New best (val 3D MPJPE %.2fmm)", e3)
                stop = (early_stop_patience is not None
                        and epoch > warmup
                        and epoch - last_best_epoch
                        >= early_stop_patience)
                if (epoch + 1) % checkpoint_every == 0 or \
                        epoch + 1 == n_epochs or stop:
                    if best_dirty:
                        ckpt.save(os.path.join(model_path, "best"),
                                  _state_tree(best_state, best_err))
                        best_dirty = False
                        logger.info("Saved best (val 3D MPJPE %.2fmm)",
                                    best_err)
                    ckpt.save(
                        os.path.join(model_path, "latest"),
                        _state_tree(state, best_err if best_err != float(
                            "inf") else 0.0))
                if stop:
                    logger.info(
                        "Early stop at epoch %d: no val improvement for "
                        "%d epochs (best %.2f mm at epoch %d)", epoch + 1,
                        epoch - last_best_epoch, best_err,
                        last_best_epoch + 1)
                    break

    except KeyboardInterrupt:
        logger.warning("Interrupted — saving latest checkpoint "
                       "before exit (resume with --resume)")
        if best_dirty:
            ckpt.save(os.path.join(model_path, "best"),
                      _state_tree(best_state, best_err))
        ckpt.save(os.path.join(model_path, "latest"),
                  _state_tree(state, best_err if best_err
                              != float("inf") else 0.0))
        ckpt.wait()     # the process is about to exit — flush
        raise
    ckpt.wait()         # drain background saves; re-raise worker errors

    if plot_dir:
        from ..utils import plot_loss
        plot_loss(history["train_loss"], plot_dir, "Training Loss")
        plot_loss(history["val_loss"], plot_dir, "Validation Loss")
        plot_loss(history["val_mpjpe_3d"], plot_dir, "MPJPE")
    logger.info("Training is done!")
    return history
