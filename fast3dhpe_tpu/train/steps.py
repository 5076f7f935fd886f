"""Compiled train/eval step functions for the 2D backbone and CDRNet.

Each factory closes over the model + loss and returns jit-compiled steps.
Under a mesh, the loaders place batches with `parallel.shard_batch`
(batch axis sharded) and the state replicated; XLA's sharding propagation
turns the gradient reduction into a psum over ICI — no explicit
collectives needed.

The per-step metric computation stays on device (the reference syncs to
host numpy every step [ref: train.py:99-100]); only scalars leave, and
only when the loop actually fetches them (the loops accumulate metric
trees on device and fetch once per epoch / per --log_every window).

Padded final batches: the loaders emit `batch["row_valid"]` — a (B,) 0/1
mask, batch-sharded like the data. Steps mask padded rows out of the loss
(gradients never see duplicated samples) and out of every metric, the
loss mean is renormalized to valid rows, and train-mode BatchNorm batch
statistics are restricted to valid rows (the mask threads into every BN
via `row_valid=` on the model call; models.layers.bn_row_mask) — fully
matching the reference's smaller final torch batch. Because the mask is
sharded, sum(mask) is the GLOBAL valid count under a mesh — correct on
multi-host too, and under pjit the masked BN reduction is global.
"""

from __future__ import annotations


from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.metrics import pck_counts, pck_from_counts, per_sample_mpjpe
from .state import TrainState, clip_grads_by_norm, global_grad_norm


def _row_mask(batch):
    """(B,) 0/1 validity mask, or None when the batch carries none."""
    return batch.get("row_valid")


def _masked_count(mask, batch_size):
    if mask is None:
        return jnp.asarray(batch_size, jnp.float32)
    return jnp.sum(jnp.asarray(mask, jnp.float32))


def make_train_step_2d(model, loss_fn) -> Callable:
    """Train step for PoseResNet heatmap regression. [ref: train.py:84-107]

    batch: {"image": (B, H, W, 3), "target": (B, h, w, J),
            "target_weight": (B, J), optional "row_valid": (B,)}
    """

    @jax.jit
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        mask = _row_mask(batch)

        def loss_of(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], train=True, row_valid=mask,
                mutable=["batch_stats"])
            loss = loss_fn(out, batch["target"], batch["target_weight"],
                           sample_mask=mask)
            return loss, (out, mutated["batch_stats"])

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
        hits, cnt, _ = pck_counts(out, batch["target"], row_mask=mask)
        acc, _ = pck_from_counts(hits, cnt)
        metrics = {"loss": loss, "acc": acc,
                   "grad_norm": global_grad_norm(grads)}
        return new_state, metrics

    return train_step


def make_eval_step_2d(model, loss_fn) -> Callable:
    """Eval step: batch-mean loss/acc plus accumulatable sums.

    "loss_sum"/"hits"/"cnt"/"n" sum over an epoch into per-SAMPLE-exact
    statistics (invariant to TEST.BATCH_SIZE, padding excluded) — the
    reference's per-batch averaging is kept only in the scalar "loss"/"acc"
    convenience outputs."""

    @jax.jit
    def eval_step(state: TrainState, batch) -> Dict:
        mask = _row_mask(batch)
        out = model.apply(state.variables, batch["image"], train=False)
        loss = loss_fn(out, batch["target"], batch["target_weight"],
                       sample_mask=mask)
        hits, cnt, _ = pck_counts(out, batch["target"], row_mask=mask)
        acc, _ = pck_from_counts(hits, cnt)
        n = _masked_count(mask, batch["image"].shape[0])
        return {"loss": loss, "acc": acc,
                "loss_sum": loss * n, "hits": hits, "cnt": cnt, "n": n}

    return eval_step


def make_train_epoch_2d(model, loss_fn, image_size, heatmap_size,
                        sigma: int = 3) -> Callable:
    """Whole-epoch 2D training as one jitted lax.scan dispatch (see
    make_train_epoch_cdr for the rationale); batches gather from the
    device-resident frame cache and flip on device.

    epoch(state, frames, xs) -> (state, summed_metrics); xs from
    Mono2DLoader.stacked_epoch.
    """
    from ..data.device_pipeline import preprocess_mono_batch_cached
    step = make_train_step_2d(model, loss_fn)
    image_size = tuple(image_size)
    heatmap_size = tuple(heatmap_size)

    @jax.jit
    def epoch(state: TrainState, frames, xs):
        def body(st, x):
            batch = preprocess_mono_batch_cached(
                frames, x["idx"], x["flip"], x["trans"], x["joints"],
                x["vis"], image_size=image_size,
                heatmap_size=heatmap_size, sigma=sigma)
            batch["row_valid"] = x["row_valid"]
            return step(st, batch)

        state, ms = jax.lax.scan(body, state, xs)
        return state, jax.tree_util.tree_map(
            lambda v: jnp.sum(v, axis=0), ms)

    return epoch


def make_eval_epoch_2d(model, loss_fn, image_size, heatmap_size,
                       sigma: int = 3) -> Callable:
    """Whole-epoch 2D evaluation as one dispatch; returns the summed
    accumulatable stats (loss_sum/hits/cnt/n)."""
    from ..data.device_pipeline import preprocess_mono_batch_cached
    step = make_eval_step_2d(model, loss_fn)
    image_size = tuple(image_size)
    heatmap_size = tuple(heatmap_size)

    @jax.jit
    def epoch(state: TrainState, frames, xs):
        def body(carry, x):
            batch = preprocess_mono_batch_cached(
                frames, x["idx"], x["flip"], x["trans"], x["joints"],
                x["vis"], image_size=image_size,
                heatmap_size=heatmap_size, sigma=sigma)
            batch["row_valid"] = x["row_valid"]
            m = step(state, batch)
            part = {"loss_sum": m["loss_sum"], "hits": m["hits"],
                    "cnt": m["cnt"], "n": m["n"]}
            return carry, part

        _, ms = jax.lax.scan(body, 0, xs)
        return jax.tree_util.tree_map(lambda v: jnp.sum(v, axis=0), ms)

    return epoch


def _cdr_loss(model, loss_fn, params, batch_stats, batch, use_3d,
              loss_3d_weight, scale_3d, base_joint, num_joints, train):
    """Shared CDR loss: 2D-only during warmup, 4*3D + 2D after.
    [ref: train_cdr.py:105-125]

    During TRAINING, root-relative alignment subtracts the base joint from
    every OTHER joint; the base joint itself keeps absolute coordinates
    (exactly the reference's masked in-place subtraction
    [ref: train_cdr.py:107-110]). The reference's EVAL loop skips the
    alignment entirely and computes loss + MPJPE on absolute coordinates
    [ref: train_cdr.py:180-201] — that inconsistency is preserved for
    parity. `use_3d` is a traced boolean so the warmup->3D switch does not
    recompile.
    """
    variables = {"params": params, "batch_stats": batch_stats}
    mask = _row_mask(batch)
    if train:
        (pred_2d, pred_3d), mutated = model.apply(
            variables, batch["image"], batch["proj"], train=True,
            row_valid=mask, mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        pred_2d, pred_3d = model.apply(
            variables, batch["image"], batch["proj"], train=False)
        new_stats = batch_stats

    target_3d = batch["target_3d"]
    w = batch["target_weight"]

    if train:
        not_base = (jnp.arange(num_joints) != base_joint)[None, :, None]
        pred_3d_rel = jnp.where(
            not_base, pred_3d - pred_3d[:, base_joint:base_joint + 1],
            pred_3d)
        target_3d_rel = jnp.where(
            not_base, target_3d - target_3d[:, base_joint:base_joint + 1],
            target_3d)
    else:
        pred_3d_rel, target_3d_rel = pred_3d, target_3d

    loss_2d = (loss_fn(pred_2d[:, 0], batch["target_2d"][:, 0], w,
                       sample_mask=mask)
               + loss_fn(pred_2d[:, 1], batch["target_2d"][:, 1], w,
                         sample_mask=mask))
    # Bound the 3D loss inputs at +-1e6 mm (1 km — never binding for real
    # poses): an untrained/degenerate stereo prediction triangulates to
    # astronomically large coordinates whose DLT gradients would overflow;
    # clip keeps the warmup's zero-weighted 3D branch numerically inert
    # without altering the trained regime.
    pred_3d_loss = jnp.clip(pred_3d_rel, -1e6, 1e6)
    loss_3d = loss_fn(pred_3d_loss * scale_3d, target_3d_rel * scale_3d, w,
                      sample_mask=mask)

    use_3d = jnp.asarray(use_3d)
    loss = loss_2d + jnp.where(use_3d, loss_3d_weight * loss_3d, 0.0)
    aux = {"pred_2d": pred_2d, "pred_3d": pred_3d,
           "pred_3d_rel": pred_3d_rel, "target_3d_rel": target_3d_rel,
           "new_stats": new_stats, "loss_2d": loss_2d, "loss_3d": loss_3d}
    return loss, aux


def make_train_step_cdr(model, loss_fn, loss_3d_weight: float = 4.0,
                        scale_3d: float = 0.1, base_joint: int = 1,
                        num_joints: int = 19,
                        clip_norm: float = 100.0) -> Callable:
    """CDR train step. [ref: train_cdr.py:86-135]

    batch: {"image": (B, V, H, W, 3), "proj": (B, V, 3, 4),
            "target_3d": (B, J, 3), "target_2d": (B, V, J, 2),
            "target_weight": (B, J), optional "row_valid": (B,)}
    use_3d: traced bool — False during warmup epochs.
    """

    @jax.jit
    def train_step(state: TrainState, batch, use_3d):
        def loss_of(params):
            return _cdr_loss(model, loss_fn, params, state.batch_stats,
                             batch, use_3d, loss_3d_weight, scale_3d,
                             base_joint, num_joints, train=True)

        (loss, aux), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        # clip only post-warmup [ref: train_cdr.py:132-133]
        grads, grad_norm = clip_grads_by_norm(grads, clip_norm, use_3d)
        new_state = state.apply_gradients(
            grads, new_batch_stats=aux["new_stats"])
        metrics = {"loss": loss, "loss_2d": aux["loss_2d"],
                   "loss_3d": aux["loss_3d"], "grad_norm": grad_norm}
        return new_state, metrics

    return train_step


def make_train_epoch_cdr(model, loss_fn, image_size, occlusion=None,
                         **step_kwargs) -> Callable:
    """Whole-epoch CDR training as ONE jitted dispatch (scan-epoch path).

    With the dataset's frames resident in device HBM
    (data/device_cache.py) and an epoch's per-batch metadata stacked
    host-side (Stereo3DLoader.stacked_epoch), the entire epoch —
    on-device batch gather + preprocessing + S train steps — runs under
    a single lax.scan. Per-epoch host cost collapses to one upload of a
    few small arrays + one dispatch + one metric fetch; on the dev
    relay, the per-batch dispatch/upload RPCs otherwise capped the loop
    5x under the compiled step rate (docs/PERFORMANCE.md round 3).

    Per-step occlusion PRNG keys derive as fold_in(epoch_key, step).

    epoch(state, frames, xs, epoch_key, use_3d) -> (state, summed_metrics)
      xs: dict of (S, B, ...) arrays from stacked_epoch;
      summed_metrics: per-step metric tree summed over the scan (divide
      by S for means, matching the per-step loop's accumulation).
    """
    from ..data.device_pipeline import preprocess_stereo_batch_cached
    step = make_train_step_cdr(model, loss_fn, **step_kwargs)
    image_size = tuple(image_size)

    @jax.jit
    def epoch(state: TrainState, frames, xs, epoch_key, use_3d):
        S = xs["idx_l"].shape[0]

        def body(carry, x):
            st, i = carry
            key = jax.random.fold_in(epoch_key, i)
            batch = preprocess_stereo_batch_cached(
                key, frames, x["idx_l"], x["idx_r"], x["trans"],
                x["P_l"], x["P_r"], x["pose_3d"], x["joints_vis"],
                image_size=image_size, occlusion=occlusion, train=True)
            batch["row_valid"] = x["row_valid"]
            st, m = step(st, batch, use_3d)
            return (st, i + 1), m

        (state, _), ms = jax.lax.scan(body, (state, jnp.asarray(0)), xs,
                                      length=S)
        return state, jax.tree_util.tree_map(
            lambda v: jnp.sum(v, axis=0), ms)

    return epoch


def make_eval_epoch_cdr(model, loss_fn, image_size,
                        **step_kwargs) -> Callable:
    """Whole-epoch CDR evaluation as one dispatch (see
    make_train_epoch_cdr). Returns the accumulatable sums
    (loss_sum/e2_sum/e3_sum/n) summed over the scan — per-FRAME-exact
    epoch metrics with padding excluded."""
    from ..data.device_pipeline import preprocess_stereo_batch_cached
    step = make_eval_step_cdr(model, loss_fn, **step_kwargs)
    image_size = tuple(image_size)

    @jax.jit
    def epoch(state: TrainState, frames, xs, use_3d):
        dummy_key = jax.random.PRNGKey(0)    # eval: no occlusion draws

        def body(carry, x):
            batch = preprocess_stereo_batch_cached(
                dummy_key, frames, x["idx_l"], x["idx_r"], x["trans"],
                x["P_l"], x["P_r"], x["pose_3d"], x["joints_vis"],
                image_size=image_size, occlusion=None, train=False)
            batch["row_valid"] = x["row_valid"]
            m = step(state, batch, use_3d)
            part = {"loss_sum": m["loss_sum"], "e2_sum": m["e2_sum"],
                    "e3_sum": m["e3_sum"], "n": m["n"]}
            return carry, part

        _, ms = jax.lax.scan(body, 0, xs)
        return jax.tree_util.tree_map(lambda v: jnp.sum(v, axis=0), ms)

    return epoch


def make_segment_cdr(model, loss_fn, image_size, occlusion=None,
                     warmup: int = 0, seed: int = 0,
                     loss_3d_weight: float = 4.0, scale_3d: float = 0.1,
                     base_joint: int = 1, num_joints: int = 19,
                     clip_norm: float = 100.0) -> Callable:
    """A SEGMENT of E epochs — each a full train scan + eval scan — as
    ONE jitted dispatch, with best-state selection done ON DEVICE.

    Motivation (docs/PERFORMANCE.md round 3): with the scan-epoch path,
    each epoch still pays a fixed ~1.4 s of relay RPCs (stacked-metadata
    uploads + 2 dispatches + 2 metric fetches) against ~0.5 s of compute
    at 256-frame epochs. Batching the E epochs between checkpoint
    boundaries into one dispatch divides that fixed cost by E; the best
    val state is tracked inside the graph (per-epoch masked select over
    the TrainState — ~0.2 ms of HBM traffic per epoch) so no state ever
    leaves the device except at checkpoint boundaries.

    segment(state, best_state, best_err, t_frames, v_frames, xs_seq,
            vxs, epoch0, epoch_valid) -> (state, best_state, best_err, ms)
      xs_seq: dict of (E, S, B, ...) train metadata (E stacked
        Stereo3DLoader.stacked_epoch results — same RandomState sequence
        as E sequential epochs);
      vxs: (S', B, ...) eval metadata (epoch-invariant: no augmentation);
      epoch0: int32 scalar, global index of the segment's first epoch
        (drives the warmup switch + the per-epoch occlusion PRNG key,
        PRNGKey(seed*10007 + ep) — identical to the scan-epoch path);
      epoch_valid: (E,) bool — False rows are PADDING epochs that leave
        state/best untouched and cost (almost) nothing: the loops pad
        every segment to a fixed E = checkpoint_every so ragged final /
        resume-offset segments reuse the one compiled graph instead of
        recompiling the largest program in the codebase (minutes on the
        dev relay) for each distinct length. A lax.cond skips the
        epoch's scans entirely on padding rows;
      best_state/best_err: running best (pass the current state and +inf
        initially; per reference semantics best only updates when
        epoch > warmup [ref: train_cdr.py:223-228]);
      ms: per-epoch stacked metrics {"train": sums over S,
        "eval": {loss_sum, e2_sum, e3_sum, n}, "improved": (E,) bool}
        (zeros on padding rows — hosts must only read the valid prefix).
    """
    from ..data.device_pipeline import preprocess_stereo_batch_cached
    step = make_train_step_cdr(model, loss_fn,
                               loss_3d_weight=loss_3d_weight,
                               scale_3d=scale_3d, base_joint=base_joint,
                               num_joints=num_joints, clip_norm=clip_norm)
    estep = make_eval_step_cdr(model, loss_fn,
                               loss_3d_weight=loss_3d_weight,
                               scale_3d=scale_3d, base_joint=base_joint,
                               num_joints=num_joints)
    image_size = tuple(image_size)

    @jax.jit
    def segment(state: TrainState, best_state: TrainState, best_err,
                t_frames, v_frames, xs_seq, vxs, epoch0, epoch_valid):
        def epoch_body(carry, inp):
            exs, valid = inp
            st, ep, best_st, berr = carry
            use_3d = ep >= warmup
            epoch_key = jax.random.PRNGKey(seed * 10007 + ep)

            def run_epoch(op):
                st, best_st, berr = op

                def tbody(c, x):
                    s, i = c
                    key = jax.random.fold_in(epoch_key, i)
                    batch = preprocess_stereo_batch_cached(
                        key, t_frames, x["idx_l"], x["idx_r"], x["trans"],
                        x["P_l"], x["P_r"], x["pose_3d"], x["joints_vis"],
                        image_size=image_size, occlusion=occlusion,
                        train=True)
                    batch["row_valid"] = x["row_valid"]
                    s, m = step(s, batch, use_3d)
                    return (s, i + 1), m

                (st, _), tms = jax.lax.scan(tbody, (st, jnp.asarray(0)),
                                            exs)
                tsum = jax.tree_util.tree_map(
                    lambda v: jnp.sum(v, axis=0), tms)

                def ebody(c, x):
                    batch = preprocess_stereo_batch_cached(
                        epoch_key, v_frames, x["idx_l"], x["idx_r"],
                        x["trans"], x["P_l"], x["P_r"], x["pose_3d"],
                        x["joints_vis"], image_size=image_size,
                        occlusion=None, train=False)
                    batch["row_valid"] = x["row_valid"]
                    m = estep(st, batch, use_3d)
                    return c, {"loss_sum": m["loss_sum"],
                               "e2_sum": m["e2_sum"],
                               "e3_sum": m["e3_sum"], "n": m["n"]}

                _, ems = jax.lax.scan(ebody, 0, vxs)
                esum = jax.tree_util.tree_map(
                    lambda v: jnp.sum(v, axis=0), ems)
                e3 = esum["e3_sum"] / jnp.maximum(esum["n"], 1.0)
                improved = (e3 < berr) & (ep > warmup)
                best_st = jax.tree_util.tree_map(
                    lambda b, c: jnp.where(improved, c, b), best_st, st)
                berr = jnp.where(improved, e3, berr)
                ms = {"train": tsum, "eval": esum, "improved": improved}
                return (st, best_st, berr), ms

            # padding epochs (ragged final segment / resume offset): skip
            # the scans via cond so the fixed-E graph is reused at ~zero
            # compute; metric structure derived by abstract eval so the
            # skip branch tracks any future metric additions
            zeros_ms = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                jax.eval_shape(run_epoch, (st, best_st, berr))[1])
            (st, best_st, berr), ms = jax.lax.cond(
                valid, run_epoch, lambda op: (op, zeros_ms),
                (st, best_st, berr))
            return (st, ep + 1, best_st, berr), ms

        (state, _, best_state, best_err), ms = jax.lax.scan(
            epoch_body, (state, epoch0, best_state, best_err),
            (xs_seq, epoch_valid))
        return state, best_state, best_err, ms

    return segment


def make_segment_2d(model, loss_fn, image_size, heatmap_size,
                    sigma: int = 3) -> Callable:
    """2D counterpart of make_segment_cdr: E epochs (train scan + eval
    scan each) as one dispatch; best selected on device by val PCK
    (maximize, no warmup gate [ref: train.py:150-155]).

    segment(state, best_state, best_acc, t_frames, v_frames, xs_seq,
            vxs, epoch_valid) -> (state, best_state, best_acc, ms)
      epoch_valid: (E,) bool — padding rows (see make_segment_cdr) are
      skipped via cond and report zero metrics / improved=False.
      ms per-epoch: {"train": sums, "eval": {loss_sum, hits, cnt, n},
      "val_acc": (E,), "improved": (E,) bool}.
    """
    from ..data.device_pipeline import preprocess_mono_batch_cached
    step = make_train_step_2d(model, loss_fn)
    estep = make_eval_step_2d(model, loss_fn)
    image_size = tuple(image_size)
    heatmap_size = tuple(heatmap_size)

    @jax.jit
    def segment(state: TrainState, best_state: TrainState, best_acc,
                t_frames, v_frames, xs_seq, vxs, epoch_valid):
        def epoch_body(carry, inp):
            exs, valid = inp
            st, best_st, bacc = carry

            def run_epoch(op):
                st, best_st, bacc = op

                def tbody(s, x):
                    batch = preprocess_mono_batch_cached(
                        t_frames, x["idx"], x["flip"], x["trans"],
                        x["joints"], x["vis"], image_size=image_size,
                        heatmap_size=heatmap_size, sigma=sigma)
                    batch["row_valid"] = x["row_valid"]
                    return step(s, batch)

                st, tms = jax.lax.scan(tbody, st, exs)
                tsum = jax.tree_util.tree_map(
                    lambda v: jnp.sum(v, axis=0), tms)

                def ebody(c, x):
                    batch = preprocess_mono_batch_cached(
                        v_frames, x["idx"], x["flip"], x["trans"],
                        x["joints"], x["vis"], image_size=image_size,
                        heatmap_size=heatmap_size, sigma=sigma)
                    batch["row_valid"] = x["row_valid"]
                    m = estep(st, batch)
                    return c, {"loss_sum": m["loss_sum"],
                               "hits": m["hits"],
                               "cnt": m["cnt"], "n": m["n"]}

                _, ems = jax.lax.scan(ebody, 0, vxs)
                esum = jax.tree_util.tree_map(
                    lambda v: jnp.sum(v, axis=0), ems)
                va, _ = pck_from_counts(esum["hits"], esum["cnt"])
                improved = va > bacc
                best_st = jax.tree_util.tree_map(
                    lambda b, c: jnp.where(improved, c, b), best_st, st)
                bacc = jnp.where(improved, va, bacc)
                ms = {"train": tsum, "eval": esum, "val_acc": va,
                      "improved": improved}
                return (st, best_st, bacc), ms

            # padding rows skip both scans (see make_segment_cdr)
            zeros_ms = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                jax.eval_shape(run_epoch, (st, best_st, bacc))[1])
            (st, best_st, bacc), ms = jax.lax.cond(
                valid, run_epoch, lambda op: (op, zeros_ms),
                (st, best_st, bacc))
            return (st, best_st, bacc), ms

        (state, best_state, best_acc), ms = jax.lax.scan(
            epoch_body, (state, best_state, best_acc),
            (xs_seq, epoch_valid))
        return state, best_state, best_acc, ms

    return segment


def make_eval_step_cdr(model, loss_fn, loss_3d_weight: float = 4.0,
                       scale_3d: float = 0.1, base_joint: int = 1,
                       num_joints: int = 19) -> Callable:
    """CDR eval step: loss + on-device 2D/3D MPJPE.
    [ref: train_cdr.py:153-203]

    Besides the batch-mean "loss"/"mpjpe_2d"/"mpjpe_3d", returns
    "loss_sum"/"e2_sum"/"e3_sum"/"n" — masked per-sample sums that
    accumulate into per-FRAME-exact epoch metrics (the reference's
    per-batch averaging biased the model-selection MPJPE on the padded
    final batch)."""

    @jax.jit
    def eval_step(state: TrainState, batch, use_3d):
        mask = _row_mask(batch)
        loss, aux = _cdr_loss(model, loss_fn, state.params,
                              state.batch_stats, batch, use_3d,
                              loss_3d_weight, scale_3d, base_joint,
                              num_joints, train=False)
        e2_s, e3_s = per_sample_mpjpe(
            aux["pred_2d"], aux["pred_3d"], batch["target_3d"],
            batch["target_2d"][:, 0], batch["target_2d"][:, 1],
            batch["target_weight"])
        if mask is not None:
            m = jnp.asarray(mask, jnp.float32)
            e2_s, e3_s = e2_s * m, e3_s * m
        n = _masked_count(mask, e2_s.shape[0])
        e2_sum, e3_sum = jnp.sum(e2_s), jnp.sum(e3_s)
        denom = jnp.maximum(n, 1.0)
        return {"loss": loss, "mpjpe_2d": e2_sum / denom,
                "mpjpe_3d": e3_sum / denom,
                "loss_sum": loss * n, "e2_sum": e2_sum, "e3_sum": e3_sum,
                "n": n}

    return eval_step
