"""Shared movement-evaluation machinery for the inference + baseline apps.

Both apps evaluate a movement the same way [ref: inference.py:138-149,
baseline.py:103-134]: stream batches, run a one-dispatch per-batch eval
(crop + forward + GT projection + per-sample MPJPE), and accumulate the
masked sums ON DEVICE so the loop carries no per-batch host syncs. The
only difference between the apps is the model inside `predict_eval`
(CDRNet stereo forward vs PoseResNet + hard-argmax + DLT), so the
gather-from-HBM wrapper, the masked accumulator, and the streaming loop
live here once.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def make_cached_eval(predict_eval):
    """Wrap a per-batch `predict_eval(variables, img_l, img_r, trans,
    proj, pose_3d, vis) -> (e2, e3)` so the frames come from a
    device-resident cache (stream.build_device_cache): gather the batch
    by index, then the identical eval path. `frames` stays an ARGUMENT —
    closing over it would bake it into the graph and blow a relay link's
    compile-request size limit."""

    @jax.jit
    def _predict_eval_cached(variables, frames, idx_l, idx_r, trans,
                             proj, pose_3d, vis):
        img_l = jnp.take(frames, jnp.asarray(idx_l, jnp.int32), axis=0)
        img_r = jnp.take(frames, jnp.asarray(idx_r, jnp.int32), axis=0)
        return predict_eval(variables, img_l, img_r, trans, proj,
                            pose_3d, vis)

    return _predict_eval_cached


@jax.jit
def accum_eval(tot2, tot3, n, e2, e3, k):
    """Masked device-side accumulation: padded rows (>= n_valid) never
    count, and the loop stays free of per-batch host syncs — one fetch
    at the end of the movement."""
    m = (jnp.arange(e2.shape[0]) < k).astype(e2.dtype)
    return (tot2 + jnp.sum(e2 * m), tot3 + jnp.sum(e3 * m),
            n + jnp.asarray(k, jnp.float32))


def evaluate_stream(variables, predict_eval, predict_eval_cached,
                    stream, batch_size: int,
                    device_cache_bytes: int = 0) -> Tuple[float, float]:
    """Per-batch streaming evaluation: sequence-average MPJPE2D (px) /
    MPJPE3D (mm), averaged per frame exactly like the reference loops.
    Batches may carry device-cached frame indices (partial or full HBM
    cache), raw frames + trans (device crop), or host-cropped frames."""
    tot2 = tot3 = n = jnp.zeros((), jnp.float32)
    identity = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    for batch in stream.batches(batch_size,
                                device_warp=True,
                                device_cache_bytes=device_cache_bytes):
        pose_3d = batch["pose_3d"]
        vis = np.logical_and.reduce(
            ~np.isnan(pose_3d), axis=2).astype(np.float32)
        pose_3d = np.nan_to_num(pose_3d).astype(np.float32)
        if "frames" in batch:
            e2, e3 = predict_eval_cached(
                variables, batch["frames"], batch["idx_l"],
                batch["idx_r"], jnp.asarray(batch["trans"]),
                jnp.asarray(batch["proj"]), jnp.asarray(pose_3d),
                jnp.asarray(vis))
        else:
            # host-warp fallback batches carry no trans: frames are
            # already cropped, so the device crop is the identity
            trans = batch.get("trans")
            if trans is None:
                trans = np.broadcast_to(identity,
                                        (pose_3d.shape[0], 2, 3))
            e2, e3 = predict_eval(
                variables, jnp.asarray(batch["img_l"]),
                jnp.asarray(batch["img_r"]), jnp.asarray(trans),
                jnp.asarray(batch["proj"]), jnp.asarray(pose_3d),
                jnp.asarray(vis))
        tot2, tot3, n = accum_eval(tot2, tot3, n, e2, e3,
                                   batch["n_valid"])
    tot2, tot3, n = jax.device_get((tot2, tot3, n))
    return float(tot2) / max(float(n), 1.0), \
        float(tot3) / max(float(n), 1.0)
