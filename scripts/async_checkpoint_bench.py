"""Measure what AsyncCheckpointWriter buys at flagship scale.

A CDR-101 checkpoint ({params, batch_stats, opt_state, step}) is
~540 MB; an inline save stalls the training loop for the whole
device->host fetch + orbax write (docs/PERFORMANCE.md "Closing the
loop-vs-step gap": ~30 s through this relay's ~23 MB/s link). The async
writer fetches on a background thread, so the transfer overlaps the
next span's compute.

Protocol: BOUNDARIES x (chain STEPS train steps, then save "latest"),
final drain, one scalar fetch — the exact rolling-checkpoint shape of
the loops. Variants: sync (inline save_checkpoint) vs async
(AsyncCheckpointWriter). The async variant's saves go to DISTINCT paths
so per-path coalescing cannot silently skip work and the comparison
stays save-count-equal.

Run AFTER any other TPU job finishes (never two clients on this relay).
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from fast3dhpe_tpu.models import CDRNet, make_loss
from fast3dhpe_tpu.train.state import TrainState
from fast3dhpe_tpu.train.steps import make_train_step_cdr
from fast3dhpe_tpu.train.checkpoint import (AsyncCheckpointWriter,
                                            save_checkpoint)

B = 64
STEPS = int(os.environ.get("ACB_STEPS", "130"))       # ~15 s compute/span
BOUNDARIES = int(os.environ.get("ACB_BOUNDARIES", "3"))


def _stereo_projs(batch):
    K = np.array([[1100.0, 0.0, 128.0],
                  [0.0, 1100.0, 128.0],
                  [0.0, 0.0, 1.0]])
    Ps = []
    for dx in (-400.0, 400.0):
        R = np.eye(3)
        T = np.array([[dx], [0.0], [3000.0]])
        Ps.append((K @ np.hstack([R, T])).astype(np.float32))
    return np.broadcast_to(np.stack(Ps), (batch, 2, 3, 4)).astype(np.float32)


def state_tree(state):
    return {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}


def main():
    from fast3dhpe_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    rng = np.random.RandomState(0)
    model = CDRNet(num_joints=19, num_layers=101, dtype=jnp.bfloat16)
    batch = {
        "image": jnp.asarray(rng.randn(B, 2, 256, 256, 3), jnp.float32),
        "proj": jnp.asarray(_stereo_projs(B)),
        "target_3d": jnp.asarray(rng.randn(B, 19, 3) * 200, jnp.float32),
        "target_2d": jnp.asarray(rng.uniform(0, 256, (B, 2, 19, 2)),
                                 jnp.float32),
        "target_weight": jnp.ones((B, 19), jnp.float32),
    }
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["image"], batch["proj"], train=False)
    step_fn = make_train_step_cdr(model, make_loss("JointsMSESmooth", True))
    state = TrainState.create(variables, optax.adam(1e-4))
    use_3d = jnp.asarray(True)

    # warm/compile + measure the bare save cost once
    state, out = step_fn(state, batch, use_3d)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(
        state_tree(state)))
    print(f"checkpoint size: {nbytes/1e6:.0f} MB", flush=True)
    tmp = tempfile.mkdtemp(prefix="acb_")
    t0 = time.perf_counter()
    host = jax.device_get(state_tree(state))
    t_fetch = time.perf_counter() - t0
    save_checkpoint(os.path.join(tmp, "warm"), host)
    t_save = time.perf_counter() - t0 - t_fetch
    print(f"one save: fetch {t_fetch:.1f}s + write {t_save:.1f}s",
          flush=True)

    def run(variant):
        nonlocal state
        writer = AsyncCheckpointWriter() if variant == "async" else None
        t0 = time.perf_counter()
        for b in range(BOUNDARIES):
            for _ in range(STEPS):
                state, out = step_fn(state, batch, use_3d)
            path = os.path.join(tmp, f"{variant}_{b}")
            if writer is not None:
                writer.save(path, state_tree(state))
            else:
                save_checkpoint(
                    os.path.join(tmp, variant),
                    jax.device_get(state_tree(state)))
        if writer is not None:
            writer.close()
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        dt = time.perf_counter() - t0
        print(f"{variant:5s}: {dt:6.1f}s total "
              f"({dt/BOUNDARIES:5.1f}s per {STEPS}-step boundary, "
              f"{BOUNDARIES*STEPS*B/dt:6.1f} pairs/s)", flush=True)
        return dt

    dt_sync = run("sync")
    dt_async = run("async")
    print(f"async/sync wall: {dt_async/dt_sync:.2f}x "
          f"(saves hidden: {(dt_sync-dt_async)/BOUNDARIES:.1f}s each)",
          flush=True)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
