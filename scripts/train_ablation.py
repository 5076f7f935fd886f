"""Where does CDRNet train-step time go beyond the forward?

fwd(b32) = 14.5 ms but train step = 63 ms (4.4x) — canonical conv nets
sit near 3x. Suspects: the Jacobi-SVD DLT backward (unrolled rotation
sweeps), BN train-mode stat reductions, the geometry path's VJP.

Variants at batch 32 (state-chained host timing, final fetch syncs):
  full        — the real step (jacobi DLT)
  sii         — dlt_method="sii" (solve-based VJP)
  stopgrad3d  — stop_gradient on pred_3d (kills DLT/pinv/soft-argmax bwd)
  warmup      — use_3d=False (same graph, both branches still computed)
  posenet     — PoseResNet train step at 128 images (conv-only yardstick)
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

import sys
sys.path.insert(0, "/root/repo")

from fast3dhpe_tpu.models import CDRNet, PoseResNet, make_loss
from fast3dhpe_tpu.train.state import TrainState
from fast3dhpe_tpu.train.steps import make_train_step_cdr, make_train_step_2d


def _stereo_projs(batch):
    K = np.array([[1100.0, 0.0, 128.0], [0.0, 1100.0, 128.0],
                  [0.0, 0.0, 1.0]])
    Ps = []
    for dx in (-400.0, 400.0):
        Ps.append((K @ np.hstack([np.eye(3),
                                  np.array([[dx], [0.0], [3000.0]])]))
                  .astype(np.float32))
    return np.broadcast_to(np.stack(Ps), (batch, 2, 3, 4)).astype(np.float32)


def time_step(step, state, batch, use_3d=None, iters=10):
    if use_3d is None:
        state, m = step(state, batch)
    else:
        state, m = step(state, batch, use_3d)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        if use_3d is None:
            state, m = step(state, batch)
        else:
            state, m = step(state, batch, use_3d)
    _ = float(m["loss"])
    return (time.perf_counter() - t0) / iters


def main():
    print(f"# devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    B = 32
    batch = {
        "image": jnp.asarray(rng.randn(B, 2, 256, 256, 3), jnp.float32),
        "proj": jnp.asarray(_stereo_projs(B)),
        "target_3d": jnp.asarray(rng.randn(B, 19, 3) * 200, jnp.float32),
        "target_2d": jnp.asarray(rng.uniform(0, 256, (B, 2, 19, 2)),
                                 jnp.float32),
        "target_weight": jnp.ones((B, 19), jnp.float32),
    }
    loss_fn = make_loss("JointsMSESmooth", True)

    def cdr_state(model):
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), batch["image"], batch["proj"],
            train=False)
        return TrainState.create(variables, optax.adam(1e-4))

    m_jac = CDRNet(num_joints=19, num_layers=101, dtype=jnp.bfloat16)
    st = cdr_state(m_jac)
    step = make_train_step_cdr(m_jac, loss_fn)
    t = time_step(step, st, batch, jnp.asarray(True))
    print(f"full (jacobi): {t*1e3:.1f} ms/step  {B/t:.0f} pairs/s")

    t = time_step(step, st, batch, jnp.asarray(False))
    print(f"warmup (use_3d=False, same graph): {t*1e3:.1f} ms/step")

    m_sii = CDRNet(num_joints=19, num_layers=101, dtype=jnp.bfloat16,
                   dlt_method="sii")
    step = make_train_step_cdr(m_sii, loss_fn)
    t = time_step(step, st, batch, jnp.asarray(True))
    print(f"sii DLT: {t*1e3:.1f} ms/step  {B/t:.0f} pairs/s")

    # stopgrad3d: wrap the model so pred_3d is detached
    class StopGrad3D(CDRNet):
        def __call__(self, imgs, projs, train=False, **kw):
            kp, p3d = CDRNet.__call__(self, imgs, projs, train=train)
            return kp, jax.lax.stop_gradient(p3d)

    m_sg = StopGrad3D(num_joints=19, num_layers=101, dtype=jnp.bfloat16)
    step = make_train_step_cdr(m_sg, loss_fn)
    t = time_step(step, st, batch, jnp.asarray(True))
    print(f"stop_gradient(pred_3d): {t*1e3:.1f} ms/step")

    # conv-only yardstick: PoseResNet at the same conv workload
    from fast3dhpe_tpu.ops import render_gaussian_heatmaps
    imgs = rng.randn(2 * B, 256, 256, 3).astype(np.float32)
    joints = rng.uniform(10, 246, size=(2 * B, 19, 2)).astype(np.float32)
    vis = np.ones((2 * B, 19), np.float32)
    tgt, w = render_gaussian_heatmaps(joints, vis, (64, 64), (256, 256), 3)
    pbatch = {"image": jnp.asarray(imgs), "target": tgt, "target_weight": w}
    pm = PoseResNet(num_joints=19, num_layers=101, dtype=jnp.bfloat16)
    pv = jax.jit(pm.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), pbatch["image"][:1], train=False)
    pst = TrainState.create(pv, optax.adam(1e-4))
    pstep = make_train_step_2d(pm, make_loss("JointsMSE", True,
                                             layout="NHWC"))
    t = time_step(pstep, pst, pbatch)
    print(f"PoseResNet-101 train, {2*B} imgs: {t*1e3:.1f} ms/step "
          f"({2*B/t:.0f} imgs/s)")


if __name__ == "__main__":
    main()
