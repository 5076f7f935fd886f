"""Localize CDRNet-101 train-step time (fwd vs bwd vs optimizer vs BN).

Inference runs at 61% MFU; the train step (fwd+bwd+Adam+BN stats) at
~39%. This script measures, on the real chip, where the difference
lives, and whether buffer donation helps. Variants (batch 64 = the
training batch chosen by the round-2 sweep):

  fwd_eval      eval-mode forward (the inference envelope, ~25 ms)
  fwd_train     train-mode forward (adds BN batch-stat passes)
  grads         value_and_grad, no optimizer update
  full          the production train step (make_train_step_cdr)
  full_donated  same, with the state buffers donated to XLA
  full_remat    same, with per-block encoder rematerialization
                (CDRNet(remat=True)) — the bandwidth lever for a step
                running at ~97% of the HBM roofline
  full_remat_convs  selective remat (remat_policy="convs"): conv
                outputs saved, only BN/ReLU chains recomputed in
                backward — the r5 structural byte-reduction attempt
                (full recompute measured +19% bytes in r3)

Timing uses host-chained steps (state carried through the loop) with a
single scalar fetch at the end — the same pattern as bench.py --train,
so numbers are directly comparable with docs/PERFORMANCE.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from fast3dhpe_tpu.models import CDRNet, make_loss
from fast3dhpe_tpu.train.state import TrainState
from fast3dhpe_tpu.train.steps import make_train_step_cdr, _cdr_loss

B = 64
ITERS = 10


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


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated variant subset to run (e.g. "
                         "'full,full_remat_convs') — each variant is a "
                         "multi-minute remote compile on this relay, so "
                         "target the comparison you need")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

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
    loss_fn = make_loss("JointsMSESmooth", True)

    def timed(name, fn, make_state, chain_state):
        """fn(state, batch) -> (state, scalar-bearing tree).

        A fresh state per run so donated variants never reuse a
        consumed buffer (donation invalidates the input state)."""
        assert chain_state
        s, out = fn(make_state(), batch)                # compile + warm
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        s = make_state()
        t0 = time.perf_counter()
        for _ in range(ITERS):
            s, out = fn(s, batch)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:14s} {dt*1e3:8.1f} ms/step  {B/dt:7.1f} pairs/s",
              flush=True)
        return dt

    # --- forward only, eval vs train mode ---
    @jax.jit
    def fwd_eval(state, batch):
        kp, p3 = model.apply(state.variables, batch["image"], batch["proj"],
                             train=False)
        return state, {"s": jnp.sum(p3) + jnp.sum(kp)}

    @jax.jit
    def fwd_train(state, batch):
        (kp, p3), mut = model.apply(
            state.variables, batch["image"], batch["proj"], train=True,
            mutable=["batch_stats"])
        state = state.replace(batch_stats=mut["batch_stats"])
        return state, {"s": jnp.sum(p3) + jnp.sum(kp)}

    # --- grads, no update ---
    @jax.jit
    def grads_only(state, batch):
        def loss_of(params):
            return _cdr_loss(model, loss_fn, params, state.batch_stats,
                             batch, True, 4.0, 0.1, 1, 19, train=True)
        (loss, aux), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        # consume EVERY grad leaf, or XLA dead-code-eliminates most of
        # the backward pass and the variant measures nothing
        gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        return state.replace(batch_stats=aux["new_stats"]), \
            {"s": loss + gsum}

    full = make_train_step_cdr(model, loss_fn)

    def full_step(state, batch):
        return full(state, batch, jnp.asarray(True))

    inner = full.__wrapped__ if hasattr(full, "__wrapped__") else None

    state = TrainState.create(variables, optax.adam(1e-4))
    reuse = lambda: state                    # noqa: E731

    def fresh():
        # deep-copy: donated runs must not delete buffers shared with
        # `variables` / the other variants' state
        copied = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                        variables)
        return TrainState.create(copied, optax.adam(1e-4))
    if want("fwd_eval"):
        timed("fwd_eval", fwd_eval, reuse, True)
    if want("fwd_train"):
        timed("fwd_train", fwd_train, reuse, True)
    if want("grads"):
        timed("grads", grads_only, reuse, True)
    dt_full = timed("full", full_step, reuse, True) if want("full") else None

    if inner is not None and want("full_donated"):
        donated = jax.jit(inner, donate_argnums=(0,))

        def donated_step(state, batch):
            return donated(state, batch, jnp.asarray(True))

        # donation consumes each input state; start from fresh ones
        timed("full_donated", donated_step, fresh, True)

    # --- per-block encoder remat (bandwidth lever) ---
    dt_remat = full_r = None
    if want("full_remat"):
        model_r = CDRNet(num_joints=19, num_layers=101,
                         dtype=jnp.bfloat16, remat=True)
        full_r = make_train_step_cdr(model_r, loss_fn)

        def remat_step(state, batch):
            return full_r(state, batch, jnp.asarray(True))

        dt_remat = timed("full_remat", remat_step, reuse, True)

    # --- selective remat: save conv outputs, recompute BN/ReLU only ---
    dt_rc = full_rc = None
    if want("full_remat_convs"):
        model_rc = CDRNet(num_joints=19, num_layers=101,
                          dtype=jnp.bfloat16, remat=True,
                          remat_policy="convs")
        full_rc = make_train_step_cdr(model_rc, loss_fn)

        def remat_convs_step(state, batch):
            return full_rc(state, batch, jnp.asarray(True))

        dt_rc = timed("full_remat_convs", remat_convs_step, reuse, True)

    def report_cost(name, fn, dt):
        try:
            lowered = jax.jit(fn).lower(state, batch, jnp.asarray(True))
            cost = lowered.compile().cost_analysis()
            if cost:
                c = cost[0] if isinstance(cost, (list, tuple)) else cost
                fl = c.get("flops", float("nan"))
                by = c.get("bytes accessed", float("nan"))
                print(f"cost_analysis[{name}]: {fl/1e12:.2f} TFLOP, "
                      f"{by/1e9:.2f} GB accessed "
                      f"-> {fl/1e12/dt:.0f} TFLOP/s, "
                      f"{by/1e9/dt:.0f} GB/s")
        except Exception as e:
            print(f"cost_analysis[{name}] unavailable:", e)

    if dt_full is not None:
        report_cost("full", inner or (lambda s, b, u: full(s, b, u)),
                    dt_full)
    if dt_remat is not None:
        inner_r = (full_r.__wrapped__
                   if hasattr(full_r, "__wrapped__") else None)
        report_cost("full_remat",
                    inner_r or (lambda s, b, u: full_r(s, b, u)), dt_remat)
    if dt_rc is not None:
        inner_rc = (full_rc.__wrapped__
                    if hasattr(full_rc, "__wrapped__") else None)
        report_cost("full_remat_convs",
                    inner_rc or (lambda s, b, u: full_rc(s, b, u)), dt_rc)


if __name__ == "__main__":
    main()
