"""Benchmark: CDRNet-101 stereo inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "stereo_pairs_per_sec", "value": N, "unit": "pairs/s",
   "vs_baseline": N / 1.128}

Baseline 1.128 pairs/s = the reference torch-CPU CDRNet-101 forward at
256x256, batch 1 (best CPU batch size), minted on this host — see
BASELINE.md. The reference publishes no numbers of its own.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_PAIRS_PER_SEC = 1.128


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


def bench_cdrnet(batch_sizes=(16, 32, 64), iters=20,
                 dtype=jnp.bfloat16, verbose=True):
    """Steady-state throughput with the iteration loop INSIDE jit.

    The axon-tunneled TPU has ~20ms per-dispatch RPC latency and its
    block_until_ready does not wait for device completion, so host-side
    per-call timing is meaningless. Instead `iters` forward passes run
    under one lax.scan with a serializing data dependency (the input is
    perturbed by a term derived from the previous output, numerically
    negligible but impossible to hoist), and completion is forced by
    fetching a scalar reduced from the final carry.
    """
    from fast3dhpe_tpu.models import CDRNet

    model = CDRNet(num_joints=19, num_layers=101, dtype=dtype)
    rng = np.random.RandomState(0)

    best = 0.0
    best_b = None
    results = {}
    for B in batch_sizes:
        imgs = jnp.asarray(rng.randn(B, 2, 256, 256, 3), jnp.float32)
        projs = jnp.asarray(_stereo_projs(B))
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), imgs, projs, train=False)

        def run_n(variables, imgs, projs):
            def body(carry, _):
                x = carry
                kp, p3d = model.apply(variables, x, projs, train=False)
                # serializing dependency; ~1e-9 relative perturbation
                x = x + jnp.mean(kp) * 1e-9
                return x, jnp.sum(p3d)
            x, sums = jax.lax.scan(body, imgs, None, length=iters)
            return jnp.sum(sums)

        g = jax.jit(run_n)
        # first call compiles (remote compile is slow) + warms up
        float(g(variables, imgs, projs))

        t0 = time.perf_counter()
        s = float(g(variables, imgs, projs))
        dt = (time.perf_counter() - t0) / iters
        assert np.isfinite(s)
        pps = B / dt
        results[B] = pps
        if verbose:
            print(f"# batch {B}: {pps:.1f} pairs/s ({dt*1e3:.2f} ms/step)")
        if pps > best:
            best, best_b = pps, B
    return best, best_b, results


def bench_training(B=16, iters=10, dtype=jnp.bfloat16):
    """Secondary metric: full CDR train step (fwd+bwd+Adam+BN) pairs/s."""
    import optax
    from fast3dhpe_tpu.models import CDRNet, make_loss
    from fast3dhpe_tpu.train.state import TrainState
    from fast3dhpe_tpu.train.steps import make_train_step_cdr

    rng = np.random.RandomState(0)
    model = CDRNet(num_joints=19, num_layers=101, dtype=dtype)
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
    state = TrainState.create(variables, optax.adam(1e-4))
    step = make_train_step_cdr(model, make_loss("JointsMSESmooth", True))

    state, m = step(state, batch, jnp.asarray(True))      # compile
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, jnp.asarray(True))  # chained via state
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"# training: {B / dt:.1f} pairs/s ({dt*1e3:.1f} ms/step, "
          f"batch {B})")
    return B / dt


def main():
    import sys
    backend = jax.default_backend()
    print(f"# backend: {backend}, devices: {jax.devices()}")
    if "--train" in sys.argv:
        bench_training()
    best, best_b, _ = bench_cdrnet()
    print(json.dumps({
        "metric": "stereo_pairs_per_sec",
        "value": round(best, 2),
        "unit": "pairs/s",
        "vs_baseline": round(best / BASELINE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
