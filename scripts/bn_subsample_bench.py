"""Structural-byte-reduction study: subsampled BatchNorm statistics.

The CDR-101 train step is at 98% of the v5e HBM roofline (93.84 GB
accessed/step at batch 64 — docs/PERFORMANCE.md); the only lever left
is structural byte reduction. The measured BN train-mode overhead is
+8.1 ms forward (fwd_train vs fwd_eval = one extra traversal of every
conv output for the mean/var pass, ~6.5 GB at 805 GB/s), and the
backward carries matching stat-gradient traversals.

Hypothesis: computing batch statistics from a strided ROW SUBSAMPLE
(x[::k] over the stacked-views batch axis — outermost dim, so skipped
rows are whole contiguous HBM chunks the fused slice+reduce never
touches) removes (1 - 1/k) of the stat-pass bytes in forward AND the
d(mean)/d(var) traversals in backward, at a statistics change
equivalent to computing BN over a batch/k sub-batch (ghost-BN-style —
BN was designed at batch 32; 128/4 = 32 stacked views).

This script measures it on the real chip: eval fwd (floor), train fwd
and full value_and_grad with full stats vs stride-4 stats, each with
XLA cost analysis (bytes accessed), using the same host-chained timing
as scripts/train_step_bench.py. Ships as a study first; the opt-in
model flag is only worth threading through if the measured win is real
(the remat/donation studies both ended as anti-findings on this stack).

    python scripts/bn_subsample_bench.py [--stride 4] [--batch 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _stereo_projs(b):
    import numpy as np
    base = np.array([[600.0, 0, 128, 0], [0, 600.0, 128, 0],
                     [0, 0, 1, 3000.0]], np.float32)
    right = base.copy()
    right[0, 3] = -600.0 * 0.3
    return np.broadcast_to(np.stack([base, right]), (b, 2, 3, 4)).copy()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--layers", type=int, default=101)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from fast3dhpe_tpu.models import layers as L
    from fast3dhpe_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    B = args.batch

    class SubsampleBN(nn.Module):
        """BatchNorm2d whose TRAIN-mode batch statistics come from
        x[::stride] rows only (full rows are still normalized). Running
        stats update from the same subsample. Mirrors the flax BN surface
        the models use (constructed per-call via the batch_norm seam;
        `mask` accepted for signature parity, combined with the stride)."""
        stride: int
        train: bool
        dtype: object = jnp.float32

        @nn.compact
        def __call__(self, x, mask=None):
            f = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (f,),
                               jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (f,),
                              jnp.float32)
            ra_mean = self.variable("batch_stats", "mean",
                                    nn.initializers.zeros, None, (f,),
                                    jnp.float32)
            ra_var = self.variable("batch_stats", "var",
                                   nn.initializers.ones, None, (f,),
                                   jnp.float32)
            if not self.train:
                mean, var = ra_mean.value, ra_var.value
            else:
                xs = x[::self.stride]
                if mask is not None:
                    ms = mask[::self.stride]
                    n = jnp.maximum(jnp.sum(
                        jnp.broadcast_to(ms, xs.shape[:-1] + (1,)),
                        dtype=jnp.float32), 1.0)
                    xf = jnp.where(ms, xs, 0).astype(jnp.float32)
                    mean = jnp.sum(xf, axis=(0, 1, 2)) / n
                    var = jnp.sum(
                        jnp.where(ms, (xs.astype(jnp.float32)
                                       - mean) ** 2, 0),
                        axis=(0, 1, 2)) / n
                else:
                    xf = xs.astype(jnp.float32)
                    mean = jnp.mean(xf, axis=(0, 1, 2))
                    var = jnp.var(xf, axis=(0, 1, 2))
                if not self.is_initializing():
                    ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                    ra_var.value = 0.9 * ra_var.value + 0.1 * var
            # stats in f32 (above), normalization arithmetic in the
            # model dtype — mirrors flax BatchNorm(dtype=bf16) so the
            # byte comparison is apples-to-apples
            dt = self.dtype or x.dtype
            mul = (jax.lax.rsqrt(var + 1e-5) * scale).astype(dt)
            add = (bias - mean * jax.lax.rsqrt(var + 1e-5)
                   * scale).astype(dt)
            return x.astype(dt) * mul + add

    def subsample_batch_norm(train, name=None, dtype=jnp.float32):
        return SubsampleBN(stride=args.stride, train=train, dtype=dtype,
                           name=name)

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(B, 2, 256, 256, 3), jnp.float32),
        "proj": jnp.asarray(_stereo_projs(B)),
        "target_3d": jnp.asarray(rng.randn(B, 19, 3) * 200, jnp.float32),
        "target_2d": jnp.asarray(rng.uniform(0, 256, (B, 2, 19, 2)),
                                 jnp.float32),
        "target_weight": jnp.ones((B, 19), jnp.float32),
    }

    from contextlib import contextmanager

    @contextmanager
    def patched_bn(bn_factory):
        """The models `from .layers import batch_norm` and call it at
        TRACE time (inside flax __call__), so rebinding the symbol in
        each model module's namespace swaps every BN for traces made
        while the patch is active (init AND each jit's first call)."""
        from fast3dhpe_tpu.models import resnet, decoder, cdrnet
        mods = (resnet, decoder, cdrnet)
        saved = [m.batch_norm for m in mods]
        for m in mods:
            m.batch_norm = bn_factory
        try:
            yield cdrnet
        finally:
            for m, f in zip(mods, saved):
                m.batch_norm = f

    def build(bn_factory):
        with patched_bn(bn_factory) as cdrnet:
            model = cdrnet.CDRNet(num_joints=19, num_layers=args.layers,
                                  dtype=jnp.bfloat16)
            variables = jax.jit(model.init, static_argnames=("train",))(
                jax.random.PRNGKey(0), batch["image"], batch["proj"],
                train=False)
        return model, variables

    from fast3dhpe_tpu.models import make_loss
    from fast3dhpe_tpu.train.state import TrainState
    from fast3dhpe_tpu.train.steps import _cdr_loss
    import optax
    loss_fn = make_loss("JointsMSESmooth", True)

    def timed(name, fn, state, iters=args.iters):
        s, out = fn(state, batch)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            s, out = fn(s, batch)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:18s} {dt*1e3:8.1f} ms/step  {B/dt:7.1f} pairs/s",
              flush=True)
        return dt

    def cost(name, fn, state, dt):
        try:
            c = jax.jit(fn).lower(state, batch).compile().cost_analysis()
            c = c[0] if isinstance(c, (list, tuple)) else c
            fl, by = c.get("flops", float("nan")), \
                c.get("bytes accessed", float("nan"))
            print(f"cost[{name}]: {fl/1e12:.2f} TFLOP, {by/1e9:.2f} GB "
                  f"-> {fl/1e12/dt:.0f} TF/s, {by/1e9/dt:.0f} GB/s",
                  flush=True)
            return by
        except Exception as e:
            print(f"cost[{name}] unavailable: {e}", flush=True)
            return float("nan")

    results = {}
    for label, factory in (("full", L.batch_norm),
                           ("sub%d" % args.stride, subsample_batch_norm)):
      # the patch must stay active through timing: jitted fns trace at
      # their FIRST CALL, and that trace is what instantiates the BNs
      with patched_bn(factory):
        model, variables = build(factory)
        state = TrainState.create(variables, optax.adam(1e-4))

        @jax.jit
        def fwd_train(state, batch, model=model):
            (kp, p3), mut = model.apply(
                state.variables, batch["image"], batch["proj"], train=True,
                mutable=["batch_stats"])
            return state.replace(batch_stats=mut["batch_stats"]), \
                {"s": jnp.sum(p3) + jnp.sum(kp)}

        @jax.jit
        def grads_only(state, batch, model=model):
            def loss_of(params):
                return _cdr_loss(model, loss_fn, params, state.batch_stats,
                                 batch, True, 4.0, 0.1, 1, 19, train=True)
            (loss, aux), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params)
            gsum = sum(jnp.sum(g)
                       for g in jax.tree_util.tree_leaves(grads))
            return state.replace(batch_stats=aux["new_stats"]), \
                {"s": loss + gsum}

        dt_f = timed(f"fwd_train[{label}]", fwd_train, state)
        by_f = cost(f"fwd_train[{label}]", fwd_train, state, dt_f)
        dt_g = timed(f"grads[{label}]", grads_only, state)
        by_g = cost(f"grads[{label}]", grads_only, state, dt_g)
        results[label] = (dt_f, by_f, dt_g, by_g)

    f, s = results["full"], results["sub%d" % args.stride]
    print(f"\nfwd_train: {f[0]*1e3:.1f} -> {s[0]*1e3:.1f} ms "
          f"({f[1]/1e9:.2f} -> {s[1]/1e9:.2f} GB); "
          f"grads: {f[2]*1e3:.1f} -> {s[2]*1e3:.1f} ms "
          f"({f[3]/1e9:.2f} -> {s[3]/1e9:.2f} GB)")


if __name__ == "__main__":
    main()
