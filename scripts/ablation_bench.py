"""Where does the CDRNet-101 step time actually go? (real-model ablation)

Times the REAL encoder truncated after each stage (stem, +stage1..4), the
decoder, and the full CDRNet, all with the serializing-scan pattern at the
bench shapes (encoder batch 128 = 64 stereo pairs). Stage cost = delta
between consecutive truncations, measured in the true compile context
(standalone stage benches mis-schedule vs the fused whole-model program).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

import sys
sys.path.insert(0, "/root/repo")

from fast3dhpe_tpu.models.resnet import (
    RESNET_SPEC, BasicBlock, Bottleneck, BASIC_EXPANSION,
    BOTTLENECK_EXPANSION)
from fast3dhpe_tpu.models.layers import conv2d, batch_norm, max_pool_torch

PEAK = 197e12


class TruncatedEncoder(nn.Module):
    num_layers: int = 101
    max_stage: int = 4           # 0 = stem only
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        block_name, stage_sizes = RESNET_SPEC[self.num_layers]
        block_cls = BasicBlock if block_name == "basic" else Bottleneck
        expansion = (BASIC_EXPANSION if block_name == "basic"
                     else BOTTLENECK_EXPANSION)
        x = x.astype(self.dtype)
        x = conv2d(64, 7, 2, 3, "conv1", self.dtype)(x)
        x = batch_norm(train, "bn1", self.dtype)(x)
        x = nn.relu(x)
        x = max_pool_torch(x, 3, 2, 1)
        inplanes = 64
        for stage, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), stage_sizes), start=1):
            if stage > self.max_stage:
                break
            stride = 1 if stage == 1 else 2
            for i in range(blocks):
                s = stride if i == 0 else 1
                downsample = (i == 0 and
                              (s != 1 or inplanes != planes * expansion))
                x = block_cls(planes=planes, stride=s,
                              downsample=downsample, dtype=self.dtype,
                              name=f"layer{stage}_{i}")(x, train=train)
                inplanes = planes * expansion
        return x


def timed_apply(model, variables, x, iters=20):
    def run(x):
        def body(carry, _):
            out = model.apply(variables, carry + 0.0, train=False)
            # serialize: perturb input by a scalar from the output
            nxt = carry + jnp.mean(out).astype(carry.dtype) * 1e-9
            return nxt, jnp.sum(out)
        c, sums = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(sums)
    g = jax.jit(run)
    float(g(x))
    t0 = time.perf_counter()
    s = float(g(x))
    assert np.isfinite(s)
    return (time.perf_counter() - t0) / iters


def main():
    print(f"# devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    B = 128
    x = jnp.asarray(rng.randn(B, 256, 256, 3), jnp.float32)

    prev = 0.0
    for stage in range(0, 5):
        model = TruncatedEncoder(max_stage=stage)
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), x, train=False)
        dt = timed_apply(model, variables, x)
        print(f"stem+stages<= {stage}: {dt*1e3:.2f} ms  "
              f"(delta {1e3*(dt-prev):.2f} ms)")
        prev = dt

    # decoder alone at bench shape
    from fast3dhpe_tpu.models.decoder import PoseDecoder
    z = jnp.asarray(rng.randn(B, 8, 8, 2048), jnp.bfloat16)
    dec = PoseDecoder(num_joints=19, dtype=jnp.bfloat16)
    dvars = jax.jit(dec.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), z, train=False)
    ddt = timed_apply(dec, dvars, z)
    print(f"decoder (8->64, 19 joints): {ddt*1e3:.2f} ms")

    # full CDRNet-101 reconfirmation at batch 64
    from fast3dhpe_tpu.models import CDRNet
    model = CDRNet(num_joints=19, num_layers=101, dtype=jnp.bfloat16)
    imgs = jnp.asarray(rng.randn(64, 2, 256, 256, 3), jnp.float32)
    K = np.array([[1100.0, 0, 128], [0, 1100.0, 128], [0, 0, 1]])
    Ps = [(K @ np.hstack([np.eye(3), np.array([[dx], [0], [3000.0]])]))
          .astype(np.float32) for dx in (-400.0, 400.0)]
    projs = jnp.asarray(np.broadcast_to(np.stack(Ps), (64, 2, 3, 4)))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), imgs, projs, train=False)

    def run(imgs):
        def body(carry, _):
            kp, p3d = model.apply(variables, carry, projs, train=False)
            return carry + jnp.mean(kp) * 1e-9, jnp.sum(p3d)
        c, sums = jax.lax.scan(body, imgs, None, length=20)
        return jnp.sum(sums)
    g = jax.jit(run)
    float(g(imgs))
    t0 = time.perf_counter()
    float(g(imgs))
    dt = (time.perf_counter() - t0) / 20
    print(f"full CDRNet-101 b64: {dt*1e3:.2f} ms = {64/dt:.0f} pairs/s")


if __name__ == "__main__":
    main()
