"""Microbenchmark: small-spatial convolution strategies on TPU.

Round-1 located CDRNet's remaining headroom in the small-spatial encoder
stages (16x16/8x8 run at 12-38 TFLOP/s vs 86 at 64x64 — docs/PERFORMANCE.md).
This script measures, at the EXACT ResNet-101 stage shapes of the batch-64
stereo bench (encoder batch = 128):

  - XLA native lax.conv_general_dilated (the round-1 baseline)
  - 1x1 conv as reshape + single matmul
  - 3x3 conv as im2col (9 shifted slices) + one matmul
  - 3x3 conv as shift-and-accumulate: 9 matmuls, one per tap

Timing uses the serializing-scan pattern (see bench.py): the axon relay's
block_until_ready does not wait for device completion and each dispatch
costs ~20ms RPC, so the iteration loop lives INSIDE one jit.
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

PEAK_BF16 = 197e12   # v5e


def timed(fn, args, iters=30, perturb_idx=0):
    """Serializing-scan timing: returns seconds/iter."""

    def run(args):
        def body(carry, _):
            a = list(args)
            a[perturb_idx] = carry
            out = fn(*a)
            carry = carry + jnp.mean(out).astype(carry.dtype) * 1e-9
            return carry, jnp.sum(out)

        c, sums = jax.lax.scan(body, args[perturb_idx], None, length=iters)
        return jnp.sum(sums)

    g = jax.jit(run)
    s = g(args)
    float(s)                      # compile + warm
    t0 = time.perf_counter()
    s = g(args)
    assert np.isfinite(float(s))
    return (time.perf_counter() - t0) / iters


def conv_native(x, w, stride=1):
    pad = (w.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def conv1x1_matmul(x, w):
    B, H, W, C = x.shape
    out = jnp.dot(x.reshape(B * H * W, C), w.reshape(C, -1),
                  preferred_element_type=jnp.float32)
    return out.reshape(B, H, W, -1).astype(x.dtype)


def conv3x3_im2col(x, w):
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + H, dx:dx + W, :] for dy in range(3)
            for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1)             # (B, H, W, 9C)
    out = jnp.dot(patches.reshape(B * H * W, 9 * C),
                  w.reshape(9 * C, -1), preferred_element_type=jnp.float32)
    return out.reshape(B, H, W, -1).astype(x.dtype)


def conv3x3_shiftmm(x, w):
    B, H, W, C = x.shape
    Cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((B * H * W, Cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy:dy + H, dx:dx + W, :].reshape(B * H * W, C)
            acc = acc + jnp.dot(xs, w[dy, dx],
                                preferred_element_type=jnp.float32)
    return acc.reshape(B, H, W, Cout).astype(x.dtype)


def main():
    print(f"# devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    # (label, B, H, Cin, Cout, k)  — encoder batch 128 = 64 pairs x 2 views
    shapes = [
        ("stage3 3x3 256ch 16x16", 128, 16, 256, 256, 3),
        ("stage4 3x3 512ch 8x8", 128, 8, 512, 512, 3),
        ("stage4 1x1 2048->512 8x8", 128, 8, 2048, 512, 1),
        ("stage4 1x1 512->2048 8x8", 128, 8, 512, 2048, 1),
        ("stage3 1x1 1024->256 16x16", 128, 16, 1024, 256, 1),
        ("stage3 1x1 256->1024 16x16", 128, 16, 256, 1024, 1),
        ("fusion 1x1 2048->300 8x8", 64, 8, 2048, 300, 1),
        ("decoder 1x1 256->19 64x64", 128, 64, 256, 19, 1),
    ]
    for label, B, H, Cin, Cout, k in shapes:
        x = jnp.asarray(rng.randn(B, H, H, Cin), dt)
        w = jnp.asarray(rng.randn(k, k, Cin, Cout) * 0.05, dt)
        flops = 2 * B * H * H * Cin * Cout * k * k
        results = {}
        results["native"] = timed(conv_native, (x, w))
        if k == 1:
            results["matmul"] = timed(conv1x1_matmul, (x, w))
        else:
            results["im2col"] = timed(conv3x3_im2col, (x, w))
            results["shiftmm"] = timed(conv3x3_shiftmm, (x, w))
        msg = " | ".join(
            f"{name} {dt_*1e3:.3f}ms {flops/dt_/1e12:.1f}TF/s"
            f" ({100*flops/dt_/PEAK_BF16:.0f}%)"
            for name, dt_ in results.items())
        print(f"{label}: {msg}")


if __name__ == "__main__":
    main()
