"""Stage-level conv benchmark: full ResNet-101 stage3/stage4 stacks.

Single-op microbenches on this platform bottom out at the ~1.45ms/iter
scan floor (per-iteration overhead of the relay) — a 0.2ms conv measures
as 1.45ms. Here each scan body runs an ENTIRE encoder stage (23 or 3
bottleneck blocks, inference-fused BN as scale+shift + relu + residual),
so the floor is <5% of the body.

Variants:
  native   — lax.conv for everything (round-1 baseline)
  matmul   — every 1x1 as reshape+dot; 3x3 native
  im2col   — every 1x1 as dot AND every 3x3 as im2col+dot
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

PEAK_BF16 = 197e12


def timed(fn, x, iters=10):
    def run(x):
        def body(carry, _):
            out = fn(carry)
            # chain: output feeds the next iteration (same shape)
            return out, jnp.sum(out)
        c, sums = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(sums)

    g = jax.jit(run)
    float(g(x))
    t0 = time.perf_counter()
    s = float(g(x))
    assert np.isfinite(s)
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
    patches = jnp.concatenate(cols, axis=-1)
    out = jnp.dot(patches.reshape(B * H * W, 9 * C),
                  w.reshape(9 * C, -1), preferred_element_type=jnp.float32)
    return out.reshape(B, H, W, -1).astype(x.dtype)


def make_stage(n_blocks, C_in, C_mid, H, B, variant, seed=0):
    """Returns (fn: x->x, x0, flops_per_call)."""
    rng = np.random.RandomState(seed)
    dt = jnp.bfloat16
    blocks = []
    for i in range(n_blocks):
        w1 = jnp.asarray(rng.randn(1, 1, C_in, C_mid) * 0.04, dt)
        w2 = jnp.asarray(rng.randn(3, 3, C_mid, C_mid) * 0.02, dt)
        w3 = jnp.asarray(rng.randn(1, 1, C_mid, C_in) * 0.02, dt)
        s1 = jnp.asarray(rng.rand(C_mid) * 0.1, dt)
        s2 = jnp.asarray(rng.rand(C_mid) * 0.1, dt)
        s3 = jnp.asarray(rng.rand(C_in) * 0.02, dt)
        blocks.append((w1, w2, w3, s1, s2, s3))

    c1x1 = conv1x1_matmul if variant in ("matmul", "im2col") else conv_native
    c3x3 = conv3x3_im2col if variant == "im2col" else conv_native

    def stage(x):
        for w1, w2, w3, s1, s2, s3 in blocks:
            y = jax.nn.relu(c1x1(x, w1) * s1)
            y = jax.nn.relu(c3x3(y, w2) * s2)
            y = c1x1(y, w3) * s3
            x = jax.nn.relu(x + y)
        return x

    flops = n_blocks * 2 * B * H * H * (
        C_in * C_mid + 9 * C_mid * C_mid + C_mid * C_in)
    x0 = jnp.asarray(rng.randn(B, H, H, C_in), dt)
    return stage, x0, flops


def main():
    print(f"# devices: {jax.devices()}")
    stages = [
        ("stage3 (23 blocks, 1024/256ch, 16x16)", 23, 1024, 256, 16, 128),
        ("stage4 (3 blocks, 2048/512ch, 8x8)", 3, 2048, 512, 8, 128),
        ("stage2 (4 blocks, 512/128ch, 32x32)", 4, 512, 128, 32, 128),
    ]
    for label, n, cin, cmid, h, b in stages:
        row = [label + ":"]
        for variant in ("native", "matmul", "im2col"):
            fn, x0, flops = make_stage(n, cin, cmid, h, b, variant)
            dt = timed(fn, x0)
            row.append(f"{variant} {dt*1e3:.2f}ms "
                       f"{flops/dt/1e12:.0f}TF/s "
                       f"({100*flops/dt/PEAK_BF16:.0f}%)")
        print(" | ".join(row))


if __name__ == "__main__":
    main()
