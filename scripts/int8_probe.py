"""Probe: does int8 reach the v5e MXU's 2x int8 path through XLA?

Inference is HBM-bound (docs/PERFORMANCE.md: 145 FLOP/byte intensity vs
the ~240 FLOP/byte bf16 ridge), so int8 activations+weights would halve
bytes AND double MXU peak — a potential ~2x serving lever IF the
compiler actually lowers int8 convs to the quantized MXU path. This
measures that lowering in isolation before any quantization work:

  1. square matmuls (the clean MXU case): int8xint8->int32 vs bf16
  2. ResNet-shaped convs (stage1/2/3 of CDRNet-101 at batch 128):
     int8 conv via lax.conv_general_dilated preferred_element_type=int32

Timing = serializing lax.scan with the loop inside jit (bench.py
methodology — host-side timing is meaningless on this relay).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _time_scan(fn, x0, iters=30):
    """fn: carry -> (carry, scalar). Returns seconds/iter (in-jit loop)."""
    def run(x):
        def body(c, _):
            return fn(c)
        c, outs = lax.scan(body, x, None, length=iters)
        return jnp.sum(outs)

    g = jax.jit(run)
    float(g(x0))                      # compile + warm
    t0 = time.perf_counter()
    s = float(g(x0))
    assert np.isfinite(s)
    return (time.perf_counter() - t0) / iters


CHAIN = 8   # ops per scan body: amortizes the ~1.3 ms/iter scan floor
            # (CLAUDE.md round-2 lesson — single-op bodies measure floor)


def bench_matmul(n=4096, iters=20):
    rng = np.random.RandomState(0)
    a8 = jnp.asarray(rng.randint(-127, 127, (n, n)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 127, (n, n)), jnp.int8)
    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)
    flops = 2.0 * n * n * n * CHAIN

    def mm_bf16(c):
        for _ in range(CHAIN):
            y = jnp.dot(c, bbf, preferred_element_type=jnp.float32)
            # rescale + clip into range (keeps the chain finite; the
            # chained dependency is what serializes the ops)
            c = jnp.clip(y * (1.0 / n), -100, 100).astype(jnp.bfloat16)
        return c, y[0, 0]

    def mm_int8(c):
        for _ in range(CHAIN):
            y = lax.dot_general(c, b8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            # requantize: shift back into int8 range (realistic for a
            # quantized net, keeps the chain int8-in/int8-in)
            c = jnp.clip(y >> 13, -127, 127).astype(jnp.int8)
        return c, y[0, 0].astype(jnp.float32)

    t_bf = _time_scan(mm_bf16, abf, iters) / CHAIN
    t_i8 = _time_scan(mm_int8, a8, iters) / CHAIN
    flops /= CHAIN
    print(f"matmul {n}x{n} (x{CHAIN}/body): bf16 {t_bf*1e3:.2f} ms "
          f"({flops/t_bf/1e12:.1f} TFLOP/s) | int8 {t_i8*1e3:.2f} ms "
          f"({flops/t_i8/1e12:.1f} TOP/s) | int8/bf16 speedup "
          f"{t_bf/t_i8:.2f}x")


def bench_conv(B, H, W, C, K, iters=30, label=""):
    rng = np.random.RandomState(0)
    x8 = jnp.asarray(rng.randint(-127, 127, (B, H, W, C)), jnp.int8)
    w8 = jnp.asarray(rng.randint(-127, 127, (3, 3, C, K)), jnp.int8)
    xbf = x8.astype(jnp.bfloat16)
    wbf = w8.astype(jnp.bfloat16)
    dn = lax.conv_dimension_numbers(x8.shape, w8.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    flops = 2.0 * B * H * W * C * K * 9

    scale = 1.0 / (C * 9)

    def conv_bf16(c):
        for _ in range(CHAIN):
            y = lax.conv_general_dilated(
                c, wbf, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            # chained + clipped: serializing and finite
            c = jnp.clip(y * scale, -100, 100).astype(jnp.bfloat16)
        return c, y[0, 0, 0, 0]

    def conv_int8(c):
        for _ in range(CHAIN):
            y = lax.conv_general_dilated(
                c, w8, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            c = jnp.clip(y >> 13, -127, 127).astype(jnp.int8)  # requant
        return c, y[0, 0, 0, 0].astype(jnp.float32)

    t_bf = _time_scan(conv_bf16, xbf, iters) / CHAIN
    try:
        t_i8 = _time_scan(conv_int8, x8, iters) / CHAIN
    except Exception as e:   # int8 conv may simply not lower on TPU
        print(f"conv {label} B{B} {H}x{W} C{C}->K{K}: bf16 "
              f"{t_bf*1e3:.2f} ms ({flops/t_bf/1e12:.1f} TFLOP/s) | "
              f"int8 FAILED: {type(e).__name__}: {str(e)[:120]}")
        return
    print(f"conv {label} B{B} {H}x{W} C{C}->K{K} (x{CHAIN}/body): "
          f"bf16 {t_bf*1e3:.2f} ms ({flops/t_bf/1e12:.1f} TFLOP/s) | "
          f"int8 {t_i8*1e3:.2f} ms ({flops/t_i8/1e12:.1f} TOP/s) | "
          f"speedup {t_bf/t_i8:.2f}x")


def main():
    print(f"# devices: {jax.devices()}")
    bench_matmul(4096)
    # CDRNet-101 inference shapes (batch 64 stereo = 128 images)
    bench_conv(128, 64, 64, 64, 64, label="stage1")
    bench_conv(128, 32, 32, 128, 128, label="stage2")
    bench_conv(128, 16, 16, 256, 256, label="stage3")


if __name__ == "__main__":
    main()
