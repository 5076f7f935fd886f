"""Measure the fused-bottleneck kernel variants at stage1/stage2 shapes
(real TPU): XLA native vs Pallas "taps" (9 x K=P) vs Pallas "xpack"
(3 x K=4P implicit-im2col) — the formulation VERDICT r2 asked to cover.

Floor-corrected with the same serializing-scan methodology as bench.py.

    python scripts/bottleneck_variant_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, x, iters=30):
    def run(x):
        def body(carry, _):
            out = fn(carry)
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


def floor(iters=30):
    """Shared methodology: utils.profiling.measure_scan_floor (one
    baseline for bench.py --latency and this script)."""
    from fast3dhpe_tpu.utils.profiling import measure_scan_floor
    return measure_scan_floor(iters=iters)


def main():
    from fast3dhpe_tpu.ops.pallas_bottleneck import (
        fused_bottleneck, bottleneck_reference)
    from fast3dhpe_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    print(f"# devices: {jax.devices()}")
    fl = floor()
    print(f"# scan floor: {fl*1e3:.3f} ms/iter")

    r = np.random.RandomState(0)
    for label, P, H, B, S in (("stage1-identity (P=64, 64x64)", 64, 64,
                               128, 1),
                              ("stage2-identity (P=128, 32x32)", 128, 32,
                               128, 2)):
        Cout = 4 * P
        Cin = Cout                      # identity block
        dt = jnp.bfloat16
        x0 = jnp.asarray(r.randn(B, H, H, Cin) * 0.1, dt)
        w1 = r.randn(Cin, P).astype(np.float32) * 0.05
        w2 = r.randn(3, 3, P, P).astype(np.float32) * 0.05
        w3 = r.randn(P, Cout).astype(np.float32) * 0.05
        bn = lambda C: (np.abs(r.randn(C)).astype(np.float32) + 0.5,
                        r.randn(C).astype(np.float32) * 0.1)
        s1, b1 = bn(P)
        s2, b2 = bn(P)
        s3, b3 = bn(Cout)
        args = (w1, s1, b1, w2, s2, b2, w3, s3, b3)

        flops = 2 * B * H * H * (Cin * P + 9 * P * P + P * Cout)
        results = {}
        fns = {
            "xla-native": lambda x: bottleneck_reference(x, *args),
            "pallas-taps": lambda x: fused_bottleneck(
                x, *args, samples_per_cell=S, conv2_mode="taps"),
            "pallas-xpack": lambda x: fused_bottleneck(
                x, *args, samples_per_cell=S, conv2_mode="xpack"),
        }
        # parity first (bf16 tolerance)
        ref = np.asarray(fns["xla-native"](x0), np.float32)
        for name in ("pallas-taps", "pallas-xpack"):
            got = np.asarray(fns[name](x0), np.float32)
            err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
            assert err < 2e-2, (name, err)
        for name, fn in fns.items():
            dt_s = max(timed(fn, x0) - fl, 1e-9)
            results[name] = dt_s
            print(f"# {label} {name}: {dt_s*1e3:.2f} ms/block "
                  f"({flops/dt_s/1e12:.0f} TF/s)")
        best = min(results, key=results.get)
        print(f"# {label} best: {best}")


if __name__ == "__main__":
    main()
