"""Small-batch serving latency by HOST-CHAINED dispatch (real TPU).

Cross-check for `bench.py --latency`'s scan-floor-corrected numbers
using the train_step_bench.py pattern instead: N dependent dispatches
(each step's output perturbs the next step's input, so the device must
run them serially) issued back-to-back, ONE final scalar fetch. Dispatch
on this relay is asynchronous, so the host can issue far ahead of the
device; the final fetch syncs. No lax.scan -> no per-iteration scan
floor; the only bias left is the (sub-ms) per-dispatch device-side
launch overhead, which a serving host would also pay.

[ref: inference.py:46-68 — the reference's actual serving use case is
frame-by-frame stereo video.]

    python scripts/serving_latency_chain.py [--iters 200]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _stereo_projs(batch):
    K = np.array([[1100.0, 0.0, 128.0],
                  [0.0, 1100.0, 128.0],
                  [0.0, 0.0, 1.0]])
    Ps = []
    for dx in (-400.0, 400.0):
        T = np.array([[dx], [0.0], [3000.0]])
        Ps.append((K @ np.hstack([np.eye(3), T])).astype(np.float32))
    return np.broadcast_to(np.stack(Ps), (batch, 2, 3, 4)).astype(
        np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 4, 16])
    ap.add_argument("--int8", action="store_true",
                    help="measure the int8 PTQ serving path "
                         "(models/quantized.py) instead of bf16; "
                         "latency is weight-independent, so the pack is "
                         "calibrated from the random-init model")
    args = ap.parse_args()

    from fast3dhpe_tpu.config import config_from_dict
    from fast3dhpe_tpu.models import CDRNet
    from fast3dhpe_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    print(f"# backend: {jax.default_backend()}, devices: {jax.devices()}")

    cfg = config_from_dict({
        "DATASET": {"TYPE": "MADS_3d", "ROOT": "", "TRAIN_SET": "train",
                    "TEST_SET": "valid"},
        "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": 101, "NAME": "lat",
                  "PRETRAINED": "", "IMAGE_SIZE": [256, 256],
                  "EXTRA": {"TARGET_TYPE": "gaussian", "SIGMA": 3,
                            "HEATMAP_SIZE": [64, 64]}},
        "TRAIN": {"BATCH_SIZE": 1, "EPOCH": 1, "LR": 1e-4,
                  "LR_STEP": [40], "LR_FACTOR": 0.1},
        "TEST": {"BATCH_SIZE": 1},
        "LOSS": {"USE_TARGET_WEIGHT": True, "TYPE": "JointsMSESmooth"},
    })
    model = CDRNet.from_config(cfg, dtype=jnp.bfloat16)

    for B in args.batches:
        rng = np.random.RandomState(0)
        imgs = jnp.asarray(rng.randn(B, 2, 256, 256, 3), jnp.float32)
        projs = jnp.asarray(_stereo_projs(B))
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), imgs, projs, train=False)

        if args.int8:
            from fast3dhpe_tpu.models import quantized as qz
            pack = qz.quantize_cdrnet(variables, [(imgs, projs)])
            depth = int(pack["depth"])

            @jax.jit
            def step(x):
                _, p3d = qz.cdrnet_int8_apply(pack, x, projs, depth=depth)
                return x + jnp.mean(p3d).astype(x.dtype) * 1e-12
        else:
            @jax.jit
            def step(x):
                _, p3d = model.apply(variables, x, projs, train=False)
                # serializing dependency: the next frame depends on this
                # prediction by a numerically negligible amount
                return x + jnp.mean(p3d).astype(x.dtype) * 1e-12

        x = step(imgs)                       # compile
        float(jnp.sum(x))                    # sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            x = step(x)                      # host-chained, async dispatch
        final = float(jnp.sum(x))            # ONE sync for the chain
        dt = (time.perf_counter() - t0) / args.iters
        assert np.isfinite(final)
        mode = "int8" if args.int8 else "bf16"
        print(f"# chained latency [{mode}] batch {B}: {dt*1e3:.2f} "
              f"ms/step ({B/dt:.1f} pairs/s, {args.iters} dependent "
              f"dispatches)")


if __name__ == "__main__":
    main()
