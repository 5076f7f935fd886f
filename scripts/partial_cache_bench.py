"""Partial-device-cache loop throughput vs cache fraction (real TPU).

The full HBM frame cache removes ALL per-step frame transfer; the
partial cache (dataset > DEVICE_CACHE_BYTES) removes the cached
fraction. This measures the CDR train loop's sustained pairs/s on a
synthetic MADS tree at cache fractions {0, ~0.5, 1} to show the benefit
scales with residency on a transfer-bound link.

[ref: tools/load.py:118-132 — the reference's host DataLoader always
pays full per-batch transfer.]

    python scripts/partial_cache_bench.py [--frames 128] [--batch 32]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--layers", type=int, default=101)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (functional smoke run; "
                         "JAX_PLATFORMS is ignored on this stack)")
    ap.add_argument("--image", type=int, default=256)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from fast3dhpe_tpu.config import config_from_dict
    from fast3dhpe_tpu.data.synthetic import make_synthetic_mads
    from fast3dhpe_tpu.data.loader import Stereo3DLoader
    from fast3dhpe_tpu.models import CDRNet, make_loss
    from fast3dhpe_tpu.train.state import TrainState, make_optimizer
    from fast3dhpe_tpu.train.steps import make_train_step_cdr
    from fast3dhpe_tpu.utils.profiling import sync
    from fast3dhpe_tpu.utils.runtime import enable_compilation_cache
    import jax.numpy as jnp

    enable_compilation_cache()
    root = os.path.join(tempfile.gettempdir(), "partial_cache_bench")
    if not os.path.isdir(os.path.join(root, "train")):
        make_synthetic_mads(root, n_frames=args.frames, img_w=256,
                            img_h=192)

    frame_bytes = 192 * 256 * 3
    n_unique = 2 * args.frames
    budgets = {
        "stream (no cache)": 0,
        "partial (~50%)": (n_unique // 2) * frame_bytes + frame_bytes // 2,
        "full": 8 << 30,
    }

    cfg = config_from_dict({
        "DATASET": {"TYPE": "MADS_3d", "ROOT": root, "TRAIN_SET": "train",
                    "TEST_SET": "valid", "FLIP": True, "ROT_FACTOR": 30,
                    "SCALE_FACTOR": 0.25, "OCCLUSION": "None",
                    "CACHE_BYTES": 2 << 30},
        "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": args.layers,
                  "NAME": "pcb", "PRETRAINED": "",
                  "IMAGE_SIZE": [args.image, args.image],
                  "EXTRA": {"TARGET_TYPE": "gaussian", "SIGMA": 3,
                            "HEATMAP_SIZE": [64, 64]}},
        "TRAIN": {"BATCH_SIZE": args.batch, "EPOCH": 1, "LR": 1e-4,
                  "LR_STEP": [40], "LR_FACTOR": 0.1, "WARMUP": 0,
                  "LOSS_3D_WEIGHT": 4},
        "TEST": {"BATCH_SIZE": args.batch},
        "LOSS": {"USE_TARGET_WEIGHT": True, "TYPE": "JointsMSESmooth"},
    })

    model = CDRNet.from_config(cfg, dtype=jnp.bfloat16)
    imgs = jnp.zeros((args.batch, 2, args.image, args.image, 3),
                     jnp.float32)
    projs = jnp.broadcast_to(
        jnp.asarray([[1100.0, 0, args.image / 2, 0], [0, 1100.0, args.image / 2, 0],
                     [0, 0, 1, 3000.0]], jnp.float32),
        (args.batch, 2, 3, 4))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), imgs, projs, train=True)
    tx = make_optimizer(cfg, steps_per_epoch=max(
        1, args.frames // args.batch))
    state = TrainState.create(variables, tx)
    step = make_train_step_cdr(model, make_loss(
        cfg.LOSS.TYPE, cfg.LOSS.USE_TARGET_WEIGHT))
    use_3d = jnp.asarray(True)

    for name, budget in budgets.items():
        loader = Stereo3DLoader(cfg, "train", seed=0,
                                cache_bytes=cfg.DATASET.CACHE_BYTES,
                                device_cache_bytes=budget)
        st = state
        # warm epoch: decode/RAM-cache fill + device-cache build + compile
        for b in iter(loader):
            st, _ = step(st, b, use_3d)
        sync(st.params)
        mode = ("full" if loader.device_cached
                and not loader._device_cache.partial else
                "partial" if loader.device_cached else "stream")
        t0, n = time.perf_counter(), 0
        for _ in range(args.epochs):
            for b in iter(loader):
                st, _ = step(st, b, use_3d)
                n += int(np.asarray(jax.device_get(b["row_valid"])).sum())
        sync(st.params)
        dt = time.perf_counter() - t0
        print(f"# {name:20s} [{mode:7s}] {n / dt:7.1f} pairs/s "
              f"({dt:.1f}s, {n} pairs)")
        loader.close()


if __name__ == "__main__":
    main()
