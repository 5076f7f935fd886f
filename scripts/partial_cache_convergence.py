"""Partial-cache training convergence validation (real TPU).

Real MADS (~7-16 GB decoded) will ALWAYS run under a PARTIAL device
cache on v5e (data/loader.py: resident prefix + fixed upload lane), and
its stratified per-batch cached/uncached mix is a documented deviation
from exchangeable shuffling. This script validates the deviation
STATISTICALLY: the same CDRNet-18 protocol trained under (a) a full
cache and (b) a cache forced to ~50% of the dataset must produce
comparable loss trajectories and final val 3D MPJPE.

Both runs force scan_epochs=False so they share the per-batch execution
path (the scan-epoch path requires full residency and uses a different
occlusion PRNG schedule — that would confound the comparison).

    python scripts/partial_cache_convergence.py [--epochs 10] [--frames 128]

Results recorded in docs/PERFORMANCE.md §4 and BASELINE.md.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=18)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--fraction", type=float, default=0.5,
                    help="partial-cache budget as a fraction of the "
                         "decoded dataset bytes")
    ap.add_argument("--workdir", type=str, default=None)
    args = ap.parse_args()

    from fast3dhpe_tpu.config import config_from_dict
    from fast3dhpe_tpu.data import load_data
    from fast3dhpe_tpu.data.synthetic import make_synthetic_mads
    from fast3dhpe_tpu.train import loop_cdr
    from fast3dhpe_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    work = args.workdir or tempfile.mkdtemp(prefix="pcache_conv_")
    os.makedirs(work, exist_ok=True)
    root = f"{work}/data"
    W, H = 256, 192
    if not os.path.isdir(os.path.join(root, "train")):
        make_synthetic_mads(root, n_frames=args.frames, img_w=W, img_h=H)

    dataset_bytes = args.frames * 2 * H * W * 3        # decoded uint8
    budgets = {"full": 4 << 30,
               "partial": int(args.fraction * dataset_bytes)}

    def cfg_for(mode, budget):
        return config_from_dict({
            "DATASET": {"TYPE": "MADS_3d", "ROOT": root,
                        "TRAIN_SET": "train", "TEST_SET": "valid",
                        "FLIP": True, "ROT_FACTOR": 30,
                        "SCALE_FACTOR": 0.25, "OCCLUSION": "CUTOUT",
                        "CACHE_BYTES": 2 << 30,
                        "DEVICE_CACHE_BYTES": budget},
            "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": args.layers,
                      "NAME": f"pcache_{mode}", "PRETRAINED": "",
                      "IMAGE_SIZE": [256, 256],
                      "EXTRA": {"TARGET_TYPE": "gaussian", "SIGMA": 3,
                                "HEATMAP_SIZE": [64, 64]}},
            "TRAIN": {"BATCH_SIZE": args.batch, "EPOCH": args.epochs,
                      "LR": args.lr, "LR_STEP": [int(args.epochs * 0.7)],
                      "LR_FACTOR": 0.1, "WARMUP": args.warmup,
                      "LOSS_3D_WEIGHT": 4},
            "TEST": {"BATCH_SIZE": args.batch},
            "LOSS": {"USE_TARGET_WEIGHT": True, "TYPE": "JointsMSESmooth"},
        })

    results = {}
    for mode, budget in budgets.items():
        cfg = cfg_for(mode, budget)
        # confirm the intended cache mode actually engages
        tr, _ = load_data(cfg)
        cache = tr.ensure_device_cache()
        engaged = ("none" if cache is None
                   else "partial" if cache.partial else "full")
        expected = "full" if mode == "full" else "partial"
        assert engaged == expected, (mode, engaged, budget)
        if cache is not None and cache.partial:
            print(f"[{mode}] cache resident {cache.frames.shape[0]}/"
                  f"{2 * args.frames} frames (budget {budget >> 20} MB)",
                  flush=True)
        del tr, cache

        t0 = time.time()
        hist = loop_cdr.run(cfg, overwrite=True, seed=0,
                            weights_root=f"{work}/weights",
                            compute_dtype="bfloat16",
                            scan_epochs=False,
                            checkpoint_every=args.epochs)
        post = hist["val_mpjpe_3d"][args.warmup + 1:] or hist["val_mpjpe_3d"]
        results[mode] = {
            "best_val_mpjpe3d_mm": round(min(post), 1),
            "final_val_mpjpe3d_mm": round(hist["val_mpjpe_3d"][-1], 1),
            "train_loss": [round(v, 5) for v in hist["train_loss"]],
            "val_mpjpe_3d": [round(v, 1) for v in hist["val_mpjpe_3d"]],
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"[{mode}] best {results[mode]['best_val_mpjpe3d_mm']} mm, "
              f"final {results[mode]['final_val_mpjpe3d_mm']} mm "
              f"({results[mode]['wall_s']}s)", flush=True)

    f, p = results["full"], results["partial"]
    rel = abs(f["best_val_mpjpe3d_mm"] - p["best_val_mpjpe3d_mm"]) / \
        max(f["best_val_mpjpe3d_mm"], 1e-9)
    print(json.dumps({"partial_cache_convergence": results,
                      "fraction": args.fraction,
                      "best_rel_diff": round(rel, 3)}))


if __name__ == "__main__":
    main()
