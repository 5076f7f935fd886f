"""Baseline vs CDRNet head-to-head — the reference's central result.

The reference's entire Results section is the naive stereo baseline
(PoseResNet hard-argmax + closed-form triangulation
[ref: baseline.py:133-134]) against CDRNet (learned fusion + soft-argmax
+ differentiable DLT [ref: inference.py:148-149, README.md:64-73]) on
the same sequences. This script reproduces that comparison on the
synthetic rig using the artifacts of a scripts/staged_convergence.py
run: the stage-1 2D checkpoint drives apps.baseline.BaselineEstimator,
the staged CDR best checkpoint drives apps.inference.CDRNetInferencer,
both evaluated over the identical valid frames.

    python scripts/staged_convergence.py --layers 101 --workdir runs/staged
    python scripts/head_to_head.py --workdir runs/staged [--layers 101]

Prints a side-by-side MPJPE2D/MPJPE3D JSON table (recorded in
BASELINE.md). Serialize TPU jobs: run AFTER the staged run finishes.
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=str, required=True,
                    help="staged_convergence workdir (data/ + weights/)")
    ap.add_argument("--layers", type=int, default=101)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--device_cache_mb", type=int, default=2048)
    args = ap.parse_args()

    import jax.numpy as jnp

    from fast3dhpe_tpu.config import config_from_dict
    from fast3dhpe_tpu.apps.baseline import BaselineEstimator
    from fast3dhpe_tpu.apps.inference import CDRNetInferencer
    from fast3dhpe_tpu.data.stream import LoadMADSData
    from fast3dhpe_tpu.train.checkpoint import load_variables
    from fast3dhpe_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    work = args.workdir
    valid_root = os.path.join(work, "data", "valid")
    weights = os.path.join(work, "weights")
    name2d = f"staged2d_{args.layers}"
    name3d = f"staged3d_{args.layers}"

    extra = {"TARGET_TYPE": "gaussian", "SIGMA": 3,
             "HEATMAP_SIZE": [64, 64]}
    cfg2d = config_from_dict({
        "DATASET": {"TYPE": "MADS_2d", "ROOT": os.path.join(work, "data"),
                    "TRAIN_SET": "train", "TEST_SET": "valid"},
        "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": args.layers,
                  "NAME": name2d, "PRETRAINED": "",
                  "IMAGE_SIZE": [256, 256], "EXTRA": extra},
        "TRAIN": {"BATCH_SIZE": args.batch},
        "TEST": {"BATCH_SIZE": args.batch},
        "LOSS": {"USE_TARGET_WEIGHT": True, "TYPE": "JointsMSE"},
    })
    cfg3d = config_from_dict({
        "DATASET": {"TYPE": "MADS_3d", "ROOT": os.path.join(work, "data"),
                    "TRAIN_SET": "train", "TEST_SET": "valid"},
        "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": args.layers,
                  "NAME": name3d, "PRETRAINED": "",
                  "IMAGE_SIZE": [256, 256], "EXTRA": extra},
        "TRAIN": {"BATCH_SIZE": args.batch},
        "TEST": {"BATCH_SIZE": args.batch},
        "LOSS": {"USE_TARGET_WEIGHT": True, "TYPE": "JointsMSESmooth"},
    })

    movements = sorted(os.path.basename(p)
                       for p in glob.glob(os.path.join(valid_root, "*"))
                       if os.path.isdir(p))
    assert movements, f"no movements under {valid_root}"

    # the baseline app's loader prefers latest.pth/latest (reference
    # parity [ref: baseline.py:30-34]); for the head-to-head both models
    # get their BEST checkpoints
    baseline = BaselineEstimator(cfg2d, weights_root=weights,
                                 dtype=jnp.bfloat16)
    best2d = os.path.join(weights, name2d, "best")
    if os.path.isdir(best2d):
        baseline.variables = load_variables(best2d)
    cdr = CDRNetInferencer(cfg3d, weights_root=weights, dtype=jnp.bfloat16)

    cache_bytes = args.device_cache_mb << 20
    table = {}
    for mv in movements:
        row = {}
        for label, est in (("baseline", baseline), ("cdrnet", cdr)):
            stream = LoadMADSData(valid_root, cfg3d.MODEL.IMAGE_SIZE, mv)
            t0 = time.time()
            e2, e3 = est.evaluate_movement(stream, args.batch,
                                           device_cache_bytes=cache_bytes)
            row[label] = {"mpjpe2d_px": round(float(e2), 2),
                          "mpjpe3d_mm": round(float(e3), 1),
                          "frames": len(stream),
                          "eval_s": round(time.time() - t0, 1)}
            print(f"[{mv}/{label}] MPJPE2D {e2:.2f} px  "
                  f"MPJPE3D {e3:.1f} mm  ({len(stream)} frames)",
                  flush=True)
        table[mv] = row

    # sequence-weighted aggregate (frames are equal across movements on
    # the synthetic rig, but weight anyway)
    agg = {}
    for label in ("baseline", "cdrnet"):
        n = sum(table[m][label]["frames"] for m in table)
        agg[label] = {
            "mpjpe2d_px": round(sum(
                table[m][label]["mpjpe2d_px"] * table[m][label]["frames"]
                for m in table) / n, 2),
            "mpjpe3d_mm": round(sum(
                table[m][label]["mpjpe3d_mm"] * table[m][label]["frames"]
                for m in table) / n, 1),
        }
    print(json.dumps({"head_to_head": table, "aggregate": agg,
                      "layers": args.layers}))


if __name__ == "__main__":
    main()
