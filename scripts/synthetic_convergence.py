"""Full-resolution convergence run on the synthetic MADS rig (real TPU).

The 64px tiny proxy in tests bottoms out at ~1.9 m MPJPE because of its
16x16-heatmap depth resolution (BASELINE.md). This run trains CDRNet at
the REAL pipeline scale (256px images, 64x64 heatmaps) on a larger
synthetic set to record the framework's achievable absolute 3D MPJPE on
a rig where ground truth is exact. Usage:

    python scripts/synthetic_convergence.py [--layers 18] [--epochs 40]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=18)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    from fast3dhpe_tpu.config import config_from_dict
    from fast3dhpe_tpu.data.synthetic import make_synthetic_mads
    from fast3dhpe_tpu.train import loop_cdr
    from fast3dhpe_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    tmp = tempfile.mkdtemp(prefix="synth_conv_")
    root = f"{tmp}/data"
    make_synthetic_mads(root, n_frames=args.frames, img_w=256, img_h=192)
    cfg = config_from_dict({
        "DATASET": {"TYPE": "MADS_3d", "ROOT": root, "TRAIN_SET": "train",
                    "TEST_SET": "valid", "FLIP": True, "ROT_FACTOR": 30,
                    "SCALE_FACTOR": 0.25, "OCCLUSION": "CUTOUT",
                    "CACHE_BYTES": 2 << 30},
        "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": args.layers,
                  "NAME": "synth_conv", "PRETRAINED": "",
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
    hist = loop_cdr.run(cfg, overwrite=True, weights_root=f"{tmp}/weights",
                        compute_dtype="bfloat16")
    post = hist["val_mpjpe_3d"][args.warmup + 1:] or hist["val_mpjpe_3d"]
    print(f"best val 3D MPJPE (post-warmup): {min(post):.1f} mm "
          f"(final {hist['val_mpjpe_3d'][-1]:.1f} mm); "
          f"best val 2D MPJPE: {min(hist['val_mpjpe_2d']):.2f} px")


if __name__ == "__main__":
    main()
