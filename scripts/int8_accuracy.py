"""Int8 PTQ accuracy study on the synthetic rig (real TPU).

The int8 serving path (models/quantized.py) is worth shipping only if
the quantization error is negligible at task level. This script trains
CDRNet at the real pipeline scale (256px / 64x64 heatmaps) on the
synthetic rig — ground truth exact — then evaluates the best checkpoint
through the SAME serving code (apps.inference.CDRNetInferencer) twice:
bf16 and int8 (calibrated on training frames), and reports the val
MPJPE2D/MPJPE3D side by side. Results are recorded in BASELINE.md.

    python scripts/int8_accuracy.py [--layers 18] [--epochs 40] \
        [--workdir runs/int8] [--skip_train]

Serializes all TPU jobs (relay constraint: never two TPU clients).
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_cfg(root, layers, epochs, warmup, batch, lr):
    from fast3dhpe_tpu.config import config_from_dict
    return config_from_dict({
        "DATASET": {"TYPE": "MADS_3d", "ROOT": root, "TRAIN_SET": "train",
                    "TEST_SET": "valid", "FLIP": True, "ROT_FACTOR": 30,
                    "SCALE_FACTOR": 0.25, "OCCLUSION": "CUTOUT",
                    "CACHE_BYTES": 2 << 30,
                    "DEVICE_CACHE_BYTES": 4 << 30},
        "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": layers,
                  "NAME": f"int8acc_{layers}", "PRETRAINED": "",
                  "IMAGE_SIZE": [256, 256],
                  "EXTRA": {"TARGET_TYPE": "gaussian", "SIGMA": 3,
                            "HEATMAP_SIZE": [64, 64]}},
        "TRAIN": {"BATCH_SIZE": batch, "EPOCH": epochs, "LR": lr,
                  "LR_STEP": [int(epochs * 0.7)], "LR_FACTOR": 0.1,
                  "WARMUP": warmup, "LOSS_3D_WEIGHT": 4},
        "TEST": {"BATCH_SIZE": batch},
        "LOSS": {"USE_TARGET_WEIGHT": True, "TYPE": "JointsMSESmooth"},
    })


def _evaluate(inferencer, data_path, image_size, batch_size):
    """Frame-weighted val MPJPE2D/3D over every movement in data_path,
    through the serving path (whole-movement scan when cacheable)."""
    from fast3dhpe_tpu.data.stream import LoadMADSData
    movements = sorted(os.path.basename(p)
                       for p in glob.glob(os.path.join(data_path, "*"))
                       if os.path.isdir(p))
    t2 = t3 = n = 0.0
    for movement in movements:
        stream = LoadMADSData(data_path, image_size, movement)
        e2, e3 = inferencer.evaluate_movement(
            stream, batch_size, device_cache_bytes=2 << 30)
        t2 += e2 * len(stream)
        t3 += e3 * len(stream)
        n += len(stream)
    return t2 / max(n, 1), t3 / max(n, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=18)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--eval_batch", type=int, default=16)
    ap.add_argument("--calib_batches", type=int, default=8,
                    help="sharp checkpoints need >=8 (r5 finding: 2 "
                         "batches cost +4.2 mm on the 55.3 mm flagship "
                         "vs +1.4 at 16)")
    ap.add_argument("--workdir", type=str, default=None)
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse existing checkpoint in workdir")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--ckpt", type=str, default=None,
                    help="evaluate this checkpoint dir instead of "
                         "training (e.g. a staged_convergence best); "
                         "requires --data_root")
    ap.add_argument("--data_root", type=str, default=None,
                    help="MADS-format dataset root for --ckpt eval")
    args = ap.parse_args()

    import tempfile
    import jax.numpy as jnp
    from fast3dhpe_tpu.apps.inference import CDRNetInferencer
    from fast3dhpe_tpu.data.stream import LoadMADSData
    from fast3dhpe_tpu.data.synthetic import make_synthetic_mads
    from fast3dhpe_tpu.train import loop_cdr, run_with_retries
    from fast3dhpe_tpu.train.checkpoint import load_variables
    from fast3dhpe_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    if args.ckpt:
        if not args.data_root:
            ap.error("--ckpt requires --data_root")
        root = args.data_root
        cfg = _make_cfg(root, args.layers, args.epochs, args.warmup,
                        args.batch, args.lr)
        ckpt = args.ckpt
    else:
        work = args.workdir or tempfile.mkdtemp(prefix="int8acc_")
        os.makedirs(work, exist_ok=True)
        root = f"{work}/data"
        if not os.path.isdir(os.path.join(root, "train")):
            make_synthetic_mads(root, n_frames=args.frames, img_w=256,
                                img_h=192)
        weights = f"{work}/weights"
        cfg = _make_cfg(root, args.layers, args.epochs, args.warmup,
                        args.batch, args.lr)
        best = os.path.join(weights, cfg.MODEL.NAME, "best")
        if not (args.skip_train and os.path.isdir(best)):
            t0 = time.time()
            resume = args.resume and os.path.isdir(
                os.path.join(weights, cfg.MODEL.NAME, "latest"))
            hist = run_with_retries(
                loop_cdr.run, cfg, retries=3, overwrite=not resume,
                resume=resume, weights_root=weights,
                compute_dtype="bfloat16",
                # CDR segment graphs crash this relay's worker
                # (CLAUDE.md r4)
                scan_epochs=False)
            post = (hist["val_mpjpe_3d"][args.warmup + 1:]
                    or hist["val_mpjpe_3d"])
            print(f"trained {args.epochs} ep in {time.time()-t0:.0f}s; "
                  f"best val 3D {min(post):.1f} mm", flush=True)
        ckpt = best if os.path.isdir(best) else \
            os.path.join(weights, cfg.MODEL.NAME, "latest")
    variables = load_variables(ckpt)

    valid_path = os.path.join(root, "valid")
    image_size = cfg.MODEL.IMAGE_SIZE
    # calibrate on TRAINING frames (standard PTQ hygiene — the val set
    # stays unseen by the quantizer)
    train_movement = sorted(os.path.basename(p) for p in glob.glob(
        os.path.join(root, "train", "*")) if os.path.isdir(p))[0]
    calib_stream = LoadMADSData(os.path.join(root, "train"), image_size,
                                train_movement)

    results = {}
    for mode in ("bf16", "int8"):
        inf = CDRNetInferencer(
            cfg, dtype=jnp.bfloat16, variables=variables,
            int8=(mode == "int8"), calib_stream=calib_stream,
            calib_batches=args.calib_batches)
        t0 = time.time()
        e2, e3 = _evaluate(inf, valid_path, image_size, args.eval_batch)
        results[mode] = {"mpjpe2d_px": round(e2, 2),
                         "mpjpe3d_mm": round(e3, 1)}
        print(f"[{mode}] val MPJPE2D {e2:.2f} px, MPJPE3D {e3:.1f} mm "
              f"({time.time()-t0:.0f}s)", flush=True)

    results["delta"] = {
        "mpjpe2d_px": round(results["int8"]["mpjpe2d_px"] -
                            results["bf16"]["mpjpe2d_px"], 2),
        "mpjpe3d_mm": round(results["int8"]["mpjpe3d_mm"] -
                            results["bf16"]["mpjpe3d_mm"], 1)}
    print(json.dumps({"int8_accuracy": results, "layers": args.layers,
                      "epochs": args.epochs,
                      "calib_batches": args.calib_batches}))


if __name__ == "__main__":
    main()
