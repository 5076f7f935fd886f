"""Map the CDR-101 segment-graph compile cliff on the real relay.

Round-4 finding (CLAUDE.md): the CDRNet-101 SEGMENT graph at the full
inter-checkpoint span (E=25 train+eval epochs in one scan)
deterministically crashes this relay's TPU worker at compile time, while
the plain scan-EPOCH graph (E=1) compiles and runs. `--segment_epochs N`
(train/loop_cdr.py) was built so small segment graphs can recover the
dispatch-amortization win — but no run ever probed which N actually
compiles for CDR-101. This script answers that: for each N (largest
first) it runs a short stage-2-shaped training (flagship scale: 256px,
batch 16, bf16, 256-frame synthetic rig) with segment_epochs=N and
records compile-ok + measured pairs/s, waiting for the backend to
recover between a crashing probe and the next.

    python scripts/segment_probe.py [--ns 8,4,2] [--layers 101]

Output: one JSON line per probe + a summary line with the largest
working N. [ref: train_cdr.py:86-143 — the per-step host loop this
amortization beats]
"""

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=101)
    ap.add_argument("--ns", type=str, default="8,4,2",
                    help="segment lengths to probe, comma-separated; "
                         "probed in the given order (largest-first maps "
                         "the cliff fastest)")
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--segments_per_probe", type=int, default=2,
                    help="run 2*N epochs so the second segment measures "
                         "steady-state dispatch (first pays the compile)")
    ap.add_argument("--workdir", type=str, default="runs/segprobe")
    args = ap.parse_args()

    from fast3dhpe_tpu.config import config_from_dict
    from fast3dhpe_tpu.data.synthetic import make_synthetic_mads
    from fast3dhpe_tpu.train import loop_cdr
    from fast3dhpe_tpu.train.resilience import is_retryable, wait_for_backend
    from fast3dhpe_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    work = args.workdir
    os.makedirs(work, exist_ok=True)
    root = f"{work}/data"
    if not os.path.isdir(os.path.join(root, "train")):
        make_synthetic_mads(root, n_frames=args.frames, img_w=256,
                            img_h=192)

    results = []
    for n_str in args.ns.split(","):
        N = int(n_str)
        epochs = N * args.segments_per_probe
        cfg = config_from_dict({
            "DATASET": {"TYPE": "MADS_3d", "OCCLUSION": "CUTOUT",
                        "ROOT": root, "TRAIN_SET": "train",
                        "TEST_SET": "valid", "FLIP": True,
                        "ROT_FACTOR": 30, "SCALE_FACTOR": 0.25,
                        "CACHE_BYTES": 2 << 30,
                        "DEVICE_CACHE_BYTES": 4 << 30},
            "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": args.layers,
                      "NAME": f"segprobe{args.layers}_n{N}",
                      "PRETRAINED": "", "IMAGE_SIZE": [256, 256],
                      "EXTRA": {"TARGET_TYPE": "gaussian", "SIGMA": 3,
                                "HEATMAP_SIZE": [64, 64]}},
            "TRAIN": {"BATCH_SIZE": args.batch, "EPOCH": epochs,
                      "LR": 1e-3, "LR_STEP": [max(epochs - 1, 1)],
                      "LR_FACTOR": 0.1, "WARMUP": 0,
                      "LOSS_3D_WEIGHT": 4},
            "TEST": {"BATCH_SIZE": args.batch},
            "LOSS": {"USE_TARGET_WEIGHT": True,
                     "TYPE": "JointsMSESmooth"},
        })
        rec = {"probe": "cdr_segment", "layers": args.layers,
               "segment_epochs": N, "epochs": epochs}
        t0 = time.time()
        try:
            hist = loop_cdr.run(
                cfg, overwrite=True, weights_root=f"{work}/weights",
                compute_dtype="bfloat16", segment_epochs=N,
                checkpoint_every=epochs)
            pps = hist["train_pairs_per_sec"]
            # first segment's rate includes the compile; the later
            # segments are steady-state
            rec.update(ok=True, wall_s=round(time.time() - t0, 1),
                       pairs_per_sec_first=round(pps[0], 1),
                       pairs_per_sec_steady=round(pps[-1], 1),
                       final_mpjpe3d=round(hist["val_mpjpe_3d"][-1], 1))
        except Exception as e:              # noqa: BLE001 — recorded
            rec.update(ok=False, wall_s=round(time.time() - t0, 1),
                       error=str(e).splitlines()[0][:200],
                       retryable=is_retryable(e))
            if not is_retryable(e):
                traceback.print_exc()
        print(json.dumps(rec), flush=True)
        results.append(rec)
        if not rec["ok"] and rec.get("retryable"):
            # the crash takes the worker down for minutes; don't start
            # the next probe until it answers again
            print("waiting for backend recovery before next probe...",
                  flush=True)
            wait_for_backend(900.0, poll_s=30.0)

    working = [r["segment_epochs"] for r in results if r["ok"]]
    print(json.dumps({
        "summary": "cdr_segment_probe",
        "layers": args.layers,
        "largest_working_segment_epochs": max(working) if working else 0,
        "crashed_at": [r["segment_epochs"] for r in results
                       if not r["ok"]],
    }), flush=True)


if __name__ == "__main__":
    main()
