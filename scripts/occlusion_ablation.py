"""Occlusion-augmentation efficacy study (real TPU).

The reference's headline contribution is robustness from Cutout /
Hide-and-Seek training augmentation [ref: README.md:7-9,
tools/augmentation.py:5-105, dataset/mads_3d.py:218-221]. This script
DEMONSTRATES that claim on the synthetic rig: it trains CDRNet twice
under the identical protocol — OCCLUSION: None vs CUTOUT — then
evaluates both best checkpoints on (a) the clean val set and (b) a
deterministically occluded variant of the same val set (train-equivalent
cutout holes, fixed PRNG key, gray fill in the normalized domain). The
with-occlusion model should degrade less under occluded eval.

    python scripts/occlusion_ablation.py [--layers 18] [--epochs 40] \
        [--workdir runs/occl] [--skip_train]

Results are recorded in BASELINE.md. Serializes all TPU jobs (relay
constraint: never two TPU clients at once).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_cfg(mode, root, layers, epochs, warmup, batch, lr):
    from fast3dhpe_tpu.config import config_from_dict
    return config_from_dict({
        "DATASET": {"TYPE": "MADS_3d", "ROOT": root, "TRAIN_SET": "train",
                    "TEST_SET": "valid", "FLIP": True, "ROT_FACTOR": 30,
                    "SCALE_FACTOR": 0.25,
                    "OCCLUSION": "CUTOUT" if mode == "cutout" else (
                        "HNS" if mode == "hns" else "None"),
                    "CACHE_BYTES": 2 << 30,
                    "DEVICE_CACHE_BYTES": 4 << 30},
        "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": layers,
                  "NAME": f"occl_{mode}_{layers}", "PRETRAINED": "",
                  "IMAGE_SIZE": [256, 256],
                  "EXTRA": {"TARGET_TYPE": "gaussian", "SIGMA": 3,
                            "HEATMAP_SIZE": [64, 64]}},
        "TRAIN": {"BATCH_SIZE": batch, "EPOCH": epochs, "LR": lr,
                  "LR_STEP": [int(epochs * 0.7)], "LR_FACTOR": 0.1,
                  "WARMUP": warmup, "LOSS_3D_WEIGHT": 4},
        "TEST": {"BATCH_SIZE": batch},
        "LOSS": {"USE_TARGET_WEIGHT": True, "TYPE": "JointsMSESmooth"},
    })


def _evaluate(cfg, ckpt_dir, occl_holes, occl_length, seed=123):
    """(clean_mpjpe3d, occluded_mpjpe3d, clean_2d, occluded_2d) for the
    checkpoint, evaluated over the full val split.

    Occluded eval applies the SAME hole distribution the CUTOUT training
    path uses (ops.occlusion.cutout defaults) to EVERY sample with a
    fixed key — but on the loader's already-normalized images, so holes
    are filled with normalize_imagenet(128) instead of raw 128."""
    import jax
    import jax.numpy as jnp
    import optax

    from fast3dhpe_tpu.data import load_data
    from fast3dhpe_tpu.models import CDRNet, make_loss
    from fast3dhpe_tpu.ops.occlusion import cutout
    from fast3dhpe_tpu.ops.warp import normalize_imagenet
    from fast3dhpe_tpu.train.checkpoint import load_variables
    from fast3dhpe_tpu.train.state import TrainState
    from fast3dhpe_tpu.train.steps import make_eval_step_cdr
    from fast3dhpe_tpu.train.loop_cdr import SCALE_3D, BASE_JOINT

    model = CDRNet.from_config(cfg, dtype=jnp.bfloat16)
    variables = load_variables(ckpt_dir)
    state = TrainState.create(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, optax.sgd(0.0))
    loss_fn = make_loss(cfg.LOSS.TYPE, cfg.LOSS.USE_TARGET_WEIGHT)
    eval_step = make_eval_step_cdr(
        model, loss_fn, loss_3d_weight=cfg.TRAIN.LOSS_3D_WEIGHT,
        scale_3d=SCALE_3D, base_joint=BASE_JOINT,
        num_joints=cfg.MODEL.NUM_JOINTS)

    gray = normalize_imagenet(jnp.full((1, 1, 1, 3), 128.0, jnp.float32))

    @jax.jit
    def occluded_eval_step(state, batch, key):
        img = batch["image"]                       # (B, 2, H, W, 3), normed
        B, V, H, W, C = img.shape
        _, keep = cutout(key, jnp.zeros((B * V, H, W, 1)),
                         n_holes=occl_holes, length=occl_length)
        hole = (~keep).reshape(B, V, H, W)
        occluded = jnp.where(hole[..., None], gray.astype(img.dtype), img)
        return eval_step(state, dict(batch, image=occluded),
                         jnp.asarray(True))

    _, valid_loader = load_data(cfg)
    acc = {"clean": None, "occl": None}
    base_key = jax.random.PRNGKey(seed)
    for i, batch in enumerate(valid_loader):
        mc = eval_step(state, batch, jnp.asarray(True))
        mo = occluded_eval_step(state, batch,
                                jax.random.fold_in(base_key, i))
        for name, m in (("clean", mc), ("occl", mo)):
            part = {"e2_sum": m["e2_sum"], "e3_sum": m["e3_sum"],
                    "n": m["n"]}
            acc[name] = part if acc[name] is None else \
                jax.tree_util.tree_map(jnp.add, acc[name], part)
    out = {}
    for name in ("clean", "occl"):
        h = jax.device_get(acc[name])
        n = max(float(h["n"]), 1.0)
        out[name] = (float(h["e3_sum"]) / n, float(h["e2_sum"]) / n)
    return out["clean"][0], out["occl"][0], out["clean"][1], out["occl"][1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=18)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--modes", type=str, default="none,cutout",
                    help="comma list of {none,cutout,hns}")
    ap.add_argument("--eval_holes", type=int, default=6)
    ap.add_argument("--eval_length", type=int, default=40)
    ap.add_argument("--checkpoint_every", type=int, default=10)
    ap.add_argument("--workdir", type=str, default=None)
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse existing checkpoints in workdir")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--segments", action="store_true",
                    help="allow the scan-segment path (default per-batch: "
                         "the CDR segment compile crashed the relay's TPU "
                         "worker in r4 — see CLAUDE.md; per-batch CDR-18 "
                         "epochs are ~3 s here anyway)")
    args = ap.parse_args()

    import tempfile
    from fast3dhpe_tpu.data.synthetic import make_synthetic_mads
    from fast3dhpe_tpu.train import loop_cdr, run_with_retries
    from fast3dhpe_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    work = args.workdir or tempfile.mkdtemp(prefix="occl_abl_")
    os.makedirs(work, exist_ok=True)
    root = f"{work}/data"
    if not os.path.isdir(os.path.join(root, "train")):
        make_synthetic_mads(root, n_frames=args.frames, img_w=256,
                            img_h=192)
    weights = f"{work}/weights"

    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    results = {}
    for mode in modes:
        cfg = _make_cfg(mode, root, args.layers, args.epochs, args.warmup,
                        args.batch, args.lr)
        name = cfg.MODEL.NAME
        best = os.path.join(weights, name, "best")
        if not (args.skip_train and os.path.isdir(best)):
            t0 = time.time()
            resume = args.resume and os.path.isdir(
                os.path.join(weights, name, "latest"))
            hist = run_with_retries(
                loop_cdr.run, cfg, retries=3, overwrite=not resume,
                resume=resume, weights_root=weights,
                compute_dtype="bfloat16",
                scan_epochs=None if args.segments else False,
                checkpoint_every=args.checkpoint_every)
            post = (hist["val_mpjpe_3d"][args.warmup + 1:]
                    or hist["val_mpjpe_3d"])
            print(f"[{mode}] trained {args.epochs} ep in "
                  f"{time.time()-t0:.0f}s; best val 3D "
                  f"{min(post):.1f} mm", flush=True)
        ckpt = best if os.path.isdir(best) else \
            os.path.join(weights, name, "latest")
        c3, o3, c2, o2 = _evaluate(cfg, ckpt, args.eval_holes,
                                   args.eval_length)
        results[mode] = {
            "clean_mpjpe3d_mm": round(c3, 1),
            "occluded_mpjpe3d_mm": round(o3, 1),
            "clean_mpjpe2d_px": round(c2, 2),
            "occluded_mpjpe2d_px": round(o2, 2),
            "degradation_mm": round(o3 - c3, 1),
        }
        print(f"[{mode}] clean {c3:.1f} mm -> occluded {o3:.1f} mm "
              f"(degradation {o3-c3:+.1f} mm)", flush=True)

    print(json.dumps({"occlusion_ablation": results,
                      "layers": args.layers, "epochs": args.epochs,
                      "eval": {"n_holes": args.eval_holes,
                               "length": args.eval_length}}))


if __name__ == "__main__":
    main()
