"""CDRNet stereo 3D inference app. [ref: inference.py]

Two modes:
  - batched evaluation (default): streams the movement in device-sized
    batches, predicts 2D+3D, reports sequence MPJPE2D/MPJPE3D. This is the
    throughput path — the reference runs one frame at a time with
    per-frame matplotlib rendering [ref: inference.py:138-149].
  - --save_frames N: additionally renders the reference-style per-frame
    2D overlay + 3D skeleton plot and writes <movement>.gif + test.jpg.
"""

from __future__ import annotations

import argparse
import os
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import load_config
from ..models import CDRNet
from ..models.metrics import per_sample_mpjpe
from ..ops.warp import affine_warp, normalize_imagenet
from ..data.stream import LoadMADSData
from ..train.checkpoint import load_variables
from ..utils import save_gif
from ..utils.logging import setup_logger


class CDRNetInferencer:
    """Loads weights/<MODEL.NAME>/best{,.pth} and predicts stereo batches.

    With int8=True the forward runs the PTQ path (models/quantized.py,
    measured 1.4-1.7x at CDRNet conv shapes by the int8 MXU probe):
    `self.variables` then holds the quantized pack, calibrated from the
    first `calib_batches` batches of `calib_stream` (a LoadMADSData);
    every downstream jit is pack-agnostic — it passes `variables`
    through as an opaque pytree.
    """

    def __init__(self, config, weights_root: str = "weights",
                 dtype=jnp.float32, fused_inference: bool = False,
                 variables=None, int8: bool = False, calib_stream=None,
                 calib_batches: int = 8, int8_pack: str = None):
        # calib_batches default 8: the PTQ penalty grows with checkpoint
        # sharpness and shrinks with calibration data — at the 55.3 mm
        # flagship, 2 batches cost +4.2 mm 3D where 8 cost +1.7 and 16
        # +1.4 (BASELINE.md "Int8 PTQ serving accuracy", r5)
        self.config = config
        self.model = CDRNet.from_config(config, dtype=dtype,
                                        fused_inference=fused_inference)
        self.int8 = int8
        have_pack = int8 and int8_pack and os.path.exists(int8_pack)
        if variables is None and not have_pack:
            weight_path = os.path.join(weights_root, config.MODEL.NAME)
            variables = load_variables(weight_path)

        model = self.model
        if int8:
            from ..models import quantized as qz
            if have_pack:
                # pre-calibrated pack: no fp checkpoint needed at all
                variables = qz.load_pack(int8_pack)
            else:
                if calib_stream is None:
                    raise ValueError(
                        "int8=True requires calib_stream (a LoadMADSData "
                        "to draw calibration batches from) or an "
                        "existing int8_pack file")
                variables = self.build_int8_pack(
                    variables, calib_stream, n_batches=calib_batches)
                if int8_pack:
                    qz.save_pack(int8_pack, variables)
            depth = config.MODEL.NUM_LAYERS
            dlt = config.MODEL.EXTRA.DLT_METHOD

            def apply_fn(v, imgs, proj):
                return qz.cdrnet_int8_apply(v, imgs, proj, depth=depth,
                                            dlt_method=dlt)
        else:
            def apply_fn(v, imgs, proj):
                return model.apply(v, imgs, proj, train=False)
        self.variables = variables

        image_size = tuple(config.MODEL.IMAGE_SIZE)

        @jax.jit
        def _predict(variables, img_l, img_r, proj):
            imgs = jnp.stack([normalize_imagenet(img_l),
                              normalize_imagenet(img_r)], axis=1)
            return apply_fn(variables, imgs, proj)

        @jax.jit
        def _predict_raw(variables, img_l, img_r, trans, proj):
            # raw full-size frames: affine crop on device (host only
            # decoded JPEGs — same split as the training pipeline)
            wl = affine_warp(img_l, trans, image_size)
            wr = affine_warp(img_r, trans, image_size)
            imgs = jnp.stack([normalize_imagenet(wl),
                              normalize_imagenet(wr)], axis=1)
            return apply_fn(variables, imgs, proj)

        @jax.jit
        def _predict_eval(variables, img_l, img_r, trans, proj,
                          pose_3d, vis):
            # the whole per-batch eval — crop, forward, GT projection,
            # per-sample MPJPE — as ONE dispatch: unjitted jnp eval math
            # costs ~20 ms RPC PER OP through the axon relay, which made
            # a first cut of this loop 300x slower than its model step
            from ..geometry.camera import project_points
            pred_2d, pred_3d = _predict_raw(variables, img_l, img_r,
                                            trans, proj)
            gt_l = project_points(pose_3d, proj[:, 0])
            gt_r = project_points(pose_3d, proj[:, 1])
            e2, e3 = per_sample_mpjpe(pred_2d, pred_3d, pose_3d,
                                      gt_l, gt_r, vis)
            return e2, e3

        # gather-from-HBM wrapper + masked accumulator are shared with
        # the baseline app (apps.eval_loop)
        from .eval_loop import make_cached_eval, accum_eval
        _predict_eval_cached = make_cached_eval(_predict_eval)
        _accum_eval = accum_eval

        @jax.jit
        def _eval_movement_scan(variables, frames, idx_l, idx_r, trans,
                                proj, pose_3d, vis, n_valid):
            # the WHOLE movement as one dispatch: with frames resident in
            # HBM and all per-batch metadata stacked up front, a
            # lax.scan over the batches leaves nothing per-step on the
            # host — the per-batch dispatch+upload RPCs (~20 ms each on
            # this relay) otherwise cap the loop 10x below the step rate.
            # Args idx_*: (S, B); trans (S, B, 2, 3); proj (S, B, 2, 3, 4);
            # pose_3d (S, B, J, 3); vis (S, B, J); n_valid (S,).
            def body(carry, xs):
                t2, t3, n = carry
                il, ir, tr, pj, ps, vs, k = xs
                e2, e3 = _predict_eval_cached(variables, frames, il, ir,
                                              tr, pj, ps, vs)
                return _accum_eval(t2, t3, n, e2, e3, k), ()

            zero = jnp.zeros((), jnp.float32)
            (t2, t3, n), _ = jax.lax.scan(
                body, (zero, zero, zero),
                (idx_l, idx_r, trans, proj, pose_3d, vis, n_valid))
            return t2, t3, n

        self._predict = _predict
        self._predict_raw = _predict_raw
        self._predict_eval = _predict_eval
        self._predict_eval_cached = _predict_eval_cached
        self._accum_eval = _accum_eval
        self._eval_movement_scan = _eval_movement_scan

    @staticmethod
    def build_int8_pack(variables, calib_stream, n_batches: int = 2,
                        batch_size: int = 16):
        """Calibrate activation scales on real frames from
        `calib_stream` and quantize the checkpoint (PTQ)."""
        from ..models import quantized as qz
        calib = []
        for i, b in enumerate(calib_stream.batches(batch_size)):
            if i >= n_batches:
                break
            imgs = jnp.stack(
                [normalize_imagenet(jnp.asarray(b["img_l"])),
                 normalize_imagenet(jnp.asarray(b["img_r"]))], axis=1)
            calib.append((imgs, jnp.asarray(b["proj"], jnp.float32)))
        return qz.quantize_cdrnet(variables, calib)

    def predict_batch(self, img_l, img_r, proj, trans=None):
        """uint8 frames (B, H, W, 3) x2 + proj (B, 2, 3, 4) ->
        (pred_2d (B, 2, J, 2), pred_3d (B, J, 3)).

        With trans (B, 2, 3), frames are RAW (un-cropped) and the affine
        warp runs on device (stream.batches(device_warp=True))."""
        if trans is not None:
            return self._predict_raw(self.variables, jnp.asarray(img_l),
                                     jnp.asarray(img_r), jnp.asarray(trans),
                                     jnp.asarray(proj))
        return self._predict(self.variables, jnp.asarray(img_l),
                             jnp.asarray(img_r), jnp.asarray(proj))

    def evaluate_movement(self, stream: LoadMADSData, batch_size: int = 32,
                          device_cache_bytes: int = 0
                          ) -> Tuple[float, float]:
        """Sequence-average MPJPE2D (px) / MPJPE3D (mm), averaged per frame
        exactly like the reference loop [ref: inference.py:138-149].

        Sums accumulate ON DEVICE and the host fetches once at the end —
        a per-batch fetch would serialize the relay's ~20 ms RPC into
        every batch. With device_cache_bytes > 0 the movement's frames
        are resident in HBM and the WHOLE movement runs as a single
        lax.scan dispatch (stacked per-batch metadata, on-device index
        gather) — measured on this relay, even zero-sync per-batch
        dispatch left the loop 10x under the step rate on per-batch
        upload RPCs alone."""
        if device_cache_bytes:
            cache = stream.build_device_cache(device_cache_bytes)
            # partial caches can't stack the movement (misses would all
            # ride the scan upload) — the per-batch loop below consumes
            # the chained cached+streamed batches instead
            if cache is not None and not cache.partial:
                batches = list(stream.cached_batches(batch_size, cache))
                poses = np.stack([b["pose_3d"] for b in batches])
                vis = np.logical_and.reduce(
                    ~np.isnan(poses), axis=3).astype(np.float32)
                poses = np.nan_to_num(poses).astype(np.float32)
                il = np.stack([b["idx_l"] for b in batches])
                ir = np.stack([b["idx_r"] for b in batches])
                tr = np.stack([b["trans"] for b in batches])
                pj = np.stack([b["proj"] for b in batches]).astype(
                    np.float32)
                nv = np.asarray([b["n_valid"] for b in batches],
                                np.float32)
                # bucket the scan length: movements of different batch
                # counts S would each recompile the whole scan (minutes
                # on a relay link); zero-valid filler batches (masked
                # out by _accum_eval) cost ~one step of compute each,
                # and a multiple-of-8 S reuses one compiled graph for
                # `--movement all` and across runs
                pad = (-len(batches)) % 8
                if pad:
                    def _p(a):
                        return np.concatenate(
                            [a, np.repeat(a[-1:], pad, axis=0)])
                    il, ir, tr, pj = _p(il), _p(ir), _p(tr), _p(pj)
                    poses, vis = _p(poses), _p(vis)
                    nv = np.concatenate([nv, np.zeros(pad, np.float32)])
                t2, t3, nn = jax.device_get(self._eval_movement_scan(
                    self.variables, cache.frames, il, ir, tr, pj,
                    poses, vis, nv))
                return (float(t2) / max(float(nn), 1.0),
                        float(t3) / max(float(nn), 1.0))
        from .eval_loop import evaluate_stream
        return evaluate_stream(self.variables, self._predict_eval,
                               self._predict_eval_cached, stream,
                               batch_size, device_cache_bytes)

    def render_frames(self, stream: LoadMADSData, max_frames: int,
                      out_jpg: str = "test.jpg", batch_size: int = 32):
        """Reference-style per-frame visualization frames (RGB arrays);
        shared flow in utils.render [ref: inference.py:91-109]."""
        from ..utils.render import render_prediction_frames
        return render_prediction_frames(self.predict_batch, stream,
                                        max_frames, out_jpg, batch_size)


def main():
    from ..utils.runtime import enable_compilation_cache
    enable_compilation_cache()   # warm runs skip the remote XLA compile
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str,
                        default="configs/mads_3d.yaml")
    parser.add_argument("--movement", type=str, default="HipHop",
                        help="The movement video to inference, or 'all' to "
                             "evaluate every movement in --data_path")
    parser.add_argument("--save_frames", type=int, default=None,
                        help="Number of frames to render into a gif")
    parser.add_argument("--data_path", type=str,
                        default="data/MADS_extract/valid")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--device_cache_mb", type=int, default=2048,
                        help="HBM budget for the resident frame cache "
                             "(0 disables; oversized movements fall back "
                             "to streaming automatically)")
    parser.add_argument("--weights_root", type=str, default="weights")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (fp32 params)")
    parser.add_argument("--fused_inference", action="store_true",
                        help="run bandwidth-bound encoder blocks as fused "
                             "Pallas kernels (requires --bf16; see "
                             "docs/PERFORMANCE.md before enabling)")
    parser.add_argument("--int8", action="store_true",
                        help="serve the post-training-quantized int8 "
                             "path (calibrated on the first batches of "
                             "the first movement; accuracy delta: "
                             "scripts/int8_accuracy.py, BASELINE.md)")
    parser.add_argument("--int8_pack", type=str, default=None,
                        help="path to a .npz quantized pack: loaded if "
                             "it exists (skips calibration AND the fp "
                             "checkpoint), written after calibration "
                             "otherwise")
    parser.add_argument("--calib_batches", type=int, default=8,
                        help="PTQ calibration batches (sharp checkpoints "
                             "need >=8: 2 batches cost +4.2 mm 3D on the "
                             "55.3 mm flagship vs +1.4 at 16 — "
                             "BASELINE.md)")
    args = parser.parse_args()
    if args.fused_inference and not args.bf16:
        parser.error("--fused_inference requires --bf16 (the Pallas "
                     "kernels only engage on bfloat16 activations; "
                     "without it every block silently runs the plain "
                     "XLA path)")

    logger = setup_logger()
    config = load_config(args.config_path)

    if args.movement == "all":
        import glob as _glob
        movements = sorted(
            os.path.basename(p)
            for p in _glob.glob(os.path.join(args.data_path, "*"))
            if os.path.isdir(p))
    else:
        movements = [args.movement]

    calib_stream = None
    if args.int8 and not (args.int8_pack and
                          os.path.exists(args.int8_pack)):
        calib_stream = LoadMADSData(args.data_path,
                                    config.MODEL.IMAGE_SIZE, movements[0])
    inferencer = CDRNetInferencer(
        config, weights_root=args.weights_root,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        fused_inference=args.fused_inference,
        int8=args.int8, calib_stream=calib_stream,
        calib_batches=args.calib_batches,
        int8_pack=args.int8_pack)

    tot2 = tot3 = total_frames = 0.0
    for movement in movements:
        stream = LoadMADSData(args.data_path, config.MODEL.IMAGE_SIZE,
                              movement)
        logger.info("%d frames in %s", len(stream), movement)
        e2, e3 = inferencer.evaluate_movement(
            stream, args.batch_size,
            device_cache_bytes=args.device_cache_mb << 20)
        print(f"[{movement}] MPJPE2D: ", e2)
        print(f"[{movement}] MPJPE3D: ", e3)
        tot2 += e2 * len(stream)
        tot3 += e3 * len(stream)
        total_frames += len(stream)

        if args.save_frames:
            frames = inferencer.render_frames(stream, args.save_frames)
            save_gif(frames, f"{movement}.gif")
            logger.info("Wrote %s.gif (%d frames)", movement, len(frames))

    if len(movements) > 1 and total_frames:
        print("MPJPE2D (all): ", tot2 / total_frames)
        print("MPJPE3D (all): ", tot3 / total_frames)


if __name__ == "__main__":
    main()
