"""Int8 post-training-quantized (PTQ) inference for PoseResNet / CDRNet.

Why: bf16 inference sits at 100% of its intensity roofline on v5e
(docs/PERFORMANCE.md) — the only lever left is changing the numbers.
int8 halves every activation/weight byte AND doubles MXU peak; the probe
(scripts/int8_probe.py) measured the quantized path real at 1.4-1.7x for
CDRNet conv shapes, requant epilogue included.

Design (TPU-first, no reference analogue — the reference serves fp32
torch [ref: inference.py:49-56]):
- One shared structural WALK of the network (stem -> residual stages ->
  deconv decoder) drives two executors: a CALIBRATION context that runs
  the BN-folded fp32 forward and records the max-abs of every tensor
  that will live as int8, and an INT8 context that runs the quantized
  graph. Scale bookkeeping therefore can't drift from the executed graph.
- Weights: per-output-channel symmetric int8 (BN folded first).
- Activations: per-tensor symmetric int8; residual adds and the final
  heatmap conv output stay in fp32 epilogue space (the sensitive spots),
  so blocks consume/produce int8 but fuse their adds at full precision.
- CDRNet: the encoder and decoder (~99% of FLOPs) run int8; the
  CanonicalFusion trunk (1x1 convs + FTL at 8x8 — tiny) stays bf16, and
  soft-argmax / DLT stay fp32 exactly as in the bf16 model
  (models/cdrnet.py:201-216).

The quantized pack is a plain pytree (int8 kernels, fp32 per-channel
weight scales + biases, 0-d activation scales), so ``jax.jit`` the apply
functions directly and pass the pack as an argument — nothing large is
closed over (relay HTTP-413 trap, CLAUDE.md).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .resnet import RESNET_SPEC, BASIC_EXPANSION, BOTTLENECK_EXPANSION
from .cdrnet import CanonicalFusion
from ..geometry.triangulation import dlt_triangulate, pinv_projection
from ..ops.heatmap import soft_argmax
from ..ops import quant as Q

# ---------------------------------------------------------------------------
# BN-folded fp layer extraction from flax variables
# ---------------------------------------------------------------------------


def _fold_module(params, stats, conv: str, bn: Optional[str],
                 out_axis: int = -1):
    """One conv (+ optional BN) -> {"w": folded fp32 kernel, "b": (K,)}."""
    w = params[conv]["kernel"]
    if bn is None:
        b = params[conv].get("bias")
        if b is None:
            b = jnp.zeros((w.shape[out_axis],), jnp.float32)
        return {"w": w.astype(jnp.float32), "b": b.astype(jnp.float32)}
    wf, bf = Q.fold_bn(w, params[bn]["scale"], params[bn]["bias"],
                       stats[bn]["mean"], stats[bn]["var"],
                       out_axis=out_axis)
    return {"w": wf, "b": bf}


def _extract_backbone(variables) -> Tuple[Dict[str, Any], int]:
    """Flatten encoder+decoder params into name -> folded fp layer dict.

    Names mirror the flax module tree (models/resnet.py naming) so the
    pack is self-describing: encoder.conv1, encoder.layer{s}_{i}.conv{n},
    decoder.deconv{n}, decoder.final_layer.
    """
    p, st = variables["params"], variables["batch_stats"]
    enc_p, enc_s = p["encoder"], st["encoder"]
    layers: Dict[str, Any] = {}
    layers["encoder.conv1"] = _fold_module(enc_p, enc_s, "conv1", "bn1")

    # infer depth from the block structure rather than trusting a config
    n_blocks = {s: sum(1 for k in enc_p if k.startswith(f"layer{s}_"))
                for s in (1, 2, 3, 4)}
    counts = tuple(n_blocks[s] for s in (1, 2, 3, 4))
    is_bottleneck = "conv3" in enc_p["layer1_0"]
    depth = next(k for k, (blk, c) in RESNET_SPEC.items()
                 if c == counts and (blk == "bottleneck") == is_bottleneck)

    block, sizes = RESNET_SPEC[depth]
    for stage, blocks in enumerate(sizes, start=1):
        for i in range(blocks):
            name = f"layer{stage}_{i}"
            bp, bs = enc_p[name], enc_s[name]
            pre = f"encoder.{name}"
            n_convs = 3 if block == "bottleneck" else 2
            for n in range(1, n_convs + 1):
                layers[f"{pre}.conv{n}"] = _fold_module(
                    bp, bs, f"conv{n}", f"bn{n}")
            if "downsample_conv" in bp:
                layers[f"{pre}.downsample"] = _fold_module(
                    bp, bs, "downsample_conv", "downsample_bn")

    dec_p, dec_s = p["decoder"], st["decoder"]
    for i in (1, 2, 3):
        layers[f"decoder.deconv{i}"] = _fold_module(
            dec_p, dec_s, f"deconv{i}", f"deconv{i}_bn", out_axis=2)
    layers["decoder.final_layer"] = _fold_module(
        dec_p, dec_s, "final_layer", None)
    return layers, depth


# ---------------------------------------------------------------------------
# Executors
# ---------------------------------------------------------------------------


class _CalibCtx:
    """BN-folded fp32 executor that records |t| statistics at every
    point where the int8 executor will hold an int8 tensor."""

    def __init__(self, layers, percentile=None):
        self.layers = layers
        self.percentile = percentile
        self.stats: Dict[str, jnp.ndarray] = {}

    def _rec(self, name, t):
        self.stats[name] = Q.abs_stat(t, self.percentile)
        return t

    def quant_input(self, x):
        return self._rec("input", x.astype(jnp.float32))

    def _conv_fp(self, name, x, stride, pad):
        l = self.layers[name]
        dn = jax.lax.conv_dimension_numbers(
            x.shape, l["w"].shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, l["w"], (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=dn)
        return y + l["b"]

    def conv(self, name, x, stride, pad, relu, requant_out):
        y = self._conv_fp(name, x, stride, pad)
        if relu:
            y = jax.nn.relu(y)
        if requant_out:
            y = self._rec(name, y)
        return y

    def deconv(self, name, x):
        l = self.layers[name]
        kh = l["w"].shape[0]
        ph = kh - 1 - 1
        y = jax.lax.conv_transpose(
            x, l["w"], (2, 2), ((ph, ph), (ph, ph)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True)
        return self._rec(name, jax.nn.relu(y + l["b"]))

    def add_relu_requant(self, name, acc, residual):
        return self._rec(name, jax.nn.relu(acc + residual))

    def dequant(self, x):
        return x

    def maxpool(self, x):
        # same padding semantics as layers.max_pool_torch; inputs are
        # post-ReLU so the pad value never wins
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))

    def requantize_external(self, name, x):
        """fp tensor entering the int8 domain from outside (CF output)."""
        return self._rec(name, x.astype(jnp.float32))


class _Int8Ctx:
    """Quantized executor. Activations travel as (int8, scale) pairs;
    scales are 0-d fp32 arrays from the pack, so the whole apply is one
    jittable pytree function."""

    def __init__(self, pack):
        self.layers = pack["layers"]
        self.scales = pack["scales"]

    def quant_input(self, x):
        s = self.scales["input"]
        return Q.requant(x.astype(jnp.float32), s), s

    def _epilogue(self, name, acc_i32, s_in):
        l = self.layers[name]
        return acc_i32.astype(jnp.float32) * (l["sw"] * s_in) + l["b"]

    def conv(self, name, xs, stride, pad, relu, requant_out):
        x8, s_in = xs
        y = self._epilogue(name, Q.conv_i8(x8, self.layers[name]["w"],
                                           stride, pad), s_in)
        if relu:
            y = jax.nn.relu(y)
        if requant_out:
            s = self.scales[name]
            return Q.requant(y, s), s
        return y                                   # fp32 epilogue space

    def deconv(self, name, xs):
        x8, s_in = xs
        y = self._epilogue(
            name, Q.conv_transpose_i8(x8, self.layers[name]["w"]), s_in)
        s = self.scales[name]
        return Q.requant(jax.nn.relu(y), s), s

    def add_relu_requant(self, name, acc, residual):
        s = self.scales[name]
        return Q.requant(jax.nn.relu(acc + residual), s), s

    def dequant(self, xs):
        x8, s = xs
        return Q.dequant(x8, s)

    def maxpool(self, xs):
        x8, s = xs
        return Q.max_pool_i8(x8), s

    def requantize_external(self, name, x):
        s = self.scales[name]
        return Q.requant(x.astype(jnp.float32), s), s


# ---------------------------------------------------------------------------
# The shared structural walk
# ---------------------------------------------------------------------------


def _basic_block(ctx, pre, x, stride, downsample):
    h = ctx.conv(f"{pre}.conv1", x, stride, 1, relu=True, requant_out=True)
    acc = ctx.conv(f"{pre}.conv2", h, 1, 1, relu=False, requant_out=False)
    if downsample:
        res = ctx.conv(f"{pre}.downsample", x, stride, 0,
                       relu=False, requant_out=False)
    else:
        res = ctx.dequant(x)
    return ctx.add_relu_requant(pre, acc, res)


def _bottleneck_block(ctx, pre, x, stride, downsample):
    h = ctx.conv(f"{pre}.conv1", x, 1, 0, relu=True, requant_out=True)
    h = ctx.conv(f"{pre}.conv2", h, stride, 1, relu=True, requant_out=True)
    acc = ctx.conv(f"{pre}.conv3", h, 1, 0, relu=False, requant_out=False)
    if downsample:
        res = ctx.conv(f"{pre}.downsample", x, stride, 0,
                       relu=False, requant_out=False)
    else:
        res = ctx.dequant(x)
    return ctx.add_relu_requant(pre, acc, res)


def _encoder_walk(ctx, x, depth):
    """images (already quantized by ctx.quant_input) -> encoder features."""
    x = ctx.conv("encoder.conv1", x, 2, 3, relu=True, requant_out=True)
    x = ctx.maxpool(x)
    block, sizes = RESNET_SPEC[depth]
    fn = _bottleneck_block if block == "bottleneck" else _basic_block
    expansion = (BOTTLENECK_EXPANSION if block == "bottleneck"
                 else BASIC_EXPANSION)
    inplanes = 64
    for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), sizes), start=1):
        stride = 1 if stage == 1 else 2
        for i in range(blocks):
            s = stride if i == 0 else 1
            downsample = (i == 0 and
                          (s != 1 or inplanes != planes * expansion))
            x = fn(ctx, f"encoder.layer{stage}_{i}", x, s, downsample)
            inplanes = planes * expansion
    return x


def _decoder_walk(ctx, x):
    for i in (1, 2, 3):
        x = ctx.deconv(f"decoder.deconv{i}", x)
    # final 1x1 conv: int8 in, fp32 heatmaps out — never requantized
    return ctx.conv("decoder.final_layer", x, 1, 0,
                    relu=False, requant_out=False)


# ---------------------------------------------------------------------------
# Calibration + conversion
# ---------------------------------------------------------------------------


def _max_merge(acc, new):
    if acc is None:
        return new
    return {k: jnp.maximum(acc[k], new[k]) for k in new}


def _act_scales(stats):
    """max-abs stats -> per-tensor scales; a floor guards all-zero
    calibration tensors (dead layer) from a divide-by-zero requant."""
    return {k: jnp.maximum(v / Q.INT8_MAX, 1e-12).astype(jnp.float32)
            for k, v in stats.items()}


def _quantize_layers(fp_layers):
    out = {}
    for name, l in fp_layers.items():
        out_axis = 2 if ".deconv" in name else -1
        q, sw = Q.quantize_kernel(l["w"], out_axis=out_axis)
        out[name] = {"w": q, "sw": sw, "b": l["b"]}
    return out


def poseresnet_fp_folded_apply(variables, imgs):
    """BN-folded fp32 forward (test/debug reference): must match
    model.apply(..., train=False) in fp32 up to fold associativity."""
    layers, depth = _extract_backbone(variables)
    ctx = _CalibCtx(layers)
    x = ctx.quant_input(imgs.astype(jnp.float32))
    return _decoder_walk(ctx, _encoder_walk(ctx, x, depth))


def quantize_poseresnet(variables, calib_images: List[Any],
                        percentile: Optional[float] = None):
    """PTQ a trained PoseResNet. calib_images: list of (B,H,W,3)
    normalized image batches (a handful is enough for max-abs)."""
    fp_layers, depth = _extract_backbone(variables)

    @jax.jit
    def calib(layers, imgs):
        ctx = _CalibCtx(layers, percentile)
        x = ctx.quant_input(imgs)
        z = _encoder_walk(ctx, x, depth)
        _decoder_walk(ctx, z)
        return ctx.stats

    stats = None
    for imgs in calib_images:
        stats = _max_merge(stats, calib(fp_layers, jnp.asarray(imgs)))
    return {"layers": _quantize_layers(fp_layers),
            "scales": _act_scales(stats),
            "depth": depth}


def poseresnet_int8_apply(pack, imgs, depth: int):
    """Quantized PoseResNet forward: (B,H,W,3) fp -> (B,h,w,J) fp32."""
    ctx = _Int8Ctx(pack)
    x = ctx.quant_input(imgs)
    z = _encoder_walk(ctx, x, depth)
    return _decoder_walk(ctx, z)


def _cf_module(cf_params, n_views=2):
    in_dim = cf_params["out_layer0"]["kernel"].shape[-1]
    hid_ch1 = cf_params["conv_layer1"]["kernel"].shape[-1]
    hid_ch2 = cf_params["conv_layer2_0"]["kernel"].shape[-1]
    return CanonicalFusion(in_dim=in_dim, hid_ch1=hid_ch1,
                           hid_ch2=hid_ch2, n_views=n_views,
                           dtype=jnp.bfloat16)


def _cf_apply(cf_vars, z, B, V, projs, proj_inv):
    """Run the bf16 CanonicalFusion trunk on (B*V,h,w,C) fp features."""
    fh, fw, C = z.shape[1], z.shape[2], z.shape[3]
    zs = z.reshape(B, V, fh, fw, C).astype(jnp.bfloat16)
    fused = _cf_module(cf_vars["params"], V).apply(
        cf_vars, zs, projs, proj_inv, False)
    return fused.reshape(B * V, fh, fw, C)


def quantize_cdrnet(variables, calib_batches: List[Tuple[Any, Any]],
                    percentile: Optional[float] = None):
    """PTQ a trained CDRNet. calib_batches: list of (imgs (B,V,H,W,3),
    projs (B,V,3,4)) normalized batches."""
    fp_layers, depth = _extract_backbone(variables)
    cf_vars = {"params": variables["params"]["CF"],
               "batch_stats": variables["batch_stats"]["CF"]}

    @jax.jit
    def calib(layers, cf, imgs, projs):
        B, V = imgs.shape[0], imgs.shape[1]
        ctx = _CalibCtx(layers, percentile)
        x = ctx.quant_input(
            imgs.reshape((B * V,) + imgs.shape[2:]))
        z = _encoder_walk(ctx, x, depth)
        fused = _cf_apply(cf, z, B, V, projs, pinv_projection(projs))
        f = ctx.requantize_external("cf_out", fused)
        _decoder_walk(ctx, f)
        return ctx.stats

    stats = None
    for imgs, projs in calib_batches:
        stats = _max_merge(stats, calib(fp_layers, cf_vars,
                                        jnp.asarray(imgs),
                                        jnp.asarray(projs)))
    return {"layers": _quantize_layers(fp_layers),
            "scales": _act_scales(stats),
            "cf": cf_vars,
            "depth": depth}


def cdrnet_int8_apply(pack, imgs, projs, depth: int,
                      dlt_method: str = "jacobi",
                      return_heatmaps: bool = False):
    """Quantized CDRNet forward, same contract as CDRNet.__call__
    (models/cdrnet.py:160-221): returns (pred_2d, pred_3d[, heatmaps])."""
    B, V, H, W, _ = imgs.shape
    img_size = H
    ctx = _Int8Ctx(pack)

    x = ctx.quant_input(imgs.reshape(B * V, H, W, 3))
    z = _encoder_walk(ctx, x, depth)
    proj_inv = pinv_projection(projs)
    fused = _cf_apply(pack["cf"], ctx.dequant(z), B, V, projs, proj_inv)
    f = ctx.requantize_external("cf_out", fused)
    h = _decoder_walk(ctx, f)                      # (B*V, hh, hw, J) fp32

    heatmap_size = h.shape[1]
    num_joints = h.shape[-1]
    kp = soft_argmax(h.astype(jnp.float32))
    kp = kp * (img_size / heatmap_size)
    kp = kp.reshape(B, V, num_joints, 2)
    proj_j = jnp.broadcast_to(projs[:, None], (B, num_joints, V, 3, 4))
    kp_j = jnp.swapaxes(kp, 1, 2)
    pred_3d = dlt_triangulate(proj_j, kp_j, method=dlt_method)
    if return_heatmaps:
        hm = h.reshape(B, V, heatmap_size, h.shape[2], num_joints)
        return kp, pred_3d, hm
    return kp, pred_3d


def save_pack(path: str, pack) -> None:
    """Persist a quantized pack as one .npz (int8 kernels + scales +
    the bf16 CF variables), so serving can skip calibration. The pack
    is a pure nested dict of arrays/ints with string keys, flattened to
    '/'-joined paths."""
    import numpy as np

    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", pack)
    np.savez(path, **flat)


def load_pack(path: str):
    """Inverse of save_pack; returns the pack with jnp leaves."""
    import numpy as np

    with np.load(path) as z:
        pack: dict = {}
        for key in z.files:
            parts = key.split("/")
            node = pack
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            leaf = z[key]
            node[parts[-1]] = (int(leaf) if parts[-1] == "depth"
                               else jnp.asarray(leaf))
    return pack


def jit_cdrnet_int8(pack, dlt_method: str = "jacobi"):
    """Convenience: a jitted (imgs, projs) -> (pred_2d, pred_3d) closure
    with the pack passed as a captured ARGUMENT pytree (donate-free,
    nothing baked into the graph)."""
    depth = int(pack["depth"])
    fn = jax.jit(functools.partial(cdrnet_int8_apply, depth=depth,
                                   dlt_method=dlt_method))
    return lambda imgs, projs: fn(pack, imgs, projs)
