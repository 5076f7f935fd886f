"""Fused ResNet bottleneck block as a Pallas TPU kernel (inference).

Why: the small-channel encoder stages are HBM-BANDWIDTH-bound, not
MXU-bound. At stage1 shapes (64x64 spatial, 64/256 channels, encoder
batch 128) the three convs + BN + relu + residual of one bottleneck move
~1.3 GB of activations through HBM per block; a (M,64)x(64,256) matmul
measures at the 819 GB/s roofline (~10 TF/s), and XLA materializes every
intermediate. Measured on the v5e: stage1 costs ~6 ms of the 25 ms
CDRNet-101 step at 37 TF/s while its FLOPs need ~1.3 ms at stage3's rate.

This kernel runs the ENTIRE block per grid cell — conv1x1 + BN + relu,
conv3x3 (as 9-tap im2col matmul) + BN + relu, conv1x1 + BN, residual
(+ optional downsample conv1x1 + BN), relu — reading the input once and
writing the output once. BN is folded to scale/bias outside the kernel
(inference running stats). Traffic per block drops ~4x.

Scope: stride-1 Bottleneck blocks in inference mode (the training path
stays native XLA). Weights must fit VMEM alongside one sample's plane —
true for stage1/stage2 shapes; the gate in models/resnet.py checks.

[ref: models/encoder.py:38-76 — the reference gets these blocks from
cuDNN one op at a time; there is no fused equivalent to copy.]
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """BatchNorm(running stats) -> per-channel (s, b): y = x*s + b."""
    s = scale / jnp.sqrt(var + eps)
    return s.astype(jnp.float32), (bias - mean * s).astype(jnp.float32)


def _bottleneck_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                       b2_ref, w3_ref, s3_ref, b3_ref, wd_ref, sd_ref,
                       bd_ref, out_ref, hpad_ref, *, has_downsample: bool,
                       conv2_mode: str = "taps"):
    S, H, W, Cin = x_ref.shape
    P = w1_ref.shape[1]            # planes
    Cout = w3_ref.shape[1]         # 4 * planes
    x = x_ref[:]                   # (S, H, W, Cin)
    xm = x.reshape(S * H * W, Cin)

    # conv1 (1x1) + BN + relu   (scale/bias rows are (1, C), broadcast)
    h = jnp.dot(xm, w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h * s1_ref[:] + b1_ref[:], 0.0).astype(x.dtype)

    if conv2_mode == "taps":
        # conv2 (3x3, pad 1): write h into a zero-padded VMEM scratch
        # once, then accumulate 9 matmuls over STATIC spatial slices.
        # (A 9-tap channel-axis concat was measured 4x slower — 64-wide
        # lane-offset copies; spatial slices are sublane-cheap.)
        hpad_ref[:] = jnp.zeros_like(hpad_ref)
        hpad_ref[:, 1:H + 1, 1:W + 1, :] = h.reshape(S, H, W, P)

        def ky_body(ky, acc):
            # fori over ky (dim 1 is untiled — dynamic index allowed; a
            # fully unrolled 9-tap loop kept all tap loads live and blew
            # the 16MB VMEM stack; dim 2 is the sublane dim, so kx must
            # stay STATIC — Mosaic requires dynamic sublane indices to be
            # multiples of 8)
            for kx in range(3):
                t = hpad_ref[:, pl.ds(ky, H), kx:kx + W, :]
                tm = t.reshape(S * H * W, P)
                start = pl.multiple_of((ky * 3 + kx) * P, P)
                wtap = w2_ref[pl.ds(start, P), :]
                acc = acc + jnp.dot(tm, wtap,
                                    preferred_element_type=jnp.float32)
            return acc

        acc = jax.lax.fori_loop(0, 3, ky_body,
                                jnp.zeros((S * H * W, P), jnp.float32))
    else:
        # conv2_mode == "xpack": implicit-im2col with the kx axis PACKED
        # into channels — the scratch holds [h, h<<1x, h<<2x, 0] as a
        # (.., 4P)-channel tensor, so each ky needs ONE K=4P matmul
        # instead of three K=P ones (the round-2 anti-finding measured
        # the K=P taps at their own MXU envelope, still behind XLA's
        # implicit-im2col K=9P; this narrows the K gap to 4P~2.25x at
        # 25% padded-FLOP waste). Build cost: three big VMEM stores, one
        # of them at lane offset P (static half-tile offset).
        z = hpad_ref                     # (S, H+2, W+2, 4P)
        z[:] = jnp.zeros_like(z)
        hp = h.reshape(S, H, W, P)
        # slot c holds hpad shifted left by c: Z[y', x', cP:(c+1)P] =
        # hpad[y', x'+c] (zero where x'+c leaves the padded frame), so a
        # single spatial read Z[ky:ky+H, 0:W] yields the kx=0,1,2 taps
        # side by side in channels
        z[:, 1:H + 1, 1:W + 1, 0:P] = hp               # c=0 (aligned)
        z[:, 1:H + 1, 0:W, P:2 * P] = hp               # c=1 (offset P)
        z[:, 1:H + 1, 0:W - 1, 2 * P:3 * P] = hp[:, :, 1:, :]  # c=2

        def ky_body(ky, acc):
            t = z[:, pl.ds(ky, H), 0:W, :]             # (S, H, W, 4P)
            tm = t.reshape(S * H * W, 4 * P)
            wk = w2_ref[ky]                            # (4P, P)
            return acc + jnp.dot(tm, wk,
                                 preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(0, 3, ky_body,
                                jnp.zeros((S * H * W, P), jnp.float32))
    h2 = jnp.maximum(acc * s2_ref[:] + b2_ref[:], 0.0).astype(x.dtype)

    # conv3 (1x1) + BN. The residual add happens in the compute dtype
    # (bf16), exactly like the standard XLA path (nn.Conv(dtype=bf16)
    # emits bf16 before the add) — and it halves the VMEM working set.
    h3 = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32)
    h3 = (h3 * s3_ref[:] + b3_ref[:]).astype(x.dtype)

    # residual path
    if has_downsample:
        r = jnp.dot(xm, wd_ref[:], preferred_element_type=jnp.float32)
        r = (r * sd_ref[:] + bd_ref[:]).astype(x.dtype)
    else:
        r = xm

    out = jnp.maximum(h3 + r, jnp.zeros((), x.dtype))
    out_ref[:] = out.reshape(S, H, W, Cout)


@partial(jax.jit, static_argnames=("samples_per_cell", "interpret",
                                   "conv2_mode"))
def fused_bottleneck(x, w1, s1, b1, w2, s2, b2, w3, s3, b3,
                     wd=None, sd=None, bd=None, samples_per_cell: int = 1,
                     interpret: bool = False, conv2_mode: str = "taps"):
    """Stride-1 bottleneck block, fused, inference-mode BN.

    Args:
      x: (B, H, W, Cin).
      w1: (Cin, P); w2: (3, 3, P, P) HWIO; w3: (P, 4P);
      wd: optional (Cin, 4P) downsample 1x1 (required when Cin != 4P).
      s*/b*: folded BN scale/bias per conv (fold_bn).
      samples_per_cell: grid granularity (VMEM budget knob).
      conv2_mode: "taps" (9 accumulated K=P matmuls) or "xpack"
        (kx packed into channels: 3 accumulated K=4P matmuls over a 4x
        larger scratch — the implicit-im2col formulation; see kernel).
    Returns:
      (B, H, W, 4P) in x.dtype.
    """
    B, H, W, Cin = x.shape
    P = w1.shape[-1]
    Cout = w3.shape[-1]
    S = samples_per_cell
    if B % S:
        raise ValueError(f"batch {B} not divisible by samples_per_cell {S}")
    if conv2_mode not in ("taps", "xpack"):
        raise ValueError(f"unknown conv2_mode {conv2_mode!r}")
    has_ds = wd is not None
    if not has_ds and Cin != Cout:
        raise ValueError("identity residual requires Cin == Cout")

    dt = x.dtype
    if conv2_mode == "taps":
        # 3x3 kernel HWIO -> (9P, P) rows ordered like the tap loop
        w2m = jnp.asarray(w2, dt).reshape(9 * P, P)
    else:
        # (3, 4P, P): per ky, the kx taps stacked in K with a zero 4th
        # slot matching the scratch's packed channel layout
        w2m = jnp.zeros((3, 4 * P, P), dt)
        w2m = w2m.at[:, :3 * P, :].set(
            jnp.asarray(w2, dt).reshape(3, 3 * P, P))

    def vec(v):          # per-channel vectors as (1, C) rows (VMEM tiling)
        return jnp.asarray(v, jnp.float32).reshape(1, -1)

    args = [
        jnp.asarray(w1, dt), vec(s1), vec(b1),
        w2m, vec(s2), vec(b2),
        jnp.asarray(w3, dt), vec(s3), vec(b3),
    ]
    if has_ds:
        args += [jnp.asarray(wd, dt), vec(sd), vec(bd)]
    else:  # dummies (never read; has_downsample=False specializes the body)
        args += [jnp.zeros((Cin, Cout), dt),
                 jnp.zeros((1, Cout), jnp.float32),
                 jnp.zeros((1, Cout), jnp.float32)]

    wspecs = [pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                           memory_space=pltpu.VMEM) for a in args]

    scratch_ch = P if conv2_mode == "taps" else 4 * P
    out = pl.pallas_call(
        partial(_bottleneck_kernel, has_downsample=has_ds,
                conv2_mode=conv2_mode),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), dt),
        grid=(B // S,),
        in_specs=[pl.BlockSpec((S, H, W, Cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + wspecs,
        out_specs=pl.BlockSpec((S, H, W, Cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((S, H + 2, W + 2, scratch_ch), dt)],
        # xpack's 4P-channel scratch puts the stage1 working set 94KB
        # over Mosaic's default 16MB scoped-vmem limit; the v5e has
        # 128MB of VMEM, so grant the kernel a third of it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * P * (Cin + 9 * P + Cout
                                       + (Cin * Cout // P if has_ds else 0)),
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0),
    )(x, *args)
    return out


def bottleneck_reference(x, w1, s1, b1, w2, s2, b2, w3, s3, b3,
                         wd=None, sd=None, bd=None):
    """Pure-XLA oracle of the same fused-BN block (parity tests)."""
    dt = x.dtype

    def conv(h, w, k):
        pad = (k - 1) // 2
        return jax.lax.conv_general_dilated(
            h, w, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    h = conv(x, jnp.asarray(w1, dt).reshape(1, 1, *w1.shape), 1)
    h = jnp.maximum(h * s1 + b1, 0.0).astype(dt)
    h = conv(h, jnp.asarray(w2, dt), 3)
    h = jnp.maximum(h * s2 + b2, 0.0).astype(dt)
    h = conv(h, jnp.asarray(w3, dt).reshape(1, 1, *w3.shape), 1)
    h = h * s3 + b3
    if wd is not None:
        r = conv(x, jnp.asarray(wd, dt).reshape(1, 1, *wd.shape), 1)
        r = r * sd + bd
    else:
        r = x.astype(jnp.float32)
    return jnp.maximum(h + r, 0.0).astype(dt)
