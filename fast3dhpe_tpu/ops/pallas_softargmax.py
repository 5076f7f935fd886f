"""Fused Pallas TPU kernel for the soft-argmax decode.

The differentiable keypoint decode [ref: models/cdrnet.py:120-149] is
softmax over H*W followed by two weighted reductions. The XLA lowering
materializes the (B, H, W, J) probability tensor in HBM between the
softmax and the reductions; this kernel keeps one (H, W, J) tile resident
in VMEM per batch element and emits only the (J,) centroids.

A closed-form custom VJP replaces autodiff through the softmax:
    d cx / d h_k = p_k * (x_k - cx)
so the backward pass is a single fused elementwise kernel over the saved
logits — no softmax-jacobian intermediates.

Falls back to the pure-jnp implementation off-TPU (the kernel itself is
also validated against it in tests via interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _softargmax_fwd_kernel(h_ref, cx_ref, cy_ref):
    # h block: (1, H, W, J); cx/cy blocks cover the FULL (B, J) output
    # (TPU block shapes must tile (8, 128) or equal the array dims, which
    # (1, J) does not) — each program writes its own row.
    i = pl.program_id(0)
    h = h_ref[0]                                         # (H, W, J)
    H, W, J = h.shape
    m = jnp.max(h, axis=(0, 1), keepdims=True)
    p = jnp.exp(h - m)
    s = jnp.sum(p, axis=(0, 1))                          # (J,)
    # tpu.iota only produces integers — generate int32 and convert
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W, J), 1).astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W, J), 0).astype(jnp.float32)
    cx_ref[i, :] = jnp.sum(xs * p, axis=(0, 1)) / s
    cy_ref[i, :] = jnp.sum(ys * p, axis=(0, 1)) / s


def _softargmax_bwd_kernel(h_ref, g_ref, dh_ref):
    """dL/dh = p * (gx*(x - cx) + gy*(y - cy)), recomputing p from h."""
    h = h_ref[0]                                         # (H, W, J)
    H, W, J = h.shape
    m = jnp.max(h, axis=(0, 1), keepdims=True)
    e = jnp.exp(h - m)
    s = jnp.sum(e, axis=(0, 1), keepdims=True)
    p = e / s
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W, J), 1).astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W, J), 0).astype(jnp.float32)
    cx = jnp.sum(xs * p, axis=(0, 1), keepdims=True)
    cy = jnp.sum(ys * p, axis=(0, 1), keepdims=True)
    gx = g_ref[0, :, 0][None, None, :]                   # (1, 1, J)
    gy = g_ref[0, :, 1][None, None, :]
    dh_ref[0] = p * (gx * (xs - cx) + gy * (ys - cy))


def _fwd_pallas(heatmaps, interpret=False):
    B, H, W, J = heatmaps.shape
    cx, cy = pl.pallas_call(
        _softargmax_fwd_kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, J), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((B, J), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((B, J), jnp.float32)] * 2,
        interpret=interpret,
    )(heatmaps)
    return jnp.stack([cx, cy], axis=-1)


def _bwd_pallas(heatmaps, g, interpret=False):
    B, H, W, J = heatmaps.shape
    return pl.pallas_call(
        _softargmax_bwd_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, J), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, J, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, J), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, J), jnp.float32),
        interpret=interpret,
    )(heatmaps, g)


def _jnp_soft_argmax(heatmaps):
    B, H, W, J = heatmaps.shape
    flat = heatmaps.reshape(B, H * W, J)
    flat = flat - jax.lax.stop_gradient(
        jnp.max(flat, axis=1, keepdims=True))
    p = jnp.exp(flat)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    p = p.reshape(B, H, W, J)
    xs = jnp.arange(W, dtype=p.dtype)
    ys = jnp.arange(H, dtype=p.dtype)
    cx = jnp.einsum("bhwj,w->bj", p, xs)
    cy = jnp.einsum("bhwj,h->bj", p, ys)
    return jnp.stack([cx, cy], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def soft_argmax_fused(heatmaps, interpret=False):
    """Fused soft-argmax: (B, H, W, J) float32 logits -> (B, J, 2) (x, y).

    TPU: single-pass Pallas kernel per batch element (VMEM-resident tile).
    Elsewhere: pure-jnp fallback (same math, same custom VJP).
    """
    if jax.default_backend() == "tpu" or interpret:
        return _fwd_pallas(heatmaps, interpret)
    return _jnp_soft_argmax(heatmaps)


def _fused_fwd(heatmaps, interpret):
    out = soft_argmax_fused(heatmaps, interpret)
    return out, heatmaps


def _fused_bwd(interpret, heatmaps, g):
    if jax.default_backend() == "tpu" or interpret:
        return (_bwd_pallas(heatmaps, g, interpret),)
    # closed-form jnp backward
    B, H, W, J = heatmaps.shape
    flat = heatmaps.reshape(B, H * W, J)
    flat = flat - jnp.max(flat, axis=1, keepdims=True)
    p = jnp.exp(flat)
    p = (p / jnp.sum(p, axis=1, keepdims=True)).reshape(B, H, W, J)
    xs = jnp.arange(W, dtype=p.dtype)[None, None, :, None]
    ys = jnp.arange(H, dtype=p.dtype)[None, :, None, None]
    cx = jnp.sum(xs * p, axis=(1, 2), keepdims=True)
    cy = jnp.sum(ys * p, axis=(1, 2), keepdims=True)
    gx = g[..., 0][:, None, None, :]
    gy = g[..., 1][:, None, None, :]
    return (p * (gx * (xs - cx) + gy * (ys - cy)),)


soft_argmax_fused.defvjp(_fused_fwd, _fused_bwd)
