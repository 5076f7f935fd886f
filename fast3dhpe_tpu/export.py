"""AOT model export for serving (jax.export / StableHLO).

The reference deploys by unpickling a torch state dict into Python
[ref: inference.py:30-35]; serving a TPU fleet wants a compiler-level
artifact instead: one file that carries the full preprocessing + forward
graph (ImageNet normalize -> CDRNet -> soft-argmax -> DLT) with the
weights baked in as constants, loadable into any process (including
non-Python runtimes that speak StableHLO) without the model code.

  exported = export_cdrnet(model, variables, batch_size=64)
  save_exported(exported, "cdrnet101.stablehlo")
  ...
  serve = load_serving("cdrnet101.stablehlo")
  pred_2d, pred_3d = serve(img_l, img_r, proj)      # uint8 frames in

Artifacts are cross-platform: export with platforms=("tpu", "cpu") on a
CPU-only host and run on either backend.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

from .ops.warp import normalize_imagenet


def make_serving_fn(model, variables):
    """(img_l, img_r) uint8 [0,255] (B,H,W,3) + proj (B,2,3,4) ->
    (pred_2d (B,2,J,2), pred_3d (B,J,3)). Weights are closed over (they
    become constants of the exported graph).

    The traced function itself accepts any [0,255] dtype, but
    export_cdrnet pins the exported signature to uint8 (4x cheaper on the
    wire) and load_serving rejects float inputs rather than silently
    truncating them — convert float frames explicitly before calling."""

    def serve(img_l, img_r, proj):
        imgs = jnp.stack([normalize_imagenet(img_l),
                          normalize_imagenet(img_r)], axis=1)
        return model.apply(variables, imgs, proj, train=False)

    return serve


def make_serving_fn_int8(pack, dlt_method: str = "jacobi"):
    """Int8 variant of make_serving_fn: serves a PTQ pack
    (models/quantized.py). The int8 kernels bake into the artifact as
    constants — ~4x smaller than an fp32 export, and the graph runs the
    quantized MXU path on TPU (measured 1.32x, docs/PERFORMANCE.md)."""
    from .models import quantized as qz
    depth = int(pack["depth"])

    def serve(img_l, img_r, proj):
        imgs = jnp.stack([normalize_imagenet(img_l),
                          normalize_imagenet(img_r)], axis=1)
        return qz.cdrnet_int8_apply(pack, imgs, proj, depth=depth,
                                    dlt_method=dlt_method)

    return serve


def export_cdrnet_int8(pack, batch_size: int,
                       image_size: Tuple[int, int] = (256, 256),
                       platforms: Optional[Sequence[str]] = None,
                       n_views: int = 2,
                       dlt_method: str = "jacobi") -> "jexport.Exported":
    """export_cdrnet for a quantized pack (same signature contract)."""
    H, W = int(image_size[1]), int(image_size[0])
    serve = make_serving_fn_int8(pack, dlt_method)
    img = jax.ShapeDtypeStruct((batch_size, H, W, 3), jnp.uint8)
    proj = jax.ShapeDtypeStruct((batch_size, n_views, 3, 4), jnp.float32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jexport.export(jax.jit(serve), **kwargs)(img, img, proj)


def export_cdrnet(model, variables, batch_size: int,
                  image_size: Tuple[int, int] = (256, 256),
                  platforms: Optional[Sequence[str]] = None,
                  n_views: int = 2) -> "jexport.Exported":
    """Lower + export the serving function at a fixed batch size.

    platforms: e.g. ("tpu",), ("tpu", "cpu"); default = current backend.
    """
    H, W = int(image_size[1]), int(image_size[0])
    serve = make_serving_fn(model, variables)
    img = jax.ShapeDtypeStruct((batch_size, H, W, 3), jnp.uint8)
    proj = jax.ShapeDtypeStruct((batch_size, n_views, 3, 4), jnp.float32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jexport.export(jax.jit(serve), **kwargs)(img, img, proj)


def save_exported(exported: "jexport.Exported", path: str) -> int:
    """Serialize to `path`; returns the artifact size in bytes."""
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_serving(path: str):
    """Load a serialized artifact; returns `serve(img_l, img_r, proj)`.

    The returned callable executes via jax on whatever attached backend
    matches one of the artifact's export platforms.
    """
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())

    def _as_frames(x, name):
        x = jnp.asarray(x)
        if x.dtype != jnp.uint8:
            # the artifact's input signature is uint8 (4x cheaper on the
            # wire than float32); a silent cast here would TRUNCATE float
            # frames (e.g. [0,1]-scaled input -> all-zero images)
            raise TypeError(
                f"{name} must be uint8 [0,255] frames (exported "
                f"signature), got {x.dtype}; convert explicitly with "
                f"np.round(img).astype(np.uint8) if your frames are "
                f"float [0,255]")
        return x

    def serve(img_l, img_r, proj):
        return exported.call(_as_frames(img_l, "img_l"),
                             _as_frames(img_r, "img_r"),
                             jnp.asarray(proj, jnp.float32))

    serve.exported = exported
    return serve
