"""Checkpointing: orbax-native save/restore + torch .pth import.

The reference checkpoints are plain torch state dicts saved each epoch
[ref: train.py:150-159, train_cdr.py:222-232] with keys like
``encoder.layer1.0.conv1.weight``, ``decoder.deconv1.0.weight``,
``CF.conv_layer2.3.weight``. `torch_state_dict_to_flax` maps them onto
this framework's flax variable tree ({'params': ..., 'batch_stats': ...}),
transposing conv kernels OIHW -> HWIO and ConvTranspose kernels
(I, O, kh, kw) -> (kh, kw, O, I).

Encoder-only transfer with decoder re-init (the reference's
PoseResNet.init_weights / CDRNet.init_weights pretraining handoff
[ref: models/poseresnet.py:23-38, models/cdrnet.py:103-118]) is
`merge_encoder_only`.

Native checkpoints store params + batch_stats + opt_state + step via orbax
— unlike the reference, optimizer state and step are checkpointed, so
training truly resumes.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bn_param(pname: str) -> Optional[Tuple[str, str]]:
    return {
        "weight": ("params", "scale"),
        "bias": ("params", "bias"),
        "running_mean": ("batch_stats", "mean"),
        "running_var": ("batch_stats", "var"),
        "num_batches_tracked": None,
    }[pname]


def _translate_torch_key(key: str):
    """torch state-dict key -> (collection, flax path tuple, transform).

    transform is one of "conv" (OIHW->HWIO), "deconv" ((I,O,kh,kw)->
    (kh,kw,O,I)), or None (as-is). Returns None for keys to drop.
    """
    parts = key.split(".")
    root, rest = parts[0], parts[1:]

    def conv(path, pname):
        if pname == "weight":
            return ("params", path + ("kernel",), "conv")
        return ("params", path + ("bias",), None)

    def deconv(path, pname):
        assert pname == "weight", key
        return ("params", path + ("kernel",), "deconv")

    def bn(path, pname):
        dest = _bn_param(pname)
        if dest is None:
            return None
        coll, leaf = dest
        return (coll, path + (leaf,), None)

    if root == "encoder":
        if rest[0] == "conv1":
            return conv(("encoder", "conv1"), rest[1])
        if rest[0] == "bn1":
            return bn(("encoder", "bn1"), rest[1])
        m = re.fullmatch(r"layer(\d)", rest[0])
        if m:
            block = f"layer{m.group(1)}_{rest[1]}"
            sub = rest[2]
            if sub == "downsample":
                which, pname = rest[3], rest[4]
                if which == "0":
                    return conv(("encoder", block, "downsample_conv"), pname)
                return bn(("encoder", block, "downsample_bn"), pname)
            pname = rest[3]
            if sub.startswith("conv"):
                return conv(("encoder", block, sub), pname)
            if sub.startswith("bn"):
                return bn(("encoder", block, sub), pname)
    elif root == "decoder":
        m = re.fullmatch(r"deconv(\d)", rest[0])
        if m:
            which, pname = rest[1], rest[2]
            if which == "0":
                return deconv(("decoder", f"deconv{m.group(1)}"), pname)
            return bn(("decoder", f"deconv{m.group(1)}_bn"), pname)
        if rest[0] == "final_layer":
            return conv(("decoder", "final_layer"), rest[1])
    elif root == "CF":
        if rest[0] == "conv_layer1":
            which, pname = rest[1], rest[2]
            if which == "0":
                return conv(("CF", "conv_layer1"), pname)
            return bn(("CF", "conv_layer1_bn"), pname)
        if rest[0] == "conv_layer2":
            # Sequential: 0 conv, 1 BN, 2 ReLU, 3 conv, 4 BN, 5 ReLU
            which, pname = rest[1], rest[2]
            dest = {"0": ("conv_layer2_0", "conv"),
                    "1": ("conv_layer2_0_bn", "bn"),
                    "3": ("conv_layer2_1", "conv"),
                    "4": ("conv_layer2_1_bn", "bn")}[which]
            name, kind = dest
            return (conv(("CF", name), pname) if kind == "conv"
                    else bn(("CF", name), pname))
        if rest[0] == "out_layer":
            view, which, pname = rest[1], rest[2], rest[3]
            if which == "0":
                return conv(("CF", f"out_layer{view}"), pname)
            return bn(("CF", f"out_layer{view}_bn"), pname)
    raise KeyError(f"Unrecognized reference checkpoint key: {key}")


def torch_state_dict_to_flax(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map a reference torch state dict onto {'params', 'batch_stats'}."""
    out: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    for key, value in state_dict.items():
        dest = _translate_torch_key(key)
        if dest is None:
            continue
        coll, path, transform = dest
        arr = np.asarray(value.detach().cpu().numpy()
                         if hasattr(value, "detach") else value)
        if transform in ("conv", "deconv"):
            arr = arr.transpose(2, 3, 1, 0)
        node = out[coll]
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(arr, jnp.float32)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .pth checkpoint into a flax variable tree."""
    import torch
    state_dict = torch.load(path, map_location="cpu")
    return torch_state_dict_to_flax(state_dict)


def merge_encoder_only(variables: Dict[str, Any],
                       pretrained: Dict[str, Any]) -> Dict[str, Any]:
    """Overwrite only the encoder sub-tree from a pretrained tree.

    Mirrors the reference's init_weights: decoder (and fusion) keep their
    fresh initialization, encoder weights + BN stats come from the
    checkpoint [ref: models/poseresnet.py:23-38].
    """
    out = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    for coll in ("params", "batch_stats"):
        if coll in pretrained and "encoder" in pretrained[coll]:
            out[coll] = dict(out[coll])
            out[coll]["encoder"] = pretrained[coll]["encoder"]
    return out


def load_variables(path: str) -> Dict[str, Any]:
    """Load model variables {'params', 'batch_stats'} for inference from
    either a reference torch .pth file or a native orbax checkpoint dir.

    Accepts: "<dir>/best.pth" (torch), "<dir>/best" (orbax), or a "<dir>"
    containing either.
    """
    if os.path.isfile(path) and path.endswith(".pth"):
        return load_torch_checkpoint(path)
    if os.path.isdir(path):
        # orbax checkpoint dir (contains its own metadata)
        import orbax.checkpoint as ocp
        if os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA")) or \
                os.path.exists(os.path.join(path, "d")):
            with ocp.StandardCheckpointer() as ckptr:
                tree = ckptr.restore(os.path.abspath(path))
            return {"params": tree["params"],
                    "batch_stats": tree.get("batch_stats", {})}
        for cand in ("best.pth", "best", "latest.pth", "latest"):
            sub = os.path.join(path, cand)
            if os.path.exists(sub):
                return load_variables(sub)
    raise FileNotFoundError(f"No checkpoint found at {path}")


def save_checkpoint(path: str, tree) -> None:
    """Save a pytree (e.g. {'params', 'batch_stats', 'opt_state', 'step'})
    to `path` with orbax, overwriting. Unlike the reference's torch.save of
    bare params [ref: train.py:150-159], the optimizer state and step are
    included so training truly resumes."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def restore_checkpoint(path: str, template):
    """Restore a pytree saved by save_checkpoint; `template` supplies the
    structure/shapes (an abstract or concrete tree). Returns None if the
    checkpoint does not exist."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)
