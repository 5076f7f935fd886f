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


def _flax_path_to_torch_key(path: Tuple[str, ...]) -> Tuple[str, str]:
    """Inverse of _translate_torch_key: flax module path -> (torch module
    prefix, kind) with kind in {conv, deconv, bn}."""
    root, rest = path[0], list(path[1:])
    name = rest[-1]

    if root == "encoder":
        if len(rest) == 1:            # stem: encoder/conv1, encoder/bn1
            if name == "conv1":
                return "encoder.conv1", "conv"
            if name == "bn1":
                return "encoder.bn1", "bn"
        m = re.fullmatch(r"layer(\d)_(\d+)", rest[0])
        assert m, path
        block = f"encoder.layer{m.group(1)}.{m.group(2)}"
        sub = rest[1]
        if sub == "downsample_conv":
            return f"{block}.downsample.0", "conv"
        if sub == "downsample_bn":
            return f"{block}.downsample.1", "bn"
        kind = "conv" if sub.startswith("conv") else "bn"
        return f"{block}.{sub}", kind
    if root == "decoder":
        m = re.fullmatch(r"deconv(\d)", name)
        if m:
            return f"decoder.deconv{m.group(1)}.0", "deconv"
        m = re.fullmatch(r"deconv(\d)_bn", name)
        if m:
            return f"decoder.deconv{m.group(1)}.1", "bn"
        if name == "final_layer":
            return "decoder.final_layer", "conv"
    if root == "CF":
        if name == "conv_layer1":
            return "CF.conv_layer1.0", "conv"
        if name == "conv_layer1_bn":
            return "CF.conv_layer1.1", "bn"
        m = re.fullmatch(r"conv_layer2_(\d)", name)
        if m:
            return f"CF.conv_layer2.{int(m.group(1)) * 3}", "conv"
        m = re.fullmatch(r"conv_layer2_(\d)_bn", name)
        if m:
            return f"CF.conv_layer2.{int(m.group(1)) * 3 + 1}", "bn"
        m = re.fullmatch(r"out_layer(\d)", name)
        if m:
            return f"CF.out_layer.{m.group(1)}.0", "conv"
        m = re.fullmatch(r"out_layer(\d)_bn", name)
        if m:
            return f"CF.out_layer.{m.group(1)}.1", "bn"
    raise KeyError(f"Unrecognized flax module path: {path}")


def flax_to_torch_state_dict(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Export {'params', 'batch_stats'} to a reference-format torch state
    dict (numpy arrays; pass through torch.tensor to save as .pth).

    The exact inverse of torch_state_dict_to_flax — a checkpoint trained
    here loads into the reference's torch models (strict), see
    tests/test_checkpoint_roundtrip.py.
    """
    out: Dict[str, Any] = {}

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
                continue
            arr = np.asarray(v)
            module_path = path + (k,)
            leaf = module_path[-1]
            mod = module_path[:-1]
            prefix, kind = _flax_path_to_torch_key(mod)
            if kind in ("conv", "deconv"):
                if leaf == "kernel":
                    out[f"{prefix}.weight"] = arr.transpose(3, 2, 0, 1)
                elif leaf == "bias":
                    out[f"{prefix}.bias"] = arr
                else:
                    raise KeyError(module_path)
            else:  # bn
                name = {"scale": "weight", "bias": "bias",
                        "mean": "running_mean", "var": "running_var"}[leaf]
                out[f"{prefix}.{name}"] = arr

    walk(variables["params"], ())
    walk(variables.get("batch_stats", {}), ())
    # torch BN modules also track num_batches_tracked
    for key in list(out.keys()):
        if key.endswith("running_mean"):
            out[key.replace("running_mean", "num_batches_tracked")] = \
                np.asarray(0, dtype=np.int64)
    return out


def save_torch_checkpoint(path: str, variables: Dict[str, Any]) -> None:
    """Write a reference-compatible .pth file."""
    import torch
    sd = {k: torch.tensor(v) for k, v in
          flax_to_torch_state_dict(variables).items()}
    torch.save(sd, path)


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
    if jax.process_count() > 1:
        # Multi-host: only process 0 reaches this function (writers are
        # process-0-gated), so restrict orbax's barrier/commit set to
        # {0} — the default checkpointer would wait on processes that
        # never enter the save. The tree is ALSO fetched to host numpy
        # first: serializing global jax.Arrays engages orbax's
        # cross-process array machinery even under active_processes={0}
        # (replicated state is fully host-addressable, so the fetch is
        # local). Validated for real in tests/test_distributed_real.py.
        mp = ocp.options.MultiprocessingOptions(primary_host=0,
                                                active_processes={0})
        with ocp.Checkpointer(ocp.StandardCheckpointHandler(),
                              multiprocessing_options=mp) as ckptr:
            ckptr.save(path, jax.device_get(tree), force=True)
        return
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


class AsyncCheckpointWriter:
    """Checkpoint saves off the training critical path.

    orbax's own AsyncCheckpointer performs the device->host copy
    synchronously before returning control; on a slow host<->device link
    that copy IS the cost (CDR-101 params+Adam state is ~540 MB, ~30 s
    through this relay — docs/PERFORMANCE.md), so an orbax-async save
    would still stall the loop for the whole transfer. This writer moves
    the FETCH itself off the critical path: save() enqueues only device
    references — XLA buffers are immutable, so the snapshot is consistent
    by construction and costs nothing — and one worker thread performs
    ``jax.device_get`` + the orbax write while the loop keeps dispatching.
    (The reference blocks on torch.save every epoch
    [ref: train.py:150-159, train_cdr.py:222-232].)

    Per-path coalescing: a save() for a path that already has a QUEUED
    (not yet started) entry replaces that entry, so a link slower than
    the checkpoint cadence degrades to saving less often — never to an
    unbounded queue of dead state trees pinned in HBM. At most one
    in-flight + one queued tree per path are ever live.

    wait() drains the queue and re-raises the first worker error; the
    training loops call it at normal completion AND in their interrupt
    handlers so the process never exits with a checkpoint half-written.
    The worker thread is a daemon: an unhandled crash elsewhere cannot
    hang interpreter shutdown on a stuck link.
    """

    def __init__(self):
        import threading
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._queue: Dict[str, Any] = {}     # path -> tree (insertion-ordered)
        self._busy = 0                       # entries dequeued, not yet done
        self._error: Optional[BaseException] = None
        self._closed = False
        self._thread = threading.Thread(
            target=self._work, name="ckpt-writer", daemon=True)
        self._thread.start()

    def save(self, path: str, tree) -> None:
        """Queue `tree` for a background save to `path` (coalescing any
        queued-but-unstarted save to the same path)."""
        with self._cv:
            if self._error is not None:
                err, self._error = self._error, None
                raise err
            if self._closed:
                raise RuntimeError("writer already closed")
            self._queue.pop(path, None)
            self._queue[path] = tree
            self._cv.notify()

    def _work(self):
        while True:
            with self._cv:
                while not self._queue and not self._closed:
                    self._cv.wait()
                if not self._queue and self._closed:
                    return
                path = next(iter(self._queue))
                tree = self._queue.pop(path)
                self._busy += 1
            try:
                # the expensive leg: device->host through the link
                host_tree = jax.device_get(tree)
                save_checkpoint(path, host_tree)
            except BaseException as e:   # surfaced by the next save()/wait()
                with self._cv:
                    self._error = self._error or e
            finally:
                with self._cv:
                    self._busy -= 1
                    self._cv.notify_all()

    def wait(self) -> None:
        """Block until every queued save has been written; re-raise the
        first worker error, if any."""
        with self._cv:
            while self._queue or self._busy:
                self._cv.wait()
            if self._error is not None:
                err, self._error = self._error, None
                raise err

    def close(self) -> None:
        """Drain and stop the worker (the writer is single-use)."""
        self.wait()
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._thread.join(timeout=60)


class SyncCheckpointWriter:
    """Same surface as AsyncCheckpointWriter, saving inline (the
    reference-equivalent blocking behavior)."""

    def save(self, path: str, tree) -> None:
        save_checkpoint(path, tree)

    def wait(self) -> None:
        pass

    def close(self) -> None:
        pass


class NullCheckpointWriter:
    """Writer handed to non-zero processes in multi-host runs: process 0
    owns the checkpoint tree, so saves here are no-ops. Without this
    gate, N orbax writers would race on the same weights/<NAME>/latest
    directory and corrupt it. Training state is replicated SPMD, so the
    tree process 0 writes is identical to what any host would write."""

    def save(self, path: str, tree) -> None:
        pass

    def wait(self) -> None:
        pass

    def close(self) -> None:
        pass


def make_checkpoint_writer(async_: bool):
    """Checkpoint writer factory for the training loops.

    Process-0-gated: in a multi-process run only process 0 gets a real
    writer; every other process gets a NullCheckpointWriter. All
    processes still compute/fetch identical replicated state — only the
    filesystem write is gated (assumes the usual shared-FS checkpoint
    dir; per-host disks would need per-host paths instead)."""
    if jax.process_index() != 0:
        return NullCheckpointWriter()
    return AsyncCheckpointWriter() if async_ else SyncCheckpointWriter()


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


def restore_checkpoint_compat(path: str, template: dict, optional_keys=()):
    """restore_checkpoint tolerating checkpoints that predate newer
    top-level keys (e.g. "best_metric"): on a structure mismatch, retry
    without the optional keys. Returns None if no checkpoint exists; the
    returned dict simply lacks the optional keys when the checkpoint does.
    """
    try:
        return restore_checkpoint(path, template)
    except Exception:
        slim = {k: v for k, v in template.items() if k not in optional_keys}
        if len(slim) == len(template):
            raise
        return restore_checkpoint(path, slim)
