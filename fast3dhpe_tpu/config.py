"""Typed configuration system.

Loads the same YAML schema as the reference's configs
(/root/reference/configs/*.yaml, parsed at /root/reference/train.py:174-175
into an EasyDict), but with typed dataclasses, defaults and validation so the
three reference configs load unchanged while unknown keys are surfaced
early instead of silently ignored.

Attribute access mirrors the reference: ``cfg.MODEL.NUM_JOINTS`` etc.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, List, Optional

import yaml


def _build(cls, data: dict, path: str):
    """Construct dataclass ``cls`` from ``data``, recursing into nested ones."""
    if data is None:
        data = {}
    names = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    unknown = {}
    for key, value in data.items():
        if key in names:
            ftype = names[key].type
            nested = _NESTED.get((cls.__name__, key))
            kwargs[key] = _build(nested, value, f"{path}.{key}") if nested else value
        else:
            unknown[key] = value
    obj = cls(**kwargs)
    if unknown:
        object.__setattr__(obj, "extra", {**getattr(obj, "extra", {}), **unknown})
    return obj


@dataclass
class ExtraConfig:
    TARGET_TYPE: str = "gaussian"
    SIGMA: int = 3
    HEATMAP_SIZE: List[int] = field(default_factory=lambda: [64, 64])
    # differentiable-DLT backend for CDRNet: "jacobi" (default, batched
    # one-sided Jacobi SVD), "svd" (XLA generic), or "sii" (SVD-free
    # shifted inverse iterations [ref: models/cdrnet.py:181-222])
    DLT_METHOD: str = "jacobi"
    extra: dict = field(default_factory=dict)


@dataclass
class ModelConfig:
    NAME: str = "model"
    PRETRAINED: str = ""
    IMAGE_SIZE: List[int] = field(default_factory=lambda: [256, 256])
    NUM_JOINTS: int = 19
    NUM_LAYERS: int = 101
    EXTRA: ExtraConfig = field(default_factory=ExtraConfig)
    extra: dict = field(default_factory=dict)


@dataclass
class DatasetConfig:
    TYPE: str = "MADS_3d"
    ROOT: str = "data/MADS_extract"
    TEST_SET: str = "valid"
    TRAIN_SET: str = "train"
    FLIP: bool = True
    ROT_FACTOR: float = 30
    SCALE_FACTOR: float = 0.25
    # "CUTOUT" | "HNS" | "None"/None (reference: dataset/base.py:40-45)
    OCCLUSION: Optional[str] = None
    # byte budget for the host RAM cache of decoded frames (0 = off);
    # framework extension — absent from the reference schema
    CACHE_BYTES: int = 0
    # byte budget for the DEVICE-resident (HBM) decoded-frame cache
    # (0 = off). When the dataset's decoded frames fit, batches are
    # assembled on device by index gather and the per-step host->device
    # frame traffic disappears (data/device_cache.py); oversized datasets
    # fall back to the streaming host path automatically.
    DEVICE_CACHE_BYTES: int = 0
    extra: dict = field(default_factory=dict)


@dataclass
class TrainConfig:
    BATCH_SIZE: int = 32
    EPOCH: int = 50
    LR: float = 1e-4
    LR_STEP: List[int] = field(default_factory=lambda: [40])
    LR_FACTOR: float = 0.1
    WARMUP: int = 0  # 2D-only warmup epochs for CDRNet (train_cdr.py:112-125)
    LOSS_3D_WEIGHT: float = 4.0
    extra: dict = field(default_factory=dict)


@dataclass
class TestConfig:
    BATCH_SIZE: int = 32
    extra: dict = field(default_factory=dict)


@dataclass
class LossConfig:
    USE_TARGET_WEIGHT: bool = True
    # "JointsMSE" | "JointsMSESmooth" | "MPJPE" (reference train.py:53-60)
    TYPE: str = "JointsMSE"
    extra: dict = field(default_factory=dict)


@dataclass
class Config:
    GPUS: str = "0"          # accepted for reference-config compat; unused
    OUTPUT_DIR: str = "output"
    WORKERS: int = 8
    DATASET: DatasetConfig = field(default_factory=DatasetConfig)
    MODEL: ModelConfig = field(default_factory=ModelConfig)
    TRAIN: TrainConfig = field(default_factory=TrainConfig)
    TEST: TestConfig = field(default_factory=TestConfig)
    LOSS: LossConfig = field(default_factory=LossConfig)
    extra: dict = field(default_factory=dict)

    def validate(self) -> "Config":
        if self.MODEL.NUM_LAYERS not in (18, 34, 50, 101, 152):
            raise ValueError(f"NUM_LAYERS must be a ResNet depth, "
                             f"got {self.MODEL.NUM_LAYERS}")
        if self.MODEL.EXTRA.TARGET_TYPE != "gaussian":
            raise ValueError("Only gaussian heatmap targets are supported")
        if self.LOSS.TYPE not in ("JointsMSE", "JointsMSESmooth", "MPJPE"):
            raise ValueError(f"Unknown LOSS.TYPE {self.LOSS.TYPE}")
        occl = self.DATASET.OCCLUSION
        if occl not in (None, "None", "CUTOUT", "HNS"):
            raise ValueError(f"Unknown DATASET.OCCLUSION {occl}")
        if self.MODEL.EXTRA.DLT_METHOD not in ("jacobi", "svd", "sii"):
            raise ValueError(
                f"Unknown MODEL.EXTRA.DLT_METHOD "
                f"{self.MODEL.EXTRA.DLT_METHOD!r}")
        return self


_NESTED = {
    ("Config", "DATASET"): DatasetConfig,
    ("Config", "MODEL"): ModelConfig,
    ("Config", "TRAIN"): TrainConfig,
    ("Config", "TEST"): TestConfig,
    ("Config", "LOSS"): LossConfig,
    ("ModelConfig", "EXTRA"): ExtraConfig,
}


def config_from_dict(data: dict) -> Config:
    return _build(Config, data, "cfg").validate()


def load_config(path: str) -> Config:
    """Load a YAML config file (reference schema) into a typed Config."""
    with open(path, "r") as f:
        data = yaml.safe_load(f)
    return config_from_dict(data)


def config_to_dict(cfg: Any) -> dict:
    out = {}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if dataclasses.is_dataclass(v):
            out[f.name] = config_to_dict(v)
        elif f.name == "extra":
            out.update(v)
        else:
            out[f.name] = v
    return out
