"""Config system: one tier replacing the reference's argparse + yacs split.

Mirrors the structure of ``/root/reference/code/config.py:12-183`` (DATA /
MODEL.VSSM / MODEL.SWIN / TRAIN / AUG / TEST / MISC trees, yaml merge, and
``--opts KEY VALUE`` dot-path overrides :185-239) as a lightweight attrdict —
no yacs dependency. The reference's dead TRAIN.* optimizer section (never
read by the loops, SURVEY §5.6) is intentionally NOT carried over; optimizer
settings live in TrainConfig.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Optional

import yaml


class Config(dict):
    """dict with attribute access and recursive merge/freeze-free updates."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def _wrap(v):
        if isinstance(v, dict) and not isinstance(v, Config):
            return Config({k: Config._wrap(x) for k, x in v.items()})
        return v

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        return cls({k: cls._wrap(v) for k, v in d.items()})

    def merge(self, other: Dict[str, Any]) -> "Config":
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), dict):
                self[k].merge(v)
            else:
                self[k] = self._wrap(v)
        return self

    def set_dotted(self, key: str, value: Any) -> None:
        parts = key.split(".")
        node = self
        for p in parts[:-1]:
            node = node.setdefault(p, Config())
        node[parts[-1]] = yaml.safe_load(str(value))

    def clone(self) -> "Config":
        return Config.from_dict(copy.deepcopy(dict(self)))


def default_config() -> Config:
    """Defaults matching code/config.py (model-relevant subset)."""
    return Config.from_dict({
        "DATA": {"IMG_SIZE": 224, "BATCH_SIZE": 24},
        "MODEL": {
            "TYPE": "vssm",
            "NAME": "vmamba_tiny",
            "DROP_RATE": 0.0,
            "DROP_PATH_RATE": 0.2,
            "NUM_CLASSES": 4,
            "PRETRAIN_CKPT": None,
            "VSSM": {
                "PATCH_SIZE": 4,
                "IN_CHANS": 3,
                "EMBED_DIM": 96,
                "DEPTHS": [2, 2, 2, 2],
                "D_STATE": 16,
            },
            "SWIN": {
                "PATCH_SIZE": 4,
                "IN_CHANS": 3,
                "EMBED_DIM": 96,
                "DEPTHS": [2, 2, 2, 2],
                "DECODER_DEPTHS": [2, 2, 2, 1],
                "NUM_HEADS": [3, 6, 12, 24],
                "WINDOW_SIZE": 7,
                "MLP_RATIO": 4.0,
            },
        },
        "TEST": {"CROP": True},
    })


def get_config(
    cfg_file: Optional[str] = None, opts: Optional[List[str]] = None
) -> Config:
    """Load defaults, merge a yaml file, apply --opts KEY VALUE pairs."""
    cfg = default_config()
    if cfg_file:
        with open(cfg_file) as f:
            cfg.merge(yaml.safe_load(f) or {})
    if opts:
        assert len(opts) % 2 == 0, "--opts expects KEY VALUE pairs"
        for k, v in zip(opts[0::2], opts[1::2]):
            cfg.set_dotted(k, v)
    return cfg


def build_model_from_config(cfg: Config, num_classes: Optional[int] = None,
                            img_size: Optional[int] = None,
                            drop_path_rate: Optional[float] = None):
    """The reference wrappers' config->model construction
    (vision_mamba.py:30-40 / vision_transformer.py:29-46).
    ``drop_path_rate`` overrides the config value when given (the CLI's
    --drop_path must apply to config-built models too)."""
    from mamba_unet_tpu.models import MambaUnet, SwinUnet

    nc = num_classes or cfg.MODEL.NUM_CLASSES
    dpr = (drop_path_rate if drop_path_rate is not None
           else cfg.MODEL.DROP_PATH_RATE)
    if cfg.MODEL.TYPE == "vssm":
        v = cfg.MODEL.VSSM
        dims = [v.EMBED_DIM * 2**i for i in range(len(v.DEPTHS))]
        return MambaUnet(
            num_classes=nc,
            img_size=img_size or cfg.DATA.IMG_SIZE,
            depths=tuple(v.DEPTHS),
            dims=tuple(dims),
            drop_path_rate=dpr,
        )
    if cfg.MODEL.TYPE == "swin":
        s = cfg.MODEL.SWIN
        return SwinUnet(
            num_classes=nc,
            img_size=img_size or cfg.DATA.IMG_SIZE,
            embed_dim=s.EMBED_DIM,
            depths=tuple(s.DEPTHS),
            num_heads=tuple(s.NUM_HEADS),
            window_size=s.WINDOW_SIZE,
            drop_path_rate=dpr,
        )
    raise ValueError(f"unknown MODEL.TYPE {cfg.MODEL.TYPE!r}")
