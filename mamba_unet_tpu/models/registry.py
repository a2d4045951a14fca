"""Model registry — the reference's string-dispatch ``net_factory`` pair
(``/root/reference/code/networks/net_factory.py:13-49``,
``net_factory_3d.py:10-41``) rebuilt as a lazy decorator registry.

A builder takes keyword overrides and returns a flax Module *definition*
(construction is pure — no device placement; the caller inits/jits it).
Names mirror the reference: "unet", "unet_ds", "unet_cct", "unet_urpc",
"TLunet", "vnet" (2-D VNet_2D), "enet", "pnet", "efficient_unet", "nnUNet",
"ViT_seg" (Swin-UNet), "ViM_seg" (Mamba-UNet), "classifier", "projector",
"Jigsaw_classifier"; 3-D: "unet_3D", "vnet_3D", "attention_unet",
"voxresnet", "unetr", "swinunetr", "magicnet", "segmamba".
"""

from __future__ import annotations

import importlib
from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}
# name -> (module path, attr) resolved on first use so importing the registry
# never pulls in the whole zoo.
_LAZY: Dict[str, tuple] = {
    "ViM_seg": ("mamba_unet_tpu.models.vssm", "MambaUnet"),
    "mambaunet": ("mamba_unet_tpu.models.vssm", "MambaUnet"),
    # The REAL Mamba mask model (upstream mamba_2D_mask.py's class lacks the
    # cube/mask heads its training script calls — built here; see
    # models/mamba_mask.py docstring).
    "MambaUnetMask": ("mamba_unet_tpu.models.mamba_mask", "MambaUnetMask"),
    "swinunetr": ("mamba_unet_tpu.models.swin_unetr", "SwinUNETR"),
}


def register_model(name: str):
    def wrap(fn):
        _REGISTRY[name] = fn
        return fn

    return wrap


def register_lazy(name: str, module: str, attr: str) -> None:
    _LAZY[name] = (module, attr)


def list_models():
    return sorted(set(_REGISTRY) | set(_LAZY))


def net_factory(net_type: str, **kwargs):
    """Build a model definition by registry name with keyword overrides."""
    if net_type in _REGISTRY:
        return _REGISTRY[net_type](**kwargs)
    if net_type in _LAZY:
        module, attr = _LAZY[net_type]
        cls = getattr(importlib.import_module(module), attr)
        return cls(**kwargs)
    raise KeyError(f"unknown model {net_type!r}; known: {list_models()}")
