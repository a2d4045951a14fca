"""Reusable flax.linen modules: SS2D mixer, VSS blocks, patch ops, conv blocks.

Everything is channels-last (B, H, W, C) — the TPU-native layout — and takes a
``dtype`` (compute dtype, bf16 for the MXU fast path) with fp32 parameters.
"""

from mamba_unet_tpu.nn.layers import DropPath, trunc_normal_init
from mamba_unet_tpu.nn.patch_ops import (
    PatchEmbed2D,
    PatchMerging2D,
    PatchExpand2D,
    FinalPatchExpand2D,
)
from mamba_unet_tpu.nn.ss2d import SS2D
from mamba_unet_tpu.nn.vss import VSSBlock, VSSLayer

__all__ = [
    "DropPath",
    "trunc_normal_init",
    "PatchEmbed2D",
    "PatchMerging2D",
    "PatchExpand2D",
    "FinalPatchExpand2D",
    "SS2D",
    "VSSBlock",
    "VSSLayer",
]
