"""Device ops: the TPU-native compute primitives of the framework."""

from mamba_unet_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_ref,
    selective_scan_xla,
)
from mamba_unet_tpu.ops.cross_scan import cross_scan, cross_merge
from mamba_unet_tpu.ops.causal_conv1d import causal_conv1d, causal_conv1d_update

__all__ = [
    "selective_scan",
    "selective_scan_ref",
    "selective_scan_xla",
    "cross_scan",
    "cross_merge",
    "causal_conv1d",
    "causal_conv1d_update",
]
