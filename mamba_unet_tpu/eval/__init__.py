"""Evaluation: binary segmentation metrics + volume inference drivers."""

from mamba_unet_tpu.eval.metrics import (
    dice_binary,
    hd95,
    asd,
    assd,
    nsd,
    surface_distances,
    calculate_metric_percase,
    calculate_metric_percase_full,
)
from mamba_unet_tpu.eval.inference import (
    evaluate_slice_volumes,
    test_single_volume,
    test_single_volume_mad,
    test_single_volume_stacked,
    sliding_window_inference_3d,
)

__all__ = [
    "dice_binary",
    "hd95",
    "asd",
    "assd",
    "nsd",
    "surface_distances",
    "calculate_metric_percase",
    "calculate_metric_percase_full",
    "evaluate_slice_volumes",
    "test_single_volume",
    "test_single_volume_mad",
    "test_single_volume_stacked",
    "sliding_window_inference_3d",
]
