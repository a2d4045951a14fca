"""Objectives: segmentation losses, SSL consistency losses, ramp schedules."""

from mamba_unet_tpu.objectives.losses import (
    cross_entropy_loss,
    dice_loss,
    dice_loss_from_labels,
    dice_loss_pair,
    softmax_dice_loss,
    softmax_mse_loss,
    softmax_kl_loss,
    symmetric_mse_loss,
    entropy_loss,
    entropy_loss_map,
    constra_loss,
    focal_loss,
    supervised_ce_dice,
    vat_loss,
    weighted_bce_iou_loss,
    loss_sup,
    loss_diff,
)
from mamba_unet_tpu.objectives.ramps import (
    sigmoid_rampup,
    linear_rampup,
    cosine_rampdown,
)

__all__ = [
    "cross_entropy_loss",
    "dice_loss",
    "dice_loss_from_labels",
    "dice_loss_pair",
    "softmax_dice_loss",
    "softmax_mse_loss",
    "softmax_kl_loss",
    "symmetric_mse_loss",
    "entropy_loss",
    "entropy_loss_map",
    "constra_loss",
    "focal_loss",
    "supervised_ce_dice",
    "vat_loss",
    "weighted_bce_iou_loss",
    "loss_sup",
    "loss_diff",
    "sigmoid_rampup",
    "linear_rampup",
    "cosine_rampdown",
]
