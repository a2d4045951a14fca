"""Utilities: checkpointing, logging, config."""

from mamba_unet_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint, latest_step
from mamba_unet_tpu.utils.sdf import compute_sdf

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step", "compute_sdf"]
