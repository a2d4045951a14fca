"""Utilities: checkpointing, logging, config."""

from mamba_unet_tpu.utils.checkpoint import (
    checkpoint_top_keys,
    latest_step,
    load_best_marks,
    load_cta_state,
    load_model_snapshot,
    restore_checkpoint,
    save_best_marks,
    save_checkpoint,
    save_cta_state,
)
from mamba_unet_tpu.utils.sdf import compute_sdf

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
    "checkpoint_top_keys",
    "save_best_marks",
    "load_best_marks",
    "save_cta_state",
    "load_cta_state",
    "load_model_snapshot",
    "compute_sdf",
]
