"""Mesh construction and sharding helpers.

The reference has no parallelism above one GPU (SURVEY §2.9); here the trainer
is mesh-native from the start: params replicated (or model-sharded), batches
split over the ``data`` axis, XLA inserting the grad all-reduce over ICI.
"""

from mamba_unet_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
from mamba_unet_tpu.parallel.seq_scan import (
    selective_scan_seq_sharded,
    sequence_sharding,
)
from mamba_unet_tpu.parallel.tp_scan import (
    channel_sharding,
    selective_scan_tp_sharded,
)
from mamba_unet_tpu.parallel.pipeline import (
    pipeline_blocks,
    pipeline_lm_apply,
    pipeline_lm_loss,
    prestack_lm_params,
    stack_layer_params,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "selective_scan_seq_sharded",
    "sequence_sharding",
    "selective_scan_tp_sharded",
    "channel_sharding",
    "pipeline_blocks",
    "pipeline_lm_apply",
    "pipeline_lm_loss",
    "prestack_lm_params",
    "stack_layer_params",
]
