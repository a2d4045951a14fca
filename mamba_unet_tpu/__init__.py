"""mamba_unet_tpu — a TPU-native (JAX/XLA/Pallas) medical-image-segmentation framework.

A from-scratch rebuild of the capabilities of Grozta/Mamba-UNet (reference:
/root/reference) designed TPU-first:

  * the CUDA ``selective_scan`` kernel family becomes a chunked associative scan
    (XLA) plus a Pallas TPU kernel with a custom VJP (``ops.selective_scan``),
  * the network zoo (Mamba-UNet / Swin-UNet / UNet / VNet / MagicNet / SegMamba)
    is written in flax.linen with channels-last layouts that map onto the MXU,
  * training runs under a ``jax.sharding.Mesh`` (data-parallel by default,
    sequence-sharded scan optional) instead of DataParallel/NCCL,
  * the host data path is a NumPy/grain pipeline feeding device-sharded batches.

Subpackages
-----------
ops         device ops: selective scan, cross scan/merge, causal conv1d
nn          reusable flax modules (SS2D, VSS blocks, patch ops, conv blocks)
models      the network zoo + registry (``net_factory`` equivalent)
data        datasets, augmentations, two-stream batching
objectives  losses (dice/ce/consistency/contrastive) and ramp schedules
train       generic jitted trainer + method-specific loops
parallel    mesh construction and sharding helpers
eval        metrics (dice/hd95/asd/nsd) and slice / sliding-window inference
utils       checkpointing (orbax), config, logging
"""

__version__ = "0.1.0"
