"""Host data path: h5 slice/volume datasets, numpy augmentations, two-stream
batching, synthetic data generation, and device feeding."""

from mamba_unet_tpu.data.acdc import (
    SliceDataset,
    VolumeDataset,
    patients_to_slices,
)
from mamba_unet_tpu.data.augment import (
    RandomGenerator,
    WeakStrongAugment,
    random_rot_flip,
    random_rotate,
)
from mamba_unet_tpu.data.sampler import (
    TwoStreamBatchSampler,
    EpochShuffleSampler,
)
from mamba_unet_tpu.data.loader import Loader
from mamba_unet_tpu.data.scribble import scribbles_from_mask
from mamba_unet_tpu.data.synthetic import make_synthetic_acdc

__all__ = [
    "SliceDataset",
    "VolumeDataset",
    "patients_to_slices",
    "RandomGenerator",
    "WeakStrongAugment",
    "random_rot_flip",
    "random_rotate",
    "TwoStreamBatchSampler",
    "EpochShuffleSampler",
    "Loader",
    "make_synthetic_acdc",
    "scribbles_from_mask",
]
