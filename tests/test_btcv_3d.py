"""BTCV 3-D data path + MagicNet-3D smoke + 3-D validation."""

import numpy as np
import pytest

from mamba_unet_tpu.data.btcv import (
    Compose3D,
    RandomCrop3D,
    RandomRotFlip3D,
    VolumeTrainDataset,
    make_synthetic_btcv,
)


@pytest.fixture(scope="module")
def btcv_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("btcv")
    return make_synthetic_btcv(str(root), n_train=2, n_val=1, size=48,
                               num_classes=5)


def test_btcv_dataset_and_transforms(btcv_root):
    ds = VolumeTrainDataset(
        btcv_root, "train.list",
        transform=Compose3D([RandomRotFlip3D(seed=0),
                             RandomCrop3D((32, 32, 32), seed=0)]),
    )
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (32, 32, 32, 1)
    assert s["label"].shape == (32, 32, 32)
    assert s["label"].max() <= 4


def test_random_crop_pads_small_volumes():
    crop = RandomCrop3D((16, 16, 16), seed=0)
    out = crop({"image": np.zeros((8, 20, 20), np.float32),
                "label": np.zeros((8, 20, 20), np.int64)})
    assert out["image"].shape == (16, 16, 16)


def test_validation_all_case(btcv_root):
    from mamba_unet_tpu.data.btcv import VolumeTrainDataset
    from mamba_unet_tpu.eval.validate_3d import validation_all_case

    ds = VolumeTrainDataset(btcv_root, "val.list")

    def perfect_fn(x):
        # pretend logits derived from intensity thresholds: just background
        b = x[..., 0]
        logits = np.zeros((*b.shape, 5), np.float32)
        logits[..., 0] = 10.0
        return logits

    arr = validation_all_case(ds, perfect_fn, 5, patch_size=(32, 32, 32),
                              stride=(16, 16, 16))
    assert arr.shape == (1, 4, 4)
    # empty predictions -> all-zero metric rows
    np.testing.assert_array_equal(arr, 0)


def test_magicnet_3d_smoke(btcv_root):
    """One MagicNet step at rank 3 (tiny)."""
    import jax

    from mamba_unet_tpu.data import Loader, TwoStreamBatchSampler
    from mamba_unet_tpu.models import net_factory
    from mamba_unet_tpu.train import TrainConfig
    from mamba_unet_tpu.train.magicnet import MagicNetTrainer

    root = btcv_root
    ds = VolumeTrainDataset(
        root, "train.list",
        transform=Compose3D([RandomCrop3D((32, 32, 32), seed=1)]),
    )
    # duplicate indices to fill an 8-batch from 2 volumes
    sampler = [[0, 1, 0, 1, 0, 1, 0, 1]] * 2

    class FixedSampler:
        def __iter__(self):
            return iter(sampler)

        def __len__(self):
            return len(sampler)

    cfg = TrainConfig(base_lr=0.01, max_iterations=2, batch_size=8,
                      patch_size=(32, 32, 32), num_classes=5, log_every=1,
                      eval_every=10_000, seed=0)
    model = net_factory("magicnet", num_classes=5, cube_size=16,
                        patch_size=32, n_filters=2)
    trainer = MagicNetTrainer(model, cfg, labeled_bs=4, cube_size=16,
                              blend_after=1)
    result = trainer.fit(Loader(ds, FixedSampler()))
    assert result["iterations"] == 2
    assert all(np.isfinite(h["loss"]) for h in result["history"] if "loss" in h)
