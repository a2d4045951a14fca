"""Trainer smoke tests on the virtual 8-device CPU mesh + synthetic data."""

import jax
import numpy as np
import pytest

from mamba_unet_tpu.data import (
    EpochShuffleSampler,
    Loader,
    RandomGenerator,
    SliceDataset,
    VolumeDataset,
    make_synthetic_acdc,
)
from mamba_unet_tpu.models import UNet
from mamba_unet_tpu.train import TrainConfig, Trainer


@pytest.fixture(scope="module")
def acdc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("acdc_train")
    return make_synthetic_acdc(str(root), n_train_cases=4, slices_per_case=8,
                               n_val_cases=2, size=32)


def test_mesh_uses_all_devices():
    assert len(jax.devices()) == 8  # conftest virtual mesh


def test_trainer_loss_decreases(acdc_root):
    cfg = TrainConfig(
        base_lr=0.05, max_iterations=30, batch_size=8, patch_size=(32, 32),
        num_classes=4, eval_every=1000, log_every=5, seed=0,
    )
    model = UNet(num_classes=4)
    trainer = Trainer(model, cfg)
    ds = SliceDataset(acdc_root, transform=RandomGenerator((32, 32), seed=0))
    loader = Loader(ds, EpochShuffleSampler(len(ds), 8, seed=0))
    result = trainer.fit(loader)
    assert result["iterations"] == 30
    losses = [h["loss"] for h in result["history"] if "loss" in h]
    assert losses[0] > losses[-1], losses
    assert np.isfinite(losses).all()


def test_trainer_eval_and_best_ckpt(acdc_root, tmp_path):
    cfg = TrainConfig(
        base_lr=0.05, max_iterations=20, batch_size=8, patch_size=(32, 32),
        num_classes=4, eval_every=10, eval_batch_size=4, log_every=100,
        seed=0, snapshot_dir=str(tmp_path / "snap"),
    )
    model = UNet(num_classes=4)
    trainer = Trainer(model, cfg)
    ds = SliceDataset(acdc_root, transform=RandomGenerator((32, 32), seed=1))
    val = VolumeDataset(acdc_root, "val")
    loader = Loader(ds, EpochShuffleSampler(len(ds), 8, seed=1))
    result = trainer.fit(loader, val)
    evals = [h["val_dice"] for h in result["history"] if "val_dice" in h]
    assert len(evals) == 2
    assert all(0.0 <= d <= 1.0 for d in evals)


def test_trainer_batch_is_sharded(acdc_root):
    """The jitted step must consume a batch sharded over the data axis."""
    cfg = TrainConfig(base_lr=0.01, max_iterations=2, batch_size=8,
                      patch_size=(32, 32), num_classes=4, log_every=1, seed=0)
    model = UNet(num_classes=4)
    trainer = Trainer(model, cfg)
    ds = SliceDataset(acdc_root, transform=RandomGenerator((32, 32), seed=2))
    batch = {
        "image": np.stack([ds[i]["image"] for i in range(8)]),
        "label": np.stack([ds[i]["label"] for i in range(8)]),
    }
    sharded = jax.device_put(batch["image"], trainer._bsh)
    assert len(sharded.sharding.device_set) == 8
    loader = Loader(ds, EpochShuffleSampler(len(ds), 8, seed=2))
    result = trainer.fit(loader)
    assert result["iterations"] == 2
