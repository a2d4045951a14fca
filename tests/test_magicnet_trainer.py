"""MagicNet trainer smoke test (cube pipeline end-to-end, tiny shapes)."""

import numpy as np
import pytest

from mamba_unet_tpu.data import (
    Loader,
    RandomGenerator,
    SliceDataset,
    TwoStreamBatchSampler,
    make_synthetic_acdc,
)
from mamba_unet_tpu.models import net_factory
from mamba_unet_tpu.train import TrainConfig
from mamba_unet_tpu.train.magicnet import MagicNetTrainer, magic_dice_labels


def test_magic_dice_zero_for_perfect():
    import jax
    import jax.numpy as jnp

    labels = jnp.asarray(np.random.default_rng(0).integers(0, 3, (1, 8, 8)))
    probs = jax.nn.one_hot(labels, 3)
    assert float(magic_dice_labels(probs, labels)) < 1e-6


def test_magicnet_trainer_steps(tmp_path):
    root = make_synthetic_acdc(str(tmp_path / "acdc"), n_train_cases=2,
                               slices_per_case=8, n_val_cases=1, size=32)
    cfg = TrainConfig(base_lr=0.01, max_iterations=25, batch_size=8,
                      patch_size=(32, 32), num_classes=4, log_every=1,
                      eval_every=10_000, seed=0)
    model = net_factory("magicnet_2D", num_classes=4, cube_size=16,
                        patch_size=32, n_filters=4)
    trainer = MagicNetTrainer(model, cfg, labeled_bs=4, cube_size=16,
                              blend_after=3)
    ds = SliceDataset(root, transform=RandomGenerator((32, 32), seed=0))
    sampler = TwoStreamBatchSampler(range(8), range(8, 16), batch_size=8,
                                    secondary_batch_size=4, seed=0)
    result = trainer.fit(Loader(ds, sampler))
    assert result["iterations"] == 25
    losses = [h["loss"] for h in result["history"] if "loss" in h]
    assert all(np.isfinite(losses))
    # the class-dist logger must have been refreshed (20-iter cadence)
    assert trainer.dist_logger.get_class_dist().sum() > 0
