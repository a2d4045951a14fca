"""Checkpoint/resume: periodic ckpt -> restart continues from saved step."""

import numpy as np
import pytest

from mamba_unet_tpu.data import (
    EpochShuffleSampler,
    Loader,
    RandomGenerator,
    SliceDataset,
    make_synthetic_acdc,
)
from mamba_unet_tpu.models import UNet
from mamba_unet_tpu.train import TrainConfig, Trainer


def test_resume_from_periodic_ckpt(tmp_path):
    root = make_synthetic_acdc(str(tmp_path / "a"), n_train_cases=2,
                               slices_per_case=8, n_val_cases=0, size=32)
    ds = SliceDataset(root, transform=RandomGenerator((32, 32), seed=0))

    def mk(resume):
        cfg = TrainConfig(base_lr=0.05, max_iterations=10, batch_size=8,
                          patch_size=(32, 32), num_classes=4, log_every=100,
                          eval_every=10_000, ckpt_every=5, seed=0,
                          snapshot_dir=str(tmp_path / "snap"),
                          resume=resume, tensorboard=True)
        return Trainer(UNet(num_classes=4), cfg)

    t1 = mk(resume=False)
    r1 = t1.fit(Loader(ds, EpochShuffleSampler(len(ds), 8, seed=0)))
    assert r1["iterations"] == 10
    assert int(t1.state.step) == 10

    t2 = mk(resume=True)
    start = t2.try_resume()
    assert start == 10
    assert int(t2.state.step) == 10
    # restored params equal the trained ones
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
