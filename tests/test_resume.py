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


def test_cross_teaching_kill_and_resume(tmp_path):
    """Two-model kill-and-resume (train_Semi_Mamba_UNet.py has no resume;
    this is the preemption-safety the 30k-iter semi runs need)."""
    import jax

    from mamba_unet_tpu.data import TwoStreamBatchSampler
    from mamba_unet_tpu.train.methods import CrossTeachingTrainer

    root = make_synthetic_acdc(str(tmp_path / "a"), n_train_cases=2,
                               slices_per_case=8, n_val_cases=0, size=32)
    ds = SliceDataset(root, transform=RandomGenerator((32, 32), seed=0))

    def mk(resume, max_iterations):
        cfg = TrainConfig(base_lr=0.05, max_iterations=max_iterations,
                          batch_size=8, patch_size=(32, 32), num_classes=4,
                          log_every=100, eval_every=10_000, ckpt_every=4,
                          seed=0, snapshot_dir=str(tmp_path / "snap"),
                          resume=resume)
        return CrossTeachingTrainer(UNet(num_classes=4), cfg, labeled_bs=4)

    def loader():
        return Loader(ds, TwoStreamBatchSampler(range(8), range(8, 16),
                                                batch_size=8,
                                                secondary_batch_size=4,
                                                seed=0))

    t1 = mk(resume=False, max_iterations=8)
    r1 = t1.fit(loader())
    assert r1["iterations"] == 8

    # "kill": fresh trainer resumes both models + opt states from step 8
    t2 = mk(resume=True, max_iterations=8)
    start = t2.try_resume()
    assert start == 8
    for a, b in zip(jax.tree_util.tree_leaves(t1.cross.s1.params),
                    jax.tree_util.tree_leaves(t2.cross.s1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(t1.cross.s2.params),
                    jax.tree_util.tree_leaves(t2.cross.s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # model-2 params differ from model-1 (independent init seeds)
    l1 = jax.tree_util.tree_leaves(t2.cross.s1.params)
    l2 = jax.tree_util.tree_leaves(t2.cross.s2.params)
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(l1, l2))

    # fit() itself resumes and continues to the new horizon
    t3 = mk(resume=True, max_iterations=12)
    r3 = t3.fit(loader())
    assert r3["iterations"] == 12
    assert int(t3.cross.step) == 12
