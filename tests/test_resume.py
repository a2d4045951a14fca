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


def test_mean_teacher_resume_restores_ema(tmp_path):
    """ROUND3 self-review finding #1: `--resume` with mean-teacher/UAMT must
    restore the EMA teacher — not silently reset it to the restored
    student's *initial-teacher* state. The periodic checkpoint now carries
    `ema_params`; legacy checkpoints without it re-seed the teacher from the
    restored student."""
    import jax

    from mamba_unet_tpu.train.methods import MeanTeacherTrainer
    from mamba_unet_tpu.utils import save_checkpoint

    root = make_synthetic_acdc(str(tmp_path / "a"), n_train_cases=2,
                               slices_per_case=8, n_val_cases=0, size=32)
    ds = SliceDataset(root, transform=RandomGenerator((32, 32), seed=0))

    def mk(resume, snap="snap"):
        cfg = TrainConfig(base_lr=0.05, max_iterations=6, batch_size=8,
                          patch_size=(32, 32), num_classes=4, log_every=100,
                          eval_every=10_000, ckpt_every=3, seed=0,
                          snapshot_dir=str(tmp_path / snap), resume=resume)
        return MeanTeacherTrainer(UNet(num_classes=4), cfg, labeled_bs=4,
                                  warmup_iters=0)

    t1 = mk(resume=False)
    r1 = t1.fit(Loader(ds, EpochShuffleSampler(len(ds), 8, seed=0)))
    assert r1["iterations"] == 6

    # after 6 steps the teacher lags the student (EMA) — they must differ
    diffs = [float(np.abs(np.asarray(a - b)).max())
             for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                             jax.tree_util.tree_leaves(t1.state.ema_params))]
    assert max(diffs) > 0

    t2 = mk(resume=True)
    assert t2.try_resume() == 6
    # the restored teacher is EXACTLY the trained teacher, not a re-init
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.ema_params),
                    jax.tree_util.tree_leaves(t2.state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # legacy checkpoint (no ema_params in the tree): the teacher re-seeds
    # from the restored STUDENT (correct up to EMA lag), not from random init
    legacy_dir = str(tmp_path / "legacy")
    save_checkpoint(legacy_dir, 6,
                    {"params": t1.state.params,
                     "batch_stats": t1.state.batch_stats,
                     "opt_state": t1.state.opt_state,
                     "step": t1.state.step})
    t3 = mk(resume=True, snap="legacy")
    assert t3.try_resume() == 6
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(t3.state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_preserves_best_dice_mark(tmp_path):
    """ROUND3 self-review finding #2: the best-Dice high-water mark must
    survive `--resume` (best_marks.json sidecar), so the first post-resume
    eval cannot overwrite the `best_*` lineage with a worse model (which
    cli/test.py then loads). Eval quality is scripted (a 10-iteration net on
    synthetic phantoms legitimately scores 0.0), isolating the mark
    machinery from model quality."""
    from mamba_unet_tpu.utils import latest_step, load_best_marks, save_best_marks

    root = make_synthetic_acdc(str(tmp_path / "a"), n_train_cases=2,
                               slices_per_case=8, n_val_cases=1, size=32)
    ds = SliceDataset(root, transform=RandomGenerator((32, 32), seed=0))
    from mamba_unet_tpu.data import VolumeDataset

    val = VolumeDataset(root, "val")
    snap = str(tmp_path / "snap")

    def mk(resume, max_iterations, dice):
        cfg = TrainConfig(base_lr=0.05, max_iterations=max_iterations,
                          batch_size=8, patch_size=(32, 32), num_classes=4,
                          log_every=100, eval_every=5, ckpt_every=5, seed=0,
                          eval_batch_size=8, snapshot_dir=snap, resume=resume)
        t = Trainer(UNet(num_classes=4), cfg)
        t.evaluate = lambda v, detailed=True: (dice, np.zeros((3, 2)))
        return t

    t1 = mk(resume=False, max_iterations=10, dice=0.8)
    r1 = t1.fit(Loader(ds, EpochShuffleSampler(len(ds), 8, seed=0)), val)
    assert r1["best_dice"] == pytest.approx(0.8)
    assert load_best_marks(snap).get("best") == pytest.approx(0.8)
    best_step_before = latest_step(snap, "best")

    # resumed run whose evals are WORSE (0.5 < 0.8): the persisted mark must
    # win — reported best stays 0.8 and the `best_*` lineage is untouched
    t2 = mk(resume=True, max_iterations=15, dice=0.5)
    r2 = t2.fit(Loader(ds, EpochShuffleSampler(len(ds), 8, seed=0)), val)
    assert r2["iterations"] == 15
    assert r2["best_dice"] == pytest.approx(0.8)
    assert load_best_marks(snap)["best"] == pytest.approx(0.8)
    assert latest_step(snap, "best") == best_step_before

    # a resumed run that IMPROVES raises the mark and the lineage
    t3 = mk(resume=True, max_iterations=20, dice=0.9)
    r3 = t3.fit(Loader(ds, EpochShuffleSampler(len(ds), 8, seed=0)), val)
    assert r3["best_dice"] == pytest.approx(0.9)
    assert load_best_marks(snap)["best"] == pytest.approx(0.9)
    assert latest_step(snap, "best") > best_step_before

    # sidecar semantics: merge (multi-model trainers write best/best2/best3)
    save_best_marks(snap, {"best2": 0.5})
    got = load_best_marks(snap)
    assert got["best2"] == 0.5 and got["best"] == pytest.approx(0.9)


def test_best_marks_unreadable_sidecar_returns_empty(tmp_path):
    """The loader's contract is '{} when absent or unreadable' — including
    non-numeric values and a non-object top level (hand edits, partial
    foreign writes), which must not crash the next best save."""
    import json
    import os

    from mamba_unet_tpu.utils import load_best_marks, save_best_marks

    snap = str(tmp_path)
    path = os.path.join(snap, "best_marks.json")
    for bad in ('{"best": null}', '{"best": [0.8]}', "[0.1, 0.2]",
                "not json at all"):
        with open(path, "w") as f:
            f.write(bad)
        assert load_best_marks(snap) == {}
        # and a save over the bad sidecar recovers it
        save_best_marks(snap, {"best": 0.7})
        assert load_best_marks(snap) == {"best": 0.7}
        with open(path) as f:
            assert json.load(f) == {"best": 0.7}
