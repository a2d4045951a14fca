"""Checkpoint/resume for the method trainers that train MORE than the base
TrainState: contrastive-CC (two models + projector trio + CTA policy),
MagicNet (EMA teacher + organ-class histogram), MAD fine-tune (seg/mad/den
trio). Reference contracts: save_checkpoint_4_2C (util.py:54-94, restored by
train_Semi_Contrastive_Consistency.py:328-358), MagicNet periodic saves
(train_Semi_MagicNet_3D_for_BTCV.py:382-384), MAD best trio
(MAD_FineTuning.py:188-219). Without these saves a trained model was
discarded at process exit."""

import numpy as np
import pytest

from mamba_unet_tpu.data import (
    Loader,
    RandomGenerator,
    SliceDataset,
    TwoStreamBatchSampler,
    make_synthetic_acdc,
)
from mamba_unet_tpu.models import UNet, net_factory
from mamba_unet_tpu.train import TrainConfig


def _tree_equal(a, b):
    import jax

    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb) and la
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_contrastive_cc_kill_and_resume(tmp_path):
    """Both models, all four projector states AND the learned CTAugment
    policy rates survive a kill (the reference's richest checkpoint)."""
    import jax

    from mamba_unet_tpu.data.cta_transform import CTATransform
    from mamba_unet_tpu.data.ctaugment import CTAugment
    from mamba_unet_tpu.train.contrastive_cc import (
        ContrastiveConsistencyTrainer,
    )
    from mamba_unet_tpu.utils import latest_step, load_best_marks

    root = make_synthetic_acdc(str(tmp_path / "a"), n_train_cases=2,
                               slices_per_case=8, n_val_cases=1, size=32)
    snap = str(tmp_path / "snap")

    def mk(resume, max_iterations, seed_cta):
        cta = CTAugment(seed=seed_cta)
        tf = CTATransform((32, 32), cta, seed=1)
        ds = SliceDataset(root, transform=tf)
        cfg = TrainConfig(base_lr=0.05, max_iterations=max_iterations,
                          batch_size=8, patch_size=(32, 32), num_classes=4,
                          log_every=100, eval_every=3, ckpt_every=3, seed=0,
                          eval_batch_size=8, snapshot_dir=snap, resume=resume)
        tr = ContrastiveConsistencyTrainer(UNet(num_classes=4), cfg,
                                           labeled_bs=4)
        # scripted eval isolates the checkpoint machinery from model quality
        tr.evaluate = lambda v: 0.7
        tr.evaluate2 = lambda v: 0.6
        loader = Loader(ds, TwoStreamBatchSampler(
            range(8), range(8, 16), batch_size=8, secondary_batch_size=4,
            seed=0))
        from mamba_unet_tpu.data import VolumeDataset

        return tr, loader, VolumeDataset(root, "val"), cta, tf

    t1, loader1, val, cta1, tf1 = mk(False, 6, seed_cta=1)
    r1 = t1.fit(loader1, val, cta=cta1, cta_transform=tf1)
    assert r1["iterations"] == 6
    assert r1["best_dice"] == pytest.approx(0.7)
    assert r1["best_dice2"] == pytest.approx(0.6)
    # best checkpoints for BOTH models + marks exist on disk
    assert latest_step(snap, "best") is not None
    assert latest_step(snap, "best2") is not None
    marks = load_best_marks(snap)
    assert marks["best"] == pytest.approx(0.7)
    assert marks["best2"] == pytest.approx(0.6)
    # the policy learner has actually moved rates off the init (epoch updates
    # fire every len(loader)=2 iterations)
    assert any(
        not np.allclose(np.asarray(r), 1.0)
        for bins in cta1.rates.values() for r in bins
    )

    # "kill": a fresh process resumes everything — different CTA seed proves
    # the rates come from the sidecar, not the constructor
    t2, loader2, _, cta2, _ = mk(True, 6, seed_cta=99)
    start = t2.try_resume()
    assert start == 6
    _tree_equal(t1.cc.s1.params, t2.cc.s1.params)
    _tree_equal(t1.cc.s2.params, t2.cc.s2.params)
    _tree_equal(t1.cc.p3.params, t2.cc.p3.params)
    _tree_equal(t1.cc.p4.params, t2.cc.p4.params)
    _tree_equal(t1.cc.p1_params, t2.cc.p1_params)
    _tree_equal(t1.cc.p2_params, t2.cc.p2_params)
    _tree_equal(t1.cc.s1.opt_state, t2.cc.s1.opt_state)

    # fit() itself restores the CTA policy and continues to a new horizon
    t3, loader3, val3, cta3, tf3 = mk(True, 8, seed_cta=99)
    r3 = t3.fit(loader3, val3, cta=cta3, cta_transform=tf3)
    assert r3["iterations"] == 8
    assert int(t3.cc.step) == 8
    # rates restored from the sidecar == the trained run's rates AT SAVE TIME
    # (iteration 6, when the periodic checkpoint + sidecar were written, which
    # coincides with the epoch-update cadence) then evolved further — at
    # minimum they are NOT the fresh seed-99 init
    fresh = mk(False, 1, seed_cta=99)[3]
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for ka in sorted(cta3.rates)
        for a, b in zip(cta3.rates[ka], fresh.rates[ka])
    )
    # a worse resumed eval cannot overwrite the persisted marks
    assert load_best_marks(snap)["best"] >= 0.7


def test_cta_state_roundtrip(tmp_path):
    """cta_state.json round-trips rates exactly (atomic JSON sidecar)."""
    from mamba_unet_tpu.data.ctaugment import CTAugment
    from mamba_unet_tpu.utils import load_cta_state, save_cta_state

    cta = CTAugment(seed=3)
    # move some rates off init via the real update path
    policy = cta.policy(probe=True, weak=False)
    cta.update_rates(policy, proximity=0.9)
    cta.update_rates(cta.policy(probe=True, weak=True), proximity=0.2)
    save_cta_state(str(tmp_path), cta)

    cta2 = CTAugment(seed=77)
    assert load_cta_state(str(tmp_path), cta2)
    assert sorted(cta2.rates) == sorted(cta.rates)
    for k in cta.rates:
        for a, b in zip(cta.rates[k], cta2.rates[k]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-7)
    assert (cta2.depth, cta2.th, cta2.decay) == (cta.depth, cta.th, cta.decay)
    # absent sidecar: load returns False and leaves the policy untouched
    cta3 = CTAugment(seed=5)
    assert not load_cta_state(str(tmp_path / "nowhere"), cta3)


def test_magicnet_kill_and_resume(tmp_path):
    """Student + EMA teacher + opt state + the HOST-side organ-class
    histogram all survive a kill; the best model is saved and loadable."""
    import jax

    from mamba_unet_tpu.data import VolumeDataset
    from mamba_unet_tpu.train.magicnet import MagicNetTrainer
    from mamba_unet_tpu.utils import latest_step, load_best_marks

    root = make_synthetic_acdc(str(tmp_path / "a"), n_train_cases=2,
                               slices_per_case=8, n_val_cases=1, size=32)
    ds = SliceDataset(root, transform=RandomGenerator((32, 32), seed=0))
    val = VolumeDataset(root, "val")
    snap = str(tmp_path / "snap")

    def mk(resume, max_iterations):
        cfg = TrainConfig(base_lr=0.01, max_iterations=max_iterations,
                          batch_size=8, patch_size=(32, 32), num_classes=4,
                          log_every=100, eval_every=10, ckpt_every=20, seed=0,
                          eval_batch_size=8, snapshot_dir=snap, resume=resume)
        model = net_factory("magicnet_2D", num_classes=4, cube_size=16,
                            patch_size=32, n_filters=4)
        t = MagicNetTrainer(model, cfg, labeled_bs=4, cube_size=16,
                            blend_after=3)
        t.evaluate = lambda v, detailed=False: 0.5
        return t

    def loader():
        return Loader(ds, TwoStreamBatchSampler(
            range(8), range(8, 16), batch_size=8, secondary_batch_size=4,
            seed=0))

    # 20 iterations crosses the 20-iter histogram refresh — the saved
    # class_dist is nonzero, so the round-trip is discriminating
    t1 = mk(False, 20)
    r1 = t1.fit(loader(), val)
    assert r1["iterations"] == 20
    dist1 = t1.dist_logger.get_class_dist()
    assert dist1.sum() > 0
    assert latest_step(snap, "best") is not None
    assert load_best_marks(snap)["best"] == pytest.approx(0.5)

    t2 = mk(True, 20)
    assert t2.try_resume() == 20
    _tree_equal(t1.state.params, t2.state.params)
    _tree_equal(t1.state.ema_params, t2.state.ema_params)
    _tree_equal(t1.state.opt_state, t2.state.opt_state)
    np.testing.assert_array_equal(dist1, t2.dist_logger.get_class_dist())
    # teacher genuinely lags the student (EMA), so restoring it mattered
    diffs = [float(np.abs(np.asarray(a - b)).max())
             for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                             jax.tree_util.tree_leaves(t1.state.ema_params))]
    assert max(diffs) > 0

    # fit() resumes and continues to a new horizon
    t3 = mk(True, 24)
    r3 = t3.fit(loader(), val)
    assert r3["iterations"] == 24
    assert int(t3.state.step) == 24


def test_magicnet_final_validation_uses_saved_best(tmp_path):
    """The end-of-run protocol evaluates the SAVED best model and dumps the
    per-case metric array (metric_final.npy equivalent,
    train_Semi_MagicNet_3D_for_BTCV.py:328-337,416-417)."""
    import os

    from mamba_unet_tpu.data import VolumeDataset
    from mamba_unet_tpu.train.magicnet import MagicNetTrainer

    root = make_synthetic_acdc(str(tmp_path / "a"), n_train_cases=2,
                               slices_per_case=8, n_val_cases=1, size=32)
    ds = SliceDataset(root, transform=RandomGenerator((32, 32), seed=0))
    val = VolumeDataset(root, "val")
    snap = str(tmp_path / "snap")
    cfg = TrainConfig(base_lr=0.01, max_iterations=4, batch_size=8,
                      patch_size=(32, 32), num_classes=4, log_every=100,
                      eval_every=2, ckpt_every=100, seed=0, eval_batch_size=8,
                      snapshot_dir=snap, resume=False)
    model = net_factory("magicnet_2D", num_classes=4, cube_size=16,
                        patch_size=32, n_filters=4)
    t = MagicNetTrainer(model, cfg, labeled_bs=4, cube_size=16, blend_after=3)
    loader = Loader(ds, TwoStreamBatchSampler(
        range(8), range(8, 16), batch_size=8, secondary_batch_size=4, seed=0))
    t.fit(loader, val)
    arr = t.final_validation(val)
    assert arr.shape[0] == len(val) and arr.shape[1] == 3  # C-1 classes
    assert np.isfinite(arr).all()
    path = os.path.join(snap, "metric_final.npy")
    assert os.path.isfile(path)
    np.testing.assert_array_equal(np.load(path), arr)


def test_mad_finetune_kill_and_resume(tmp_path):
    """The seg/mad/den trio (params + opt states) survives a kill; the best
    trio saves under best/best2/best3 so cli/test.py's stacked protocol can
    load seg (--ckpt_name best) and the fine-tuned denoiser
    (--denoiser_ckpt_name best3)."""
    from mamba_unet_tpu.data.mad_augment import MADFineTuneTransform
    from mamba_unet_tpu.train.mad import MADFineTuneTrainer
    from mamba_unet_tpu.utils import (
        latest_step,
        load_best_marks,
        load_model_snapshot,
    )

    root = make_synthetic_acdc(str(tmp_path / "a"), n_train_cases=2,
                               slices_per_case=8, n_val_cases=1, size=32)
    ds = SliceDataset(root, transform=MADFineTuneTransform(
        (32, 32), num_classes=4, seed=0))
    snap = str(tmp_path / "snap")

    def mk(resume, max_iterations):
        # eval_every == max_iterations of run 1: the single eval lands on the
        # FINAL iteration, so the saved best trio equals the live end-of-run
        # states (a mid-run best would rightly differ from them)
        cfg = TrainConfig(base_lr=0.05, max_iterations=max_iterations,
                          batch_size=8, patch_size=(32, 32), num_classes=4,
                          log_every=100, eval_every=6, ckpt_every=3, seed=0,
                          eval_batch_size=8, snapshot_dir=snap, resume=resume)
        seg = UNet(num_classes=4)
        mad = UNet(num_classes=4, in_chns=4)
        t = MADFineTuneTrainer(seg, mad, cfg)
        t.evaluate = lambda v, detailed=False: 0.65
        return t

    from mamba_unet_tpu.data import EpochShuffleSampler, VolumeDataset

    def loader():
        return Loader(ds, EpochShuffleSampler(len(ds), 8, seed=0))

    val = VolumeDataset(root, "val")
    t1 = mk(False, 6)
    r1 = t1.fit(loader(), val)
    assert r1["iterations"] == 6
    # the trio saved at the same best step under three names
    s = latest_step(snap, "best")
    assert s is not None
    assert latest_step(snap, "best2") == s
    assert latest_step(snap, "best3") == s
    assert load_best_marks(snap)["best"] == pytest.approx(0.65)

    # the fine-tuned denoiser is loadable exactly the way cli/test.py does it
    _, den_vars = load_model_snapshot("unet", 4, (32, 32), 4, snap, "best3")
    _tree_equal(den_vars["params"], t1.mad_state.den.params)
    _, seg_vars = load_model_snapshot("unet", 4, (32, 32), 1, snap, "best")
    _tree_equal(seg_vars["params"], t1.mad_state.seg.params)

    # kill-and-resume restores all three states
    t2 = mk(True, 6)
    assert t2.try_resume() == 6
    _tree_equal(t1.mad_state.seg.params, t2.mad_state.seg.params)
    _tree_equal(t1.mad_state.mad.params, t2.mad_state.mad.params)
    _tree_equal(t1.mad_state.den.params, t2.mad_state.den.params)
    _tree_equal(t1.mad_state.seg.opt_state, t2.mad_state.seg.opt_state)
    # the three models have genuinely diverged from one another
    import jax

    lm = jax.tree_util.tree_leaves(t2.mad_state.mad.params)
    ld = jax.tree_util.tree_leaves(t2.mad_state.den.params)
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(lm, ld))

    # fit() resumes and continues
    t3 = mk(True, 9)
    r3 = t3.fit(loader(), val)
    assert r3["iterations"] == 9
    assert int(t3.mad_state.step) == 9
