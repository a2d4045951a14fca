"""Weak-Mamba-UNet (scribble supervision) tests: scribble synthesis, partial
CE semantics, the three-network trainer, and the CLI entry.

The reference publishes Weak-Mamba-UNet results (WeakMambaUNet.pdf Table 1)
but no code; the method contract tested here is the paper's: pCE on
scribble pixels only (Eq. 2) + Dice vs the random-simplex composite pseudo
label (Eq. 3-4), three networks (Eq. 1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_unet_tpu.data.scribble import scribbles_from_mask
from mamba_unet_tpu.objectives import cross_entropy_loss

pytestmark = pytest.mark.fast


def _ring_mask(size=64):
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    r = np.hypot(yy - size / 2, xx - size / 2)
    label = np.zeros((size, size), np.uint8)
    label[r < 20] = 2
    label[r < 10] = 3
    return label


def test_scribbles_subset_and_coverage():
    label = _ring_mask()
    rng = np.random.default_rng(0)
    scrib = scribbles_from_mask(label, rng, ignore_index=4)
    assert scrib.shape == label.shape
    # every scribbled pixel carries the true class of that pixel
    ann = scrib != 4
    assert ann.any()
    np.testing.assert_array_equal(scrib[ann], label[ann])
    # each present class gets at least a few scribble pixels
    for k in np.unique(label):
        assert (scrib == k).sum() >= 5, f"class {k} unscribbled"
    # scribbles are sparse (a few % of the slice)
    assert ann.mean() < 0.2


def test_scribbles_absent_class_not_invented():
    label = np.zeros((32, 32), np.uint8)  # background only
    scrib = scribbles_from_mask(label, np.random.default_rng(1))
    assert set(np.unique(scrib)) <= {0, 4}


def test_partial_ce_ignores_unlabeled_pixels():
    rng = jax.random.key(0)
    logits = jax.random.normal(rng, (2, 8, 8, 4))
    labels = jnp.zeros((2, 8, 8), jnp.int32).at[:, :2, :].set(4)

    # value: equals CE over only the annotated rows
    full = cross_entropy_loss(logits[:, 2:], labels[:, 2:], ignore_index=4)
    masked = cross_entropy_loss(logits, labels, ignore_index=4)
    np.testing.assert_allclose(masked, full, rtol=1e-6)

    # gradient: zero on ignored pixels
    g = jax.grad(lambda lo: cross_entropy_loss(lo, labels, ignore_index=4))(
        logits
    )
    np.testing.assert_array_equal(np.asarray(g[:, :2, :]), 0.0)
    assert np.abs(np.asarray(g[:, 2:, :])).max() > 0


def test_weak_trainer_three_tiny_nets(tmp_path):
    from mamba_unet_tpu.data import (
        EpochShuffleSampler,
        Loader,
        RandomGenerator,
        SliceDataset,
        VolumeDataset,
        make_synthetic_acdc,
    )
    from mamba_unet_tpu.models import net_factory
    from mamba_unet_tpu.train import TrainConfig
    from mamba_unet_tpu.train.weak import WeakScribbleTrainer

    root = make_synthetic_acdc(str(tmp_path / "ds"), n_train_cases=2,
                               slices_per_case=4, n_val_cases=1, size=32,
                               scribble=True)
    cfg = TrainConfig(base_lr=0.01, max_iterations=3, batch_size=8,
                      patch_size=(32, 32), num_classes=4, eval_every=2,
                      snapshot_dir=str(tmp_path / "snap"), ckpt_every=2)
    nets = [net_factory("unet", num_classes=4) for _ in range(3)]
    trainer = WeakScribbleTrainer(nets[0], cfg, model2=nets[1], model3=nets[2])

    ds = SliceDataset(root, sup_type="scribble",
                      transform=RandomGenerator((32, 32), label_cval=4))
    # scribble labels reach the batch: ignore index present, nothing > 4
    sample = ds[0]
    assert sample["label"].max() <= 4 and (sample["label"] == 4).any()

    sampler = EpochShuffleSampler(len(ds), cfg.batch_size, seed=0)
    result = trainer.fit(Loader(ds, sampler), VolumeDataset(root, "val"))
    assert result["iterations"] == 3
    assert np.isfinite(result["history"][0]["loss"])
    # periodic 3-model checkpoint written for resume
    import os

    assert any(n.startswith("state_") for n in
               os.listdir(tmp_path / "snap"))


def test_cli_weak_scribble_smoke(tmp_path):
    from mamba_unet_tpu.cli.test import main as test_main
    from mamba_unet_tpu.cli.train import main

    snap = str(tmp_path / "snap")
    assert main([
        "--method", "weak_scribble", "--model", "unet",
        "--model2", "unet", "--model3", "unet",
        "--synthetic", "--synthetic_spec", "2", "4", "1", "0", "32",
        "--patch_size", "32", "32", "--batch_size", "8",
        "--max_iterations", "2", "--eval_every", "1",
        "--num_classes", "4", "--snapshot_dir", snap,
    ]) == 0
    # each trio member's best checkpoint is testable through cli.test
    import os

    root = [d for d in os.listdir("/tmp") if d.startswith(
        "synthetic_acdc_2x4v1t0s32w")][0]
    for name in ("best", "best2", "best3"):
        assert test_main([
            "--root_path", os.path.join("/tmp", root), "--model", "unet",
            "--num_classes", "4", "--patch_size", "32", "32",
            "--split", "val", "--checkpoint", snap, "--ckpt_name", name,
        ]) == 0


def test_weak_trainer_pce_only_ablation(tmp_path):
    """The paper's ablation baseline: pCE alone — the pseudo-label Dice term
    must be exactly zero and training must still step."""
    from mamba_unet_tpu.data import (
        EpochShuffleSampler,
        Loader,
        RandomGenerator,
        SliceDataset,
        make_synthetic_acdc,
    )
    from mamba_unet_tpu.models import net_factory
    from mamba_unet_tpu.train import TrainConfig
    from mamba_unet_tpu.train.weak import WeakScribbleTrainer

    root = make_synthetic_acdc(str(tmp_path / "ds"), n_train_cases=2,
                               slices_per_case=4, n_val_cases=0, size=32,
                               scribble=True)
    cfg = TrainConfig(base_lr=0.01, max_iterations=2, batch_size=8,
                      patch_size=(32, 32), num_classes=4, eval_every=1000)
    nets = [net_factory("unet", num_classes=4) for _ in range(3)]
    trainer = WeakScribbleTrainer(nets[0], cfg, model2=nets[1],
                                  model3=nets[2], pce_only=True)
    ds = SliceDataset(root, sup_type="scribble",
                      transform=RandomGenerator((32, 32), label_cval=4))
    batch = next(iter(Loader(ds, EpochShuffleSampler(len(ds), 8, seed=0))))
    tri, logs = trainer._tri_step(
        trainer.tri,
        {"image": jax.device_put(batch["image"]),
         "label": jax.device_put(batch["label"])},
    )
    assert float(logs["loss_pseudo_dice"]) == 0.0
    assert np.isfinite(float(logs["loss_total"]))


def test_weak_trainer_trio_resume(tmp_path):
    """Kill-and-resume of the three-model state: a fresh trainer with
    resume=True must pick up step/params/opt_state for all three nets."""
    from mamba_unet_tpu.data import (
        EpochShuffleSampler,
        Loader,
        RandomGenerator,
        SliceDataset,
        make_synthetic_acdc,
    )
    from mamba_unet_tpu.models import net_factory
    from mamba_unet_tpu.train import TrainConfig
    from mamba_unet_tpu.train.weak import WeakScribbleTrainer

    root = make_synthetic_acdc(str(tmp_path / "ds"), n_train_cases=2,
                               slices_per_case=4, n_val_cases=0, size=32,
                               scribble=True)
    snap = str(tmp_path / "snap")

    def make_trainer(max_it, resume):
        cfg = TrainConfig(base_lr=0.01, max_iterations=max_it, batch_size=8,
                          patch_size=(32, 32), num_classes=4, eval_every=1000,
                          snapshot_dir=snap, ckpt_every=2, resume=resume)
        nets = [net_factory("unet", num_classes=4) for _ in range(3)]
        return cfg, WeakScribbleTrainer(nets[0], cfg, model2=nets[1],
                                        model3=nets[2])

    def loader():
        ds = SliceDataset(root, sup_type="scribble",
                          transform=RandomGenerator((32, 32), label_cval=4))
        return Loader(ds, EpochShuffleSampler(len(ds), 8, seed=0))

    _, tr1 = make_trainer(3, resume=False)
    r1 = tr1.fit(loader())
    assert r1["iterations"] == 3

    _, tr2 = make_trainer(5, resume=True)
    r2 = tr2.fit(loader())
    # resumed at the step-2 periodic checkpoint, ran 3 more
    assert r2["iterations"] == 5
    assert int(jax.device_get(tr2.tri.step)) == 5
    for s in (tr2.tri.s1, tr2.tri.s2, tr2.tri.s3):
        leaves = jax.tree_util.tree_leaves(jax.device_get(s.params))
        assert all(np.isfinite(l).all() for l in leaves)
    # the continued run wrote the next periodic checkpoint
    import os

    assert os.path.isdir(os.path.join(snap, "state_4"))
