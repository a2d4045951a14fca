"""CTATransform + contrastive-consistency trainer smoke tests."""

import numpy as np
import pytest

from mamba_unet_tpu.data import (
    Loader,
    SliceDataset,
    TwoStreamBatchSampler,
    make_synthetic_acdc,
)
from mamba_unet_tpu.data.cta_transform import CTATransform
from mamba_unet_tpu.data.ctaugment import CTAugment
from mamba_unet_tpu.models import UNet
from mamba_unet_tpu.train import TrainConfig
from mamba_unet_tpu.train.contrastive_cc import ContrastiveConsistencyTrainer


def test_cta_transform_outputs(rng):
    cta = CTAugment(seed=0)
    tf = CTATransform((32, 32), cta, grid_shape=(4, 4), seed=0)
    sample = {"image": rng.uniform(size=(48, 48)).astype(np.float32),
              "label": rng.integers(0, 4, size=(48, 48))}
    out = tf(sample)
    for k in ("image", "image_weak", "image_strong", "jigsaw_image"):
        assert out[k].shape == (32, 32, 1), k
    assert out["label_aug"].shape == (32, 32)
    assert set(np.unique(out["label_aug"])) <= {0, 1, 2, 3}
    assert out["jigsaw_index"].shape == (16,)
    # strong differs from weak (photometric ops applied on top)
    assert not np.allclose(out["image_weak"], out["image_strong"])


def test_cc_trainer_steps(tmp_path):
    root = make_synthetic_acdc(str(tmp_path / "a"), n_train_cases=2,
                               slices_per_case=8, n_val_cases=0, size=32)
    cta = CTAugment(seed=1)
    tf = CTATransform((32, 32), cta, seed=1)
    ds = SliceDataset(root, transform=tf)
    sampler = TwoStreamBatchSampler(range(8), range(8, 16), batch_size=8,
                                    secondary_batch_size=4, seed=0)
    cfg = TrainConfig(base_lr=0.05, max_iterations=5, batch_size=8,
                      patch_size=(32, 32), num_classes=4, log_every=1,
                      eval_every=10_000, seed=0)
    tr = ContrastiveConsistencyTrainer(UNet(num_classes=4), cfg, labeled_bs=4)
    result = tr.fit(Loader(ds, sampler), cta=cta, cta_transform=tf)
    assert result["iterations"] == 5
    losses = [h["loss"] for h in result["history"] if "loss" in h]
    assert all(np.isfinite(losses))
    # EMA projector params must differ from the trained ones after updates
    import jax

    diffs = [float(np.abs(np.asarray(a - b)).max()) for a, b in zip(
        jax.tree_util.tree_leaves(tr.cc.p1_params),
        jax.tree_util.tree_leaves(tr.cc.p3.params))]
    assert max(diffs) > 0


def test_cc_mask_variant(tmp_path):
    """The _mask script variant: CC + shuffle/mask recovery on the mask net."""
    from mamba_unet_tpu.models import net_factory

    root = make_synthetic_acdc(str(tmp_path / "b"), n_train_cases=2,
                               slices_per_case=8, n_val_cases=0, size=32)
    cta = CTAugment(seed=2)
    tf = CTATransform((32, 32), cta, seed=2)
    ds = SliceDataset(root, transform=tf)
    sampler = TwoStreamBatchSampler(range(8), range(8, 16), batch_size=8,
                                    secondary_batch_size=4, seed=0)
    cfg = TrainConfig(base_lr=0.05, max_iterations=3, batch_size=8,
                      patch_size=(32, 32), num_classes=4, log_every=1,
                      eval_every=10_000, seed=0)
    model = net_factory("magicnet_2D_mask", num_classes=4, cube_size=16,
                        patch_size=32, n_filters=4)
    tr = ContrastiveConsistencyTrainer(model, cfg, labeled_bs=4,
                                       mask_recovery=True, mask_cube_size=16)
    result = tr.fit(Loader(ds, sampler), cta=cta, cta_transform=tf)
    assert result["iterations"] == 3
    assert all(np.isfinite(h["loss"]) for h in result["history"] if "loss" in h)
