"""MAD transforms + trainers tests."""

import numpy as np
import pytest

from mamba_unet_tpu.data.mad_augment import (
    MADPretrainTransform,
    RandomGeneratorV2,
    image2binary,
    np_softmax,
    random_mask_edge,
    random_mask_puzzle,
)


def test_image2binary_softmax(rng):
    lab = rng.integers(0, 4, size=(8, 8))
    oh = image2binary(lab, 1e-3, 4)
    assert oh.shape == (8, 8, 4)
    assert np.argmax(oh, -1).tolist() == lab.tolist()
    sm = np_softmax(oh)
    np.testing.assert_allclose(sm.sum(-1), 1.0, rtol=1e-5)
    assert (np.argmax(sm, -1) == lab).all()


def test_random_mask_puzzle(rng):
    img = np.ones((16, 16), np.float32)
    out = random_mask_puzzle(rng, img, mask_rate=0.25, mask_size=(4, 4))
    assert out.shape == img.shape
    # exactly 4 of 16 cells zeroed
    cells = out.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 16)
    zeroed = sum((c == 0).all() for c in out.reshape(4, 4, 4, 4)
                 .transpose(0, 2, 1, 3).reshape(16, 4, 4))
    assert zeroed == 4
    assert (img == 1).all()  # input untouched


def test_random_mask_edge(rng):
    img = np.zeros((32, 32), np.float32)
    img[8:24, 8:24] = 3.0  # sharp edge for Canny
    out = random_mask_edge(rng, img, mask_rate=0.2, mask_size=(2, 2), mask_val=0)
    assert out.shape == img.shape
    assert not np.array_equal(out, img)


def test_mad_pretrain_transform(rng):
    tf = MADPretrainTransform((32, 32), num_classes=4, seed=0)
    sample = {"image": rng.normal(size=(40, 40)).astype(np.float32),
              "label": rng.integers(0, 4, size=(40, 40))}
    out = tf(sample)
    assert out["image"].shape == (32, 32, 4)
    assert out["label"].shape == (32, 32)
    np.testing.assert_allclose(out["image"].sum(-1), 1.0, rtol=1e-4)


def test_random_generator_v2(rng):
    tf = RandomGeneratorV2((32, 32), seed=1)
    sample = {"image": rng.normal(size=(50, 44)).astype(np.float32),
              "label": rng.integers(0, 4, size=(50, 44))}
    out = tf(sample)
    assert out["image"].shape == (32, 32, 1)
    assert out["label"].shape == (32, 32)


def test_mad_finetune_steps(tmp_path):
    import jax.numpy as jnp

    from mamba_unet_tpu.data import (EpochShuffleSampler, Loader,
                                     RandomGenerator, SliceDataset,
                                     make_synthetic_acdc)
    from mamba_unet_tpu.models import UNet
    from mamba_unet_tpu.train import TrainConfig
    from mamba_unet_tpu.train.mad import MADFineTuneTrainer

    root = make_synthetic_acdc(str(tmp_path / "a"), n_train_cases=2,
                               slices_per_case=8, n_val_cases=1, size=32)
    cfg = TrainConfig(base_lr=0.05, max_iterations=6, batch_size=8,
                      patch_size=(32, 32), num_classes=4, log_every=2,
                      eval_every=10_000, seed=0)
    seg = UNet(num_classes=4, in_chns=1)
    mad = UNet(num_classes=4, in_chns=4)
    tr = MADFineTuneTrainer(seg, mad, cfg)
    ds = SliceDataset(root, transform=RandomGenerator((32, 32), seed=0))
    result = tr.fit(Loader(ds, EpochShuffleSampler(len(ds), 8, seed=0)))
    assert result["iterations"] == 6
    hist = [h["loss"] for h in result["history"] if "loss" in h]
    assert all(np.isfinite(hist))


@pytest.mark.parametrize("mode,ch", [(1, 2), (2, 2), (3, 5), (4, 5), (5, 5),
                                     (6, 5), (7, 4)])
def test_fusion_transform_modes(rng, mode, ch):
    from mamba_unet_tpu.data.mad_augment import FusionTransform

    tf = FusionTransform((32, 32), num_classes=4, fusion_mode=mode, seed=mode)
    sample = {"image": rng.uniform(size=(40, 44)).astype(np.float32),
              "label": rng.integers(0, 4, size=(40, 44)),
              "origin_img": rng.uniform(size=(40, 44)).astype(np.float32)}
    out = tf(sample)
    assert out["image"].shape == (32, 32, ch), mode
    assert out["label"].shape == (32, 32)
    if mode in (4, 6, 7):
        assert out["mask_label"].shape == (32, 32, 4)
        np.testing.assert_allclose(out["mask_label"].sum(-1), 1.0, rtol=1e-4)
