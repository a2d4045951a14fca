"""Mask model + SSL pretraining tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_unet_tpu.models import net_factory
from mamba_unet_tpu.objectives.masked import make_masked_input, make_shuffled_input


def test_mask_model_heads(rng):
    m = net_factory("magicnet_2D_mask", num_classes=4, cube_size=16,
                    patch_size=32, n_filters=4)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)), jnp.float32)
    variables = m.init(jax.random.key(0), x, method="init_all")
    seg, emb = m.apply(variables, x)
    assert seg.shape == (2, 32, 32, 4)
    out = m.apply(variables, x, method="forward_mix_pos_mask")
    assert out.shape == (2, 256)
    # position ids change the output (the embedding is input-dependent)
    perm = jnp.tile(jnp.arange(4, dtype=jnp.float32)[::-1], (2, 1))
    out2 = m.apply(variables, x, perm, method="forward_mix_pos_mask")
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_make_shuffled_and_masked(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 1)), jnp.float32)
    shuffled, perms = make_shuffled_input(jax.random.key(0), x, cube_size=8)
    assert shuffled.shape == x.shape and perms.shape == (2, 4)
    np.testing.assert_allclose(np.sort(np.asarray(shuffled).ravel()),
                               np.sort(np.asarray(x).ravel()), rtol=1e-6)
    masked, vis = make_masked_input(jax.random.key(1), x, cube_size=8,
                                    masked_rate=0.5)
    assert masked.shape == x.shape and vis.shape == (2, 4)
    assert set(np.unique(np.asarray(vis))) <= {0.0, 1.0}


def test_mask_pretrain_steps(tmp_path):
    from mamba_unet_tpu.data import (EpochShuffleSampler, Loader,
                                     RandomGenerator, SliceDataset,
                                     make_synthetic_acdc)
    from mamba_unet_tpu.train import TrainConfig
    from mamba_unet_tpu.train.mask_pretrain import MaskPretrainTrainer

    root = make_synthetic_acdc(str(tmp_path / "a"), n_train_cases=2,
                               slices_per_case=8, n_val_cases=0, size=32)
    cfg = TrainConfig(base_lr=0.01, max_iterations=3, batch_size=8,
                      patch_size=(32, 32), num_classes=4, log_every=1,
                      eval_every=10_000, seed=0)
    model = net_factory("magicnet_2D_mask", num_classes=4, cube_size=16,
                        patch_size=32, n_filters=4)
    tr = MaskPretrainTrainer(model, cfg, cube_size=16)
    ds = SliceDataset(root, transform=RandomGenerator((32, 32), seed=0))
    result = tr.fit(Loader(ds, EpochShuffleSampler(len(ds), 8, seed=0)))
    assert result["iterations"] == 3
    assert all(np.isfinite(h["loss"]) for h in result["history"] if "loss" in h)
