"""MambaUnetMask: the visual-Mamba MagicNet-mask model + method.

The upstream ``MambaUnetMask`` (mamba_2D_mask.py:23-46) lacks the heads its
training script (train_Semi_Mamba_2D_mask.py) calls; this repo builds the
intended model. These tests check (a) the full head API the script drives,
(b) the loss composition of the mask-recovery MagicNet step mirroring
train_Semi_Mamba_2D_mask.py:241-266.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_model():
    from mamba_unet_tpu.models import net_factory

    return net_factory(
        "MambaUnetMask", num_classes=4, cube_size=32, patch_size=64,
        depths=(1, 1, 1, 1), dims=(4, 8, 16, 32), d_state=4,
        drop_path_rate=0.0,
    )


def test_mamba_mask_head_api(tiny_model, rng):
    import jax
    import jax.numpy as jnp

    model = tiny_model
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 1)).astype(np.float32))
    variables = jax.jit(
        lambda r, a: model.init(r, a, method="init_all")
    )(jax.random.key(0), x)

    # __call__ -> (logits, 16-ch embedding)
    seg, emb = model.apply(variables, x)
    assert seg.shape == (2, 64, 64, 4)
    assert emb.shape == (2, 64, 64, 16)

    # prediction head on the embedding reproduces the logits
    seg2 = model.apply(variables, emb, method="forward_prediction_head")
    np.testing.assert_allclose(np.asarray(seg2), np.asarray(seg), atol=1e-5)

    # encoder feature list: 4 skips + bottleneck; decoder round-trips it
    feats = model.apply(variables, x, method="forward_encoder")
    assert len(feats) == 5
    assert feats[-1].shape == (2, 2, 2, 32)  # 64/32 bottleneck grid
    seg3, emb3 = model.apply(variables, feats, method="forward_decoder")
    assert seg3.shape == seg.shape and emb3.shape == emb.shape

    # location head on a flattened cube bottleneck: (patch/cube)^2 classes
    cube_feats = model.apply(
        variables, x[:, :32, :32, :], method="forward_encoder"
    )
    flat = cube_feats[-1].reshape(2, -1)
    loc = model.apply(variables, flat, method="forward_location")
    assert loc.shape == (2, 4)  # (64/32)^2 locations

    # mix-out head: (B, 256) global embedding; pos_embed/mask accepted
    g = model.apply(variables, x, method="forward_mix_pos_mask")
    assert g.shape == (2, 256)
    ids = jnp.tile(jnp.arange(4, dtype=jnp.float32), (2, 1))
    g2 = model.apply(variables, x, ids, None, method="forward_mix_pos_mask")
    assert g2.shape == (2, 256)


def test_semi_mamba_mask_step_composition(tmp_path):
    """One mask-recovery MagicNet step on MambaUnetMask: every loss term of
    train_Semi_Mamba_2D_mask.py:241-266 present and finite."""
    import jax.numpy as jnp

    from mamba_unet_tpu.data import (
        Loader,
        RandomGenerator,
        SliceDataset,
        TwoStreamBatchSampler,
        make_synthetic_acdc,
    )
    from mamba_unet_tpu.models import net_factory
    from mamba_unet_tpu.train import TrainConfig
    from mamba_unet_tpu.train.magicnet import MagicNetTrainer

    root = make_synthetic_acdc(str(tmp_path / "acdc"), n_train_cases=2,
                               slices_per_case=4, n_val_cases=1, size=64)
    cfg = TrainConfig(base_lr=0.01, max_iterations=2, batch_size=4,
                      patch_size=(64, 64), num_classes=4, log_every=1,
                      eval_every=10_000, seed=0)
    model = net_factory("MambaUnetMask", num_classes=4, cube_size=32,
                        patch_size=64, depths=(1, 1, 1, 1),
                        dims=(4, 8, 16, 32), d_state=4, drop_path_rate=0.0)
    trainer = MagicNetTrainer(model, cfg, labeled_bs=2, cube_size=32,
                              mask_recovery=True)
    ds = SliceDataset(root, transform=RandomGenerator((64, 64), seed=0))
    sampler = TwoStreamBatchSampler(range(4), range(4, 8), batch_size=4,
                                    secondary_batch_size=2, seed=0)

    # run one step directly to inspect the composed loss terms
    it = iter(Loader(ds, sampler))
    batch = next(it)
    batch = {
        "image": jnp.asarray(batch["image"]),
        "label": jnp.asarray(batch["label"]),
        "class_dist": jnp.zeros((4,), jnp.float32),
    }
    state, logs = trainer._step(trainer.state, batch)
    for term in ("loss_total", "loss_sup", "loss_loc", "loss_cons",
                 "loss_recv"):
        assert term in logs, term
        assert np.isfinite(float(logs[term])), term
    assert float(logs["loss_recv"]) >= 0.0
    # total = sup + 0.1*loc + w*cons + recv
    want = (float(logs["loss_sup"]) + 0.1 * float(logs["loss_loc"])
            + float(logs["cons_weight"]) * float(logs["loss_cons"])
            + float(logs["loss_recv"]))
    np.testing.assert_allclose(float(logs["loss_total"]), want, rtol=1e-5)
