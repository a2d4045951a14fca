"""Smoke tests: Attention-UNet, UNETR, nnU-Net GenericUNet, Gaussian SW."""

import jax
import jax.numpy as jnp
import numpy as np

from mamba_unet_tpu.eval.inference import (
    gaussian_importance_map,
    sliding_window_inference_3d,
)
from mamba_unet_tpu.models import net_factory


def _run(m, shape):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    variables = m.init(jax.random.key(0), x)
    return m.apply(variables, x)


def test_attention_unet():
    m = net_factory("attention_unet", num_classes=2)
    y = _run(m, (1, 32, 32, 32, 1))
    assert y.shape == (1, 32, 32, 32, 2)
    assert np.isfinite(np.asarray(y)).all()


def test_unetr_small():
    m = net_factory("unetr", num_classes=3, img_size=32, patch_size=16,
                    hidden=64, mlp_dim=128, heads=4, n_layers=12,
                    feature_size=8)
    y = _run(m, (1, 32, 32, 32, 1))
    assert y.shape == (1, 32, 32, 32, 3)


def test_nnunet_anisotropic():
    m = net_factory("nnUNet", num_classes=4)
    # anisotropic pooling: depth pooled 4x (2 stages of [2,2,2]),
    # in-plane pooled 64x
    y = _run(m, (1, 8, 64, 64, 1))
    assert y.shape == (1, 8, 64, 64, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_gaussian_importance_map():
    g = gaussian_importance_map((8, 8, 8))
    assert g.shape == (8, 8, 8)
    assert g.max() == 1.0
    assert g.min() > 0
    assert g[4, 4, 4] == g.max()


def test_gaussian_sliding_window():
    image = np.zeros((12, 12, 12), np.float32)
    image[4:8, 4:8, 4:8] = 1.0

    def predict_fn(x):
        fg = (x[..., 0] > 0.5).astype(np.float32)
        return np.stack([1 - fg, fg], axis=-1) * 10

    pred = sliding_window_inference_3d(image, predict_fn, 2,
                                       patch_size=(8, 8, 8), stride=(4, 4, 4),
                                       gaussian_weighting=True)
    np.testing.assert_array_equal(pred, (image > 0.5).astype(np.int64))
