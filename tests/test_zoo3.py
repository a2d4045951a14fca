"""Smoke tests: discriminators, preUnet, EffiUNet, SwinUNETR, MambaUnetMask."""

import jax
import jax.numpy as jnp
import numpy as np

from mamba_unet_tpu.models import net_factory


def _run(m, *shapes, train=False):
    xs = [jnp.asarray(np.random.default_rng(i).normal(size=s), jnp.float32)
          for i, s in enumerate(shapes)]
    variables = m.init(jax.random.key(0), *xs)
    return m.apply(variables, *xs)


def test_fc_discriminators():
    d2 = net_factory("fc_discriminator", num_classes=4, ndf=8)
    out = _run(d2, (2, 32, 32, 4), (2, 32, 32, 1))
    assert out.shape == (2, 2)
    d3 = net_factory("fc3d_discriminator", num_classes=2, ndf=4)
    out = _run(d3, (1, 16, 16, 16, 2), (1, 16, 16, 16, 1))
    assert out.shape == (1, 2)


def test_pre_unet():
    m = net_factory("preUnet", num_classes=4, depths=(1, 1, 1))
    y = _run(m, (1, 64, 64, 1))
    assert y.shape == (1, 64, 64, 4)


def test_effi_unet():
    m = net_factory("efficient_unet", num_classes=4,
                    stage_features=(8, 12, 16, 24, 32),
                    stage_blocks=(1, 1, 1, 1, 1),
                    decoder_features=(32, 24, 16, 8))
    y = _run(m, (1, 64, 64, 1))
    assert y.shape == (1, 64, 64, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_swin_unetr():
    m = net_factory("swinunetr", num_classes=2, feature_size=8,
                    depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 4),
                    window_size=4)
    y = _run(m, (1, 32, 32, 32, 1))
    assert y.shape == (1, 32, 32, 32, 2)
    assert np.isfinite(np.asarray(y)).all()


def test_mamba_unet_mask_is_real_model():
    # "MambaUnetMask" now resolves to the REAL mask model (VSSM + cube/mask
    # heads, models/mamba_mask.py) — __call__ returns (logits, embedding).
    # The full head API is covered by tests/test_mamba_mask.py.
    m = net_factory("MambaUnetMask", num_classes=4, cube_size=32,
                    patch_size=64, depths=(1, 1, 1, 1), dims=(4, 8, 16, 32),
                    d_state=4, drop_path_rate=0.0)
    seg, emb = _run(m, (1, 64, 64, 1))
    assert seg.shape == (1, 64, 64, 4)
    assert emb.shape == (1, 64, 64, 16)
