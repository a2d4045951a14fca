"""Shape/grad smoke tests for the wider model zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_unet_tpu.models import net_factory, list_models


def _init_apply(m, shape, train=False):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    variables = m.init(jax.random.key(0), x)
    if train:
        out, _ = m.apply(variables, x, deterministic=False,
                         rngs={"dropout": jax.random.key(1)},
                         mutable=["batch_stats"])
    else:
        out = m.apply(variables, x)
    return out


def test_vnet_2d():
    m = net_factory("vnet", num_classes=4, in_chns=1)
    seg = _init_apply(m, (1, 64, 64, 1))
    assert seg.shape == (1, 64, 64, 4)


def test_vnet_3d():
    m = net_factory("vnet_3D", num_classes=2)
    seg = _init_apply(m, (1, 32, 32, 32, 1))
    assert seg.shape == (1, 32, 32, 32, 2)


def test_magicnet_2d_heads():
    m = net_factory("magicnet_2D", num_classes=4, cube_size=16, patch_size=32)
    x = jnp.zeros((2, 32, 32, 1), jnp.float32)
    variables = m.init(jax.random.key(0), x)
    seg, emb = m.apply(variables, x)
    assert seg.shape == (2, 32, 32, 4)
    assert emb.shape == (2, 32, 32, 16)
    # encoder/decoder split callable via method=
    feats = m.apply(variables, x, method="forward_encoder")
    assert len(feats) == 5
    seg2, _ = m.apply(variables, feats, method="forward_decoder")
    np.testing.assert_allclose(np.asarray(seg), np.asarray(seg2), atol=1e-5)
    head = m.apply(variables, emb, method="forward_prediction_head")
    assert head.shape == seg.shape
    # location head: bottleneck of one 16³ cube -> (32/16)²=4 logits
    flat = jnp.zeros((4, 256), jnp.float32)


def test_magicnet_location_head():
    m = net_factory("magicnet_2D", num_classes=4, cube_size=16, patch_size=32)
    x = jnp.zeros((2, 32, 32, 1), jnp.float32)
    variables = m.init(jax.random.key(0), x, method="init_all")
    # bottleneck of a 16² cube: (16/16)² x 256 filters flattened
    flat = jnp.zeros((4, 16 * 16), jnp.float32)
    out, _ = m.apply(variables, flat, method="forward_location",
                     deterministic=False, mutable=["batch_stats"],
                     rngs={"dropout": jax.random.key(0)})
    assert out.shape == (4, 4)


def test_pnet():
    m = net_factory("pnet", num_classes=4, in_chns=1)
    seg = _init_apply(m, (1, 32, 32, 1))
    assert seg.shape == (1, 32, 32, 4)


def test_unet_3d():
    m = net_factory("unet_3D", num_classes=2)
    seg = _init_apply(m, (1, 32, 32, 32, 1))
    assert seg.shape == (1, 32, 32, 32, 2)


def test_unet_3d_dv_semi():
    m = net_factory("unet_3D_dv_semi", num_classes=2)
    outs = _init_apply(m, (1, 16, 16, 16, 1))
    assert len(outs) == 4
    assert all(o.shape == (1, 16, 16, 16, 2) for o in outs)


def test_voxresnet():
    m = net_factory("voxresnet", num_classes=2, feature_chns=16)
    seg = _init_apply(m, (1, 16, 16, 16, 1))
    assert seg.shape == (1, 16, 16, 16, 2)


def test_enet():
    m = net_factory("enet", num_classes=4)
    seg = _init_apply(m, (1, 64, 64, 1))
    assert seg.shape == (1, 64, 64, 4)
    assert np.isfinite(np.asarray(seg)).all()


def test_enet_unpool_roundtrip():
    from mamba_unet_tpu.models.enet import _max_unpool, _maxpool_with_argmax

    rng = np.random.default_rng(0)
    # positive values: unpool zero-fills non-max slots (torch semantics),
    # so re-pooling only recovers the max when it beats the zero fill
    x = jnp.asarray(rng.uniform(0.1, 1.0, size=(1, 8, 8, 3)), jnp.float32)
    pooled, onehot = _maxpool_with_argmax(x)
    assert pooled.shape == (1, 4, 4, 3)
    up = _max_unpool(pooled, onehot)
    assert up.shape == x.shape
    # unpooled keeps exactly the max values in place
    pooled2, _ = _maxpool_with_argmax(up)
    np.testing.assert_allclose(np.asarray(pooled2), np.asarray(pooled))
    # each window has exactly one nonzero
    w = np.asarray(up).reshape(1, 4, 2, 4, 2, 3).transpose(0, 1, 3, 2, 4, 5)
    counts = (w.reshape(1, 4, 4, 4, 3) != 0).sum(axis=3)
    assert counts.max() <= 1


def test_projector_heads():
    m = net_factory("projector")
    out = _init_apply(m, (2, 32, 32, 4))
    assert out.shape == (2, 8, 8, 16)
    c = net_factory("classifier")
    out = _init_apply(c, (2, 32, 32, 4))
    assert out.shape == (2, 4, 4, 32)
    j = net_factory("Jigsaw_classifier")
    out = _init_apply(j, (2, 224, 224, 4))
    assert out.shape == (2, 16, 16)


def test_registry_lists_all():
    names = list_models()
    for expected in ["unet", "unet_ds", "unet_cct", "unet_urpc", "TLunet",
                     "ViM_seg", "ViT_seg", "vnet", "vnet_3D", "magicnet",
                     "magicnet_2D", "pnet", "enet", "unet_3D",
                     "unet_3D_dv_semi", "voxresnet", "projector",
                     "classifier", "Jigsaw_classifier"]:
        assert expected in names, expected
