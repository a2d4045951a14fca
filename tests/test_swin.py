"""Swin-UNet tests: window ops round-trip, attention mask, model fwd/grad."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_unet_tpu.models import SwinUnet
from mamba_unet_tpu.nn.swin import (
    SwinBlock,
    _relative_position_index,
    _shift_attn_mask,
    window_partition,
    window_reverse,
)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)), jnp.float32)
    wins = window_partition(x, 4)
    assert wins.shape == (2 * 2 * 3, 16, 5)
    back = window_reverse(wins, 4, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_properties():
    idx = _relative_position_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < 13 * 13
    # diagonal = self-relative (center of table), constant
    assert len(set(np.diag(idx))) == 1


def test_shift_mask():
    m = _shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert set(np.unique(m)) <= {0.0, -100.0}
    # unshifted -> None
    assert _shift_attn_mask(8, 8, 4, 0) is None


def test_swin_block_shapes(rng):
    x = jnp.asarray(rng.normal(size=(2, 14, 14, 32)), jnp.float32)
    blk = SwinBlock(dim=32, num_heads=4, window_size=7, shift_size=3)
    params = blk.init(jax.random.key(0), x)
    y = blk.apply(params, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_swin_unet_forward_and_grad(rng):
    m = SwinUnet(num_classes=4, embed_dim=24, depths=(1, 1), num_heads=(2, 4),
                 window_size=4, drop_path_rate=0.0)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 1)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 32, 32, 4)

    def loss(p):
        return jnp.mean(m.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


def test_swin_unet_full_config_shape(rng):
    """The headline 224² tiny config compiles and produces the right shape."""
    m = SwinUnet(num_classes=4, drop_path_rate=0.0)
    x = jnp.zeros((1, 224, 224, 1), jnp.float32)
    y = jax.eval_shape(lambda: m.init(jax.random.key(0), x))
    # eval_shape of init: just ensure it traces; forward shape via apply
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 224, 224, 4)
