"""UNet-family tests: shapes, batch_stats mutation, multi-head outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_unet_tpu.models import UNet, UNetCCT, UNetDS, UNetURPC, TLUNet, net_factory


def test_unet_forward_and_bn(rng):
    m = UNet(num_classes=4)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 1)), jnp.float32)
    variables = m.init(jax.random.key(0), x)
    assert "batch_stats" in variables
    y, updates = m.apply(
        variables, x, deterministic=False,
        rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"],
    )
    assert y.shape == (2, 64, 64, 4)
    # running stats must actually move
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))
    # eval path uses running stats, no rng needed
    y_eval = m.apply(variables, x)
    assert np.isfinite(np.asarray(y_eval)).all()


@pytest.mark.parametrize("name,n_out", [("unet_ds", 4), ("unet_urpc", 4), ("unet_cct", 4)])
def test_multihead_unets(rng, name, n_out):
    m = net_factory(name, num_classes=4)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 1)), jnp.float32)
    variables = m.init(jax.random.key(0), x)
    outs, _ = m.apply(
        variables, x, deterministic=False,
        rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"],
    )
    assert len(outs) == n_out
    for o in outs:
        assert o.shape == (1, 64, 64, 4)
        assert np.isfinite(np.asarray(o)).all()


def test_tlunet(rng):
    m = TLUNet(num_classes=4)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 1)), jnp.float32)
    variables = m.init(jax.random.key(0), x)
    y = m.apply(variables, x)
    assert y.shape == (1, 64, 64, 4)


def test_unet_grad(rng):
    m = UNet(num_classes=4)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 1)), jnp.float32)
    variables = m.init(jax.random.key(0), x)

    def loss(p):
        y, _ = m.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, x,
            deterministic=False, rngs={"dropout": jax.random.key(1)},
            mutable=["batch_stats"],
        )
        return jnp.mean(y**2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))
