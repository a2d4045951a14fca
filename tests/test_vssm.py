"""VSSM / Mamba-UNet model tests: shapes, grads, dtype policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_unet_tpu.models import MambaUnet, VSSM, net_factory


@pytest.fixture(scope="module")
def tiny_model_and_params():
    m = MambaUnet(num_classes=4, depths=(1, 1), dims=(16, 32), drop_path_rate=0.0)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    params = m.init(jax.random.key(0), x)
    return m, params


def test_mamba_unet_forward_shape(tiny_model_and_params, rng):
    m, params = tiny_model_and_params
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)), jnp.float32)
    y = m.apply(params, x)
    assert y.shape == (2, 32, 32, 4)
    assert y.dtype == jnp.float32
    assert np.isfinite(np.asarray(y)).all()


def test_mamba_unet_grad_flows(tiny_model_and_params, rng):
    m, params = tiny_model_and_params
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 1)), jnp.float32)

    def loss(p):
        return jnp.mean(m.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # every parameter should receive gradient somewhere (A_logs, dt bias, convs)
    nonzero = sum(float(jnp.abs(l).sum()) > 0 for l in leaves)
    assert nonzero > len(leaves) * 0.9


def test_registry_builds_vim():
    m = net_factory("ViM_seg", num_classes=4, depths=(1, 1), dims=(8, 16))
    x = jnp.zeros((1, 16, 16, 1), jnp.float32)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 16, 16, 4)


def test_vssm_bf16_compute(tiny_model_and_params, rng):
    """bf16 compute dtype must keep fp32 params and fp32 logits out."""
    m = VSSM(num_classes=4, depths=(1, 1), dims=(16, 32), dtype=jnp.bfloat16,
             drop_path_rate=0.0)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32
    y = m.apply(params, x)
    assert y.dtype == jnp.float32
    assert np.isfinite(np.asarray(y)).all()


def test_vssm_a_log_init(tiny_model_and_params):
    """A_logs must be the S4D log(1..16) tile (SURVEY faithfulness item)."""
    _, params = tiny_model_and_params
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    found = False
    for path, leaf in flat:
        if any(getattr(k, "key", None) == "A_logs" for k in path):
            found = True
            n = leaf.shape[-1]
            np.testing.assert_allclose(
                np.asarray(leaf[0]), np.log(np.arange(1, n + 1)), rtol=1e-6
            )
    assert found
