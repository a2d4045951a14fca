"""Tensor-parallel (channel-sharded) scan: must match the unsharded
reference exactly — the scan is channel-independent, so sharding d_inner
over a "model" mesh axis is collective-free inside the op."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_unet_tpu.ops import selective_scan_ref
from mamba_unet_tpu.parallel import make_mesh
from mamba_unet_tpu.parallel.tp_scan import (
    channel_sharding,
    selective_scan_tp_sharded,
)


def make_inputs(rng, bsz=2, d=16, L=48, n=4, G=2):
    u = jnp.asarray(rng.normal(size=(bsz, d, L)), jnp.float32)
    delta = jnp.asarray(0.4 * rng.normal(size=(bsz, d, L)), jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(d, n)), jnp.float32) * 0.5)
    B = jnp.asarray(rng.normal(size=(bsz, G, n, L)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(bsz, G, n, L)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    db = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    return u, delta, A, B, C, D, db


@pytest.mark.parametrize("n_tp", [2, 4, 8])
def test_tp_sharded_matches_ref(rng, n_tp):
    mesh = make_mesh(devices=jax.devices()[:n_tp], axes=("model",))
    u, delta, A, B, C, D, db = make_inputs(rng)
    want = selective_scan_ref(u, delta, A, B, C, D, None, db, True)

    f = jax.jit(lambda *a: selective_scan_tp_sharded(
        *a, delta_softplus=True, mesh=mesh, axis="model", chunk=16))
    got = f(u, delta, A, B, C, D, None, db)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_tp_sharded_with_z_and_grad(rng):
    mesh = make_mesh(devices=jax.devices()[:4], axes=("model",))
    u, delta, A, B, C, D, db = make_inputs(rng, L=32)
    z = jnp.asarray(rng.normal(size=u.shape), jnp.float32)
    want = selective_scan_ref(u, delta, A, B, C, D, z, db, True)
    got = selective_scan_tp_sharded(u, delta, A, B, C, D, z, db, True,
                                    mesh=mesh, chunk=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # grads over EVERY operand — the sharded/replicated parameter operands
    # (A, B, C, D, delta_bias) are the ones training updates, and their
    # cotangents exercise the shard_map transpose's psums
    gy = jnp.asarray(np.random.default_rng(7).normal(size=u.shape), jnp.float32)
    g_ref = jax.grad(lambda u_, d_, A_, B_, C_, D_, db_: jnp.sum(
        selective_scan_ref(u_, d_, A_, B_, C_, D_, None, db_, True) * gy
    ), argnums=(0, 1, 2, 3, 4, 5, 6))(u, delta, A, B, C, D, db)
    g_tp = jax.grad(lambda u_, d_, A_, B_, C_, D_, db_: jnp.sum(
        selective_scan_tp_sharded(u_, d_, A_, B_, C_, D_, None, db_, True,
                                  mesh=mesh, chunk=8) * gy
    ), argnums=(0, 1, 2, 3, 4, 5, 6))(u, delta, A, B, C, D, db)
    for name, w, g in zip(("u", "delta", "A", "B", "C", "D", "delta_bias"),
                          g_ref, g_tp):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-3,
            err_msg=f"grad mismatch for {name}")


def test_tp_sharded_dp_tp_2d_mesh(rng):
    """Composes with data parallelism on a (data, model) 2-D mesh."""
    mesh = make_mesh(devices=jax.devices()[:8], axes=("data", "model"),
                     shape=(2, 4))
    u, delta, A, B, C, D, db = make_inputs(rng, bsz=4)
    want = selective_scan_ref(u, delta, A, B, C, D, None, db, True)
    got = selective_scan_tp_sharded(
        u, delta, A, B, C, D, None, db, True,
        mesh=mesh, axis="model", batch_axis="data", chunk=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_model_level_tp_parity(rng):
    """MambaUnet with scan_impl='tp_sharded' equals the plain xla scan path
    on the SAME params (the model structure is scan_impl-independent)."""
    from mamba_unet_tpu.models import MambaUnet

    mesh = make_mesh(devices=jax.devices()[:4], axes=("model",))
    kw = dict(num_classes=4, depths=(1, 1), dims=(16, 32), drop_path_rate=0.0)
    m_ref = MambaUnet(scan_impl="xla", **kw)
    m_tp = MambaUnet(scan_impl="tp_sharded", **kw)

    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)), jnp.float32)
    params = jax.jit(m_ref.init)(jax.random.key(0), x)
    want = m_ref.apply(params, x)
    with channel_sharding(mesh, "model"):
        got = m_tp.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
