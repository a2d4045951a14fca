"""Sequence-sharded scan: must match the unsharded reference exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mamba_unet_tpu.ops import selective_scan_ref
from mamba_unet_tpu.parallel import make_mesh
from mamba_unet_tpu.parallel.seq_scan import selective_scan_seq_sharded


def make_inputs(rng, bsz=2, d=8, L=64, n=4, G=2):
    u = jnp.asarray(rng.normal(size=(bsz, d, L)), jnp.float32)
    delta = jnp.asarray(0.4 * rng.normal(size=(bsz, d, L)), jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(d, n)), jnp.float32) * 0.5)
    B = jnp.asarray(rng.normal(size=(bsz, G, n, L)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(bsz, G, n, L)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    db = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    return u, delta, A, B, C, D, db


@pytest.mark.parametrize("n_seq", [2, 4, 8])
def test_seq_sharded_matches_ref(rng, n_seq):
    mesh = make_mesh(devices=jax.devices()[:n_seq], axes=("seq",))
    u, delta, A, B, C, D, db = make_inputs(rng, L=64)
    want = selective_scan_ref(u, delta, A, B, C, D, None, db, True)

    f = jax.jit(lambda *a: selective_scan_seq_sharded(
        *a, delta_softplus=True, mesh=mesh, axis="seq", chunk=16))
    got = f(u, delta, A, B, C, D, None, db)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_seq_sharded_with_z(rng):
    mesh = make_mesh(devices=jax.devices()[:4], axes=("seq",))
    u, delta, A, B, C, D, db = make_inputs(rng, L=32)
    z = jnp.asarray(rng.normal(size=u.shape), jnp.float32)
    want = selective_scan_ref(u, delta, A, B, C, D, z, db, True)
    got = selective_scan_seq_sharded(u, delta, A, B, C, D, z, db, True,
                                     mesh=mesh, chunk=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_seq_sharded_grad(rng):
    mesh = make_mesh(devices=jax.devices()[:4], axes=("seq",))
    u, delta, A, B, C, D, db = make_inputs(rng, L=32)
    gy = jnp.asarray(rng.normal(size=u.shape), jnp.float32)

    g_ref = jax.grad(lambda u, d: jnp.sum(
        selective_scan_ref(u, d, A, B, C, D, None, db, True) * gy
    ), argnums=(0, 1))(u, delta)
    g_sh = jax.grad(lambda u, d: jnp.sum(
        selective_scan_seq_sharded(u, d, A, B, C, D, None, db, True,
                                   mesh=mesh, chunk=8) * gy
    ), argnums=(0, 1))(u, delta)
    for a, b in zip(g_ref, g_sh):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-3, atol=3e-3)


def test_ss2d_seq_sharded_matches_xla(rng):
    """SS2D running its scan sequence-parallel over 8 devices must match the
    single-device XLA path."""
    from mamba_unet_tpu.nn.ss2d import SS2D
    from mamba_unet_tpu.parallel.seq_scan import sequence_sharding

    mesh = make_mesh(devices=jax.devices()[:8], axes=("seq",))
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 12)), jnp.float32)  # L=64
    m_x = SS2D(d_model=12, d_state=4, scan_impl="xla")
    m_s = SS2D(d_model=12, d_state=4, scan_impl="seq_sharded", scan_chunk=8)
    params = m_x.init(jax.random.key(0), x)
    want = m_x.apply(params, x)
    with sequence_sharding(mesh, "seq"):
        got = m_s.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
