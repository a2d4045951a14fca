"""Differential tests for the bidirectional (no-flip) Pallas scan path.

selective_scan_pallas_bidir must equal running selective_scan_ref on the 4
explicitly-flipped sequences (the reference cross-scan semantics,
mamba_sys.py:396-436) — forward AND gradients — since the reversal happens
via index arithmetic inside the kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_unet_tpu.ops import selective_scan_ref
from mamba_unet_tpu.ops.selective_scan_pallas import selective_scan_pallas_bidir


def _ref_bidir(u2, delta4, A, B4, C4, D, db):
    """Reference: build the 4 flipped sequences explicitly and scan each."""
    bsz, _, L, dg = delta4.shape
    ys = []
    for k in range(4):
        m, r = k % 2, k // 2
        uk = u2[:, m]
        dk, Bk, Ck = delta4[:, k], B4[:, k], C4[:, k]
        if r:
            uk, dk, Bk, Ck = (jnp.flip(x, axis=1) for x in (uk, dk, Bk, Ck))
        y = selective_scan_ref(
            uk.transpose(0, 2, 1),
            dk.transpose(0, 2, 1),
            A[k * dg : (k + 1) * dg],
            Bk.transpose(0, 2, 1)[:, None],
            Ck.transpose(0, 2, 1)[:, None],
            D[k * dg : (k + 1) * dg],
            None,
            db[k * dg : (k + 1) * dg],
            True,
        ).transpose(0, 2, 1)
        if r:
            y = jnp.flip(y, axis=1)  # back to data order
        ys.append(y)
    return jnp.stack(ys, axis=1)


@pytest.mark.parametrize("L,dg", [(64, 8), (96, 16)])
def test_bidir_matches_flipped_ref(rng, L, dg):
    bsz, n = 2, 4
    u2 = jnp.asarray(rng.normal(size=(bsz, 2, L, dg)), jnp.float32)
    delta4 = jnp.asarray(0.3 * rng.normal(size=(bsz, 4, L, dg)), jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(4 * dg, n)), jnp.float32) * 0.5)
    B4 = jnp.asarray(rng.normal(size=(bsz, 4, L, n)), jnp.float32)
    C4 = jnp.asarray(rng.normal(size=(bsz, 4, L, n)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(4 * dg,)), jnp.float32)
    db = jnp.asarray(0.1 * rng.normal(size=(4 * dg,)), jnp.float32)

    got = selective_scan_pallas_bidir(
        u2, delta4, A, B4, C4, D=D, delta_bias=db, delta_softplus=True,
        chunk=32, interpret=True,
    )
    want = _ref_bidir(u2, delta4, A, B4, C4, D, db)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_bidir_gradients_match(rng):
    bsz, L, dg, n = 2, 48, 8, 4
    u2 = jnp.asarray(rng.normal(size=(bsz, 2, L, dg)), jnp.float32)
    delta4 = jnp.asarray(0.3 * rng.normal(size=(bsz, 4, L, dg)), jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(4 * dg, n)), jnp.float32) * 0.5)
    B4 = jnp.asarray(rng.normal(size=(bsz, 4, L, n)), jnp.float32)
    C4 = jnp.asarray(rng.normal(size=(bsz, 4, L, n)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(4 * dg,)), jnp.float32)
    db = jnp.asarray(0.1 * rng.normal(size=(4 * dg,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(bsz, 4, L, dg)), jnp.float32)

    def loss_k(u2, delta4, A, B4, C4, D, db):
        y = selective_scan_pallas_bidir(
            u2, delta4, A, B4, C4, D=D, delta_bias=db, delta_softplus=True,
            chunk=16, interpret=True,
        )
        return jnp.sum(y * w)

    def loss_r(u2, delta4, A, B4, C4, D, db):
        return jnp.sum(_ref_bidir(u2, delta4, A, B4, C4, D, db) * w)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4, 5, 6))(
        u2, delta4, A, B4, C4, D, db)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5, 6))(
        u2, delta4, A, B4, C4, D, db)
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "ddelta_bias"]
    for name, a, b in zip(names, gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"gradient mismatch: {name}",
        )


def test_ss2d_bidir_matches_xla_path(rng):
    """The full SS2D module: bidir scan output == the XLA cross-scan path."""
    from mamba_unet_tpu.nn.ss2d import SS2D

    x = jnp.asarray(rng.normal(size=(2, 12, 12, 24)), jnp.float32)
    m_ref = SS2D(d_model=24, d_state=4, scan_impl="xla")
    v = m_ref.init(jax.random.key(0), x)
    want = m_ref.apply(v, x)
    m_bd = SS2D(d_model=24, d_state=4, scan_impl="bidir")
    got = m_bd.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_bidir_merge_pairs_fwd_and_grads(rng):
    """merge_pairs=True: y == pairwise sum of the 4-direction output, and
    ALL gradients match the explicit-sum formulation (the half-size
    cotangent path must be transparent)."""
    bsz, L, dg, n = 2, 48, 8, 4
    u2 = jnp.asarray(rng.normal(size=(bsz, 2, L, dg)), jnp.float32)
    delta4 = jnp.asarray(0.3 * rng.normal(size=(bsz, 4, L, dg)), jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(4 * dg, n)), jnp.float32) * 0.5)
    B4 = jnp.asarray(rng.normal(size=(bsz, 4, L, n)), jnp.float32)
    C4 = jnp.asarray(rng.normal(size=(bsz, 4, L, n)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(4 * dg,)), jnp.float32)
    db = jnp.asarray(0.1 * rng.normal(size=(4 * dg,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(bsz, 2, L, dg)), jnp.float32)

    got = selective_scan_pallas_bidir(
        u2, delta4, A, B4, C4, D=D, delta_bias=db, delta_softplus=True,
        chunk=16, interpret=True, merge_pairs=True,
    )
    y4 = _ref_bidir(u2, delta4, A, B4, C4, D, db)
    want = y4[:, :2] + y4[:, 2:]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    def loss_m(u2, delta4, A, B4, C4, D, db):
        y = selective_scan_pallas_bidir(
            u2, delta4, A, B4, C4, D=D, delta_bias=db, delta_softplus=True,
            chunk=16, interpret=True, merge_pairs=True,
        )
        return jnp.sum(y * w)

    def loss_r(u2, delta4, A, B4, C4, D, db):
        y4 = _ref_bidir(u2, delta4, A, B4, C4, D, db)
        return jnp.sum((y4[:, :2] + y4[:, 2:]) * w)

    gm = jax.grad(loss_m, argnums=(0, 1, 2, 3, 4, 5, 6))(
        u2, delta4, A, B4, C4, D, db)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5, 6))(
        u2, delta4, A, B4, C4, D, db)
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "ddelta_bias"]
    for name, a, b in zip(names, gm, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"gradient mismatch: {name}",
        )
