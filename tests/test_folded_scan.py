"""Differential tests for the batch-folded-lane Pallas scan
(ops/selective_scan_folded.py): forward AND all gradients vs the sequential
reference, unidirectional and bidirectional, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_unet_tpu.ops import selective_scan_ref
from mamba_unet_tpu.ops.selective_scan_folded import (
    selective_scan_folded,
    selective_scan_folded_bidir,
)


def _fold(x):
    """(B, G, L, dg) -> (G, L, B*dg)."""
    B, G, L, dg = x.shape
    return jnp.transpose(x, (1, 2, 0, 3)).reshape(G, L, B * dg)


def _unfold(y, Bsz):
    """(G, L, B*dg) -> (B, G, L, dg)."""
    G, L, BD = y.shape
    return jnp.transpose(y.reshape(G, L, Bsz, BD // Bsz), (2, 0, 1, 3))


def _ref_grouped(u, delta, A, Bm, Cm, D, db):
    """Reference scan on standard-layout (B, G, L, dg) operands."""
    bsz, G, L, dg = u.shape
    ys = []
    for k in range(G):
        y = selective_scan_ref(
            u[:, k].transpose(0, 2, 1),
            delta[:, k].transpose(0, 2, 1),
            A[k * dg : (k + 1) * dg],
            Bm[:, k].transpose(0, 2, 1)[:, None],
            Cm[:, k].transpose(0, 2, 1)[:, None],
            D[k * dg : (k + 1) * dg],
            None,
            db[k * dg : (k + 1) * dg],
            True,
        ).transpose(0, 2, 1)
        ys.append(y)
    return jnp.stack(ys, axis=1)


def make_std_inputs(rng, bsz=4, G=2, L=96, dg=32, n=4):
    u = jnp.asarray(rng.normal(size=(bsz, G, L, dg)), jnp.float32)
    delta = jnp.asarray(0.3 * rng.normal(size=(bsz, G, L, dg)), jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(G * dg, n)), jnp.float32) * 0.5)
    Bm = jnp.asarray(rng.normal(size=(bsz, G, L, n)), jnp.float32)
    Cm = jnp.asarray(rng.normal(size=(bsz, G, L, n)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(G * dg,)), jnp.float32)
    db = jnp.asarray(0.1 * rng.normal(size=(G * dg,)), jnp.float32)
    return u, delta, A, Bm, Cm, D, db


def _folded_args(u, delta, Bm, Cm):
    return (_fold(u), _fold(delta),
            jnp.transpose(Bm, (1, 2, 3, 0)),   # (G, L, N, B)
            jnp.transpose(Cm, (1, 2, 3, 0)))


@pytest.mark.parametrize("L,bsz,dg", [(96, 4, 32), (50, 2, 64), (33, 8, 16)])
def test_folded_fwd_matches_ref(rng, L, bsz, dg):
    u, delta, A, Bm, Cm, D, db = make_std_inputs(rng, bsz=bsz, L=L, dg=dg)
    want = _ref_grouped(u, delta, A, Bm, Cm, D, db)
    u_f, d_f, B_f, C_f = _folded_args(u, delta, Bm, Cm)
    got = selective_scan_folded(u_f, d_f, A, B_f, C_f, D=D, delta_bias=db,
                                delta_softplus=True, interpret=True)
    np.testing.assert_allclose(np.asarray(_unfold(got, bsz)),
                               np.asarray(want), rtol=2e-4, atol=2e-4)


def test_folded_grads_match_ref(rng):
    bsz, G, L, dg, n = 4, 2, 64, 32, 4
    u, delta, A, Bm, Cm, D, db = make_std_inputs(rng, bsz=bsz, G=G, L=L,
                                                 dg=dg, n=n)
    gy = jnp.asarray(rng.normal(size=u.shape), jnp.float32)

    def loss_ref(u, delta, A, Bm, Cm, D, db):
        return jnp.sum(_ref_grouped(u, delta, A, Bm, Cm, D, db) * gy)

    def loss_fold(u, delta, A, Bm, Cm, D, db):
        u_f, d_f, B_f, C_f = _folded_args(u, delta, Bm, Cm)
        y = selective_scan_folded(u_f, d_f, A, B_f, C_f, D=D, delta_bias=db,
                                  delta_softplus=True, interpret=True)
        return jnp.sum(_unfold(y, bsz) * gy)

    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5, 6))(
        u, delta, A, Bm, Cm, D, db)
    got = jax.grad(loss_fold, argnums=(0, 1, 2, 3, 4, 5, 6))(
        u, delta, A, Bm, Cm, D, db)
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "ddelta_bias"]
    for name, w, g in zip(names, want, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-3,
            err_msg=f"gradient mismatch: {name}")


def _ref_bidir(u2, delta4, A, B4, C4, D, db):
    """Reference semantics: 4 explicitly-flipped sequences, each scanned."""
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
            y = jnp.flip(y, axis=1)
        ys.append(y)
    return jnp.stack(ys, axis=1)


def test_folded_bidir_fwd_and_grads(rng):
    bsz, L, dg, n = 4, 48, 32, 4
    u2 = jnp.asarray(rng.normal(size=(bsz, 2, L, dg)), jnp.float32)
    delta4 = jnp.asarray(0.3 * rng.normal(size=(bsz, 4, L, dg)), jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(4 * dg, n)), jnp.float32) * 0.5)
    B4 = jnp.asarray(rng.normal(size=(bsz, 4, L, n)), jnp.float32)
    C4 = jnp.asarray(rng.normal(size=(bsz, 4, L, n)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(4 * dg,)), jnp.float32)
    db = jnp.asarray(0.1 * rng.normal(size=(4 * dg,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(bsz, 4, L, dg)), jnp.float32)

    def loss_fold(u2, delta4, A, B4, C4, D, db):
        y = selective_scan_folded_bidir(
            _fold(u2), _fold(delta4), A,
            jnp.transpose(B4, (1, 2, 3, 0)), jnp.transpose(C4, (1, 2, 3, 0)),
            D=D, delta_bias=db, delta_softplus=True, interpret=True)
        return jnp.sum(_unfold(y, bsz) * w)

    def loss_ref(u2, delta4, A, B4, C4, D, db):
        return jnp.sum(_ref_bidir(u2, delta4, A, B4, C4, D, db) * w)

    got_y = selective_scan_folded_bidir(
        _fold(u2), _fold(delta4), A,
        jnp.transpose(B4, (1, 2, 3, 0)), jnp.transpose(C4, (1, 2, 3, 0)),
        D=D, delta_bias=db, delta_softplus=True, interpret=True)
    want_y = _ref_bidir(u2, delta4, A, B4, C4, D, db)
    np.testing.assert_allclose(np.asarray(_unfold(got_y, bsz)),
                               np.asarray(want_y), rtol=2e-4, atol=2e-4)

    gk = jax.grad(loss_fold, argnums=(0, 1, 2, 3, 4, 5, 6))(
        u2, delta4, A, B4, C4, D, db)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5, 6))(
        u2, delta4, A, B4, C4, D, db)
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "ddelta_bias"]
    for name, a, b in zip(names, gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"gradient mismatch: {name}")


def test_ss2d_folded_matches_xla_path(rng):
    """The full SS2D module: folded scan output == the XLA cross-scan path.
    d_model=24 -> d_inner=48 (not 128-aligned, the folded target case);
    bsz=8 so B*dg = 384 is 128-aligned."""
    from mamba_unet_tpu.nn.ss2d import SS2D

    x = jnp.asarray(rng.normal(size=(8, 8, 8, 24)), jnp.float32)
    m_ref = SS2D(d_model=24, d_state=4, scan_impl="xla")
    v = m_ref.init(jax.random.key(0), x)
    want = m_ref.apply(v, x)
    m_f = SS2D(d_model=24, d_state=4, scan_impl="folded")
    got = m_f.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_ss2d_hwbc_layout_matches_bhwc(rng):
    """layout="hwbc" (time-major batch-minor activations) must reproduce the
    default layout bit-for-bit on the folded path and via the fallback."""
    from mamba_unet_tpu.nn.ss2d import SS2D

    x = jnp.asarray(rng.normal(size=(8, 8, 8, 16)) * 0.5, jnp.float32)
    m0 = SS2D(d_model=16, d_state=4, scan_impl="folded")
    v = m0.init(jax.random.key(0), x)
    want = m0.apply(v, x)
    # auto in hwbc means folded; params are layout-independent
    got = SS2D(d_model=16, d_state=4, scan_impl="auto", layout="hwbc").apply(
        v, x.transpose(1, 2, 0, 3))
    np.testing.assert_allclose(
        np.asarray(got.transpose(2, 0, 1, 3)), np.asarray(want),
        rtol=1e-6, atol=1e-6)
    # non-folded impls under hwbc take the transpose fallback
    got_tm = SS2D(d_model=16, d_state=4, scan_impl="tm", layout="hwbc").apply(
        v, x.transpose(1, 2, 0, 3))
    want_tm = SS2D(d_model=16, d_state=4, scan_impl="tm").apply(v, x)
    np.testing.assert_allclose(
        np.asarray(got_tm.transpose(2, 0, 1, 3)), np.asarray(want_tm),
        rtol=1e-6, atol=1e-6)


def test_vssm_hwbc_layout_matches(rng):
    """Full MambaUnet in hwbc layout: logits AND grads match the default
    layout with shared params (the layout is an internal detail)."""
    from mamba_unet_tpu.models.vssm import MambaUnet

    x = jnp.asarray(rng.normal(size=(8, 32, 32, 1)) * 0.5, jnp.float32)
    kw = dict(num_classes=4, depths=(1, 1), dims=(16, 32), drop_path_rate=0.0)
    m0 = MambaUnet(**kw, scan_impl="folded")
    v = m0.init(jax.random.key(0), x[:1])
    m1 = MambaUnet(**kw, layout="hwbc")
    np.testing.assert_allclose(
        np.asarray(m1.apply(v, x)), np.asarray(m0.apply(v, x)),
        rtol=1e-5, atol=1e-5)

    def loss(m):
        return lambda v, x: jnp.sum(m.apply(v, x) ** 2)

    g0 = jax.grad(loss(m0))(v, x)
    g1 = jax.grad(loss(m1))(v, x)
    # fwd is exact; grads differ only by reduction re-association in the
    # transposed matmuls, so compare per-leaf RELATIVE error
    errs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max())
        / (float(jnp.abs(a).max()) + 1e-8),
        g0, g1)
    worst = max(jax.tree_util.tree_leaves(errs))
    assert worst < 2e-3, f"grad rel mismatch between layouts: {worst}"


def test_folded_bf16_io(rng):
    u, delta, A, Bm, Cm, D, db = make_std_inputs(rng, bsz=4, L=64, dg=32)
    want = _ref_grouped(u, delta, A, Bm, Cm, D, db)
    u_f, d_f, B_f, C_f = _folded_args(u, delta, Bm, Cm)
    got = selective_scan_folded(
        u_f.astype(jnp.bfloat16), d_f.astype(jnp.bfloat16), A,
        B_f.astype(jnp.bfloat16), C_f.astype(jnp.bfloat16), D=D,
        delta_bias=db, delta_softplus=True, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(_unfold(got, 4), np.float32), np.asarray(want),
        rtol=0.1, atol=0.15)
