"""Differential tests: Pallas selective-scan kernel (interpret mode on CPU)
vs the sequential lax.scan reference — forward AND all gradients, mirroring
the reference's kernel test strategy (mamba/tests/ops/test_selective_scan.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_unet_tpu.ops import selective_scan_ref
from mamba_unet_tpu.ops.selective_scan_pallas import (
    selective_scan_pallas,
    supported,
)


def make_inputs(rng, bsz=2, d=8, L=96, n=4, G=2, bias=True, with_d=True):
    u = jnp.asarray(rng.normal(size=(bsz, d, L)), jnp.float32)
    delta = jnp.asarray(0.5 * rng.normal(size=(bsz, d, L)), jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(d, n)), jnp.float32) * 0.5)
    B = jnp.asarray(rng.normal(size=(bsz, G, n, L)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(bsz, G, n, L)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(d,)), jnp.float32) if with_d else None
    db = jnp.asarray(rng.normal(size=(d,)), jnp.float32) if bias else None
    return u, delta, A, B, C, D, db


@pytest.mark.parametrize("L,chunk", [(64, 64), (96, 32), (100, 32), (37, 16)])
def test_pallas_fwd_matches_ref(rng, L, chunk):
    u, delta, A, B, C, D, db = make_inputs(rng, L=L)
    want = selective_scan_ref(u, delta, A, B, C, D, None, db, True)
    got = selective_scan_pallas(u, delta, A, B, C, D, None, db, True,
                                chunk=chunk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pallas_fwd_no_bias_no_d(rng):
    u, delta, A, B, C, _, _ = make_inputs(rng, bias=False, with_d=False)
    want = selective_scan_ref(u, delta, A, B, C, None, None, None, False)
    got = selective_scan_pallas(u, delta, A, B, C, None, None, None, False,
                                chunk=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pallas_with_z_gate(rng):
    u, delta, A, B, C, D, db = make_inputs(rng)
    z = jnp.asarray(rng.normal(size=u.shape), jnp.float32)
    want = selective_scan_ref(u, delta, A, B, C, D, z, db, True)
    got = selective_scan_pallas(u, delta, A, B, C, D, z, db, True,
                                chunk=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("L,chunk", [(64, 32), (100, 32)])
def test_pallas_grads_match_ref(rng, L, chunk):
    u, delta, A, B, C, D, db = make_inputs(rng, L=L)
    gy = jnp.asarray(rng.normal(size=u.shape), jnp.float32)

    def loss_ref(u, delta, A, B, C, D, db):
        out = selective_scan_ref(u, delta, A, B, C, D, None, db, True)
        return jnp.sum(out * gy)

    def loss_pal(u, delta, A, B, C, D, db):
        out = selective_scan_pallas(u, delta, A, B, C, D, None, db, True,
                                    chunk=chunk, interpret=True)
        return jnp.sum(out * gy)

    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5, 6))(
        u, delta, A, B, C, D, db
    )
    got = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4, 5, 6))(
        u, delta, A, B, C, D, db
    )
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "ddelta_bias"]
    for name, w, g in zip(names, want, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-3,
            err_msg=f"gradient mismatch: {name}",
        )


def test_supported_predicate(rng):
    u, delta, A, B, C, D, db = make_inputs(rng)
    assert supported(u, A, B, return_last_state=False)
    assert not supported(u, A, B, return_last_state=True)


def test_pallas_vision_shapes_fwd(rng):
    """SS2D-like shape: G=4 directions, dg=24, N=8, L=49 (stride test)."""
    u, delta, A, B, C, D, db = make_inputs(rng, bsz=2, d=96, L=49, n=8, G=4)
    want = selective_scan_ref(u, delta, A, B, C, D, None, db, True)
    got = selective_scan_pallas(u, delta, A, B, C, D, None, db, True,
                                chunk=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pallas_bf16_io(rng):
    """bf16 inputs stream as bf16 but the state math stays fp32: outputs
    must track the fp32 reference within bf16 tolerance."""
    u, delta, A, B, C, D, db = make_inputs(rng, L=64)
    want = selective_scan_ref(u, delta, A, B, C, D, None, db, True)
    got = selective_scan_pallas(
        u.astype(jnp.bfloat16), delta.astype(jnp.bfloat16), A,
        B.astype(jnp.bfloat16), C.astype(jnp.bfloat16), D, None, db, True,
        chunk=32, interpret=True,
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.1, atol=0.15)

    # gradients flow and are finite in bf16
    def loss(u_, d_):
        return jnp.sum(selective_scan_pallas(
            u_, d_, A, B.astype(jnp.bfloat16), C.astype(jnp.bfloat16),
            D, None, db, True, chunk=32, interpret=True).astype(jnp.float32))

    gu, gd = jax.grad(loss, argnums=(0, 1))(
        u.astype(jnp.bfloat16), delta.astype(jnp.bfloat16))
    assert gu.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(gu, np.float32)).all()


def test_kernel_repeated_run_determinism(rng):
    """Repeated-run bitwise determinism — the role of the reference's
    test_causal_conv1d_race_condition (causal-conv1d/tests:117-173): the
    same compiled kernel on the same inputs must produce identical bits
    every run (catches scratch-reuse/carry races across grid cells). On CPU
    this exercises interpret mode; with MAMBA_UNET_TPU_TEST_PLATFORM=tpu it
    runs against the real compiled kernel."""
    import jax
    import jax.numpy as jnp

    from mamba_unet_tpu.ops.selective_scan_pallas import (
        selective_scan_pallas_tm,
    )

    B, K, L, dg, n = 2, 4, 96, 8, 4
    u = jnp.asarray(rng.normal(size=(B, K, L, dg)), jnp.float32)
    dl = jnp.asarray(0.1 * rng.normal(size=(B, K, L, dg)), jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(K * dg, n)), jnp.float32))
    Bm = jnp.asarray(rng.normal(size=(B, K, L, n)), jnp.float32)
    Cm = jnp.asarray(rng.normal(size=(B, K, L, n)), jnp.float32)

    f = jax.jit(lambda *a: selective_scan_pallas_tm(*a, delta_softplus=True))
    g = jax.jit(jax.grad(lambda *a: jnp.sum(
        selective_scan_pallas_tm(*a, delta_softplus=True) ** 2
    ), argnums=(0, 1)))

    y0 = np.asarray(f(u, dl, A, Bm, Cm))
    g0 = [np.asarray(x) for x in g(u, dl, A, Bm, Cm)]
    for _ in range(2):
        np.testing.assert_array_equal(np.asarray(f(u, dl, A, Bm, Cm)), y0)
        for a, b in zip(g(u, dl, A, Bm, Cm), g0):
            np.testing.assert_array_equal(np.asarray(a), b)
