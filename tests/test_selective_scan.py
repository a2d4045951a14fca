"""Differential tests for the selective scan, modeled on the reference suite
``/root/reference/mamba/tests/ops/test_selective_scan.py``: every implementation
must match the sequential reference in forward outputs and in every gradient
(u, delta, A, B, C, D, z, delta_bias) within dtype-scaled tolerances."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_unet_tpu.ops import selective_scan_ref, selective_scan_xla


def make_inputs(rng, bsz=2, dim=12, n=16, L=137, groups=1, with_z=True,
                dtype=jnp.float32):
    f = lambda *s: jnp.asarray(rng.standard_normal(s), dtype)
    u = f(bsz, dim, L)
    delta = f(bsz, dim, L) * 0.5
    A = -jnp.exp(jnp.asarray(rng.uniform(-1.0, 1.0, (dim, n)), jnp.float32))
    B = f(bsz, groups, n, L) if groups > 1 else f(bsz, n, L)
    C = f(bsz, groups, n, L) if groups > 1 else f(bsz, n, L)
    D = jnp.asarray(rng.standard_normal(dim), jnp.float32)
    z = f(bsz, dim, L) if with_z else None
    delta_bias = jnp.asarray(rng.uniform(-0.2, 0.2, dim), jnp.float32)
    return u, delta, A, B, C, D, z, delta_bias


@pytest.mark.parametrize("L", [1, 16, 137, 384, 784])
@pytest.mark.parametrize("groups", [1, 4])
@pytest.mark.parametrize("chunk", [64, 256])
def test_xla_matches_ref_fwd(rng, L, groups, chunk):
    args = make_inputs(rng, L=L, groups=groups)
    out_ref = selective_scan_ref(*args, delta_softplus=True)
    out = selective_scan_xla(*args, delta_softplus=True, chunk=chunk)
    np.testing.assert_allclose(out, out_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("groups", [1, 4])
def test_xla_matches_ref_last_state(rng, groups):
    args = make_inputs(rng, L=100, groups=groups)
    out_ref, st_ref = selective_scan_ref(
        *args, delta_softplus=True, return_last_state=True
    )
    out, st = selective_scan_xla(
        *args, delta_softplus=True, return_last_state=True, chunk=64
    )
    np.testing.assert_allclose(st, st_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out, out_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("with_z", [True, False])
def test_xla_matches_ref_grads(rng, with_z):
    """Gradients of a scalar loss wrt every differentiable input must match."""
    u, delta, A, B, C, D, z, delta_bias = make_inputs(rng, L=96, with_z=with_z)
    cot = jnp.asarray(rng.standard_normal((2, 12, 96)), jnp.float32)

    def loss(fn):
        def inner(u, delta, A, B, C, D, z, delta_bias):
            out = fn(u, delta, A, B, C, D, z, delta_bias, delta_softplus=True)
            return jnp.sum(out * cot)
        return inner

    argnums = tuple(range(8 if with_z else 6))
    args = (u, delta, A, B, C, D, z, delta_bias)
    g_ref = jax.grad(loss(selective_scan_ref), argnums=argnums)(*args)
    g_xla = jax.grad(
        loss(lambda *a, **k: selective_scan_xla(*a, chunk=32, **k)),
        argnums=argnums,
    )(*args)
    names = ["u", "delta", "A", "B", "C", "D", "z", "delta_bias"]
    for name, a, b in zip(names, g_xla, g_ref):
        if a is None:
            continue
        np.testing.assert_allclose(
            a, b, rtol=1e-4, atol=1e-4, err_msg=f"grad mismatch for {name}"
        )


def test_bf16_io_fp32_state(rng):
    """bf16 in/out but the recurrence itself is fp32 (reference kernel policy)."""
    args32 = make_inputs(rng, L=200, dtype=jnp.float32)
    u, delta, A, B, C, D, z, db = args32
    out32 = selective_scan_xla(*args32, delta_softplus=True)
    out_bf = selective_scan_xla(
        u.astype(jnp.bfloat16), delta.astype(jnp.bfloat16), A, B, C, D,
        z.astype(jnp.bfloat16), db, delta_softplus=True,
    )
    assert out_bf.dtype == jnp.bfloat16
    # bf16 inputs quantize the operands, so tolerance is bf16-scale.
    np.testing.assert_allclose(
        np.asarray(out_bf, np.float32), out32, rtol=5e-2, atol=5e-2
    )


def test_no_optional_args(rng):
    u, delta, A, B, C, *_ = make_inputs(rng, L=64)
    out_ref = selective_scan_ref(u, delta, A, B, C)
    out = selective_scan_xla(u, delta, A, B, C, chunk=16)
    np.testing.assert_allclose(out, out_ref, rtol=2e-5, atol=2e-5)
