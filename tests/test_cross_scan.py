"""Permutation-identity tests for cross-scan/cross-merge (SURVEY §4.3)."""

import jax.numpy as jnp
import numpy as np

from mamba_unet_tpu.ops import cross_scan, cross_merge
from mamba_unet_tpu.ops.causal_conv1d import causal_conv1d, causal_conv1d_update


def test_cross_scan_directions(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 5, 7)), jnp.float32)  # B,H,W,D
    xs = cross_scan(x)
    assert xs.shape == (2, 4, 7, 15)
    row = x.transpose(0, 3, 1, 2).reshape(2, 7, 15)
    col = x.transpose(0, 3, 2, 1).reshape(2, 7, 15)
    np.testing.assert_array_equal(xs[:, 0], row)
    np.testing.assert_array_equal(xs[:, 1], col)
    np.testing.assert_array_equal(xs[:, 2], row[..., ::-1])
    np.testing.assert_array_equal(xs[:, 3], col[..., ::-1])


def test_cross_merge_inverts_cross_scan(rng):
    """merge(scan(x)) must equal 4x — each direction contributes x once."""
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 3)), jnp.float32)
    y = cross_merge(cross_scan(x), 4, 6)
    np.testing.assert_allclose(y, 4.0 * x, rtol=1e-6, atol=1e-6)


def test_causal_conv1d_matches_direct(rng):
    b, d, L, w = 2, 6, 25, 4
    x = jnp.asarray(rng.standard_normal((b, d, L)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((d, w)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(d), jnp.float32)
    out = causal_conv1d(x, weight, bias, activation="silu")
    # direct: y[t] = sum_k w[k] * x[t - (w-1) + k]
    xp = np.pad(np.asarray(x), ((0, 0), (0, 0), (w - 1, 0)))
    ref = np.zeros((b, d, L), np.float32)
    for k in range(w):
        ref += np.asarray(weight)[None, :, k, None] * xp[:, :, k:k + L]
    ref += np.asarray(bias)[None, :, None]
    ref = ref / (1 + np.exp(-ref))  # silu
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_causal_conv1d_update_consistency(rng):
    """Streaming decode must reproduce the full convolution step by step."""
    b, d, L, w = 2, 4, 10, 3
    x = jnp.asarray(rng.standard_normal((b, d, L)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((d, w)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(d), jnp.float32)
    full = causal_conv1d(x, weight, bias)
    state = jnp.zeros((b, d, w), jnp.float32)
    for t in range(L):
        out_t, state = causal_conv1d_update(x[:, :, t], state, weight, bias)
        np.testing.assert_allclose(out_t, full[:, :, t], rtol=1e-5, atol=1e-5)


def test_cross_scan_tm_matches_cross_scan(rng):
    """Time-major variant must equal the (B,K,D,L) variant transposed."""
    import jax.numpy as jnp

    from mamba_unet_tpu.ops.cross_scan import (
        cross_merge,
        cross_merge_tm,
        cross_scan,
        cross_scan_tm,
    )

    x = jnp.asarray(rng.normal(size=(2, 5, 7, 3)), jnp.float32)
    a = np.asarray(cross_scan(x))                  # (B, 4, D, L)
    b = np.asarray(cross_scan_tm(x))               # (B, 4, L, D)
    np.testing.assert_array_equal(b.transpose(0, 1, 3, 2), a)

    ys = jnp.asarray(rng.normal(size=(2, 4, 3, 35)), jnp.float32)
    m1 = np.asarray(cross_merge(ys, 5, 7))
    m2 = np.asarray(cross_merge_tm(ys.transpose(0, 1, 3, 2), 5, 7))
    np.testing.assert_allclose(m2, m1, rtol=1e-6)


def test_ss2d_tm_path_matches_xla_path(rng):
    """SS2D with the forced-pallas time-major path (interpret mode) must
    match the XLA path numerically."""
    import jax
    import jax.numpy as jnp

    from mamba_unet_tpu.nn.ss2d import SS2D

    x = jnp.asarray(rng.normal(size=(1, 6, 8, 12)), jnp.float32)
    m_x = SS2D(d_model=12, d_state=4, scan_impl="xla")
    m_p = SS2D(d_model=12, d_state=4, scan_impl="pallas")
    params = m_x.init(jax.random.key(0), x)
    y_x = m_x.apply(params, x)
    y_p = m_p.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               rtol=2e-4, atol=2e-4)
