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
