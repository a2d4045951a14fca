"""1-D Mamba block + LM tests, including the decode-vs-forward consistency
check (the role of the reference's selective_state_update/causal_conv1d
update tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_unet_tpu.models.mamba_lm import MambaLMHeadModel, generate
from mamba_unet_tpu.nn.mamba1d import Mamba, MambaBlock
from mamba_unet_tpu.ops.state_update import selective_state_update


def test_mamba_forward_shape(rng):
    m = Mamba(d_model=16, d_state=4)
    x = jnp.asarray(rng.normal(size=(2, 12, 16)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 12, 16)
    assert np.isfinite(np.asarray(y)).all()


def test_bimamba_differs_from_unidirectional(rng):
    x = jnp.asarray(rng.normal(size=(1, 10, 16)), jnp.float32)
    uni = Mamba(d_model=16, d_state=4)
    bi = Mamba(d_model=16, d_state=4, bimamba_type="v2")
    pu = uni.init(jax.random.key(0), x)
    pb = bi.init(jax.random.key(0), x)
    assert not np.allclose(np.asarray(uni.apply(pu, x)),
                           np.asarray(bi.apply(pb, x)))
    # bimamba output is NOT flip-equivariant-trivial: check finite + shape
    y = bi.apply(pb, x)
    assert y.shape == x.shape


def test_decode_matches_forward(rng):
    """step()-by-step decode must reproduce the full forward outputs."""
    m = Mamba(d_model=8, d_state=4, d_conv=4)
    x = jnp.asarray(rng.normal(size=(2, 9, 8)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    full = m.apply(params, x)  # (2, 9, 8)

    conv_state, ssm_state = m.init_cache(2)
    outs = []
    for t in range(x.shape[1]):
        y, conv_state, ssm_state = m.apply(
            params, x[:, t : t + 1], conv_state, ssm_state, method="step"
        )
        outs.append(y)
    stepped = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               rtol=2e-4, atol=2e-4)


def test_prefill_then_step_matches_full(rng):
    """prefill(x[:k]) + steps over x[k:] == forward(x)."""
    m = Mamba(d_model=8, d_state=4)
    x = jnp.asarray(rng.normal(size=(1, 12, 8)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    full = m.apply(params, x)

    k = 7
    out_pre, conv_state, ssm_state = m.apply(
        params, x[:, :k], method="forward_with_cache"
    )
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(full[:, :k]),
                               rtol=2e-4, atol=2e-4)
    outs = []
    for t in range(k, x.shape[1]):
        y, conv_state, ssm_state = m.apply(
            params, x[:, t : t + 1], conv_state, ssm_state, method="step"
        )
        outs.append(y)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs, axis=1)), np.asarray(full[:, k:]),
        rtol=2e-4, atol=2e-4,
    )


def test_lm_forward_and_generate(rng):
    model = MambaLMHeadModel(vocab_size=50, d_model=16, n_layer=2, d_state=4)
    ids = jnp.asarray(rng.integers(0, 50, size=(2, 6)))
    variables = model.init(jax.random.key(0), ids)
    logits = model.apply(variables, ids)
    assert logits.shape == (2, 6, 56)  # padded to multiple of 8

    out = generate(model, variables, ids, max_new_tokens=5, top_k=1)
    assert out.shape == (2, 11)
    # greedy generate must be deterministic
    out2 = generate(model, variables, ids, max_new_tokens=5, top_k=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_generate_matches_naive_greedy(rng):
    """Scan-based decode == running the full forward each step (greedy)."""
    model = MambaLMHeadModel(vocab_size=30, d_model=16, n_layer=2, d_state=4)
    ids = jnp.asarray(rng.integers(0, 30, size=(1, 5)))
    variables = model.init(jax.random.key(0), ids)
    fast = generate(model, variables, ids, max_new_tokens=4, top_k=1)

    cur = ids
    for _ in range(4):
        logits = model.apply(variables, cur)
        nxt = jnp.argmax(logits[:, -1], axis=-1)
        cur = jnp.concatenate([cur, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(cur))


def test_selective_state_update_matches_scan_step(rng):
    from mamba_unet_tpu.ops import selective_scan_ref

    bsz, d, n = 2, 6, 4
    state = jnp.asarray(rng.normal(size=(bsz, d, n)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(bsz, d)), jnp.float32)
    dt = jnp.asarray(rng.normal(size=(bsz, d)), jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(d, n)), jnp.float32))
    B = jnp.asarray(rng.normal(size=(bsz, n)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(bsz, n)), jnp.float32)
    y, new_state = selective_state_update(state, u, dt, A, B, C,
                                          delta_softplus=True)
    # manual recurrence
    dtp = np.log1p(np.exp(np.asarray(dt)))
    want_state = np.exp(dtp[..., None] * np.asarray(A)) * np.asarray(state) + \
        dtp[..., None] * np.asarray(B)[:, None] * np.asarray(u)[..., None]
    want_y = np.einsum("bdn,bn->bd", want_state, np.asarray(C))
    np.testing.assert_allclose(np.asarray(new_state), want_state, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y), want_y, rtol=1e-5)
