"""LM eval harness: loglikelihood semantics + task drivers on a tiny model."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_lm():
    import jax
    import jax.numpy as jnp

    from mamba_unet_tpu.models.mamba_lm import MambaLMHeadModel

    model = MambaLMHeadModel(vocab_size=61, d_model=32, n_layer=2)
    ids = jnp.zeros((1, 8), jnp.int32)
    variables = jax.jit(model.init)(jax.random.key(0), ids)
    return model, variables


def test_loglikelihood_matches_forward(tiny_lm):
    """Scorer must equal a hand-rolled log-softmax walk over the same seq."""
    import jax
    import jax.numpy as jnp

    from mamba_unet_tpu.eval.lm_eval import LMEvaluator

    model, variables = tiny_lm
    ev = LMEvaluator(model, variables, batch_size=2)
    rng = np.random.default_rng(0)
    ctx = rng.integers(0, 61, 5).tolist()
    cont = rng.integers(0, 61, 3).tolist()
    (ll, greedy), = ev.loglikelihood([(ctx, cont)])

    seq = jnp.asarray([ctx + cont])
    logits = model.apply(variables, seq)
    logp = np.asarray(jax.nn.log_softmax(logits[0], axis=-1))
    want = sum(logp[len(ctx) - 1 + i, cont[i]] for i in range(len(cont)))
    np.testing.assert_allclose(ll, want, rtol=1e-4, atol=1e-5)
    want_greedy = all(
        int(np.argmax(logp[len(ctx) - 1 + i])) == cont[i]
        for i in range(len(cont))
    )
    assert greedy == want_greedy


def test_loglikelihood_padding_invariance(tiny_lm):
    """Bucket padding must not change scores: same request alone vs batched
    with a longer one (different bucket/pad) gives the same ll."""
    from mamba_unet_tpu.eval.lm_eval import LMEvaluator

    model, variables = tiny_lm
    ev = LMEvaluator(model, variables, batch_size=2)
    rng = np.random.default_rng(1)
    a = (rng.integers(1, 61, 4).tolist(), rng.integers(1, 61, 2).tolist())
    b = (rng.integers(1, 61, 40).tolist(), rng.integers(1, 61, 5).tolist())
    solo = ev.loglikelihood([a])[0][0]
    batched = ev.loglikelihood([a, b])[0][0]
    np.testing.assert_allclose(solo, batched, rtol=1e-4, atol=1e-5)


def test_task_drivers(tiny_lm):
    from mamba_unet_tpu.eval.lm_eval import LMEvaluator

    model, variables = tiny_lm
    ev = LMEvaluator(model, variables, batch_size=4)
    rng = np.random.default_rng(2)
    docs = [
        {"context": rng.integers(0, 61, 6).tolist(),
         "choices": [rng.integers(0, 61, rng.integers(1, 4)).tolist()
                     for _ in range(3)],
         "gold": int(rng.integers(0, 3))}
        for _ in range(4)
    ]
    mc = ev.multiple_choice(docs)
    assert 0.0 <= mc["acc"] <= 1.0 and 0.0 <= mc["acc_norm"] <= 1.0

    lam = [{"context": rng.integers(0, 61, 7).tolist(),
            "target": rng.integers(0, 61, 2).tolist()} for _ in range(3)]
    out = ev.lambada(lam)
    assert out["ppl"] > 0 and 0.0 <= out["acc"] <= 1.0


def test_generate_until(tiny_lm):
    """Greedy generate_until: cap at max_gen_toks, truncate before the first
    stop-sequence occurrence (the harness's generate_until contract)."""
    from mamba_unet_tpu.eval.lm_eval import LMEvaluator

    model, variables = tiny_lm
    ev = LMEvaluator(model, variables, batch_size=2)
    ctx = [3, 7, 11, 2]

    full, = ev.generate_until([(ctx, {"max_gen_toks": 8})])
    assert len(full) == 8

    # stop on a token we KNOW occurs (the 4th generated token); expected
    # truncation point = its first occurrence in the untruncated output
    stop = [full[3]]
    want = full[: full.index(stop[0])]
    cut, = ev.generate_until([(ctx, {"max_gen_toks": 8, "until": [stop]})])
    assert cut == want

    # a stop sequence that never occurs changes nothing
    same, = ev.generate_until(
        [(ctx, {"max_gen_toks": 8, "until": [[60, 60, 60]]})])
    assert same == full
