"""Pipeline parallelism: the pipelined LM stack must match the plain model.

Forward AND gradients: GPipe over a ``pipe`` mesh axis re-orders the same
per-layer math (microbatching only re-batches rows), so logits and grads must
match ``MambaLMHeadModel.apply`` to fp32 tolerance on the virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_unet_tpu.models.mamba_lm import MambaLMHeadModel
from mamba_unet_tpu.parallel import (
    make_mesh,
    pipeline_blocks,
    pipeline_lm_apply,
    pipeline_lm_loss,
    prestack_lm_params,
    stack_layer_params,
)

VOCAB, D_MODEL, N_LAYER, B, L = 17, 16, 4, 4, 24


@pytest.fixture(scope="module")
def lm():
    model = MambaLMHeadModel(
        vocab_size=VOCAB, d_model=D_MODEL, n_layer=N_LAYER, d_state=4,
        scan_impl="xla",
    )
    ids = jnp.zeros((B, L), jnp.int32)
    variables = model.init(jax.random.key(0), ids)
    return model, variables


def _plain_loss(model, variables, ids, targets):
    logits = model.apply(variables, ids)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(-jnp.take_along_axis(logp, targets[..., None], axis=-1))


@pytest.mark.parametrize("stages,n_micro", [(4, 2), (2, 4), (4, 4)])
def test_pipeline_forward_matches_plain(lm, stages, n_micro):
    model, variables = lm
    mesh = make_mesh(devices=jax.devices()[:stages], axes=("pipe",))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, VOCAB, size=(B, L)), jnp.int32)

    want = model.apply(variables, ids)
    got = jax.jit(
        lambda v, i: pipeline_lm_apply(model, v, i, mesh, n_micro=n_micro)
    )(variables, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_grads_match_plain(lm):
    model, variables = lm
    mesh = make_mesh(devices=jax.devices()[:4], axes=("pipe",))
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, VOCAB, size=(B, L)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, VOCAB, size=(B, L)), jnp.int32)

    loss_p, grads_p = jax.jit(jax.value_and_grad(
        lambda v: pipeline_lm_loss(model, v, ids, targets, mesh, n_micro=2)
    ))(variables)
    loss_r, grads_r = jax.jit(jax.value_and_grad(
        lambda v: _plain_loss(model, v, ids, targets)
    ))(variables)

    np.testing.assert_allclose(float(loss_p), float(loss_r), rtol=1e-5)
    flat_p = jax.tree_util.tree_leaves_with_path(grads_p)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(grads_r))
    assert flat_p and len(flat_p) == len(flat_r)
    for path, g in flat_p:
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(flat_r[path]), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pipeline_prestacked_matches_plain(lm):
    """The production layout (prestack_lm_params: layer stack device-sharded
    P('pipe'), nonlayer variables stripped of the per-layer subtrees) must
    produce the same logits as the plain model — and the stacked leaves must
    actually be sharded over the pipe axis."""
    model, variables = lm
    mesh = make_mesh(devices=jax.devices()[:4], axes=("pipe",))
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, VOCAB, size=(B, L)), jnp.int32)

    nonlayer, stacked = prestack_lm_params(variables, N_LAYER, mesh)
    assert not any(k.startswith("layers_") for k in nonlayer["params"])
    leaf = jax.tree_util.tree_leaves(stacked)[0]
    assert leaf.sharding.spec == jax.sharding.PartitionSpec("pipe")

    want = model.apply(variables, ids)
    got = jax.jit(
        lambda nv, st, i: pipeline_lm_apply(model, nv, i, mesh, n_micro=2,
                                            stacked=st)
    )(nonlayer, stacked, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_prestacked_train_step_stays_sharded(lm):
    """An SGD step on the production layout: grads wrt (nonlayer, stacked)
    match the replicated path's grads (stacked grads == stacked per-layer
    grads), and the updated stack keeps its P('pipe') sharding — the
    optimizer needs no re-annotation."""
    model, variables = lm
    mesh = make_mesh(devices=jax.devices()[:4], axes=("pipe",))
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(0, VOCAB, size=(B, L)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, VOCAB, size=(B, L)), jnp.int32)

    nonlayer, stacked = prestack_lm_params(variables, N_LAYER, mesh)

    @jax.jit
    def sgd_step(nv, st):
        loss, (g_nv, g_st) = jax.value_and_grad(
            lambda nv_, st_: pipeline_lm_loss(
                model, nv_, ids, targets, mesh, n_micro=2, stacked=st_),
            argnums=(0, 1),
        )(nv, st)
        upd = jax.tree_util.tree_map(lambda p, g: p - 0.1 * g, st, g_st)
        return loss, g_nv, g_st, upd

    loss_p, g_nv, g_st, upd = sgd_step(nonlayer, stacked)

    # reference grads from the replicated path
    loss_r, grads_r = jax.jit(jax.value_and_grad(
        lambda v: _plain_loss(model, v, ids, targets)
    ))(variables)
    np.testing.assert_allclose(float(loss_p), float(loss_r), rtol=1e-5)
    want_st = stack_layer_params(grads_r["params"], N_LAYER)
    for path, g in jax.tree_util.tree_leaves_with_path(g_st):
        np.testing.assert_allclose(
            np.asarray(g),
            np.asarray(dict(jax.tree_util.tree_leaves_with_path(want_st))[path]),
            rtol=2e-4, atol=2e-5, err_msg=jax.tree_util.keystr(path),
        )
    # sharding survives grad + update
    for t in (g_st, upd):
        leaf = jax.tree_util.tree_leaves(t)[0]
        assert leaf.sharding.spec == jax.sharding.PartitionSpec("pipe")


def test_pipeline_blocks_generic_stage_fn():
    """pipeline_blocks works with ANY per-layer fn, not just flax blocks —
    an 8-layer elementwise affine stack over all 8 virtual devices."""
    mesh = make_mesh(devices=jax.devices()[:8], axes=("pipe",))
    rng = np.random.default_rng(2)
    n_layer, M, mb, d = 8, 3, 2, 8
    w = jnp.asarray(rng.normal(size=(n_layer, d)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(n_layer, d)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(M, mb, d)), jnp.float32)

    got = pipeline_blocks(
        lambda p, h: h * p["w"] + p["b"], {"w": w, "b": b}, x, mesh,
    )
    want = x
    for i in range(n_layer):
        want = want * w[i] + b[i]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_pipeline_validates_divisibility():
    mesh = make_mesh(devices=jax.devices()[:4], axes=("pipe",))
    w = jnp.zeros((6, 4))  # 6 layers over 4 stages
    x = jnp.zeros((2, 2, 4))
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_blocks(lambda p, h: h * p, w, x, mesh)
    with pytest.raises(ValueError, match="not divisible"):
        from mamba_unet_tpu.parallel.pipeline import _microbatch
        _microbatch(jnp.zeros((5, 3)), 2)
