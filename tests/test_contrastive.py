"""Contrastive loss tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_unet_tpu.objectives.contrastive import (
    MocoLoss,
    con_loss,
    con_loss_queue,
    contrastive_loss_sup,
    info_nce_loss,
)


def test_con_loss_prefers_aligned_features(rng):
    q = jnp.asarray(rng.normal(size=(2, 4, 4, 8)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(2, 4, 4, 8)), jnp.float32)
    aligned = float(con_loss(q, q))
    misaligned = float(con_loss(q, noise))
    assert aligned < misaligned
    assert np.isfinite(aligned) and np.isfinite(misaligned)
    assert contrastive_loss_sup is con_loss


def test_con_loss_grad_flows_to_q_only(rng):
    q = jnp.asarray(rng.normal(size=(1, 2, 2, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 2, 4)), jnp.float32)
    gq, gk = jax.grad(lambda q, k: con_loss(q, k), argnums=(0, 1))(q, k)
    assert float(jnp.abs(gq).sum()) > 0
    assert float(jnp.abs(gk).sum()) == 0  # k is stop-gradiented


def test_info_nce_positive_structure(rng):
    # build features where i and i+n/2 are identical -> low loss
    base = rng.normal(size=(4, 16)).astype(np.float32)
    f = np.concatenate([base, base], axis=0)
    low = float(info_nce_loss(jnp.asarray(f), jnp.asarray(f)))
    g = rng.normal(size=(8, 16)).astype(np.float32)
    high = float(info_nce_loss(jnp.asarray(g), jnp.asarray(g)))
    assert low < high


def test_moco_queue_dynamics(rng):
    loss_fn = MocoLoss(max_entries=4)
    f = lambda: jnp.asarray(rng.normal(size=(2, 8)), jnp.float32)
    l1 = float(loss_fn(f(), f(), idx=[0, 1]))
    assert len(loss_fn.queue) == 2
    l2 = float(loss_fn(f(), f(), idx=[2, 3]))
    assert len(loss_fn.queue) == 4
    # revisiting indices evicts stale entries first, then re-enqueues
    l3 = float(loss_fn(f(), f(), idx=[0, 1]))
    assert len(loss_fn.queue) == 4
    # cap enforcement
    loss_fn(f(), f(), idx=[4, 5])
    assert len(loss_fn.queue) == 4
    assert all(np.isfinite(v) for v in (l1, l2, l3))


def test_con_loss_queue(rng):
    q = jnp.asarray(rng.normal(size=(2, 8)), jnp.float32)
    bank = jnp.asarray(rng.normal(size=(6, 8)), jnp.float32)
    out = float(con_loss_queue(q, bank, q))
    assert np.isfinite(out)
    # perfect positive + orthogonal bank -> lower loss than random positive
    out2 = float(con_loss_queue(q, bank, jnp.asarray(rng.normal(size=(2, 8)), jnp.float32)))
    assert out < out2
