"""Loss-function tests: manual-formula goldens + invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_unet_tpu.objectives import (
    constra_loss,
    cross_entropy_loss,
    dice_loss_from_labels,
    dice_loss_pair,
    entropy_loss,
    focal_loss,
    sigmoid_rampup,
    softmax_kl_loss,
    softmax_mse_loss,
    supervised_ce_dice,
    symmetric_mse_loss,
)


def test_dice_perfect_prediction_is_zero(rng):
    labels = jnp.asarray(rng.integers(0, 4, size=(2, 8, 8)))
    probs = jax.nn.one_hot(labels, 4, dtype=jnp.float32)
    loss = dice_loss_from_labels(probs, labels)
    assert float(loss) < 1e-4


def test_dice_formula_matches_manual(rng):
    probs = jax.nn.softmax(jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32))
    labels = jnp.asarray(rng.integers(0, 3, size=(2, 8, 8)))
    got = float(dice_loss_from_labels(probs, labels))
    p = np.asarray(probs, np.float64)
    t = np.eye(3)[np.asarray(labels)]
    total = 0.0
    for i in range(3):
        inter = (p[..., i] * t[..., i]).sum()
        denom = (p[..., i] ** 2).sum() + (t[..., i] ** 2).sum()
        total += 1 - (2 * inter + 1e-5) / (denom + 1e-5)
    np.testing.assert_allclose(got, total / 3, rtol=1e-5)


def test_cross_entropy_matches_manual(rng):
    logits = jnp.asarray(rng.normal(size=(2, 4, 4, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, size=(2, 4, 4)))
    got = float(cross_entropy_loss(logits, labels))
    lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    want = -np.mean(np.take_along_axis(lp, np.asarray(labels)[..., None], -1))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_ce_ignore_index(rng):
    logits = jnp.asarray(rng.normal(size=(1, 2, 2, 3)), jnp.float32)
    labels = jnp.asarray([[[0, 4], [1, 4]]])  # 4 = ignore
    got = float(cross_entropy_loss(logits, labels, ignore_index=4))
    lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    want = -(lp[0, 0, 0, 0] + lp[0, 1, 0, 1]) / 2
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_supervised_combo_decreases_with_better_preds(rng):
    labels = jnp.asarray(rng.integers(0, 4, size=(2, 8, 8)))
    good = 10.0 * jax.nn.one_hot(labels, 4)
    bad = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    assert float(supervised_ce_dice(good, labels)) < float(
        supervised_ce_dice(bad, labels)
    )


def test_softmax_mse_unreduced_shape_and_zero(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 3)), jnp.float32)
    out = softmax_mse_loss(x, x)
    assert out.shape == (2, 4, 4, 3)
    assert float(jnp.abs(out).max()) == 0.0


def test_softmax_kl_nonnegative_and_zero_at_equal(rng):
    a = jnp.asarray(rng.normal(size=(2, 4, 4, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(2, 4, 4, 3)), jnp.float32)
    assert float(softmax_kl_loss(a, a)) == pytest.approx(0.0, abs=1e-7)
    assert float(softmax_kl_loss(a, b)) > 0


def test_constra_loss_zero_for_identical_and_symmetric(rng):
    a = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    assert float(constra_loss(a, a)) == pytest.approx(0.0, abs=1e-7)
    np.testing.assert_allclose(
        float(constra_loss(a, b)), float(constra_loss(b, a)), rtol=1e-6
    )


def test_entropy_loss_bounds(rng):
    p = jax.nn.softmax(jnp.asarray(rng.normal(size=(2, 4, 4, 3)), jnp.float32))
    e = float(entropy_loss(p))
    assert 0 <= e <= 1.0 + 1e-5
    uniform = jnp.full((1, 2, 2, 3), 1 / 3)
    assert float(entropy_loss(uniform)) == pytest.approx(1.0, rel=1e-3)


def test_focal_equals_ce_at_gamma0(rng):
    logits = jnp.asarray(rng.normal(size=(2, 4, 4, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, size=(2, 4, 4)))
    np.testing.assert_allclose(
        float(focal_loss(logits, labels, gamma=0.0)),
        float(cross_entropy_loss(logits, labels)),
        rtol=1e-5,
    )


def test_sigmoid_rampup_schedule():
    assert sigmoid_rampup(0, 200) == pytest.approx(np.exp(-5.0))
    assert sigmoid_rampup(200, 200) == 1.0
    assert sigmoid_rampup(300, 200) == 1.0
    assert sigmoid_rampup(100, 200) == pytest.approx(np.exp(-5 * 0.25))


def test_dice_pair_linear_denominator(rng):
    s = jnp.asarray(rng.uniform(size=(4, 4)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(4, 4)), jnp.float32)
    got = float(dice_loss_pair(s, t))
    sn, tn = np.asarray(s, np.float64), np.asarray(t, np.float64)
    want = 1 - (2 * (sn * tn).sum() + 1e-5) / (sn.sum() + tn.sum() + 1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-5)
