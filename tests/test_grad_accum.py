"""Gradient accumulation: k microbatches inside one jitted step must match
the full-batch optimizer update for batch-mean losses.

The reference PARSES ``--accumulation-steps`` but never uses it (dead
config, ``/root/reference/code/config.py:102-104``; SURVEY §2.9). Here the
flag is real: ``TrainConfig.grad_accum_steps=k`` scans fwd+bwd over k
microbatches (one microbatch's activations live at a time), averages grads,
and applies ONE optimizer update — step/LR/eval cadence unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mamba_unet_tpu.train import TrainConfig, Trainer


class TinyNet(nn.Module):
    """BN-free, dropout-free head: batch items are independent, so the
    full-batch gradient decomposes exactly into the microbatch mean."""

    num_classes: int = 4

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Conv(8, (3, 3))(x)
        h = nn.relu(h)
        return nn.Conv(self.num_classes, (1, 1))(h)


def mean_ce_method(model, variables, batch, rng, step):
    logits = model.apply(variables, batch["image"])
    logp = jax.nn.log_softmax(logits, axis=-1)
    lab = batch["label"].astype(jnp.int32)
    loss = -jnp.mean(jnp.take_along_axis(logp, lab[..., None], axis=-1))
    return loss, {"batch_stats": None, "logs": {"loss_total": loss}}


def _make_batch(bsz=8, size=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": jnp.asarray(
            rng.normal(size=(bsz, size, size, 1)), jnp.float32),
        "label": jnp.asarray(
            rng.integers(0, 4, size=(bsz, size, size)), jnp.int32),
    }


def _mk_trainer(k):
    cfg = TrainConfig(base_lr=0.05, max_iterations=100, batch_size=8,
                      patch_size=(16, 16), num_classes=4, seed=0,
                      grad_accum_steps=k)
    return Trainer(TinyNet(), cfg, method=mean_ce_method)


@pytest.mark.parametrize("k", [2, 4, 8])
def test_grad_accum_matches_full_batch(k):
    batch = _make_batch()
    t1, tk = _mk_trainer(1), _mk_trainer(k)
    # identical init (same seed)
    for _ in range(3):  # a few steps so momentum state is exercised too
        t1.state, logs1 = t1._step(t1.state, batch)
        tk.state, logsk = tk._step(tk.state, batch)
    np.testing.assert_allclose(
        float(logs1["loss_total"]), float(logsk["loss_total"]),
        rtol=1e-6, atol=1e-7)
    flat1 = jax.tree_util.tree_leaves_with_path(t1.state.params)
    flatk = dict(jax.tree_util.tree_leaves_with_path(tk.state.params))
    for path, p in flat1:
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(flatk[path]), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))
    assert int(t1.state.step) == int(tk.state.step) == 3


def test_grad_accum_default_method_smoke():
    """The real CE+Dice method under accumulation: finite loss, params move,
    loss drops over a few steps on a fixed batch."""
    from mamba_unet_tpu.models import UNet

    cfg = TrainConfig(base_lr=0.05, max_iterations=100, batch_size=8,
                      patch_size=(16, 16), num_classes=4, seed=0,
                      grad_accum_steps=2)
    t = Trainer(UNet(num_classes=4), cfg)
    batch = _make_batch()
    # snapshot to host BEFORE stepping: the jitted step donates the state,
    # so the original device buffers are deleted after the first call
    p0 = np.asarray(jax.tree_util.tree_leaves(t.state.params)[0])
    losses = []
    for _ in range(5):
        t.state, logs = t._step(t.state, batch)
        losses.append(float(logs["loss_total"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert not np.allclose(
        p0, np.asarray(jax.tree_util.tree_leaves(t.state.params)[0]))


def test_grad_accum_validates_divisibility():
    cfg = TrainConfig(batch_size=8, patch_size=(16, 16), num_classes=4,
                      grad_accum_steps=3)
    with pytest.raises(ValueError, match="not divisible"):
        Trainer(TinyNet(), cfg, method=mean_ce_method)


def test_grad_accum_rejected_by_multi_model_trainers():
    """Trainers whose jitted step is not a microbatch-scannable step must
    fail loudly rather than silently ignore grad_accum_steps."""
    from mamba_unet_tpu.train.methods import UAMTTrainer

    cfg = TrainConfig(batch_size=8, patch_size=(16, 16), num_classes=4,
                      grad_accum_steps=2)
    with pytest.raises(ValueError, match="does not support"):
        UAMTTrainer(TinyNet(), cfg, labeled_bs=4)


def _mean_teacher(k, warmup=1000, seed=0):
    from mamba_unet_tpu.train.methods import MeanTeacherTrainer

    cfg = TrainConfig(base_lr=0.05, max_iterations=100, batch_size=8,
                      patch_size=(16, 16), num_classes=4, seed=seed,
                      grad_accum_steps=k)
    return MeanTeacherTrainer(TinyNet(), cfg, labeled_bs=4,
                              warmup_iters=warmup)


def test_mean_teacher_grad_accum_parity_on_duplicated_batch():
    """With the labeled/unlabeled sets built as k identical copies and the
    consistency term still gated (step < warmup), every stratified
    microbatch equals the full batch up to duplication — so the k=2 update
    must match k=1 (tolerance: Dice's smooth term breaks exact sum-scaling
    at ~1e-5)."""
    rng = np.random.default_rng(3)
    half_img = rng.normal(size=(2, 16, 16, 1))
    half_lbl = rng.integers(0, 4, size=(2, 16, 16))
    unl = rng.normal(size=(2, 16, 16, 1))
    batch = {
        "image": jnp.asarray(
            np.concatenate([half_img, half_img, unl, unl]), jnp.float32),
        "label": jnp.asarray(
            np.concatenate([half_lbl, half_lbl,
                            np.zeros_like(half_lbl),
                            np.zeros_like(half_lbl)]), jnp.int32),
    }
    t1, t2 = _mean_teacher(1), _mean_teacher(2)
    for _ in range(3):
        t1.state, logs1 = t1._step(t1.state, batch)
        t2.state, logs2 = t2._step(t2.state, batch)
    np.testing.assert_allclose(float(logs1["loss_total"]),
                               float(logs2["loss_total"]),
                               rtol=1e-4, atol=1e-6)
    flat1 = jax.tree_util.tree_leaves_with_path(t1.state.params)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(t2.state.params))
    for path, p in flat1:
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(flat2[path]), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))
    # the EMA teacher updated ONCE per optimizer step in both
    ema1 = jax.tree_util.tree_leaves(t1.state.ema_params)[0]
    ema2 = jax.tree_util.tree_leaves(t2.state.ema_params)[0]
    np.testing.assert_allclose(np.asarray(ema1), np.asarray(ema2),
                               rtol=1e-4, atol=1e-6)


def test_mean_teacher_grad_accum_trains_with_consistency():
    """Consistency active (warmup 0): finite losses, params move, the EMA
    teacher trails the student (not equal, not random-frozen)."""
    batch = _make_batch()
    t = _mean_teacher(2, warmup=0)
    p0 = np.asarray(jax.tree_util.tree_leaves(t.state.params)[0])
    for _ in range(4):
        t.state, logs = t._step(t.state, batch)
    assert np.isfinite(float(logs["loss_total"]))
    assert float(logs["loss_cons"]) >= 0.0
    p_now = np.asarray(jax.tree_util.tree_leaves(t.state.params)[0])
    e_now = np.asarray(jax.tree_util.tree_leaves(t.state.ema_params)[0])
    assert not np.allclose(p0, p_now)
    assert not np.allclose(p_now, e_now)


def test_mean_teacher_grad_accum_stratified_divisibility():
    from mamba_unet_tpu.train.methods import MeanTeacherTrainer

    cfg = TrainConfig(batch_size=8, patch_size=(16, 16), num_classes=4,
                      grad_accum_steps=2)
    with pytest.raises(ValueError, match="stratified"):
        MeanTeacherTrainer(TinyNet(), cfg, labeled_bs=3)
