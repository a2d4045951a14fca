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
    """Trainers whose jitted step is not the base microbatch-scannable step
    must fail loudly rather than silently ignore grad_accum_steps."""
    from mamba_unet_tpu.train.methods import MeanTeacherTrainer

    cfg = TrainConfig(batch_size=8, patch_size=(16, 16), num_classes=4,
                      grad_accum_steps=2)
    with pytest.raises(ValueError, match="does not support"):
        MeanTeacherTrainer(TinyNet(), cfg)
