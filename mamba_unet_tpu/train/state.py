"""Train state: params (+ optional batch_stats / EMA copy) + optax state."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any  # {} when the model has no BatchNorm
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_params: Any = None  # populated by EMA-teacher methods

    def variables(self, params=None):
        v = {"params": self.params if params is None else params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt,
        )


def create_train_state(
    model,
    rng: jax.Array,
    sample_input,
    tx: optax.GradientTransformation,
    with_ema: bool = False,
) -> TrainState:
    variables = jax.jit(model.init)(rng, sample_input)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if with_ema else None,
    )


def ema_update(ema_params, params, step, alpha: float = 0.99):
    """EMA teacher update: α = min(1 - 1/(step+1), alpha), in-place lerp
    (train_Semi_Mamba_UNet.py:131-135)."""
    a = jnp.minimum(1.0 - 1.0 / (step.astype(jnp.float32) + 1.0), alpha)
    return jax.tree_util.tree_map(lambda e, p: e * a + p * (1.0 - a), ema_params, params)
