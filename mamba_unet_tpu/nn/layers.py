"""Shared small layers and initializers."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def trunc_normal_init(std: float = 0.02):
    """Truncated-normal(std) initializer, the reference's default for Linear
    weights (``/root/reference/code/networks/mamba_sys.py:767-783``)."""
    return nn.initializers.truncated_normal(stddev=std)


def uniform_scaled_init(bound: float):
    """Uniform(-bound, bound) initializer (torch nn.Linear default family)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class DropPath(nn.Module):
    """Per-sample stochastic depth (drops the whole residual branch).

    Matches timm's ``DropPath`` used by the reference VSS/Swin blocks: keeps
    the branch with prob 1-rate and rescales by 1/keep.
    """

    rate: float = 0.0
    batch_axis: int = 0  # 2 for the hwbc (time-major) activation layout

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = tuple(
            x.shape[i] if i == self.batch_axis else 1 for i in range(x.ndim)
        )
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))
