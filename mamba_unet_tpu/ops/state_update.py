"""Single-token SSM state update for autoregressive decode.

TPU equivalent of the reference Triton kernel
(``/root/reference/mamba/mamba_ssm/ops/triton/selective_state_update.py:99-155``):
one recurrence step on a cached state — a couple of einsums that XLA fuses;
no custom kernel needed.

    delta = softplus(delta + delta_bias)
    state = exp(delta*A) * state + delta * B * u
    y     = <C, state> + D*u ;  y *= silu(z)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def selective_state_update(
    state: jnp.ndarray,   # (B, D, N) fp32
    u: jnp.ndarray,       # (B, D)
    delta: jnp.ndarray,   # (B, D)
    A: jnp.ndarray,       # (D, N)
    B: jnp.ndarray,       # (B, N)
    C: jnp.ndarray,       # (B, N)
    D: Optional[jnp.ndarray] = None,        # (D,)
    z: Optional[jnp.ndarray] = None,        # (B, D)
    delta_bias: Optional[jnp.ndarray] = None,  # (D,)
    delta_softplus: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (y (B, D) in u.dtype, new_state fp32)."""
    out_dtype = u.dtype
    u_f = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None]
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    dA = jnp.exp(delta[..., None] * A.astype(jnp.float32)[None])   # (B, D, N)
    dBu = delta[..., None] * B.astype(jnp.float32)[:, None, :] * u_f[..., None]
    new_state = dA * state.astype(jnp.float32) + dBu
    y = jnp.einsum("bdn,bn->bd", new_state, C.astype(jnp.float32))
    if D is not None:
        y = y + u_f * D.astype(jnp.float32)[None]
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y.astype(out_dtype), new_state
