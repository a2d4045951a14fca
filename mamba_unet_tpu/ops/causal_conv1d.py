"""Depthwise causal 1-D convolution (+ single-token decode update).

TPU-native replacement for the reference ``causal_conv1d_cuda`` package
(``/root/reference/causal-conv1d/csrc/causal_conv1d.cpp``): on TPU a width-2..4
depthwise FIR is a single ``lax.conv_general_dilated`` that XLA fuses with its
neighbours — a hand-written kernel buys nothing. Reference Python semantics:
``causal_conv1d_interface.py:49-104``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def causal_conv1d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    activation: Optional[str] = None,
) -> jnp.ndarray:
    """x: (B, D, L), weight: (D, W), bias: (D,).  Causal left-pad of W-1."""
    if activation not in (None, "silu", "swish"):
        raise ValueError(f"unsupported activation {activation!r}")
    d, width = weight.shape
    dtype = x.dtype
    # (B, D, L) conv over L with one group per channel.
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        weight.astype(jnp.float32)[:, None, :],  # (outC=D, inC/groups=1, W)
        window_strides=(1,),
        padding=[(width - 1, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=d,
        precision=jax.lax.Precision.HIGHEST,
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :, None]
    if activation is not None:
        out = jax.nn.silu(out)
    return out.astype(dtype)


def causal_conv1d_update(
    x: jnp.ndarray,
    conv_state: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    activation: Optional[str] = None,
):
    """One decode step. x: (B, D); conv_state: (B, D, W) rolling buffer.

    Returns (out, new_conv_state). Mirrors causal_conv1d_update_ref
    (``causal_conv1d_interface.py:83-104``).
    """
    if activation not in (None, "silu", "swish"):
        raise ValueError(f"unsupported activation {activation!r}")
    dtype = x.dtype
    state = jnp.roll(conv_state, shift=-1, axis=-1)
    state = state.at[..., -1].set(x)
    out = jnp.einsum(
        "bdw,dw->bd", state.astype(jnp.float32), weight.astype(jnp.float32)
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    if activation is not None:
        out = jax.nn.silu(out)
    return out.astype(dtype), state
