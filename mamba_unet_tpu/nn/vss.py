"""VSS blocks and stages (the visual-Mamba UNet building blocks).

Ref: ``/root/reference/code/networks/mamba_sys.py:543-691``. One VSSLayer here
covers both the reference's ``VSSLayer`` (with downsample) and ``VSSLayer_up``
(with upsample) — the down/upsample op is supplied by the model, keeping the
stage itself a plain depth-times-VSSBlock pipe.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from mamba_unet_tpu.nn.layers import DropPath
from mamba_unet_tpu.nn.ss2d import SS2D


class VSSBlock(nn.Module):
    """x + DropPath(SS2D(LN(x))). Single-branch: no MLP (mamba_sys.py:543-560)."""

    hidden_dim: int
    drop_path: float = 0.0
    attn_drop: float = 0.0
    d_state: int = 16
    scan_impl: str = "auto"
    layout: str = "bhwc"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        y = SS2D(
            d_model=self.hidden_dim,
            d_state=self.d_state,
            dropout=self.attn_drop,
            scan_impl=self.scan_impl,
            layout=self.layout,
            dtype=self.dtype,
            name="self_attention",
        )(y, deterministic=deterministic)
        batch_axis = 2 if self.layout == "hwbc" else 0
        return x + DropPath(self.drop_path, batch_axis=batch_axis)(
            y, deterministic=deterministic
        )


class VSSLayer(nn.Module):
    """depth x VSSBlock (one encoder or decoder stage, sans re/down-sampling)."""

    dim: int
    depth: int
    drop_path: Sequence[float] = ()
    attn_drop: float = 0.0
    d_state: int = 16
    scan_impl: str = "auto"
    layout: str = "bhwc"
    use_remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        block_cls = VSSBlock
        if self.use_remat:
            # jax.checkpoint per block: the reference's torch.utils.checkpoint
            # option (mamba_sys.py:616-621), here trading FLOPs for HBM.
            block_cls = nn.remat(VSSBlock, static_argnums=(2,))
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            x = block_cls(
                hidden_dim=self.dim,
                drop_path=dp,
                attn_drop=self.attn_drop,
                d_state=self.d_state,
                scan_impl=self.scan_impl,
                layout=self.layout,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, deterministic)
        return x
