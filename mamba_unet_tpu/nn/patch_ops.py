"""Patchify / merge / expand ops for the UNet-shaped VSS and Swin models.

Channels-last throughout. Reference semantics:
``/root/reference/code/networks/mamba_sys.py:166-265`` (identical blocks are
reused by the Swin-UNet file). The space-to-depth / depth-to-space moves are
pure reshapes that XLA lowers to layout changes — no gathers.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from mamba_unet_tpu.nn.layers import trunc_normal_init


class PatchEmbed2D(nn.Module):
    """Conv patchify: (B, H, W, Cin) -> (B, H/p, W/p, embed_dim) + LayerNorm."""

    patch_size: int = 4
    embed_dim: int = 96
    use_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x)
        if self.use_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x


class PatchMerging2D(nn.Module):
    """2x2 space-to-depth -> LayerNorm(4C) -> Linear 4C->2C (downsample x2).

    Ref: mamba_sys.py:191-231. Sub-pixel order is [(0,0), (1,0), (0,1), (1,1)]
    along the channel axis (matters for checkpoint conversion).
    """

    layout: str = "bhwc"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.layout == "hwbc":
            H, W, bsz, c = x.shape
            x = x[: H - H % 2, : W - W % 2]
            x0 = x[0::2, 0::2]
            x1 = x[1::2, 0::2]
            x2 = x[0::2, 1::2]
            x3 = x[1::2, 1::2]
        else:
            bsz, H, W, c = x.shape
            x = x[:, : H - H % 2, : W - W % 2, :]
            x0 = x[:, 0::2, 0::2, :]
            x1 = x[:, 1::2, 0::2, :]
            x2 = x[:, 0::2, 1::2, :]
            x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(
            2 * c,
            use_bias=False,
            kernel_init=trunc_normal_init(),
            dtype=self.dtype,
            name="reduction",
        )(x)
        return x


class PatchExpand2D(nn.Module):
    """Linear C->2C -> 2x2 depth-to-space (C/2 out) -> LayerNorm (upsample x2).

    Ref: mamba_sys.py:233-247 (rearrange 'b h w (p1 p2 c) -> b (h p1) (w p2) c').
    """

    layout: str = "bhwc"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hwbc = self.layout == "hwbc"
        if hwbc:
            H, W, bsz, c = x.shape
        else:
            bsz, H, W, c = x.shape
        x = nn.Dense(
            2 * c,
            use_bias=False,
            kernel_init=trunc_normal_init(),
            dtype=self.dtype,
            name="expand",
        )(x)
        c_out = c // 2
        if hwbc:
            x = x.reshape(H, W, bsz, 2, 2, c_out)
            x = x.transpose(0, 3, 1, 4, 2, 5).reshape(
                2 * H, 2 * W, bsz, c_out
            )
        else:
            x = x.reshape(bsz, H, W, 2, 2, c_out)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, 2 * H, 2 * W, c_out)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x


class FinalPatchExpand2D(nn.Module):
    """Linear C->16C -> 4x4 depth-to-space (C out) -> LayerNorm (upsample x4).

    Ref: mamba_sys.py:249-265.
    """

    scale: int = 4
    layout: str = "bhwc"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hwbc = self.layout == "hwbc"
        if hwbc:
            H, W, bsz, c = x.shape
        else:
            bsz, H, W, c = x.shape
        s = self.scale
        x = nn.Dense(
            s * s * c,
            use_bias=False,
            kernel_init=trunc_normal_init(),
            dtype=self.dtype,
            name="expand",
        )(x)
        if hwbc:
            x = x.reshape(H, W, bsz, s, s, c)
            x = x.transpose(0, 3, 1, 4, 2, 5).reshape(s * H, s * W, bsz, c)
        else:
            x = x.reshape(bsz, H, W, s, s, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, s * H, s * W, c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x
