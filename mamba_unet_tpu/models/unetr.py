"""UNETR — 3-D ViT-encoder UNet.

Rebuild of ``/root/reference/code/networks/unetr.py`` (MONAI-backed: img 96³,
patch 16, hidden 768, 12 layers x 12 heads, mlp 3072, perceptron position
embedding, feature_size 16, taps at transformer layers 3/6/9/12): native ViT
(learned pos-embed + pre-norm MHSA/MLP blocks) + the MONAI-style decoder
(progressive transposed-conv chains bring the /16 token grids to /2, /4, /8
feature maps; residual conv blocks fuse with transposed-conv upsampling).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mamba_unet_tpu.models.registry import register_model
from mamba_unet_tpu.models.segmamba import UnetrBasicBlock, UnetrUpBlock
from mamba_unet_tpu.nn.layers import trunc_normal_init


class ViTBlock(nn.Module):
    hidden: int
    heads: int
    mlp_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype,
            kernel_init=trunc_normal_init(),
        )(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = nn.Dense(self.mlp_dim, kernel_init=trunc_normal_init(),
                     dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.hidden, kernel_init=trunc_normal_init(),
                     dtype=self.dtype)(h)
        return x + h


class PrUpBlock(nn.Module):
    """Progressive upsampling: num_layer+1 transposed convs (+conv blocks)."""

    features: int
    num_layer: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = (2, 2, 2)
        x = nn.ConvTranspose(self.features, s, strides=s, dtype=self.dtype)(x)
        for i in range(self.num_layer):
            x = nn.ConvTranspose(self.features, s, strides=s,
                                 dtype=self.dtype)(x)
            x = UnetrBasicBlock(self.features, dtype=self.dtype)(x)
        return x


@register_model("unetr")
class UNETR(nn.Module):
    num_classes: int = 14
    in_chns: int = 1
    img_size: int = 96
    patch_size: int = 16
    hidden: int = 768
    mlp_dim: int = 3072
    heads: int = 12
    n_layers: int = 12
    feature_size: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, deterministic: bool = True):
        p = self.patch_size
        fs = self.feature_size
        b = x_in.shape[0]
        grid = tuple(s // p for s in x_in.shape[1:4])

        tokens = nn.Conv(self.hidden, (p, p, p), strides=(p, p, p),
                         dtype=self.dtype, name="patch_embed")(x_in)
        tokens = tokens.reshape(b, -1, self.hidden)
        pos = self.param("pos_embed", trunc_normal_init(),
                         (1, tokens.shape[1], self.hidden))
        h = tokens + pos.astype(tokens.dtype)

        taps = {}
        for i in range(self.n_layers):
            h = ViTBlock(self.hidden, self.heads, self.mlp_dim, self.dtype,
                         name=f"vit_{i}")(h, deterministic)
            if (i + 1) in (3, 6, 9, 12):
                taps[i + 1] = h.reshape(b, *grid, self.hidden)

        enc1 = UnetrBasicBlock(fs, dtype=self.dtype, name="encoder1")(x_in)
        enc2 = PrUpBlock(2 * fs, num_layer=2, dtype=self.dtype,
                         name="encoder2")(taps[3])
        enc3 = PrUpBlock(4 * fs, num_layer=1, dtype=self.dtype,
                         name="encoder3")(taps[6])
        enc4 = PrUpBlock(8 * fs, num_layer=0, dtype=self.dtype,
                         name="encoder4")(taps[9])

        d = UnetrUpBlock(8 * fs, dtype=self.dtype, name="decoder5")(
            taps[12], enc4
        )
        d = UnetrUpBlock(4 * fs, dtype=self.dtype, name="decoder4")(d, enc3)
        d = UnetrUpBlock(2 * fs, dtype=self.dtype, name="decoder3")(d, enc2)
        d = UnetrUpBlock(fs, dtype=self.dtype, name="decoder2")(d, enc1)
        out = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                      name="out")(d)
        return out.astype(jnp.float32)
