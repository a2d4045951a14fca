"""Swin-UNet — the transformer baseline with the same UNet topology as VSSM.

Rebuild of ``SwinTransformerSys``
(``/root/reference/code/networks/swin_transformer_unet_skip_expand_decoder_sys.py:599-803``)
and the ``SwinUnet`` grey-input wrapper (``vision_transformer.py:24-89``).
Config (swin_tiny_..._lite.yaml): embed 96, depths [2,2,2,2], heads
[3,6,12,24], window 7, mlp_ratio 4, drop_path 0.2. The decoder mirrors the
encoder depth schedule (constructor at :743 uses depths[mirror], not
DECODER_DEPTHS — kept faithfully).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mamba_unet_tpu.models.registry import register_model
from mamba_unet_tpu.nn.layers import trunc_normal_init
from mamba_unet_tpu.nn.patch_ops import (
    FinalPatchExpand2D,
    PatchEmbed2D,
    PatchExpand2D,
    PatchMerging2D,
)
from mamba_unet_tpu.nn.swin import SwinStage


class SwinUnetSys(nn.Module):
    num_classes: int = 4
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        n_layers = len(self.depths)
        dims = [self.embed_dim * 2**i for i in range(n_layers)]
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))
        stage_dpr = []
        off = 0
        for d in self.depths:
            stage_dpr.append(tuple(dpr[off : off + d]))
            off += d

        def stage(i, name):
            return SwinStage(
                dim=dims[i],
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window_size=self.window_size,
                mlp_ratio=self.mlp_ratio,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=stage_dpr[i],
                dtype=self.dtype,
                name=name,
            )

        x = PatchEmbed2D(
            patch_size=self.patch_size, embed_dim=self.embed_dim,
            dtype=self.dtype, name="patch_embed",
        )(x)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)

        skips = []
        for i in range(n_layers):
            skips.append(x)
            x = stage(i, f"layers_{i}")(x, deterministic)
            if i < n_layers - 1:
                x = PatchMerging2D(dtype=self.dtype, name=f"downsample_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)

        for i in range(n_layers):
            mirror = n_layers - 1 - i
            if i == 0:
                x = PatchExpand2D(dtype=self.dtype, name="first_expand")(x)
            else:
                x = jnp.concatenate([x, skips[mirror]], axis=-1)
                x = nn.Dense(
                    dims[mirror], kernel_init=trunc_normal_init(),
                    dtype=self.dtype, name=f"concat_back_dim_{i}",
                )(x)
                x = stage(mirror, f"layers_up_{i}")(x, deterministic)
                if i < n_layers - 1:
                    x = PatchExpand2D(dtype=self.dtype, name=f"upsample_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_up")(x)

        x = FinalPatchExpand2D(scale=self.patch_size, dtype=self.dtype, name="up")(x)
        x = nn.Conv(
            self.num_classes, kernel_size=(1, 1), use_bias=False,
            dtype=self.dtype, name="output",
        )(x)
        return x.astype(jnp.float32)


@register_model("ViT_seg")
class SwinUnet(nn.Module):
    """Grey->RGB repeat wrapper (vision_transformer.py:50-52)."""

    num_classes: int = 4
    img_size: int = 224
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    drop_path_rate: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        return SwinUnetSys(
            num_classes=self.num_classes,
            embed_dim=self.embed_dim,
            depths=self.depths,
            num_heads=self.num_heads,
            window_size=self.window_size,
            drop_path_rate=self.drop_path_rate,
            dtype=self.dtype,
            name="swin_unet",
        )(x, deterministic)
