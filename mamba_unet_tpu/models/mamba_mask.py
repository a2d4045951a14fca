"""MambaUnetMask — the visual-Mamba MagicNet-mask model.

The reference's ``train_Semi_Mamba_2D_mask.py`` drives ``forward_encoder`` /
``fc_layer`` (``code/utils/cube_losses.py:119-158``), ``forward_decoder`` /
``forward_prediction_head`` (cube partition/recovery) and
``forward_mix_pos_mask`` (``code/utils/masked_loss.py:5-33``) on a model named
``MambaUnetMask`` — but the upstream class
(``code/networks/mamba_2D_mask.py:23-46``) is a plain VSSM wrapper WITHOUT any
of those heads, so the reference script crashes with AttributeError as-is.

This module builds the model the script intends: the VSSM (visual-Mamba UNet)
encoder/decoder split into callable halves, composed with the MagicNet mask
heads (``PosEmbedLayer``/``MixOutLayer``, magicnet_2D_mask.py:262-305, and the
``FcLayer`` cube-location classifier, magicnet.py:248-260). The API mirrors
``VNetMagicMask`` (models/magicnet_mask.py) exactly, so the MagicNet /
mask-pretrain / contrastive-mask trainers drive either backbone unchanged:

  __call__(x)                 -> (seg logits, 16-ch full-res embedding)
  forward_prediction_head(e)  -> logits (1x1 conv on the embedding)
  forward_encoder(x, ...)     -> [skip0..skip3, bottleneck] feature list
  forward_decoder(feats)      -> (logits, embedding)
  forward_location(flat)      -> cube-location logits
  forward_mix_pos_mask(x,...) -> (B, 256) global embedding

Design notes (where the composition required choices the reference never
made, because its model never existed):
  * The decoder ends in FinalPatchExpand (x4) at ``embed_dim`` channels; a
    3x3 conv projects to the 16-channel embedding the cube losses gather
    (nb_chnls=16, train_Semi_Mamba_2D_mask.py:214-218), and the prediction
    head is the 1x1 conv on that embedding — the VNet_Magic split
    (magicnet.py:272-281) transplanted onto VSSM.
  * The location head consumes the flattened bottleneck of a 32x32 cube:
    patch_embed (/4) + 3 merges (/8 more) -> 1x1 x dims[-1].
  * Grey->RGB repeat happens inside the encoder (vision_mamba.py:43-44).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mamba_unet_tpu.models.magicnet_mask import MixOutLayer, PosEmbedLayer
from mamba_unet_tpu.models.registry import register_model
from mamba_unet_tpu.models.vnet import FcLayer
from mamba_unet_tpu.nn.layers import trunc_normal_init
from mamba_unet_tpu.nn.patch_ops import (
    FinalPatchExpand2D,
    PatchEmbed2D,
    PatchExpand2D,
    PatchMerging2D,
)
from mamba_unet_tpu.nn.vss import VSSLayer


def _stage_drop_paths(depths: Sequence[int], rate: float):
    dpr = list(np.linspace(0, rate, sum(depths)))
    out, off = [], 0
    for d in depths:
        out.append(tuple(dpr[off : off + d]))
        off += d
    return out


class VSSMEncoder(nn.Module):
    """patch_embed + 4 VSS stages; returns [skip0..skip3, normed bottleneck]
    (the skip list plays VNetEncoder's feature-list role)."""

    depths: Sequence[int] = (2, 2, 2, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: int = 16
    drop_path_rate: float = 0.2
    scan_impl: str = "auto"
    use_remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        stage_dpr = _stage_drop_paths(self.depths, self.drop_path_rate)
        x = PatchEmbed2D(patch_size=4, embed_dim=self.dims[0],
                         dtype=self.dtype, name="patch_embed")(x)
        feats = []
        n = len(self.depths)
        for i in range(n):
            feats.append(x)
            x = VSSLayer(dim=self.dims[i], depth=self.depths[i],
                         drop_path=stage_dpr[i], d_state=self.d_state,
                         scan_impl=self.scan_impl, use_remat=self.use_remat,
                         dtype=self.dtype, name=f"layers_{i}")(x, deterministic)
            if i < n - 1:
                x = PatchMerging2D(dtype=self.dtype, name=f"downsample_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        feats.append(x)
        return feats


class VSSMDecoder(nn.Module):
    """VSSM decoder splitting the head into (16-ch embedding, 1x1 out_conv)."""

    num_classes: int = 4
    depths: Sequence[int] = (2, 2, 2, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: int = 16
    drop_path_rate: float = 0.2
    embed_channels: int = 16
    scan_impl: str = "auto"
    use_remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        n = len(self.depths)
        stage_dpr = _stage_drop_paths(self.depths, self.drop_path_rate)
        self.first_expand = PatchExpand2D(dtype=self.dtype)
        ups, cbd, stages = [], [], []
        for i in range(1, n):
            mirror = n - 1 - i
            cbd.append(nn.Dense(self.dims[mirror],
                                kernel_init=trunc_normal_init(),
                                dtype=self.dtype))
            stages.append(VSSLayer(
                dim=self.dims[mirror], depth=self.depths[mirror],
                drop_path=stage_dpr[mirror], d_state=self.d_state,
                scan_impl=self.scan_impl, use_remat=self.use_remat,
                dtype=self.dtype))
            if i < n - 1:
                ups.append(PatchExpand2D(dtype=self.dtype))
        self.concat_back_dim = cbd
        self.stages = stages
        self.upsamples = ups
        self.norm_up = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.up = FinalPatchExpand2D(scale=4, dtype=self.dtype)
        self.emb_conv = nn.Conv(self.embed_channels, (3, 3),
                                dtype=self.dtype)
        self.out_conv = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                                dtype=self.dtype)

    def __call__(self, feats, deterministic: bool = True):
        n = len(self.depths)
        x = self.first_expand(feats[-1])
        for i in range(1, n):
            mirror = n - 1 - i
            x = jnp.concatenate([x, feats[mirror]], axis=-1)
            x = self.concat_back_dim[i - 1](x)
            x = self.stages[i - 1](x, deterministic)
            if i < n - 1:
                x = self.upsamples[i - 1](x)
        x = self.norm_up(x)
        embedding = self.emb_conv(self.up(x))
        seg = self.out_conv(embedding).astype(jnp.float32)
        return seg, embedding


@register_model("MambaUnetMask")
class MambaUnetMask(nn.Module):
    num_classes: int = 4
    cube_size: int = 32
    patch_size: int = 256
    img_size: int = 256  # accepted for factory parity; geometry is dynamic
    depths: Sequence[int] = (2, 2, 2, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: int = 16
    drop_path_rate: float = 0.2
    embed_channels: int = 16
    scan_impl: str = "auto"
    use_remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(depths=self.depths, dims=self.dims, d_state=self.d_state,
                  drop_path_rate=self.drop_path_rate, scan_impl=self.scan_impl,
                  use_remat=self.use_remat, dtype=self.dtype)
        self.encoder = VSSMEncoder(**kw)
        self.decoder = VSSMDecoder(num_classes=self.num_classes,
                                   embed_channels=self.embed_channels, **kw)
        self.fc_layer = FcLayer(self.cube_size, self.patch_size,
                                ndim=2, dtype=self.dtype)
        self.pos_embed_layer = PosEmbedLayer(self.cube_size, self.patch_size,
                                             self.dtype)
        self.mix_out_layer = MixOutLayer(self.patch_size, self.dtype)

    def forward_prediction_head(self, emb):
        return self.decoder.out_conv(emb).astype(jnp.float32)

    def forward_encoder(self, x, pos_embed=None, mask=None,
                        deterministic: bool = True):
        x = self.pos_embed_layer(x, pos_embed, mask, deterministic)
        return self.encoder(x, deterministic)

    def forward_decoder(self, feats, deterministic: bool = True):
        return self.decoder(feats, deterministic)

    def forward_location(self, flat, deterministic: bool = True):
        return self.fc_layer(flat, deterministic)

    def forward_mix_pos_mask(self, x, pos_embed=None, mask=None,
                             deterministic: bool = True):
        x = self.pos_embed_layer(x, pos_embed, mask, deterministic)
        _, emb = self.decoder(self.encoder(x, deterministic), deterministic)
        return self.mix_out_layer(emb, deterministic)

    def __call__(self, x, pos_embed=None, mask=None, deterministic: bool = True):
        x = self.pos_embed_layer(x, pos_embed, mask, deterministic)
        return self.decoder(self.encoder(x, deterministic), deterministic)

    def init_all(self, x, deterministic: bool = True):
        seg, emb = self(x, deterministic=deterministic)
        out = self.mix_out_layer(emb, deterministic)
        flat = jnp.zeros(
            (x.shape[0], (self.cube_size // 32) ** 2 * self.dims[-1]), x.dtype
        )
        loc = self.fc_layer(flat, deterministic)
        return seg, emb, out, loc
