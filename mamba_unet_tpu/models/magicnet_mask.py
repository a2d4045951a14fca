"""MagicNet mask variant: VNet_Magic_2D_mask with position/mask embedding and
the global mix-out head for shuffle/mask recovery SSL.

Ref: ``/root/reference/code/networks/magicnet_2D_mask.py:262-345``:
``Pos_embed_layer`` (cube position ids + visibility mask -> MLP -> per-pixel
multiplicative embedding), ``Mix_out_layer`` (stride-5 conv on the 16-ch
embedding -> 256-d global vector), ``forward_mix_pos_mask`` (the SSL head
used by utils/masked_loss.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mamba_unet_tpu.models.registry import register_model
from mamba_unet_tpu.models.vnet import FcLayer, VNetDecoder, VNetEncoder


class PosEmbedLayer(nn.Module):
    cube_size: int = 32
    patch_size: int = 96
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_embed=None, mask=None, deterministic: bool = True):
        """x: (B, H, W, C). pos_embed/mask: (B, ncube²) or None (identity ids
        / all-visible)."""
        b = x.shape[0]
        nc = self.patch_size // self.cube_size
        n2 = nc * nc
        if pos_embed is None:
            pos_embed = jnp.tile(jnp.arange(n2, dtype=jnp.float32), (b, 1))
        if mask is None:
            mask = jnp.ones((b, n2), jnp.float32)
        pm = jnp.concatenate(
            [pos_embed.astype(jnp.float32), mask.astype(jnp.float32)], axis=1
        )
        h = nn.Dense(256, dtype=self.dtype, name="fc1")(pm)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Dense(self.patch_size**2, dtype=self.dtype, name="fc2")(h)
        embed = h.reshape(b, self.patch_size, self.patch_size, 1)
        if self.patch_size != x.shape[1]:
            embed = jax.image.resize(
                embed, (b, x.shape[1], x.shape[2], 1), method="bilinear"
            )
        return x * embed.astype(x.dtype)


class MixOutLayer(nn.Module):
    patch_size: int = 96
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb, deterministic: bool = True):
        """emb: (B, H, W, 16) decoder embedding -> (B, 256) global vector."""
        h = nn.Conv(1, (5, 5), strides=(5, 5), padding=2, dtype=self.dtype,
                    name="conv")(emb)
        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(256, dtype=self.dtype, name="fc")(h)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        return nn.leaky_relu(h, 0.2)


@register_model("magicnet_2D_mask")
class VNetMagicMask(nn.Module):
    num_classes: int = 2
    in_chns: int = 1
    cube_size: int = 32
    patch_size: int = 96
    n_filters: int = 16
    normalization: str = "instancenorm"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(n_filters=self.n_filters, ndim=2,
                  normalization=self.normalization, dtype=self.dtype)
        self.encoder = VNetEncoder(**kw)
        self.decoder = VNetDecoder(num_classes=self.num_classes, **kw)
        self.fc_layer = FcLayer(self.cube_size, self.patch_size,
                                self.n_filters, 2, self.dtype)
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
        ts = self.cube_size // 16
        flat = jnp.zeros((x.shape[0], (16 * self.n_filters) * ts * ts), x.dtype)
        loc = self.fc_layer(flat, deterministic)
        return seg, emb, out, loc
