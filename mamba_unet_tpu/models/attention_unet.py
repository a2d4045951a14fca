"""Attention U-Net (3-D) with grid attention gates + deep supervision.

Refs: ``/root/reference/code/networks/attention_unet.py`` (filters
[16,32,64,128,256] at feature_scale 4; gating signal from the center block;
attention on skips 2-4; dsv heads at every decoder scale concatenated into
the final 1x1) and ``grid_attention_layer.py`` ('concatenation' mode:
theta = strided conv of the skip, phi = 1x1 of the gate upsampled, psi =
1x1 -> sigmoid -> upsample -> multiply -> 1x1+norm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mamba_unet_tpu.models.registry import register_model
from mamba_unet_tpu.models.unet_3d import UnetConv3, UnetUp3CT, _up3


def _resize_to(x, spatial):
    b = x.shape[0]
    c = x.shape[-1]
    return jax.image.resize(x, (b, *spatial, c), method="trilinear")


class GridAttentionBlock3D(nn.Module):
    inter_channels: int
    sub_sample: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, g, deterministic: bool = True):
        """x: skip (B, D, H, W, C); g: gating (B, d, h, w, Cg)."""
        s = (self.sub_sample,) * 3
        theta = nn.Conv(self.inter_channels, s, strides=s, use_bias=False,
                        dtype=self.dtype, name="theta")(x)
        phi = nn.Conv(self.inter_channels, (1, 1, 1), dtype=self.dtype,
                      name="phi")(g)
        phi = _resize_to(phi, theta.shape[1:4])
        f = nn.relu(theta + phi)
        psi = nn.Conv(1, (1, 1, 1), dtype=self.dtype, name="psi")(f)
        att = jax.nn.sigmoid(psi)
        att = _resize_to(att, x.shape[1:4])
        y = att * x
        y = nn.Conv(x.shape[-1], (1, 1, 1), dtype=self.dtype, name="W")(y)
        y = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(y)
        return y, att


class MultiAttentionBlock(nn.Module):
    inter_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, g, deterministic: bool = True):
        y, att = GridAttentionBlock3D(self.inter_channels, dtype=self.dtype,
                                      name="gate_1")(x, g, deterministic)
        y = nn.Conv(x.shape[-1], (1, 1, 1), dtype=self.dtype,
                    name="combine")(y)
        y = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(y)
        return nn.relu(y), att


@register_model("attention_unet")
class AttentionUNet3D(nn.Module):
    num_classes: int = 2
    in_chns: int = 1
    feature_scale: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        f = [int(v / self.feature_scale) for v in (64, 128, 256, 512, 1024)]
        full = x.shape[1:4]
        skips = []
        for i in range(4):
            x = UnetConv3(f[i], True, self.dtype, name=f"conv{i + 1}")(
                x, deterministic
            )
            skips.append(x)
            x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        center = UnetConv3(f[4], True, self.dtype, name="center")(
            x, deterministic
        )
        # gating signal: 1x1 conv + BN + relu (UnetGridGatingSignal3)
        gating = nn.Conv(f[4], (1, 1, 1), dtype=self.dtype, name="gating")(center)
        gating = nn.BatchNorm(use_running_average=deterministic,
                              dtype=self.dtype)(gating)
        gating = nn.relu(gating)

        g4, _ = MultiAttentionBlock(f[3], self.dtype, name="attn4")(
            skips[3], gating, deterministic
        )
        up4 = UnetUp3CT(f[3], True, self.dtype, name="up_concat4")(
            g4, center, deterministic
        )
        g3, _ = MultiAttentionBlock(f[2], self.dtype, name="attn3")(
            skips[2], up4, deterministic
        )
        up3 = UnetUp3CT(f[2], True, self.dtype, name="up_concat3")(
            g3, up4, deterministic
        )
        g2, _ = MultiAttentionBlock(f[1], self.dtype, name="attn2")(
            skips[1], up3, deterministic
        )
        up2 = UnetUp3CT(f[1], True, self.dtype, name="up_concat2")(
            g2, up3, deterministic
        )
        up1 = UnetUp3CT(f[0], True, self.dtype, name="up_concat1")(
            skips[0], up2, deterministic
        )

        # deep supervision: per-scale 1x1 heads upsampled to full res, concat
        dsv4 = _resize_to(nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                                  name="dsv4")(up4), full)
        dsv3 = _resize_to(nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                                  name="dsv3")(up3), full)
        dsv2 = _resize_to(nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                                  name="dsv2")(up2), full)
        dsv1 = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                       name="dsv1")(up1)
        out = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                      name="final")(
            jnp.concatenate([dsv1, dsv2, dsv3, dsv4], axis=-1)
        )
        return out.astype(jnp.float32)
