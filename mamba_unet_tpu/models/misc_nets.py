"""Remaining zoo members: adversarial discriminators, pretrained-encoder
UNet, EfficientNet-encoder UNet.

Refs:
  * ``/root/reference/code/networks/discriminator.py`` — FC3DDiscriminator
    (map+image two-stem conv stack, stride-2 x5, avgpool, 2-way head) and
    the 2-D FCDiscriminator;
  * ``pretrained_unet.py`` — preUnet: res2net101 encoder + conv-up decoder
    (the torchvision/res2net pretrained weights do not ship; the encoder
    here is a native bottleneck ResNet of the same stage widths, trainable
    from scratch or warm-startable via utils/convert-style mapping);
  * ``efficientunet.py`` — Effi_UNet: EfficientNet encoder + UNet decoder
    (native MBConv encoder with the B3-ish stage layout; the external
    efficientnet_pytorch dependency is replaced).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mamba_unet_tpu.models.registry import register_model


# --------------------------------------------------------------------------
# discriminators (DAN leftovers, kept for inventory parity)
# --------------------------------------------------------------------------


class FCDiscriminator(nn.Module):
    """2-D map+image discriminator -> (B, 2) logits."""

    num_classes: int
    ndf: int = 64
    ndim: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seg_map, image, deterministic: bool = True):
        k = (4,) * self.ndim
        s = (2,) * self.ndim
        f_map = nn.Conv(self.ndf, k, strides=s, padding=1, dtype=self.dtype,
                        name="conv0")(seg_map)
        f_img = nn.Conv(self.ndf, k, strides=s, padding=1, dtype=self.dtype,
                        name="conv1")(image)
        x = nn.leaky_relu(f_map + f_img, 0.2)
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        for i, mult in enumerate((2, 4, 8)):
            x = nn.Conv(self.ndf * mult, k, strides=s, padding=1,
                        dtype=self.dtype, name=f"conv{i + 2}")(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Dropout(0.5, deterministic=deterministic)(x)
        x = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))  # global avg pool
        return nn.Dense(2, dtype=self.dtype, name="classifier")(x)


@register_model("fc_discriminator")
def _fc2d(**kw):
    kw.setdefault("ndim", 2)
    return FCDiscriminator(**kw)


@register_model("fc3d_discriminator")
def _fc3d(**kw):
    kw.setdefault("ndim", 3)
    return FCDiscriminator(**kw)


# --------------------------------------------------------------------------
# preUnet: bottleneck-ResNet encoder + conv-up decoder
# --------------------------------------------------------------------------


class Bottleneck(nn.Module):
    features: int  # output = 4 * features
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_ch = 4 * self.features
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=deterministic,
                             dtype=self.dtype)(x)
        return nn.relu(h + x)


class _ConvBlock2(nn.Module):
    mid: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for ch in (self.mid, self.out):
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=deterministic,
                             dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.01)
        return x


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


@register_model("preUnet")
class PreUNet(nn.Module):
    """ResNet-bottleneck encoder UNet (pretrained_unet.py:38-83 topology)."""

    num_classes: int = 1
    in_chns: int = 1
    depths: Sequence[int] = (2, 2, 2)  # layer1..layer3 block counts (compact)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = deterministic
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        x = nn.BatchNorm(use_running_average=d, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        stages = []
        for i, (f, blocks) in enumerate(zip((64, 128, 256), self.depths)):
            for b in range(blocks):
                stride = 2 if (b == 0 and i > 0) else 1
                x = Bottleneck(f, stride, self.dtype,
                               name=f"layer{i + 1}_{b}")(x, d)
            stages.append(x)  # 256@/4, 512@/8, 1024@/16
        x1, x2, x3 = stages

        h = _ConvBlock2(1024, 512, self.dtype, name="conv_up_1")(x3, d)
        h = _up2(h)
        h = _ConvBlock2(512, 512, self.dtype, name="conv_up_2")(
            jnp.concatenate([h, x2], -1), d)
        h = _ConvBlock2(512, 256, self.dtype, name="conv_up_3")(h, d)
        h = _up2(h)
        h = _ConvBlock2(256, 256, self.dtype, name="conv_up_4")(
            jnp.concatenate([h, x1], -1), d)
        h = _ConvBlock2(256, 64, self.dtype, name="conv_up_5")(h, d)
        h = _up2(h)
        h = _up2(h)
        h = _ConvBlock2(64, 64, self.dtype, name="conv_up_6")(h, d)
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                      name="final")(h)
        return out.astype(jnp.float32)


# --------------------------------------------------------------------------
# Effi_UNet: MBConv encoder + UNet decoder
# --------------------------------------------------------------------------


class MBConv(nn.Module):
    features: int
    expand: int = 4
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inp = x
        mid = x.shape[-1] * self.expand
        h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        h = nn.swish(h)
        h = nn.Conv(mid, (3, 3), strides=(self.stride,) * 2, padding=1,
                    feature_group_count=mid, use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        h = nn.swish(h)
        # squeeze-excite
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = nn.swish(nn.Conv(max(mid // 16, 4), (1, 1), dtype=self.dtype)(s))
        s = jax.nn.sigmoid(nn.Conv(mid, (1, 1), dtype=self.dtype)(s))
        h = h * s
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        if self.stride == 1 and inp.shape[-1] == self.features:
            h = h + inp
        return h


@register_model("efficient_unet")
class EffiUNet(nn.Module):
    """EfficientNet(-B3-ish)-encoder UNet (efficientunet.py equivalent)."""

    num_classes: int = 4
    in_chns: int = 1
    stage_features: Sequence[int] = (24, 32, 48, 96, 232)
    stage_blocks: Sequence[int] = (2, 3, 3, 5, 2)
    decoder_features: Sequence[int] = (256, 128, 64, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = deterministic
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        x = nn.BatchNorm(use_running_average=d, dtype=self.dtype)(x)
        x = nn.swish(x)
        skips = [x]  # /2
        for i, (f, blocks) in enumerate(zip(self.stage_features,
                                            self.stage_blocks)):
            for b in range(blocks):
                stride = 2 if (b == 0 and i > 0) else 1
                x = MBConv(f, stride=stride, dtype=self.dtype,
                           name=f"stage{i}_block{b}")(x, d)
            if i < len(self.stage_features) - 1:
                skips.append(x)
        # x at /32-ish; decode with skip concat
        for i, f in enumerate(self.decoder_features):
            x = _up2(x)
            skip = skips[-(i + 1)]
            x = jnp.concatenate([x, skip], axis=-1)
            x = _ConvBlock2(f, f, self.dtype, name=f"dec{i}")(x, d)
        x = _up2(x)
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                      name="head")(x)
        return out.astype(jnp.float32)
