"""Smaller zoo members: PNet2D (dilated pyramid), projector/classifier heads.

Refs: ``/root/reference/code/networks/pnet.py`` (DeepIGeoS P-Net: 5 dilated
conv blocks, dilations [1,2,4,8,16], concat -> 1x1 fuse -> dropout head) and
``projector.py`` (small conv heads for the contrastive/jigsaw aux tasks).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mamba_unet_tpu.models.registry import register_model


class PNetBlock(nn.Module):
    features: int
    dilation: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(2):
            x = nn.Conv(
                self.features, (3, 3), kernel_dilation=self.dilation,
                padding=self.dilation, dtype=self.dtype, name=f"conv{i + 1}",
            )(x)
            x = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.01)
        return x


@register_model("pnet")
class PNet2D(nn.Module):
    """net_factory 'pnet': PNet2D(in, classes, 64, [1,2,4,8,16])."""

    num_classes: int = 4
    in_chns: int = 1
    num_filters: int = 64
    ratios: Sequence[int] = (1, 2, 4, 8, 16)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        feats = []
        h = x
        for i, r in enumerate(self.ratios):
            h = PNetBlock(self.num_filters, r, self.dtype, name=f"block{i + 1}")(
                h, deterministic
            )
            feats.append(h)
        h = jnp.concatenate(feats, axis=-1)
        # ConcatBlock: two 1x1 convs with leaky relu (pnet.py:44-62)
        h = nn.leaky_relu(nn.Conv(h.shape[-1], (1, 1), dtype=self.dtype,
                                  name="cat_conv1")(h), 0.01)
        h = nn.leaky_relu(nn.Conv(2 * self.num_filters, (1, 1), dtype=self.dtype,
                                  name="cat_conv2")(h), 0.01)
        # OutPutBlock: dropout -> 1x1 half -> dropout -> 1x1 classes (:65-84)
        h = nn.Dropout(0.3, deterministic=deterministic)(h)
        h = nn.leaky_relu(nn.Conv(self.num_filters, (1, 1), dtype=self.dtype,
                                  name="out_conv1")(h), 0.01)
        h = nn.Dropout(0.3, deterministic=deterministic)(h)
        h = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="out_conv2")(h)
        return h.astype(jnp.float32)


class _ConvBNRelu(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(x)
        return nn.relu(x)


@register_model("projector")
class Projectors(nn.Module):
    """Contrastive projector head (projector.py:50-67): conv/pool x2 -> 16ch."""

    input_nc: int = 4
    ndf: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = _ConvBNRelu(self.ndf, self.dtype)(x, deterministic)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _ConvBNRelu(self.ndf * 2, self.dtype)(x, deterministic)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


@register_model("classifier")
class Classifier(nn.Module):
    """(projector.py:69-92): conv/pool x3 -> 1x1."""

    inp_dim: int = 4
    ndf: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for mult in (1, 2, 4):
            x = _ConvBNRelu(self.ndf * mult, self.dtype)(x, deterministic)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return nn.Conv(self.ndf * 4, (1, 1), dtype=self.dtype, name="final")(x)


@register_model("Jigsaw_classifier")
class JigsawClassifier(nn.Module):
    """(projector.py:94-119): grid-shuffle position logits (b, 16, 16)."""

    inp_dim: int = 4
    ndf: int = 8
    grid_shape: Tuple[int, int] = (4, 4)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = _ConvBNRelu(self.ndf * self.ndf, self.dtype)(x, deterministic)
        x = nn.max_pool(x, (7, 7), strides=(7, 7))
        x = _ConvBNRelu(self.ndf * self.ndf * 2, self.dtype)(x, deterministic)
        x = nn.max_pool(x, (8, 8), strides=(8, 8))
        x = _ConvBNRelu(self.ndf * 2, self.dtype)(x, deterministic)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c).transpose(0, 2, 1)
