"""ENet — real-time segmentation net (bottlenecks, dilated/asymmetric convs).

Rebuild of ``/root/reference/code/networks/enet.py`` (ENet :453-614):
initial block (3x3/s2 conv || maxpool concat), 2 downsampling stages with
max-pool INDICES forwarded to the matching unpooling decoder stages, dilation
ladder [2,4,8,16], 5x5 asymmetric (5x1 + 1x5) bottlenecks, PReLU activations
in the encoder, final transposed-conv head.

TPU notes: torch's max_unpool2d(indices) is re-expressed as a one-hot scatter
over each 2x2 pooling window (pure reshape/where — no gather kernels), and
PReLU is a learnable per-channel slope.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mamba_unet_tpu.models.registry import register_model


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.where(x >= 0, x, alpha * x)


def _act(relu: bool):
    return (lambda x: nn.relu(x)) if relu else PReLU()


def _maxpool_with_argmax(x):
    """2x2/s2 max pool returning the pooled values and the in-window argmax
    one-hot mask (B, H/2, W/2, 4, C) used for unpooling."""
    b, H, W, c = x.shape
    w = x.reshape(b, H // 2, 2, W // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    w = w.reshape(b, H // 2, W // 2, 4, c)
    pooled = jnp.max(w, axis=3)
    onehot = (w == pooled[:, :, :, None, :]).astype(x.dtype)
    # break ties: keep only the first max per window
    cum = jnp.cumsum(onehot, axis=3)
    onehot = onehot * (cum == 1.0)
    return pooled, onehot


def _max_unpool(x, onehot):
    """Inverse: scatter x into the argmax positions of each 2x2 window."""
    b, h, w, c = x.shape
    out = x[:, :, :, None, :] * onehot
    out = out.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(b, 2 * h, 2 * w, c)


class InitialBlock(nn.Module):
    features: int = 16
    relu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        main = nn.Conv(self.features - x.shape[-1], (3, 3), strides=(2, 2),
                       padding=1, use_bias=False, dtype=self.dtype)(x)
        ext = nn.max_pool(x, (2, 2), strides=(2, 2))
        out = jnp.concatenate([main, ext], axis=-1)
        out = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(out)
        return _act(self.relu)(out)


class RegularBottleneck(nn.Module):
    channels: int
    internal_ratio: int = 4
    kernel_size: int = 3
    padding: int = 1
    dilation: int = 1
    asymmetric: bool = False
    dropout_prob: float = 0.0
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inter = self.channels // self.internal_ratio
        h = nn.Conv(inter, (1, 1), use_bias=False, dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        h = _act(self.relu)(h)
        if self.asymmetric:
            k = self.kernel_size
            h = nn.Conv(inter, (k, 1), padding=((self.padding, self.padding), (0, 0)),
                        use_bias=False, dtype=self.dtype)(h)
            h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
            h = _act(self.relu)(h)
            h = nn.Conv(inter, (1, k), padding=((0, 0), (self.padding, self.padding)),
                        use_bias=False, dtype=self.dtype)(h)
        else:
            h = nn.Conv(inter, (self.kernel_size, self.kernel_size),
                        padding=self.padding, kernel_dilation=self.dilation,
                        use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        h = _act(self.relu)(h)
        h = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout_prob, deterministic=deterministic)(h)
        return _act(self.relu)(x + h)


class DownsamplingBottleneck(nn.Module):
    out_channels: int
    internal_ratio: int = 4
    dropout_prob: float = 0.0
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inter = self.out_channels // self.internal_ratio
        main, onehot = _maxpool_with_argmax(x)
        pad = self.out_channels - x.shape[-1]
        main = jnp.pad(main, ((0, 0), (0, 0), (0, 0), (0, pad)))

        h = nn.Conv(inter, (2, 2), strides=(2, 2), use_bias=False,
                    dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        h = _act(self.relu)(h)
        h = nn.Conv(inter, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        h = _act(self.relu)(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout_prob, deterministic=deterministic)(h)
        return _act(self.relu)(main + h), onehot


class UpsamplingBottleneck(nn.Module):
    out_channels: int
    internal_ratio: int = 4
    dropout_prob: float = 0.0
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, onehot, deterministic: bool = True):
        inter = self.out_channels // self.internal_ratio
        main = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                       dtype=self.dtype)(x)
        main = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(main)
        main = _max_unpool(main, onehot)

        h = nn.Conv(inter, (1, 1), use_bias=False, dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        h = _act(self.relu)(h)
        h = nn.ConvTranspose(inter, (2, 2), strides=(2, 2), use_bias=False,
                             dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        h = _act(self.relu)(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout_prob, deterministic=deterministic)(h)
        return _act(self.relu)(main + h)


@register_model("enet")
class ENet(nn.Module):
    num_classes: int = 4
    in_chns: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        enc = dict(relu=False, dtype=self.dtype)
        dec = dict(relu=True, dtype=self.dtype)
        d = deterministic
        out_size = x.shape[1:3]

        x = InitialBlock(16, dtype=self.dtype)(x, d)

        x, oh1 = DownsamplingBottleneck(64, dropout_prob=0.01, **enc)(x, d)
        for i in range(4):
            x = RegularBottleneck(64, padding=1, dropout_prob=0.01, **enc)(x, d)

        x, oh2 = DownsamplingBottleneck(128, dropout_prob=0.1, **enc)(x, d)
        for _ in range(2):  # stages 2 and 3 share the same ladder
            x = RegularBottleneck(128, padding=1, dropout_prob=0.1, **enc)(x, d)
            x = RegularBottleneck(128, dilation=2, padding=2, dropout_prob=0.1,
                                  **enc)(x, d)
            x = RegularBottleneck(128, kernel_size=5, padding=2, asymmetric=True,
                                  dropout_prob=0.1, **enc)(x, d)
            x = RegularBottleneck(128, dilation=4, padding=4, dropout_prob=0.1,
                                  **enc)(x, d)
            x = RegularBottleneck(128, padding=1, dropout_prob=0.1, **enc)(x, d)
            x = RegularBottleneck(128, dilation=8, padding=8, dropout_prob=0.1,
                                  **enc)(x, d)
            x = RegularBottleneck(128, kernel_size=5, padding=2, asymmetric=True,
                                  dropout_prob=0.1, **enc)(x, d)
            x = RegularBottleneck(128, dilation=16, padding=16, dropout_prob=0.1,
                                  **enc)(x, d)

        x = UpsamplingBottleneck(64, dropout_prob=0.1, **dec)(x, oh2, d)
        x = RegularBottleneck(64, padding=1, dropout_prob=0.1, **dec)(x, d)
        x = RegularBottleneck(64, padding=1, dropout_prob=0.1, **dec)(x, d)

        x = UpsamplingBottleneck(16, dropout_prob=0.1, **dec)(x, oh1, d)
        x = RegularBottleneck(16, padding=1, dropout_prob=0.1, **dec)(x, d)

        x = nn.ConvTranspose(self.num_classes, (3, 3), strides=(2, 2),
                             use_bias=False, dtype=self.dtype)(x)
        # match the input resolution exactly (torch output_padding semantics)
        x = x[:, : out_size[0], : out_size[1], :]
        return x.astype(jnp.float32)
