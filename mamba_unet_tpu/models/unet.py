"""The canonical 2-D UNet family: UNet, UNet_DS, UNet_URPC, UNet_CCT, TLUNet.

TPU-native rebuild of ``/root/reference/code/networks/unet.py`` (PyMIC-derived).
Channels-last; feature widths [16, 32, 64, 128, 256]; encoder dropout
[.05, .1, .2, .3, .5]; BatchNorm + LeakyReLU conv pairs; transposed-conv
upsampling (the reference default ``bilinear=False``); 3x3 output head.

BatchNorm running stats live in the ``batch_stats`` collection; pass
``deterministic=False`` (training) with ``mutable=["batch_stats"]``. Under a
data-parallel ``jit`` the batch statistics are computed over the *global*
batch (XLA inserts the cross-device reductions) — stronger than the
reference's single-GPU BN.

The aux-decoder feature perturbations (Dropout / FeatureDropout /
FeatureNoise, ref :272-301) draw from the ``dropout`` RNG stream.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mamba_unet_tpu.models.registry import register_model

FT_CHNS = (16, 32, 64, 128, 256)
DROPOUT = (0.05, 0.1, 0.2, 0.3, 0.5)


class ConvBlock(nn.Module):
    """[Conv3x3 -> BN -> LeakyReLU -> Dropout -> Conv3x3 -> BN -> LeakyReLU]."""

    features: int
    dropout_p: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.01)
        x = nn.Dropout(self.dropout_p, deterministic=deterministic)(x)
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.01)


class Encoder(nn.Module):
    ft_chns: Sequence[int] = FT_CHNS
    dropout: Sequence[float] = DROPOUT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        feats = []
        x = ConvBlock(self.ft_chns[0], self.dropout[0], self.dtype, name="in_conv")(
            x, deterministic
        )
        feats.append(x)
        for i in range(1, 5):
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = ConvBlock(
                self.ft_chns[i], self.dropout[i], self.dtype, name=f"down{i}"
            )(x, deterministic)
            feats.append(x)
        return feats


class UpBlock(nn.Module):
    """ConvTranspose x2 upsample -> concat skip -> ConvBlock."""

    skip_features: int
    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, deterministic: bool = True):
        x = nn.ConvTranspose(
            self.skip_features, (2, 2), strides=(2, 2), dtype=self.dtype, name="up"
        )(x)
        x = jnp.concatenate([skip, x], axis=-1)
        return ConvBlock(self.out_features, 0.0, self.dtype, name="conv")(
            x, deterministic
        )


def _feature_dropout(rng, x):
    """Attention-thresholded channel dropout (unet.py:277-285)."""
    attn = jnp.mean(x, axis=-1, keepdims=True)  # (B,H,W,1)
    mx = jnp.max(attn.reshape(x.shape[0], -1), axis=1).reshape(-1, 1, 1, 1)
    thresh = mx * jax.random.uniform(rng, (), minval=0.7, maxval=0.9)
    return x * (attn < thresh).astype(x.dtype)


def _feature_noise(rng, x, uniform_range=0.3):
    """Multiplicative uniform noise (unet.py:288-301)."""
    noise = jax.random.uniform(
        rng, x.shape[1:], minval=-uniform_range, maxval=uniform_range
    )[None]
    return x * noise.astype(x.dtype) + x


def _dropout(rng, x, p=0.3):
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


class Decoder(nn.Module):
    num_classes: int
    ft_chns: Sequence[int] = FT_CHNS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, deterministic: bool = True):
        f = self.ft_chns
        x = feats[4]
        for i, k in enumerate((3, 2, 1, 0)):
            x = UpBlock(f[k], f[k], self.dtype, name=f"up{i + 1}")(
                x, feats[k], deterministic
            )
        return nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype,
                       name="out_conv")(x)


class DecoderDS(nn.Module):
    """Deep-supervision decoder: aux 3x3 heads after each up stage, resized to
    full resolution (unet.py:156-206). ``mode`` selects DS (plain) or URPC
    (perturbed aux features in training, unet.py:209-269)."""

    num_classes: int
    out_shape: Tuple[int, int]
    mode: str = "ds"  # "ds" | "urpc"
    ft_chns: Sequence[int] = FT_CHNS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, deterministic: bool = True):
        f = self.ft_chns
        outs = []
        x = feats[4]

        def resize(seg):
            bsz, h, w, c = seg.shape
            return jax.image.resize(
                seg, (bsz, *self.out_shape, c), method="nearest"
            )

        # Aux-head perturbations in training (URPC, unet.py:246-265):
        # after up1 -> Dropout(0.5), up2 -> FeatureDropout, up3 -> FeatureNoise.
        perturbs = (
            lambda r, h: _dropout(r, h, 0.5),
            _feature_dropout,
            _feature_noise,
        )
        for i, k in enumerate((3, 2, 1, 0)):
            x = UpBlock(f[k], f[k], self.dtype, name=f"up{i + 1}")(
                x, feats[k], deterministic
            )
            if k > 0:
                h = x
                if self.mode == "urpc" and not deterministic:
                    h = perturbs[i](self.make_rng("dropout"), h)
                seg = nn.Conv(
                    self.num_classes, (3, 3), padding=1, dtype=self.dtype,
                    name=f"out_conv_dp{k}"
                )(h)
                outs.append(resize(seg))
        main = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype,
                       name="out_conv")(x)
        return (main, *outs[::-1])  # (full-res main, dp1, dp2, dp3)


@register_model("unet")
class UNet(nn.Module):
    num_classes: int = 4
    in_chns: int = 1
    ft_chns: Sequence[int] = FT_CHNS
    dropout: Sequence[float] = DROPOUT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        feats = Encoder(self.ft_chns, self.dropout, self.dtype, name="encoder")(
            x, deterministic
        )
        out = Decoder(self.num_classes, self.ft_chns, self.dtype, name="decoder")(
            feats, deterministic
        )
        return out.astype(jnp.float32)


@register_model("unet_ds")
class UNetDS(nn.Module):
    num_classes: int = 4
    ft_chns: Sequence[int] = FT_CHNS
    dropout: Sequence[float] = DROPOUT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        feats = Encoder(self.ft_chns, self.dropout, self.dtype, name="encoder")(
            x, deterministic
        )
        outs = DecoderDS(
            self.num_classes, x.shape[1:3], "ds", self.ft_chns, self.dtype,
            name="decoder",
        )(feats, deterministic)
        return tuple(o.astype(jnp.float32) for o in outs)


@register_model("unet_urpc")
class UNetURPC(nn.Module):
    num_classes: int = 4
    ft_chns: Sequence[int] = FT_CHNS
    dropout: Sequence[float] = DROPOUT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        feats = Encoder(self.ft_chns, self.dropout, self.dtype, name="encoder")(
            x, deterministic
        )
        outs = DecoderDS(
            self.num_classes, x.shape[1:3], "urpc", self.ft_chns, self.dtype,
            name="decoder",
        )(feats, deterministic)
        return tuple(o.astype(jnp.float32) for o in outs)


@register_model("unet_cct")
class UNetCCT(nn.Module):
    """Main + 3 aux decoders on perturbed encoder features (unet.py:365-390)."""

    num_classes: int = 4
    ft_chns: Sequence[int] = FT_CHNS
    dropout: Sequence[float] = DROPOUT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        feats = Encoder(self.ft_chns, self.dropout, self.dtype, name="encoder")(
            x, deterministic
        )
        main = Decoder(self.num_classes, self.ft_chns, self.dtype,
                       name="main_decoder")(feats, deterministic)

        def perturb(fn, fs):
            if deterministic:
                return fs
            return [fn(self.make_rng("dropout"), f) for f in fs]

        aux1 = Decoder(self.num_classes, self.ft_chns, self.dtype,
                       name="aux_decoder1")(perturb(_feature_noise, feats),
                                            deterministic)
        aux2 = Decoder(self.num_classes, self.ft_chns, self.dtype,
                       name="aux_decoder2")(perturb(_dropout, feats), deterministic)
        aux3 = Decoder(self.num_classes, self.ft_chns, self.dtype,
                       name="aux_decoder3")(perturb(_feature_dropout, feats),
                                            deterministic)
        return tuple(o.astype(jnp.float32) for o in (main, aux1, aux2, aux3))


@register_model("TLunet")
class TLUNet(nn.Module):
    """Stacked seg + mask-refine UNets (unet.py:323-362): the second UNet eats
    the softmax of the first."""

    num_classes: int = 4
    ft_chns: Sequence[int] = FT_CHNS
    dropout: Sequence[float] = DROPOUT
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.ft_chns, self.dropout, self.dtype)
        self.decoder = Decoder(self.num_classes, self.ft_chns, self.dtype)
        self.mask_encoder = Encoder(self.ft_chns, self.dropout, self.dtype)
        self.mask_decoder = Decoder(self.num_classes, self.ft_chns, self.dtype)

    def stage1(self, x, deterministic: bool = True):
        return self.decoder(self.encoder(x, deterministic), deterministic)

    def stage2(self, x, deterministic: bool = True):
        return self.mask_decoder(self.mask_encoder(x, deterministic), deterministic)

    def __call__(self, x, deterministic: bool = True):
        seg = self.stage1(x, deterministic)
        soft = jax.nn.softmax(seg, axis=-1)
        return self.stage2(soft, deterministic).astype(jnp.float32)
