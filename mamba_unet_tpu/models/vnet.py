"""VNet family (2-D and 3-D) + MagicNet variants, rank-generic.

Rebuild of ``/root/reference/code/networks/vnet.py`` (3-D VNet),
``magicnet.py`` (3-D VNet_Magic: encoder/decoder split + cube-location
FcLayer) and ``magicnet_2D.py`` (2-D twins). The reference duplicates the
whole block zoo per rank; here one implementation takes ``ndim`` (2 or 3) —
flax convs are rank-generic.

Structure (n_filters=16): 5 encoder blocks (1/2/3/3/3 convs) with stride-2
conv downsampling between, additive-skip decoder with transposed-conv
upsampling, 1x1 head on the 16-channel embedding. ``VNetMagic`` exposes
``forward_encoder`` / ``forward_decoder`` / ``forward_prediction_head``
(magicnet.py:272-288) + the cube-location ``FcLayer`` (:248-260).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mamba_unet_tpu.models.registry import register_model


def _norm(kind: str, deterministic: bool, dtype):
    if kind == "batchnorm":
        return nn.BatchNorm(use_running_average=deterministic, dtype=dtype)
    if kind == "groupnorm":
        return nn.GroupNorm(num_groups=16, dtype=dtype)
    if kind == "instancenorm":
        # InstanceNorm == GroupNorm with one channel per group
        return nn.GroupNorm(num_groups=None, group_size=1, dtype=dtype)
    if kind == "none":
        return None
    raise ValueError(kind)


class ConvStack(nn.Module):
    """n_stages x [Conv3 -> norm -> ReLU]; residual variant keeps the last
    ReLU outside the sum (vnet.py:34-65)."""

    n_stages: int
    features: int
    ndim: int = 3
    normalization: str = "none"
    residual: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inp = x
        for i in range(self.n_stages):
            x = nn.Conv(
                self.features, (3,) * self.ndim, padding=1, dtype=self.dtype
            )(x)
            norm = _norm(self.normalization, deterministic, self.dtype)
            if norm is not None:
                x = norm(x)
            if not self.residual or i != self.n_stages - 1:
                x = nn.relu(x)
        if self.residual:
            x = nn.relu(x + inp)
        return x


class Down(nn.Module):
    features: int
    ndim: int = 3
    stride: int = 2
    normalization: str = "none"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        s = (self.stride,) * self.ndim
        x = nn.Conv(self.features, s, strides=s, padding="VALID", dtype=self.dtype)(x)
        norm = _norm(self.normalization, deterministic, self.dtype)
        if norm is not None:
            x = norm(x)
        return nn.relu(x)


class Up(nn.Module):
    features: int
    ndim: int = 3
    stride: int = 2
    normalization: str = "none"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        s = (self.stride,) * self.ndim
        x = nn.ConvTranspose(self.features, s, strides=s, dtype=self.dtype)(x)
        norm = _norm(self.normalization, deterministic, self.dtype)
        if norm is not None:
            x = norm(x)
        return nn.relu(x)


class VNetEncoder(nn.Module):
    n_filters: int = 16
    ndim: int = 3
    normalization: str = "none"
    has_dropout: bool = False
    residual: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        nf = self.n_filters
        common = dict(ndim=self.ndim, normalization=self.normalization,
                      residual=self.residual, dtype=self.dtype)
        down = dict(ndim=self.ndim, normalization=self.normalization,
                    dtype=self.dtype)
        x1 = ConvStack(1, nf, name="block_one", **common)(x, deterministic)
        x = Down(2 * nf, name="block_one_dw", **down)(x1, deterministic)
        x2 = ConvStack(2, 2 * nf, name="block_two", **common)(x, deterministic)
        x = Down(4 * nf, name="block_two_dw", **down)(x2, deterministic)
        x3 = ConvStack(3, 4 * nf, name="block_three", **common)(x, deterministic)
        x = Down(8 * nf, name="block_three_dw", **down)(x3, deterministic)
        x4 = ConvStack(3, 8 * nf, name="block_four", **common)(x, deterministic)
        x = Down(16 * nf, name="block_four_dw", **down)(x4, deterministic)
        x5 = ConvStack(3, 16 * nf, name="block_five", **common)(x, deterministic)
        if self.has_dropout:
            x5 = nn.Dropout(0.5, deterministic=deterministic)(x5)
        return [x1, x2, x3, x4, x5]


class VNetDecoder(nn.Module):
    num_classes: int = 2
    n_filters: int = 16
    ndim: int = 3
    normalization: str = "none"
    has_dropout: bool = False
    residual: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        nf = self.n_filters
        common = dict(ndim=self.ndim, normalization=self.normalization,
                      residual=self.residual, dtype=self.dtype)
        up = dict(ndim=self.ndim, normalization=self.normalization,
                  dtype=self.dtype)
        self.block_five_up = Up(8 * nf, **up)
        self.block_six = ConvStack(3, 8 * nf, **common)
        self.block_six_up = Up(4 * nf, **up)
        self.block_seven = ConvStack(3, 4 * nf, **common)
        self.block_seven_up = Up(2 * nf, **up)
        self.block_eight = ConvStack(2, 2 * nf, **common)
        self.block_eight_up = Up(nf, **up)
        self.block_nine = ConvStack(1, nf, **common)
        self.out_conv = nn.Conv(self.num_classes, (1,) * self.ndim,
                                dtype=self.dtype)
        if self.has_dropout:
            self.dropout = nn.Dropout(0.5)

    def __call__(self, feats, deterministic: bool = True):
        x1, x2, x3, x4, x5 = feats
        x = self.block_five_up(x5, deterministic) + x4
        x = self.block_six(x, deterministic)
        x = self.block_six_up(x, deterministic) + x3
        x = self.block_seven(x, deterministic)
        x = self.block_seven_up(x, deterministic) + x2
        x = self.block_eight(x, deterministic)
        x = self.block_eight_up(x, deterministic) + x1
        embedding = self.block_nine(x, deterministic)
        if self.has_dropout:
            embedding = self.dropout(embedding, deterministic=deterministic)
        seg = self.out_conv(embedding)
        return seg.astype(jnp.float32), embedding


class FcLayer(nn.Module):
    """Cube-location classifier: flattened bottleneck of one cube ->
    (patch/cube)^ndim location logits (magicnet.py:248-260)."""

    cube_size: int = 32
    patch_size: int = 96
    n_filters: int = 16
    ndim: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        nt = self.patch_size // self.cube_size
        x = nn.Dense(4096, dtype=self.dtype, name="fc1")(x)
        x = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Dense(nt**self.ndim, dtype=self.dtype, name="fc2")(
            x
        ).astype(jnp.float32)


class VNet(nn.Module):
    """Plain VNet (vnet.py:145-250 / magicnet_2D.py VNet_2D)."""

    num_classes: int = 2
    in_chns: int = 1
    n_filters: int = 16
    ndim: int = 3
    normalization: str = "batchnorm"
    has_dropout: bool = False
    residual: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(n_filters=self.n_filters, ndim=self.ndim,
                  normalization=self.normalization, has_dropout=self.has_dropout,
                  residual=self.residual, dtype=self.dtype)
        self.encoder = VNetEncoder(**kw)
        self.decoder = VNetDecoder(num_classes=self.num_classes, **kw)

    def __call__(self, x, deterministic: bool = True):
        seg, _ = self.decoder(self.encoder(x, deterministic), deterministic)
        return seg


class VNetMagic(nn.Module):
    """VNet_Magic: VNet + cube-location head, encoder/decoder separately
    callable for the MagicNet cube pipeline (magicnet.py:263-290)."""

    num_classes: int = 2
    in_chns: int = 1
    cube_size: int = 32
    patch_size: int = 96
    n_filters: int = 16
    ndim: int = 3
    normalization: str = "instancenorm"
    has_dropout: bool = False
    residual: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(n_filters=self.n_filters, ndim=self.ndim,
                  normalization=self.normalization, has_dropout=self.has_dropout,
                  residual=self.residual, dtype=self.dtype)
        self.encoder = VNetEncoder(**kw)
        self.decoder = VNetDecoder(num_classes=self.num_classes, **kw)
        self.fc_layer = FcLayer(self.cube_size, self.patch_size, self.n_filters,
                                self.ndim, self.dtype)

    def forward_encoder(self, x, deterministic: bool = True):
        return self.encoder(x, deterministic)

    def forward_decoder(self, feats, deterministic: bool = True):
        return self.decoder(feats, deterministic)

    def forward_location(self, flat_bottleneck, deterministic: bool = True):
        return self.fc_layer(flat_bottleneck, deterministic)

    def forward_prediction_head(self, embedding):
        return self.decoder.out_conv(embedding).astype(jnp.float32)

    def __call__(self, x, deterministic: bool = True):
        return self.decoder(self.encoder(x, deterministic), deterministic)

    def init_all(self, x, deterministic: bool = True):
        """Init-coverage entry: touches encoder, decoder AND the location
        head so ``model.init(rng, x, method="init_all")`` creates every
        parameter (plain ``__call__`` never reaches fc_layer)."""
        seg, emb = self(x, deterministic)
        feats = self.encoder(x, deterministic)
        bottleneck = feats[-1]
        ts = self.cube_size // 16
        flat_dim = (16 * self.n_filters) * (ts**self.ndim)
        flat = jnp.zeros((x.shape[0], flat_dim), bottleneck.dtype)
        loc = self.fc_layer(flat, deterministic)
        return seg, emb, loc


@register_model("vnet")
def _vnet_2d(**kw):
    """net_factory 'vnet' = the 2-D VNet_2D (net_factory.py:20-21)."""
    kw.setdefault("ndim", 2)
    kw.setdefault("normalization", "instancenorm")
    if "class_num" in kw:
        kw["num_classes"] = kw.pop("class_num")
    return VNet(**kw)


@register_model("vnet_3D")
def _vnet_3d(**kw):
    kw.setdefault("ndim", 3)
    kw.setdefault("normalization", "batchnorm")
    kw.setdefault("has_dropout", True)
    if "class_num" in kw:
        kw["num_classes"] = kw.pop("class_num")
    return VNet(**kw)


@register_model("magicnet")
def _magic_3d(**kw):
    kw.setdefault("ndim", 3)
    if "class_num" in kw:
        kw["num_classes"] = kw.pop("class_num")
    return VNetMagic(**kw)


@register_model("magicnet_2D")
def _magic_2d(**kw):
    kw.setdefault("ndim", 2)
    if "class_num" in kw:
        kw["num_classes"] = kw.pop("class_num")
    return VNetMagic(**kw)
