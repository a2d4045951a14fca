"""3-D UNet (+ deep-variance semi variant) and VoxResNet.

Refs: ``/root/reference/code/networks/unet_3D.py`` (filters [16,32,64,128,256]
at feature_scale 4, maxpool down, trilinear-up + two-conv up blocks, dropout
0.3 at center and before the head), ``unet_3D_dv_semi.py`` (adds aux heads at
each decoder scale, interpolated to full size), ``VoxResNet.py`` (SE-gated
residual voxel blocks at 3 scales with upsampled-sum fusion).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mamba_unet_tpu.models.registry import register_model


class UnetConv3(nn.Module):
    features: int
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3, 3), padding=1, dtype=self.dtype,
                        name=f"conv{i + 1}")(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=deterministic,
                                 dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


def _up3(x):
    b, d, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * d, 2 * h, 2 * w, c), method="trilinear")


class UnetUp3CT(nn.Module):
    """Trilinear x2 upsample -> concat skip -> UnetConv3 (unet_3D.py UnetUp3_CT)."""

    features: int
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, skip, x, deterministic: bool = True):
        x = _up3(x)
        x = jnp.concatenate([skip, x], axis=-1)
        return UnetConv3(self.features, self.use_bn, self.dtype, name="conv")(
            x, deterministic
        )


@register_model("unet_3D")
class UNet3D(nn.Module):
    num_classes: int = 2
    in_chns: int = 1
    feature_scale: int = 4
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        f = [int(v / self.feature_scale) for v in (64, 128, 256, 512, 1024)]
        skips = []
        for i in range(4):
            x = UnetConv3(f[i], self.use_bn, self.dtype, name=f"conv{i + 1}")(
                x, deterministic
            )
            skips.append(x)
            x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = UnetConv3(f[4], self.use_bn, self.dtype, name="center")(x, deterministic)
        x = nn.Dropout(0.3, deterministic=deterministic)(x)
        for i, k in enumerate((3, 2, 1, 0)):
            x = UnetUp3CT(f[k], self.use_bn, self.dtype, name=f"up_concat{k + 1}")(
                skips[k], x, deterministic
            )
        x = nn.Dropout(0.3, deterministic=deterministic)(x)
        x = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype, name="final")(x)
        return x.astype(jnp.float32)


@register_model("unet_3D_dv_semi")
class UNet3DDVSemi(nn.Module):
    """Deep-supervision variant: aux 1x1 heads at each decoder scale,
    resized to full resolution (unet_3D_dv_semi.py)."""

    num_classes: int = 2
    in_chns: int = 1
    feature_scale: int = 4
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        full = x.shape[1:4]
        f = [int(v / self.feature_scale) for v in (64, 128, 256, 512, 1024)]
        skips = []
        for i in range(4):
            x = UnetConv3(f[i], self.use_bn, self.dtype, name=f"conv{i + 1}")(
                x, deterministic
            )
            skips.append(x)
            x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = UnetConv3(f[4], self.use_bn, self.dtype, name="center")(x, deterministic)
        x = nn.Dropout(0.3, deterministic=deterministic)(x)
        outs = []
        for i, k in enumerate((3, 2, 1, 0)):
            x = UnetUp3CT(f[k], self.use_bn, self.dtype, name=f"up_concat{k + 1}")(
                skips[k], x, deterministic
            )
            seg = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                          name=f"dv_head{k + 1}")(x)
            b = seg.shape[0]
            seg = jax.image.resize(seg, (b, *full, self.num_classes),
                                   method="nearest")
            outs.append(seg.astype(jnp.float32))
        return tuple(outs[::-1])  # finest first


class SEBlock3D(nn.Module):
    features: int
    ratio: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        s = nn.relu(nn.Conv(self.features // self.ratio, (1, 1, 1),
                            dtype=self.dtype)(s))
        s = nn.sigmoid(nn.Conv(self.features, (1, 1, 1), dtype=self.dtype)(s))
        return x * s


class VoxRex(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(h)
        return SEBlock3D(self.features, dtype=self.dtype)(h) + x


@register_model("voxresnet")
class VoxResNet(nn.Module):
    """SE-residual voxel net, 3 scales, upsample-sum fusion (VoxResNet.py)."""

    num_classes: int = 2
    in_chns: int = 1
    feature_chns: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        f = self.feature_chns
        full = x.shape[1:4]

        def conv_bn(h, features, strides):
            h = nn.Conv(features, (3, 3, 3), strides=strides, padding=1,
                        use_bias=False, dtype=self.dtype)(h)
            h = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype)(h)
            return nn.relu(h)

        h1 = conv_bn(x, f, (1, 1, 1))
        h1 = VoxRex(f, self.dtype)(h1, deterministic)
        h2 = conv_bn(h1, f, (2, 2, 2))
        h2 = VoxRex(f, self.dtype)(h2, deterministic)
        h3 = conv_bn(h2, f, (2, 2, 2))
        h3 = VoxRex(f, self.dtype)(h3, deterministic)

        def head(h, name):
            b = h.shape[0]
            h = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype, name=name)(h)
            return jax.image.resize(h, (b, *full, self.num_classes),
                                    method="trilinear")

        out = head(h1, "head1") + head(h2, "head2") + head(h3, "head3")
        return out.astype(jnp.float32)
