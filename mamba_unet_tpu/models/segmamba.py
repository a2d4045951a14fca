"""SegMamba — 3-D segmentation net whose encoder token-mixes with 1-D
bidirectional Mamba over flattened D*H*W tokens.

Rebuild of ``/root/reference/code/networks/segmamba.py`` (the only consumer of
``mamba_ssm.Mamba`` in code/): conv stem (7³/s2) + 3 conv downsamples, 4
stages of [LayerNorm -> Mamba(bimamba v2) over flattened tokens], per-stage
norm + channel-MLP taps, UNETR-style decoder (residual conv blocks +
transposed-conv upsampling). The MONAI UnetrBasicBlock/UnetrUpBlock deps are
re-implemented natively (instance-norm + leaky-relu residual conv blocks).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from mamba_unet_tpu.models.registry import register_model
from mamba_unet_tpu.nn.mamba1d import Mamba


class UnetrBasicBlock(nn.Module):
    """2 x [conv3 -> instance-norm -> leaky-relu] with residual (MONAI-style)."""

    features: int
    ndim: int = 3
    res_block: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = (3,) * self.ndim
        h = nn.Conv(self.features, k, padding=1, dtype=self.dtype)(x)
        h = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype)(h)
        h = nn.leaky_relu(h, 0.01)
        h = nn.Conv(self.features, k, padding=1, dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype)(h)
        if self.res_block:
            if x.shape[-1] != self.features:
                x = nn.Conv(self.features, (1,) * self.ndim, dtype=self.dtype)(x)
                x = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype)(x)
            h = h + x
        return nn.leaky_relu(h, 0.01)


class UnetrUpBlock(nn.Module):
    """Transposed-conv x2 up -> concat skip -> UnetrBasicBlock."""

    features: int
    ndim: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        s = (2,) * self.ndim
        x = nn.ConvTranspose(self.features, s, strides=s, dtype=self.dtype)(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return UnetrBasicBlock(self.features, self.ndim, dtype=self.dtype)(x)


class MambaLayer(nn.Module):
    """LN + bidirectional Mamba over flattened spatial tokens (segmamba.py:49-71)."""

    dim: int
    d_state: int = 16
    scan_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b = x.shape[0]
        spatial = x.shape[1:-1]
        c = x.shape[-1]
        tokens = x.reshape(b, -1, c)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(tokens)
        h = Mamba(
            d_model=self.dim, d_state=self.d_state, bimamba_type="v2",
            scan_impl=self.scan_impl, dtype=self.dtype, name="mamba",
        )(h, deterministic)
        return h.reshape(b, *spatial, c)


class MlpChannel(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        ndim = x.ndim - 2
        x = nn.Conv(self.hidden, (1,) * ndim, dtype=self.dtype)(x)
        x = nn.gelu(x)
        return nn.Conv(c, (1,) * ndim, dtype=self.dtype)(x)


@register_model("segmamba")
class SegMamba(nn.Module):
    num_classes: int = 2
    in_chns: int = 1
    depths: Sequence[int] = (2, 2, 2, 2)
    feat_size: Sequence[int] = (48, 96, 192, 384)
    hidden_size: int = 16
    d_state: int = 16
    ndim: int = 3
    scan_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, deterministic: bool = True):
        f = list(self.feat_size)
        nd = self.ndim

        # --- Mamba encoder (segmamba.py:87-140) ---
        outs = []
        x = x_in
        for i in range(4):
            if i == 0:
                x = nn.Conv(f[0], (7,) * nd, strides=(2,) * nd, padding=3,
                            dtype=self.dtype, name="stem")(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"down_norm{i}")(x)
                x = nn.Conv(f[i], (2,) * nd, strides=(2,) * nd,
                            dtype=self.dtype, name=f"down{i}")(x)
            for j in range(self.depths[i]):
                x = MambaLayer(
                    dim=f[i], d_state=self.d_state, scan_impl=self.scan_impl,
                    dtype=self.dtype, name=f"stage{i}_mamba{j}",
                )(x, deterministic)
            tap = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                               name=f"norm{i}")(x)
            tap = MlpChannel(4 * f[i], self.dtype, name=f"mlp{i}")(tap)
            outs.append(tap)

        # --- UNETR-style decoder (segmamba.py:171-289) ---
        kw = dict(ndim=nd, dtype=self.dtype)
        enc1 = UnetrBasicBlock(f[0], name="encoder1", **kw)(x_in)
        enc2 = UnetrBasicBlock(f[1], name="encoder2", **kw)(outs[0])
        enc3 = UnetrBasicBlock(f[2], name="encoder3", **kw)(outs[1])
        enc4 = UnetrBasicBlock(f[3], name="encoder4", **kw)(outs[2])
        hidden = UnetrBasicBlock(self.hidden_size, name="encoder5", **kw)(outs[3])
        d = UnetrUpBlock(f[3], name="decoder5", **kw)(hidden, enc4)
        d = UnetrUpBlock(f[2], name="decoder4", **kw)(d, enc3)
        d = UnetrUpBlock(f[1], name="decoder3", **kw)(d, enc2)
        d = UnetrUpBlock(f[0], name="decoder2", **kw)(d, enc1)
        d = UnetrBasicBlock(f[0], name="decoder1", **kw)(d)
        out = nn.Conv(self.num_classes, (1,) * nd, dtype=self.dtype,
                      name="out")(d)
        return out.astype(jnp.float32)
