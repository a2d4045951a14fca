"""SwinUNETR — 3-D shifted-window Swin encoder + UNETR-style decoder.

Native rebuild of the MONAI ``SwinUNETR`` pulled in by the reference's 3-D
factory (``/root/reference/code/networks/net_factory_3d.py:7,37-38``:
img 64³, feature_size 48): patch-2 conv embed, 4 Swin stages (depths
[2,2,2,2], heads [3,6,12,24], window 7 clipped to the map) with 3-D cyclic
shifts + static attention masks, patch-merging downsamples, and the
UNETR residual-conv decoder with per-stage taps.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mamba_unet_tpu.models.registry import register_model
from mamba_unet_tpu.models.segmamba import UnetrBasicBlock, UnetrUpBlock
from mamba_unet_tpu.nn.layers import DropPath, trunc_normal_init


def window_partition_3d(x, ws):
    b, D, H, W, c = x.shape
    x = x.reshape(b, D // ws, ws, H // ws, ws, W // ws, ws, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, ws**3, c)


def window_reverse_3d(wins, ws, D, H, W):
    c = wins.shape[-1]
    b = wins.shape[0] // ((D // ws) * (H // ws) * (W // ws))
    x = wins.reshape(b, D // ws, H // ws, W // ws, ws, ws, ws, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, D, H, W, c)


def _rel_index_3d(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(*([np.arange(ws)] * 3), indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel += ws - 1
    return (rel[..., 0] * (2 * ws - 1) ** 2 + rel[..., 1] * (2 * ws - 1)
            + rel[..., 2])


def _shift_mask_3d(D, H, W, ws, shift):
    if shift == 0:
        return None
    m = np.zeros((D, H, W), np.float32)
    cnt = 0
    sl = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    for a in sl:
        for b in sl:
            for c in sl:
                m[a, b, c] = cnt
                cnt += 1
    m = m.reshape(1, D, H, W, 1)
    wins = window_partition_3d(jnp.asarray(m), ws)[..., 0]
    wins = np.asarray(wins)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock3D(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, D, H, W, c = x.shape
        ws, shift = self.window_size, self.shift_size
        if min(D, H, W) <= ws:
            ws, shift = min(D, H, W), 0
        nh = self.num_heads
        hd = c // nh

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if shift > 0:
            x = jnp.roll(x, (-shift,) * 3, axis=(1, 2, 3))
        wins = window_partition_3d(x, ws)
        n = wins.shape[1]
        qkv = nn.Dense(3 * c, kernel_init=trunc_normal_init(),
                       dtype=self.dtype, name="qkv")(wins)
        qkv = qkv.reshape(-1, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * hd**-0.5, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        table = self.param("rel_bias", trunc_normal_init(),
                           ((2 * ws - 1) ** 3, nh))
        idx = _rel_index_3d(ws)
        attn = attn + table[idx.reshape(-1)].reshape(n, n, nh).transpose(
            2, 0, 1)[None].astype(attn.dtype)
        mask = _shift_mask_3d(D, H, W, ws, shift)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(-1, nw, nh, n, n) + jnp.asarray(mask)[
                None, :, None].astype(attn.dtype)
            attn = attn.reshape(-1, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3)
        out = out.reshape(-1, n, c)
        out = nn.Dense(c, kernel_init=trunc_normal_init(), dtype=self.dtype,
                       name="proj")(out)
        x = window_reverse_3d(out, ws, D, H, W)
        if shift > 0:
            x = jnp.roll(x, (shift,) * 3, axis=(1, 2, 3))
        x = shortcut + DropPath(self.drop_path)(x, deterministic)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), kernel_init=trunc_normal_init(),
                     dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(c, kernel_init=trunc_normal_init(), dtype=self.dtype,
                     name="fc2")(y)
        return x + DropPath(self.drop_path)(y, deterministic)


class PatchMerging3D(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, D, H, W, c = x.shape
        parts = [x[:, i::2, j::2, k::2] for i in range(2) for j in range(2)
                 for k in range(2)]
        x = jnp.concatenate(parts, axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, kernel_init=trunc_normal_init(),
                        dtype=self.dtype, name="reduction")(x)


@register_model("SwinUNETR")
class SwinUNETR(nn.Module):
    num_classes: int = 2
    in_chns: int = 1
    feature_size: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_in, deterministic: bool = True):
        fs = self.feature_size
        x = nn.Conv(fs, (2, 2, 2), strides=(2, 2, 2), dtype=self.dtype,
                    name="patch_embed")(x_in)
        taps = []
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            taps.append(x)
            for j in range(depth):
                x = SwinBlock3D(
                    dim=x.shape[-1], num_heads=heads,
                    window_size=self.window_size,
                    shift_size=0 if j % 2 == 0 else self.window_size // 2,
                    dtype=self.dtype, name=f"stage{i}_block{j}",
                )(x, deterministic)
            x = PatchMerging3D(dtype=self.dtype, name=f"merge{i}")(x)
        bottleneck = x  # /32

        kw = dict(ndim=3, dtype=self.dtype)
        enc0 = UnetrBasicBlock(fs, name="encoder0", **kw)(x_in)
        enc1 = UnetrBasicBlock(fs, name="encoder1", **kw)(taps[0])
        enc2 = UnetrBasicBlock(2 * fs, name="encoder2", **kw)(taps[1])
        enc3 = UnetrBasicBlock(4 * fs, name="encoder3", **kw)(taps[2])
        enc4 = UnetrBasicBlock(8 * fs, name="encoder4", **kw)(taps[3])
        d = UnetrUpBlock(8 * fs, name="decoder4", **kw)(bottleneck, enc4)
        d = UnetrUpBlock(4 * fs, name="decoder3", **kw)(d, enc3)
        d = UnetrUpBlock(2 * fs, name="decoder2", **kw)(d, enc2)
        d = UnetrUpBlock(fs, name="decoder1", **kw)(d, enc1)
        d = UnetrUpBlock(fs, name="decoder0", **kw)(d, enc0)
        out = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                      name="out")(d)
        return out.astype(jnp.float32)
