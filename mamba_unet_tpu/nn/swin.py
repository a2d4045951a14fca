"""Swin transformer blocks (window attention + shifted windows), channels-last.

TPU-native rebuild of the blocks in
``/root/reference/code/networks/swin_transformer_unet_skip_expand_decoder_sys.py``:
``WindowAttention`` (:63-167, relative position bias), ``SwinTransformerBlock``
(:169-307, cyclic shift + attn mask), ``BasicLayer`` (:413-504, alternating
shift 0 / ws//2). Window partitioning is pure reshape/transpose; the shifted-
window attention mask is built statically in numpy at trace time (shapes are
static under jit) and baked into the compiled program.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mamba_unet_tpu.nn.layers import DropPath, trunc_normal_init


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nWindows, ws*ws, C)."""
    bsz, H, W, c = x.shape
    x = x.reshape(bsz, H // ws, ws, W // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(wins: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """Inverse of :func:`window_partition`."""
    c = wins.shape[-1]
    bsz = wins.shape[0] // (H // ws * (W // ws))
    x = wins.reshape(bsz, H // ws, W // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, H, W, c)


def _relative_position_index(ws: int) -> np.ndarray:
    """Static (ws², ws²) index into the (2ws-1)² bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _shift_attn_mask(H: int, W: int, ws: int, shift: int) -> Optional[np.ndarray]:
    """Static (nW, ws², ws²) 0/-100 mask for shifted windows (ref :255-275)."""
    if shift == 0:
        return None
    img_mask = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, h, w, :] = cnt
            cnt += 1
    m = img_mask.reshape(1, H // ws, ws, W // ws, ws, 1)
    m = m.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        """x: (nW*B, N, C); mask: (nW, N, N) additive or None."""
        nb, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        scale = hd**-0.5

        qkv = nn.Dense(
            3 * c, use_bias=self.qkv_bias, kernel_init=trunc_normal_init(),
            dtype=self.dtype, name="qkv",
        )(x)
        qkv = qkv.reshape(nb, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]

        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        )

        table = self.param(
            "relative_position_bias_table",
            trunc_normal_init(),
            ((2 * self.window_size - 1) ** 2, nh),
        )
        idx = _relative_position_index(self.window_size)
        bias = table[idx.reshape(-1)].reshape(n, n, nh).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(nb // nw, nw, nh, n, n) + jnp.asarray(mask)[
                None, :, None
            ].astype(attn.dtype)
            attn = attn.reshape(nb, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)

        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3)
        out = out.reshape(nb, n, c)
        out = nn.Dense(
            c, kernel_init=trunc_normal_init(), dtype=self.dtype, name="proj"
        )(out)
        return nn.Dropout(self.proj_drop, deterministic=deterministic)(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        bsz, H, W, c = x.shape
        ws, shift = self.window_size, self.shift_size
        if min(H, W) <= ws:  # window covers the map: no shift (ref :203-206)
            ws, shift = min(H, W), 0

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
        wins = window_partition(x, ws)
        mask = _shift_attn_mask(H, W, ws, shift)
        wins = WindowAttention(
            dim=self.dim, window_size=ws, num_heads=self.num_heads,
            attn_drop=self.attn_drop, proj_drop=self.drop, dtype=self.dtype,
            name="attn",
        )(wins, mask, deterministic)
        x = window_reverse(wins, ws, H, W)
        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        x = shortcut + DropPath(self.drop_path)(x, deterministic)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(
            int(c * self.mlp_ratio), kernel_init=trunc_normal_init(),
            dtype=self.dtype, name="mlp_fc1",
        )(y)
        y = nn.gelu(y)
        y = nn.Dropout(self.drop, deterministic=deterministic)(y)
        y = nn.Dense(
            c, kernel_init=trunc_normal_init(), dtype=self.dtype, name="mlp_fc2"
        )(y)
        y = nn.Dropout(self.drop, deterministic=deterministic)(y)
        return x + DropPath(self.drop_path)(y, deterministic)


class SwinStage(nn.Module):
    """depth x SwinBlock with alternating shift 0 / ws//2 (BasicLayer)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            x = SwinBlock(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=dp,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, deterministic)
        return x
