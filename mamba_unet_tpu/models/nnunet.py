"""nnU-Net's Generic_UNet (the reference's exact anisotropic ACDC config).

Rebuild of ``/root/reference/code/networks/nnunet.py`` (Generic_UNet :186 +
``initialize_network`` :500-529): base 16 features (x2 per stage, capped at
320), 6 pooling stages with anisotropic strides [[1,2,2],[1,2,2],[2,2,2],
[2,2,2],[1,2,2],[1,2,2]] and kernels mixing [1,3,3]/[3,3,3], 2 convs per
stage of [conv -> InstanceNorm -> LeakyReLU(0.01)], convolutional pooling
(stride on the stage's first conv) and transposed-conv upsampling, identity
final nonlinearity, no deep supervision.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mamba_unet_tpu.models.registry import register_model

POOL_KERNELS = ((1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2), (1, 2, 2), (1, 2, 2))
CONV_KERNELS = ((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3),
                (3, 3, 3), (3, 3, 3))
MAX_FEATURES = 320


class ConvNormLrelu(nn.Module):
    features: int
    kernel: Tuple[int, ...]
    stride: Tuple[int, ...] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = tuple((k // 2, k // 2) for k in self.kernel)
        x = nn.Conv(self.features, self.kernel,
                    strides=self.stride or (1,) * len(self.kernel),
                    padding=pad, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                         dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.01)


@register_model("nnUNet")
class GenericUNet(nn.Module):
    num_classes: int = 4
    in_chns: int = 1
    base_features: int = 16
    pool_kernels: Sequence[Tuple[int, ...]] = POOL_KERNELS
    conv_kernels: Sequence[Tuple[int, ...]] = CONV_KERNELS
    conv_per_stage: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n_pool = len(self.pool_kernels)
        feats = [min(self.base_features * 2**i, MAX_FEATURES)
                 for i in range(n_pool + 1)]

        skips = []
        for stage in range(n_pool):
            k = self.conv_kernels[stage]
            stride = self.pool_kernels[stage - 1] if stage > 0 else None
            x = ConvNormLrelu(feats[stage], k, stride, self.dtype,
                              name=f"enc{stage}_conv0")(x)
            for c in range(1, self.conv_per_stage):
                x = ConvNormLrelu(feats[stage], k, None, self.dtype,
                                  name=f"enc{stage}_conv{c}")(x)
            skips.append(x)
        # bottleneck
        k = self.conv_kernels[n_pool]
        x = ConvNormLrelu(feats[n_pool], k, self.pool_kernels[-1], self.dtype,
                          name="bottleneck_conv0")(x)
        for c in range(1, self.conv_per_stage):
            x = ConvNormLrelu(feats[n_pool], k, None, self.dtype,
                              name=f"bottleneck_conv{c}")(x)

        for stage in reversed(range(n_pool)):
            s = self.pool_kernels[stage]
            x = nn.ConvTranspose(feats[stage], s, strides=s, use_bias=False,
                                 dtype=self.dtype, name=f"up{stage}")(x)
            x = jnp.concatenate([x, skips[stage]], axis=-1)
            k = self.conv_kernels[stage]
            for c in range(self.conv_per_stage):
                x = ConvNormLrelu(feats[stage], k, None, self.dtype,
                                  name=f"dec{stage}_conv{c}")(x)
        out = nn.Conv(self.num_classes, (1,) * (x.ndim - 2), use_bias=False,
                      dtype=self.dtype, name="seg_head")(x)
        return out.astype(jnp.float32)
