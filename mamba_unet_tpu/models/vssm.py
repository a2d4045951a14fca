"""VSSM — the UNet-shaped pure visual-Mamba segmentation network (Mamba-UNet).

TPU-native rebuild of ``/root/reference/code/networks/mamba_sys.py:694-829``
(VSSM) and its ``MambaUnet`` wrapper
(``/root/reference/code/networks/vision_mamba.py:23-83``).

Topology (depths [2,2,2,2], dims [96,192,384,768] for the ACDC config):

  patch_embed (x4 down)
  encoder: 4 stages, skip captured BEFORE each stage, PatchMerging between
  norm
  decoder: PatchExpand, then 3 stages of [concat skip -> Linear 2C->C -> VSS
           stage -> PatchExpand (except last)]
  norm_up -> FinalPatchExpand (x4 up) -> 1x1 conv head

All tensors channels-last; logits returned as (B, H, W, num_classes).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mamba_unet_tpu.nn.layers import trunc_normal_init
from mamba_unet_tpu.nn.patch_ops import (
    FinalPatchExpand2D,
    PatchEmbed2D,
    PatchExpand2D,
    PatchMerging2D,
)
from mamba_unet_tpu.nn.vss import VSSLayer


class VSSM(nn.Module):
    num_classes: int = 4
    patch_size: int = 4
    depths: Sequence[int] = (2, 2, 2, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: int = 16
    drop_path_rate: float = 0.2
    attn_drop_rate: float = 0.0
    scan_impl: str = "auto"
    layout: str = "bhwc"  # "hwbc": run all stages time-major batch-minor
    use_remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        n_layers = len(self.depths)
        hwbc = self.layout == "hwbc"
        # Stochastic-depth decay: linear 0 -> drop_path_rate over encoder blocks;
        # decoder stages reuse the *encoder* schedule of the mirrored stage
        # (mamba_sys.py:713, :747).
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))
        stage_dpr = []
        off = 0
        for d in self.depths:
            stage_dpr.append(tuple(dpr[off : off + d]))
            off += d

        common = dict(
            d_state=self.d_state,
            attn_drop=self.attn_drop_rate,
            scan_impl=self.scan_impl,
            layout=self.layout,
            use_remat=self.use_remat,
            dtype=self.dtype,
        )

        x = PatchEmbed2D(
            patch_size=self.patch_size,
            embed_dim=self.dims[0],
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        if hwbc:
            # ONE layout change for the whole network (cheapest point: 1/16
            # of input resolution); every stage below runs (H, W, B, C) so
            # the batch-folded scan's stream setup is a free reshape.
            x = x.transpose(1, 2, 0, 3)

        # --- encoder: skip captured pre-stage (mamba_sys.py:786-794) ---
        skips = []
        for i in range(n_layers):
            skips.append(x)
            x = VSSLayer(
                dim=self.dims[i],
                depth=self.depths[i],
                drop_path=stage_dpr[i],
                name=f"layers_{i}",
                **common,
            )(x, deterministic)
            if i < n_layers - 1:
                x = PatchMerging2D(layout=self.layout, dtype=self.dtype, name=f"downsample_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)

        # --- decoder (mamba_sys.py:804-815) ---
        for i in range(n_layers):
            mirror = n_layers - 1 - i
            if i == 0:
                x = PatchExpand2D(layout=self.layout, dtype=self.dtype, name="first_expand")(x)
            else:
                x = jnp.concatenate([x, skips[mirror]], axis=-1)
                x = nn.Dense(
                    self.dims[mirror],
                    kernel_init=trunc_normal_init(),
                    dtype=self.dtype,
                    name=f"concat_back_dim_{i}",
                )(x)
                x = VSSLayer(
                    dim=self.dims[mirror],
                    depth=self.depths[mirror],
                    drop_path=stage_dpr[mirror],
                    name=f"layers_up_{i}",
                    **common,
                )(x, deterministic)
                if i < n_layers - 1:
                    x = PatchExpand2D(layout=self.layout, dtype=self.dtype, name=f"upsample_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_up")(x)

        # --- head (mamba_sys.py:816-824) ---
        x = FinalPatchExpand2D(scale=self.patch_size, layout=self.layout, dtype=self.dtype, name="up")(x)
        # A 1x1 stride-1 conv is a pointwise Dense on the last axis, so the
        # same module (and checkpoint key) works in either layout.
        x = nn.Conv(
            self.num_classes,
            kernel_size=(1, 1),
            use_bias=False,
            dtype=self.dtype,
            name="output",
        )(x)
        if hwbc:
            x = x.transpose(2, 0, 1, 3)  # logits back to (B, H, W, ncls)
        return x.astype(jnp.float32)


class MambaUnet(nn.Module):
    """Grey-input wrapper: repeat 1 channel to 3 then run VSSM
    (vision_mamba.py:43-44 — the pretrained patch embed expects RGB)."""

    num_classes: int = 4
    img_size: int = 224
    depths: Sequence[int] = (2, 2, 2, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.2
    scan_impl: str = "auto"
    layout: str = "bhwc"
    use_remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        return VSSM(
            num_classes=self.num_classes,
            depths=self.depths,
            dims=self.dims,
            drop_path_rate=self.drop_path_rate,
            scan_impl=self.scan_impl,
            layout=self.layout,
            use_remat=self.use_remat,
            dtype=self.dtype,
            name="vssm",
        )(x, deterministic)
