"""Shuffle/mask recovery losses for the mask-pretraining pipeline.

Ref: ``/root/reference/code/utils/masked_loss.py:5-33``:
  * shuffled recovery: MSE between the clean global embedding and the
    embedding of the cube-shuffled image given its shuffle indices,
  * mask recovery: MSE between the clean embedding and the embedding of the
    image with ~25% of cubes blanked, given the visibility mask.

Functional: the model's ``forward_mix_pos_mask`` is applied by the caller;
these helpers build the perturbed inputs and auxiliary id/mask tensors.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mamba_unet_tpu.objectives.cube import get_patch_list, shuffle_within_sample, unmix_patches


def make_shuffled_input(key: jax.Array, image: jnp.ndarray, cube_size: int):
    """Returns (shuffled image, shuffle indices (B, P))."""
    b = image.shape[0]
    nb = image.shape[1] // cube_size
    P = nb * nb
    perms = jax.vmap(lambda k: jax.random.permutation(k, P))(
        jax.random.split(key, b)
    )
    patches = get_patch_list(image, cube_size)
    shuffled = shuffle_within_sample(patches, perms)
    return unmix_patches(shuffled, nb), perms


def make_masked_input(key: jax.Array, image: jnp.ndarray, cube_size: int,
                      masked_rate: float = 0.25, fill: float = 1e-6):
    """Returns (masked image, visibility mask (B, P): 0 = blanked)."""
    b = image.shape[0]
    nb = image.shape[1] // cube_size
    P = nb * nb
    u = jax.random.uniform(key, (b, P))
    vis = (u > masked_rate).astype(jnp.float32)  # 1 = keep
    patches = get_patch_list(image, cube_size)
    keep = vis.reshape(b, P, *([1] * (patches.ndim - 2)))
    patches = patches * keep + fill * (1.0 - keep)
    return unmix_patches(patches, nb), vis


def recovery_mse(clean_embed: jnp.ndarray, perturbed_embed: jnp.ndarray):
    return jnp.mean((clean_embed - perturbed_embed) ** 2)
