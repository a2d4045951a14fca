"""MagicNet cube machinery: cross-batch cube shuffle/recovery, per-image cube
lists, location labels, and the organ-class-distribution logger.

Refs: ``/root/reference/code/utils/cube_utils.py`` (get_part_and_rec_ind
:66-104 — per-cube-position random batch permutation + its inverse, applied
by gather) and ``code/utils/cube_losses.py`` (get_patch_list :66-116,
unmix_tensor :14-63, cube_location_loss :119-158, get_mix_pl :161-205).

TPU-native formulation: the reference's repeat_interleave + gather over a
(B, C, W, H, D) index tensor becomes a space-to-cube reshape + one
``take_along_axis`` over the batch axis — the permutation tensor stays tiny
(B, n1, n2[, n3]). Channels-last throughout; rank-generic (2-D and 3-D).
Cube grids must tile the volume exactly (256/32, 96/32 — as in the configs).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _to_cubes(x: jnp.ndarray, nb: int):
    """(B, *spatial, C) -> (B, n1..nk, cs1..csk, C) with cube axes leading."""
    spatial = x.shape[1:-1]
    k = len(spatial)
    assert all(s % nb == 0 for s in spatial), (x.shape, nb)
    cs = [s // nb for s in spatial]
    shape = [x.shape[0]]
    for s, c in zip(spatial, cs):
        shape += [nb, c]
    x = x.reshape(*shape, x.shape[-1])
    # (B, n1, c1, n2, c2, ..., C) -> (B, n1..nk, c1..ck, C)
    perm = [0] + [1 + 2 * i for i in range(k)] + [2 + 2 * i for i in range(k)]
    perm += [1 + 2 * k]
    return x.transpose(*perm), cs


def _from_cubes(x: jnp.ndarray, nb: int, spatial_rank: int):
    """Inverse of :func:`_to_cubes`."""
    k = spatial_rank
    bsz = x.shape[0]
    c = x.shape[-1]
    inv = [0]
    for i in range(k):
        inv += [1 + i, 1 + k + i]
    inv += [1 + 2 * k]
    x = x.transpose(*inv)
    spatial = [x.shape[1 + 2 * i] * x.shape[2 + 2 * i] for i in range(k)]
    return x.reshape(bsz, *spatial, c)


def cube_shuffle_indices(key: jax.Array, batch: int, nb: int, rank: int):
    """Per-cube-position random batch permutation and its inverse
    (cube_utils.py:70-85). Shapes (B, nb^rank...)."""
    u = jax.random.uniform(key, (batch,) + (nb,) * rank)
    part = jnp.argsort(u, axis=0)
    rec = jnp.argsort(part, axis=0)
    return part, rec


def apply_cube_permutation(x: jnp.ndarray, perm: jnp.ndarray, nb: int):
    """Shuffle cubes across the batch: out[b, cube p] = x[perm[b, p], cube p]."""
    rank = x.ndim - 2
    cubes, cs = _to_cubes(x, nb)  # (B, n1..nk, cs.., C)
    idx = perm.reshape(perm.shape + (1,) * (rank + 1))
    shuffled = jnp.take_along_axis(cubes, idx, axis=0)
    return _from_cubes(shuffled, nb, rank)


def get_patch_list(x: jnp.ndarray, cube_size: int) -> jnp.ndarray:
    """(B, *spatial, C) -> (B, P, cs.., C), P = prod(spatial // cube_size),
    cube index ordered x-fastest like the reference loc ids
    (cube_losses.py:92: loc = (x-1) + sx*(y-1) + sx*sy*(z-1))."""
    rank = x.ndim - 2
    nb = x.shape[1] // cube_size
    cubes, _ = _to_cubes(x, nb)  # (B, n1..nk, cs.., C)
    bsz = cubes.shape[0]
    # reference flattens with the FIRST spatial axis fastest
    axes = [0] + list(range(rank, 0, -1)) + list(range(rank + 1, cubes.ndim))
    cubes = cubes.transpose(*axes)
    return cubes.reshape(bsz, nb**rank, *cubes.shape[rank + 1 :])


def unmix_patches(patches: jnp.ndarray, nb: int) -> jnp.ndarray:
    """Inverse of :func:`get_patch_list` (cube_losses.py unmix_tensor)."""
    bsz, P = patches.shape[:2]
    rank = patches.ndim - 3
    cubes = patches.reshape(bsz, *(nb,) * rank, *patches.shape[2:])
    inv = [0] + list(range(rank, 0, -1)) + list(range(rank + 1, cubes.ndim))
    cubes = cubes.transpose(*inv)
    return _from_cubes(cubes, nb, rank)


def shuffled_location_labels(key: jax.Array, batch: int, n_cubes: int):
    """A per-sample random permutation of cube slots and its location labels:
    sample i's cube at slot j came from location perm[i, j] — the NLL target
    of the cube-location task (cube_losses.py:119-158)."""
    perms = jax.vmap(lambda k: jax.random.permutation(k, n_cubes))(
        jax.random.split(key, batch)
    )
    return perms


def shuffle_within_sample(patches: jnp.ndarray, perms: jnp.ndarray):
    """Reorder each sample's cube list by ``perms`` (B, P)."""
    idx = perms.reshape(perms.shape + (1,) * (patches.ndim - 2))
    return jnp.take_along_axis(patches, idx, axis=1)


class OrganClassLogger:
    """EMA-free class-distribution store (cube_utils.py:146-173): collect
    pseudo-label class ids, periodically recompute the histogram."""

    def __init__(self, num_classes: int = 14):
        self.num_classes = num_classes
        self.class_dist = np.zeros(num_classes, np.float64)
        self._store: List[np.ndarray] = []

    def append_class_list(self, labels) -> None:
        self._store.append(np.asarray(labels).reshape(-1))

    def update_class_dist(self) -> None:
        if not self._store:
            return
        allv = np.concatenate(self._store)
        self.class_dist = np.bincount(
            allv.astype(np.int64), minlength=self.num_classes
        ).astype(np.float64)
        self._store = []

    def get_class_dist(self, normalize: bool = False) -> np.ndarray:
        d = self.class_dist.copy()
        if normalize and d.sum() > 0:
            d = d / d.sum()
        return d
