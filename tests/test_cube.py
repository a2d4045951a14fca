"""Cube machinery tests: shuffle/recover round-trips, patch-list inverses."""

import jax
import jax.numpy as jnp
import numpy as np

from mamba_unet_tpu.objectives.cube import (
    OrganClassLogger,
    apply_cube_permutation,
    cube_shuffle_indices,
    get_patch_list,
    shuffle_within_sample,
    shuffled_location_labels,
    unmix_patches,
)


def test_cube_shuffle_roundtrip_2d(rng):
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 3)), jnp.float32)
    part, rec = cube_shuffle_indices(jax.random.key(0), 4, nb=4, rank=2)
    mixed = apply_cube_permutation(x, part, nb=4)
    assert mixed.shape == x.shape
    assert not np.allclose(np.asarray(mixed), np.asarray(x))
    back = apply_cube_permutation(mixed, rec, nb=4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_cube_shuffle_roundtrip_3d(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 2)), jnp.float32)
    part, rec = cube_shuffle_indices(jax.random.key(1), 2, nb=2, rank=3)
    mixed = apply_cube_permutation(x, part, nb=2)
    back = apply_cube_permutation(mixed, rec, nb=2)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_cube_shuffle_preserves_multiset(rng):
    """Shuffling only moves cubes between samples at the SAME position."""
    x = jnp.asarray(rng.normal(size=(3, 8, 8, 1)), jnp.float32)
    part, _ = cube_shuffle_indices(jax.random.key(2), 3, nb=2, rank=2)
    mixed = np.asarray(apply_cube_permutation(x, part, nb=2))
    xn = np.asarray(x)
    for i in range(2):
        for j in range(2):
            block = np.sort(
                xn[:, 4 * i : 4 * i + 4, 4 * j : 4 * j + 4].reshape(3, -1), axis=0
            )
            got = np.sort(
                mixed[:, 4 * i : 4 * i + 4, 4 * j : 4 * j + 4].reshape(3, -1), axis=0
            )
            np.testing.assert_array_equal(got, block)


def test_patch_list_roundtrip_2d(rng):
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 3)), jnp.float32)
    patches = get_patch_list(x, cube_size=4)
    assert patches.shape == (2, 9, 4, 4, 3)
    back = unmix_patches(patches, nb=3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_patch_list_order_x_fastest(rng):
    """Location index must be x-fastest (ref: loc = (x-1)+sx*(y-1))."""
    x = np.zeros((1, 4, 4, 1), np.float32)
    # mark each cube (2x2 grid, cs=2) with loc = xi + 2*yi computed on (W=x,H=y)
    for xi in range(2):
        for yi in range(2):
            x[0, 2 * xi : 2 * xi + 2, 2 * yi : 2 * yi + 2, 0] = xi + 2 * yi
    patches = np.asarray(get_patch_list(jnp.asarray(x), cube_size=2))
    for p in range(4):
        assert (patches[0, p] == p).all(), (p, patches[0, p])


def test_within_sample_shuffle(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 1)), jnp.float32)
    patches = get_patch_list(x, cube_size=4)
    perms = shuffled_location_labels(jax.random.key(3), 2, 4)
    shuffled = shuffle_within_sample(patches, perms)
    for b in range(2):
        for slot in range(4):
            np.testing.assert_array_equal(
                np.asarray(shuffled[b, slot]), np.asarray(patches[b, perms[b, slot]])
            )


def test_organ_class_logger():
    log = OrganClassLogger(num_classes=4)
    log.append_class_list(np.array([0, 0, 1, 3]))
    log.append_class_list(np.array([3, 3]))
    log.update_class_dist()
    np.testing.assert_array_equal(log.get_class_dist(), [2, 1, 0, 3])
    np.testing.assert_allclose(log.get_class_dist(normalize=True),
                               [2 / 6, 1 / 6, 0, 3 / 6])
