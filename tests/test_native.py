"""Native C++ data plane: differential tests vs scipy/numpy ground truth."""

import numpy as np
import pytest
from scipy.ndimage import zoom as nd_zoom

from mamba_unet_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


@pytest.mark.parametrize("shape,out", [((10, 12), (7, 9)), ((7, 5), (12, 16)),
                                       ((256, 256), (224, 224)),
                                       ((224, 224), (256, 256)),
                                       ((5, 5), (5, 5)), ((48, 31), (32, 50))])
def test_nn_zoom_matches_scipy(rng, shape, out):
    img = rng.normal(size=shape).astype(np.float32)
    want = nd_zoom(img, (out[0] / shape[0], out[1] / shape[1]), order=0)
    got = native.nn_zoom(img, out)
    np.testing.assert_array_equal(got, want)

    lab = rng.integers(0, 4, size=shape).astype(np.int64)
    want_l = nd_zoom(lab, (out[0] / shape[0], out[1] / shape[1]), order=0)
    np.testing.assert_array_equal(native.nn_zoom(lab, out), want_l)


@pytest.mark.parametrize("k", [0, 1, 2, 3])
@pytest.mark.parametrize("axis", [0, 1])
def test_rot90_flip_matches_numpy(rng, k, axis):
    img = rng.normal(size=(6, 9)).astype(np.float32)
    want = np.flip(np.rot90(img, k), axis=axis)
    got = native.rot90_flip(img, k, axis)
    np.testing.assert_array_equal(got, want)


def test_native_random_generator_matches_python(rng):
    """With identical seeds, the native transform must produce exactly what
    the scipy RandomGenerator produces (same rng consumption order)."""
    from mamba_unet_tpu.data.augment import RandomGenerator

    for seed in range(6):
        sample = {"image": rng.normal(size=(48, 40)).astype(np.float32),
                  "label": rng.integers(0, 4, size=(48, 40))}
        a = RandomGenerator((32, 32), seed=seed)(dict(sample))
        b = native.NativeRandomGenerator((32, 32), seed=seed)(dict(sample))
        np.testing.assert_array_equal(a["image"], b["image"], err_msg=f"seed {seed}")
        np.testing.assert_array_equal(a["label"], b["label"], err_msg=f"seed {seed}")
