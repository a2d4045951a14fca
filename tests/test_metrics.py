"""Metric tests against analytic geometries (medpy is absent by design)."""

import numpy as np
import pytest

from mamba_unet_tpu.eval import (
    asd,
    assd,
    calculate_metric_percase,
    dice_binary,
    hd95,
    nsd,
    test_single_volume as eval_single_volume,
)


def square(h, w, r0, r1, c0, c1):
    m = np.zeros((h, w), bool)
    m[r0:r1, c0:c1] = True
    return m


def test_dice_identical_and_disjoint():
    a = square(16, 16, 2, 10, 2, 10)
    assert dice_binary(a, a) == 1.0
    b = square(16, 16, 12, 14, 12, 14)
    assert dice_binary(a, b) == 0.0
    # half overlap: |A|=|B|=8, |A∩B|=4 -> dice 0.5
    a1 = np.zeros((4, 4), bool); a1[0, 0:2] = True
    b1 = np.zeros((4, 4), bool); b1[0, 1:3] = True
    assert dice_binary(a1, b1) == pytest.approx(0.5)


def test_hd95_translated_square():
    """Two 8x8 squares offset by 3 rows: every surface point of one is within
    3 of the other; hd95 == 3 for the axis-aligned translation."""
    a = square(32, 32, 4, 12, 4, 12)
    b = square(32, 32, 7, 15, 4, 12)
    d = hd95(a, b)
    assert d == pytest.approx(3.0, abs=0.01)


def test_identical_masks_zero_distance():
    a = square(16, 16, 3, 12, 3, 12)
    assert hd95(a, a) == 0.0
    assert asd(a, a) == 0.0
    assert assd(a, a) == 0.0
    assert nsd(a, a, 1.0) == 1.0


def test_empty_guard():
    a = np.zeros((8, 8), bool)
    b = square(8, 8, 2, 5, 2, 5)
    assert calculate_metric_percase(a, b) == (0.0, 0.0)
    assert calculate_metric_percase(b, a) == (0.0, 0.0)


def test_voxelspacing_scales_distances():
    a = square(32, 32, 4, 12, 4, 12)
    b = square(32, 32, 7, 15, 4, 12)
    assert hd95(a, b, voxelspacing=(2.0, 1.0)) == pytest.approx(6.0, abs=0.05)


def test_nsd_tolerance():
    a = square(32, 32, 4, 12, 4, 12)
    b = square(32, 32, 6, 14, 4, 12)  # offset 2
    assert nsd(a, b, tolerance_mm=0.5) < 1.0
    assert nsd(a, b, tolerance_mm=2.0) == pytest.approx(1.0)


def test_test_single_volume_perfect_model():
    """A predict_fn that returns the label as logits must score dice 1."""
    rng = np.random.default_rng(0)
    label = np.zeros((3, 20, 24), np.int64)
    label[:, 5:15, 6:18] = 1
    image = label.astype(np.float32)

    def predict_fn(x):  # (B,ps,ps,1) -> one-hot-ish logits from the image
        lab = (x[..., 0] > 0.5).astype(np.int64)
        return np.eye(2, dtype=np.float32)[lab] * 10

    metrics = eval_single_volume(image, label, predict_fn, classes=2,
                                 patch_size=(16, 16))
    dice, h = metrics[0]
    # order-0 down-and-up resize loses boundary fidelity; dice stays high
    assert dice > 0.85
    assert h < 5


def test_test_single_volume_native_resolution():
    label = np.zeros((2, 16, 16), np.int64)
    label[:, 4:12, 4:12] = 1
    image = label.astype(np.float32)

    def predict_fn(x):
        lab = (x[..., 0] > 0.5).astype(np.int64)
        return np.eye(2, dtype=np.float32)[lab] * 10

    metrics = eval_single_volume(image, label, predict_fn, classes=2,
                                 patch_size=(16, 16))
    assert metrics[0][0] == pytest.approx(1.0)
    assert metrics[0][1] == 0.0
