"""Data layer tests: synthetic dataset round-trip, transforms, samplers, loader."""

import numpy as np
import pytest

from mamba_unet_tpu.data import (
    EpochShuffleSampler,
    Loader,
    RandomGenerator,
    SliceDataset,
    TwoStreamBatchSampler,
    VolumeDataset,
    WeakStrongAugment,
    make_synthetic_acdc,
    patients_to_slices,
)


@pytest.fixture(scope="module")
def acdc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("acdc")
    return make_synthetic_acdc(str(root), n_train_cases=3, slices_per_case=4,
                               n_val_cases=2, n_test_cases=1, size=48)


def test_slice_dataset(acdc_root):
    ds = SliceDataset(acdc_root, transform=RandomGenerator((32, 32), seed=1))
    assert len(ds) == 12
    s = ds[0]
    assert s["image"].shape == (32, 32, 1) and s["image"].dtype == np.float32
    assert s["label"].shape == (32, 32) and s["label"].dtype == np.int64
    assert set(np.unique(s["label"])) <= {0, 1, 2, 3}


def test_slice_dataset_num_truncation(acdc_root):
    ds = SliceDataset(acdc_root, num=5, transform=None)
    assert len(ds) == 5


def test_volume_dataset(acdc_root):
    val = VolumeDataset(acdc_root, "val")
    assert len(val) == 2
    v = val[0]
    assert v["image"].shape == (4, 48, 48)
    assert v["label"].shape == (4, 48, 48)
    test = VolumeDataset(acdc_root, "test")
    assert len(test) == 1


def test_weak_strong_augment(acdc_root):
    ds = SliceDataset(acdc_root, transform=WeakStrongAugment((32, 32), seed=2))
    s = ds[1]
    for k in ("image", "image_weak", "image_strong"):
        assert s[k].shape == (32, 32, 1)
    assert s["label_aug"].shape == (32, 32)
    assert not np.allclose(s["image_weak"], s["image_strong"])


def test_two_stream_sampler_composition():
    sampler = TwoStreamBatchSampler(
        primary_indices=range(10), secondary_indices=range(10, 40),
        batch_size=8, secondary_batch_size=4, seed=3,
    )
    batches = list(sampler)
    assert len(batches) == 10 // 4 == len(sampler)
    seen_primary = []
    for b in batches:
        assert len(b) == 8
        assert all(i < 10 for i in b[:4])       # labeled first
        assert all(i >= 10 for i in b[4:])      # unlabeled second
        seen_primary += b[:4]
    assert len(set(seen_primary)) == len(seen_primary)  # each labeled once


def test_loader_prefetch_and_shapes(acdc_root):
    ds = SliceDataset(acdc_root, transform=RandomGenerator((32, 32), seed=4))
    loader = Loader(ds, EpochShuffleSampler(len(ds), 4, seed=5), epochs=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["image"].shape == (4, 32, 32, 1)
    assert batches[0]["label"].shape == (4, 32, 32)


def test_loader_eternal_epochs(acdc_root):
    ds = SliceDataset(acdc_root, transform=RandomGenerator((32, 32), seed=6))
    loader = Loader(ds, EpochShuffleSampler(len(ds), 4, seed=7), epochs=None)
    it = iter(loader)
    for _ in range(8):  # more than one epoch's worth (3/epoch)
        batch = next(it)
    assert batch["image"].shape[0] == 4


def test_patients_to_slices_table():
    assert patients_to_slices("ACDC", 3) == 68
    assert patients_to_slices("ACDC", 7) == 136
    assert patients_to_slices("ACDC", 140) == 1312
    with pytest.raises(KeyError):
        patients_to_slices("BTCV", 3)


def test_random_generator_augmentation_variety(acdc_root):
    """Two passes over the same item with the same transform object must
    differ eventually (the rng advances)."""
    ds = SliceDataset(acdc_root, transform=RandomGenerator((32, 32), seed=8))
    imgs = [ds[0]["image"] for _ in range(6)]
    assert any(not np.allclose(imgs[0], im) for im in imgs[1:])


def test_loader_compacts_integer_batches(tmp_path):
    """Class-id label arrays collate to uint8 (8x transfer cut vs int64);
    wide values stay wide enough."""
    import numpy as np

    from mamba_unet_tpu.data.loader import _collate, _compact_int

    samples = [
        {"image": np.zeros((8, 8), np.float32),
         "label": np.full((8, 8), 3, np.int64),
         "idx": i}
        for i in range(4)
    ]
    out = _collate(samples)
    assert out["image"].dtype == np.float32
    assert out["label"].dtype == np.uint8
    assert out["idx"].dtype in (np.uint8,)  # small ints compact too
    assert int(out["label"].max()) == 3

    big = np.array([0, 70000], np.int64)
    assert _compact_int(big).dtype == np.int32
    neg = np.array([-5, 3], np.int64)
    assert _compact_int(neg).dtype == np.int32
    huge = np.array([0, 2**40], np.int64)
    assert _compact_int(huge).dtype == np.int64
