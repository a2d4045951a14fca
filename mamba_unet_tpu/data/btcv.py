"""BTCV-style 3-D volume dataset + 3-D transforms + synthetic generator.

The reference's 3-D MagicNet scripts reference ``BTCV``/``MACT`` dataset
classes that DO NOT EXIST in the tree (SURVEY §2.8 latent defect — the
scripts crash upstream). This is the reconstruction from their usage
(``train_Semi_MagicNet_3D_for_BTCV.py:127``: dict samples with 3-D
image/label, composed with RandomCrop((96,96,96)) + rot/flip + ToTensor):

  * ``VolumeTrainDataset``: h5 volumes listed in a .list file,
  * ``RandomCrop3D``: pad-if-needed + random crop (dataset.py:150-189),
  * ``RandomRotFlip3D``: axis-aligned rot90/flip,
  * ``make_synthetic_btcv``: organ-blob phantoms in the same layout.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import h5py
import numpy as np


class RandomCrop3D:
    def __init__(self, output_size: Sequence[int], seed: int = 0):
        self.output_size = tuple(output_size)
        self.rng = np.random.default_rng(seed)

    def __call__(self, sample):
        image, label = sample["image"], sample["label"]
        pads = [max(0, o - s) for o, s in zip(self.output_size, image.shape)]
        if any(pads):
            pw = [(p // 2 + 1, p - p // 2 + 1) if p else (0, 0) for p in pads]
            image = np.pad(image, pw, mode="constant")
            label = np.pad(label, pw, mode="constant")
        starts = [
            int(self.rng.integers(0, s - o + 1))
            for s, o in zip(image.shape, self.output_size)
        ]
        sl = tuple(np.s_[st : st + o] for st, o in zip(starts, self.output_size))
        return {"image": image[sl], "label": label[sl]}


class RandomRotFlip3D:
    def __init__(self, seed: int = 0):
        self.rng = np.random.default_rng(seed)

    def __call__(self, sample):
        image, label = sample["image"], sample["label"]
        k = int(self.rng.integers(0, 4))
        image = np.rot90(image, k, axes=(1, 2))
        label = np.rot90(label, k, axes=(1, 2))
        axis = int(self.rng.integers(0, 3))
        image = np.flip(image, axis=axis).copy()
        label = np.flip(label, axis=axis).copy()
        return {"image": image, "label": label}


class Compose3D:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, sample):
        for t in self.transforms:
            sample = t(sample)
        return sample


class VolumeTrainDataset:
    """3-D training volumes: {root}/{list_name} lines -> {root}/data/{id}.h5."""

    def __init__(self, base_dir: str, list_name: str = "train.list",
                 transform=None, num: Optional[int] = None):
        self.base_dir = base_dir
        with open(os.path.join(base_dir, list_name)) as f:
            self.ids = [l.strip() for l in f if l.strip()]
        if num is not None:
            self.ids = self.ids[:num]
        self.transform = transform

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, idx):
        with h5py.File(os.path.join(self.base_dir, "data",
                                    f"{self.ids[idx]}.h5")) as f:
            sample = {"image": np.asarray(f["image"], np.float32),
                      "label": np.asarray(f["label"], np.int64)}
        if self.transform is not None:
            sample = self.transform(sample)
        return {
            "image": sample["image"].astype(np.float32)[..., None],
            "label": sample["label"].astype(np.int64),
            "idx": idx,
        }


def make_synthetic_btcv(root: str, n_train: int = 4, n_val: int = 1,
                        size: int = 64, num_classes: int = 14,
                        seed: int = 0) -> str:
    """Organ-blob phantoms: random ellipsoids per class on noise background."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)

    def phantom():
        img = 0.1 * rng.standard_normal((size, size, size)).astype(np.float32)
        lab = np.zeros((size, size, size), np.uint8)
        zz, yy, xx = np.mgrid[0:size, 0:size, 0:size].astype(np.float32)
        for c in range(1, num_classes):
            cz, cy, cx = rng.uniform(0.2, 0.8, 3) * size
            rz, ry, rx = rng.uniform(0.04, 0.12, 3) * size
            mask = (((zz - cz) / rz) ** 2 + ((yy - cy) / ry) ** 2
                    + ((xx - cx) / rx) ** 2) < 1
            lab[mask] = c
            img[mask] += 0.2 + 0.05 * c
        return np.clip(img, 0, 2), lab

    def write(ids, listname):
        with open(os.path.join(root, listname), "w") as f:
            f.write("\n".join(ids) + "\n")

    train_ids, val_ids = [], []
    for i in range(n_train):
        img, lab = phantom()
        cid = f"btcv_train_{i:03d}"
        with h5py.File(os.path.join(root, "data", f"{cid}.h5"), "w") as f:
            f.create_dataset("image", data=img)
            f.create_dataset("label", data=lab)
        train_ids.append(cid)
    for i in range(n_val):
        img, lab = phantom()
        cid = f"btcv_val_{i:03d}"
        with h5py.File(os.path.join(root, "data", f"{cid}.h5"), "w") as f:
            f.create_dataset("image", data=img)
            f.create_dataset("label", data=lab)
        val_ids.append(cid)
    write(train_ids, "train.list")
    write(val_ids, "val.list")
    return root
