"""ACDC-format datasets: h5-backed per-slice (train) and per-volume (val/test).

Directory layout and list files identical to the reference
(``/root/reference/code/dataloaders/dataset.py:22-80``):

    {root}/train_slices.list   one slice id per line -> {root}/data/slices/{id}.h5
    {root}/val.list, test.list one case id per line  -> {root}/data/{id}.h5

h5 keys: ``image`` (float), ``label`` (int). Train slices are 2-D (H, W);
val/test volumes are (Z, H, W).

Unlike the reference's 16-worker h5-per-item reads, ``SliceDataset`` memory-
caches everything up front (ACDC: 1312 x 256² floats ≈ 350 MB) — the host here
has one core, and TPU step overlap comes from the Loader's prefetch thread.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import h5py
import numpy as np

# Labeled-subset table: patients -> slices (utils/utils.py:28-34). The semi
# scripts' variant additionally maps {1: 14, 2: 28} and uses 1311 for 140 —
# an upstream inconsistency we do not replicate.
_ACDC_PATIENTS_TO_SLICES = {
    1: 14, 2: 28, 3: 68, 7: 136, 14: 256, 21: 396, 28: 512, 35: 664, 140: 1312,
}


def patients_to_slices(dataset: str, patients_num: int) -> int:
    if "ACDC" in dataset:
        return _ACDC_PATIENTS_TO_SLICES[int(patients_num)]
    raise KeyError(f"no labeled-subset table for dataset {dataset!r}")


def _read_list(path: str) -> List[str]:
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


class SliceDataset:
    """Training dataset of 2-D slices, fully cached in RAM."""

    def __init__(
        self,
        base_dir: str,
        num: Optional[int] = None,
        transform=None,
        cache: bool = True,
        sup_type: str = "label",
    ):
        """``sup_type="scribble"`` serves the h5 ``scribble`` dataset as the
        training label (sparse annotation, 4 = unlabeled) — the
        Weak-Mamba-UNet / WSL4MIS supervision mode."""
        self.base_dir = base_dir
        self.transform = transform
        self.sup_type = sup_type
        self.ids = _read_list(os.path.join(base_dir, "train_slices.list"))
        if num is not None:
            self.ids = self.ids[:num]
        self._cache: Optional[List[Dict[str, np.ndarray]]] = None
        if cache:
            self._cache = [self._load(i) for i in range(len(self.ids))]

    def _load(self, idx: int) -> Dict[str, np.ndarray]:
        path = os.path.join(self.base_dir, "data", "slices", f"{self.ids[idx]}.h5")
        with h5py.File(path, "r") as f:
            return {
                "image": np.asarray(f["image"], np.float32),
                "label": np.asarray(f[self.sup_type], np.int64),
            }

    def __len__(self) -> int:
        return len(self.ids)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        sample = self._cache[idx] if self._cache is not None else self._load(idx)
        sample = {"image": sample["image"], "label": sample["label"]}
        if self.transform is not None:
            sample = self.transform(sample)
        sample["idx"] = idx
        return sample


class VolumeDataset:
    """Val/test dataset of 3-D volumes (read per access — they are large)."""

    def __init__(self, base_dir: str, split: str = "val"):
        assert split in ("val", "test")
        self.base_dir = base_dir
        self.ids = _read_list(os.path.join(base_dir, f"{split}.list"))

    def __len__(self) -> int:
        return len(self.ids)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        path = os.path.join(self.base_dir, "data", f"{self.ids[idx]}.h5")
        with h5py.File(path, "r") as f:
            return {
                "image": np.asarray(f["image"], np.float32),
                "label": np.asarray(f["label"], np.int64),
                "case": self.ids[idx],
            }
