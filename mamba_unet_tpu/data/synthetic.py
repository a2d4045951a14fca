"""Synthetic ACDC-format dataset generator.

Writes the exact directory layout the reference's loaders expect (per-slice
train h5, per-volume val/test h5, list files — SURVEY §2.8), with cardiac-like
concentric-ring phantoms so that segmentation is learnable: class 1 (RV-like)
crescent, class 2 (Myo-like) ring, class 3 (LV-like) disk on a noisy
background. Used by tests, the e2e smoke trainer, and bench.py (no real ACDC
volumes ship with either repo).
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import h5py
import numpy as np


def _phantom(rng: np.random.Generator, size: int) -> Tuple[np.ndarray, np.ndarray]:
    h = w = size
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy = h / 2 + rng.uniform(-h / 8, h / 8)
    cx = w / 2 + rng.uniform(-w / 8, w / 8)
    r = np.hypot(yy - cy, xx - cx)
    r_lv = size * rng.uniform(0.06, 0.10)
    r_myo = r_lv + size * rng.uniform(0.04, 0.07)
    label = np.zeros((h, w), np.uint8)
    label[r < r_myo] = 2  # myocardium ring
    label[r < r_lv] = 3  # LV blood pool
    # RV: a crescent left of the LV
    rv_cx = cx - r_myo * rng.uniform(1.1, 1.5)
    rv = np.hypot(yy - cy, xx - rv_cx) < r_myo * rng.uniform(0.7, 1.0)
    label[rv & (label == 0)] = 1
    image = 0.2 + 0.15 * rng.standard_normal((h, w)).astype(np.float32)
    image += 0.3 * (label == 1) + 0.5 * (label == 2) + 0.9 * (label == 3)
    image = np.clip(image, 0, 1).astype(np.float32)
    return image, label


def make_synthetic_acdc(
    root: str,
    n_train_cases: int = 4,
    slices_per_case: int = 4,
    n_val_cases: int = 2,
    n_test_cases: int = 0,
    size: int = 64,
    seed: int = 0,
) -> str:
    """Create the dataset under ``root`` and return ``root``."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "data", "slices"), exist_ok=True)

    train_ids = []
    for c in range(n_train_cases):
        case = f"patient{c:03d}_frame01"
        for s in range(slices_per_case):
            image, label = _phantom(rng, size)
            sid = f"{case}_slice_{s}"
            with h5py.File(os.path.join(root, "data", "slices", f"{sid}.h5"), "w") as f:
                f.create_dataset("image", data=image)
                f.create_dataset("label", data=label)
            train_ids.append(sid)

    def write_volumes(prefix: str, n: int, listname: str):
        ids = []
        for c in range(n):
            case = f"{prefix}{c:03d}"
            vol_img, vol_lab = [], []
            for _ in range(slices_per_case):
                image, label = _phantom(rng, size)
                vol_img.append(image)
                vol_lab.append(label)
            with h5py.File(os.path.join(root, "data", f"{case}.h5"), "w") as f:
                f.create_dataset("image", data=np.stack(vol_img))
                f.create_dataset("label", data=np.stack(vol_lab))
            ids.append(case)
        with open(os.path.join(root, listname), "w") as f:
            f.write("\n".join(ids) + ("\n" if ids else ""))

    with open(os.path.join(root, "train_slices.list"), "w") as f:
        f.write("\n".join(train_ids) + "\n")
    write_volumes("val_patient", n_val_cases, "val.list")
    write_volumes("test_patient", n_test_cases, "test.list")
    return root
