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


def _phantom_hard(rng: np.random.Generator, size: int,
                  apical: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Discriminating phantom (VERDICT r2 task 4): wobbly class boundaries
    (angular Fourier perturbation), overlapping class intensities under a
    smooth bias field + spatially-correlated noise, 2-4 distractor blobs
    with class-like intensities but background label, and optional apical
    slices with NO RV (class imbalance). Hard enough that HD95 is nonzero
    and 10%-labeled supervised training trails semi-supervised methods."""
    from scipy.ndimage import gaussian_filter

    h = w = size
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy = h / 2 + rng.uniform(-h / 6, h / 6)
    cx = w / 2 + rng.uniform(-w / 6, w / 6)
    dy, dx = yy - cy, xx - cx
    r = np.hypot(dy, dx)
    th = np.arctan2(dy, dx)

    def wobble():
        out = np.ones_like(th)
        for k in range(2, 6):
            out += rng.uniform(0.0, 0.18) * np.sin(k * th + rng.uniform(0, 7))
        return out

    r_lv = size * rng.uniform(0.06, 0.11) * wobble()
    r_myo = r_lv + size * rng.uniform(0.035, 0.08) * wobble()
    label = np.zeros((h, w), np.uint8)
    label[r < r_myo] = 2
    label[r < r_lv] = 3
    if not apical:
        rv_cx = cx - np.mean(r_myo) * rng.uniform(1.1, 1.6)
        rv_cy = cy + rng.uniform(-h / 10, h / 10)
        rv_r = np.mean(r_myo) * rng.uniform(0.6, 1.1) * wobble()
        rv = np.hypot(yy - rv_cy, xx - rv_cx) < rv_r
        label[rv & (label == 0)] = 1

    # overlapping intensities: class means closer together, per-slice jitter
    means = np.array([0.25, 0.45, 0.55, 0.75]) + rng.uniform(-0.06, 0.06, 4)
    image = means[label].astype(np.float32)
    # distractor blobs in the background with class-like intensities
    for _ in range(rng.integers(2, 5)):
        bx, by = rng.uniform(0, w), rng.uniform(0, h)
        br = size * rng.uniform(0.03, 0.09)
        blob = np.hypot(yy - by, xx - bx) < br
        image[blob & (label == 0)] = rng.choice(means[1:])
    # smooth multiplicative bias field + correlated + white noise
    bias = gaussian_filter(rng.standard_normal((h, w)), size / 6)
    bias = 1.0 + 0.35 * bias / (np.abs(bias).max() + 1e-6)
    tex = gaussian_filter(rng.standard_normal((h, w)), 1.5).astype(np.float32)
    image = image * bias + 0.35 * tex + 0.10 * rng.standard_normal((h, w))
    image = np.clip(image, 0, 1.6).astype(np.float32) / 1.6
    return image, label


def make_synthetic_acdc(
    root: str,
    n_train_cases: int = 4,
    slices_per_case: int = 4,
    n_val_cases: int = 2,
    n_test_cases: int = 0,
    size: int = 64,
    seed: int = 0,
    hard: bool = False,
    scribble: bool = False,
) -> str:
    """Create the dataset under ``root`` and return ``root``.

    ``hard=True`` uses the discriminating phantom (_phantom_hard); the last
    ~30% of each case's slices are apical (no RV).  ``scribble=True`` adds a
    sparse ``scribble`` dataset to every train-slice h5 (ACDC-scribble
    convention: classes 0..3 scribbled, 4 = unlabeled) for the
    weakly-supervised Weak-Mamba-UNet protocol."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "data", "slices"), exist_ok=True)

    def gen(s):
        if hard:
            return _phantom_hard(rng, size,
                                 apical=(s >= 0.7 * slices_per_case))
        return _phantom(rng, size)

    train_ids = []
    for c in range(n_train_cases):
        case = f"patient{c:03d}_frame01"
        for s in range(slices_per_case):
            image, label = gen(s)
            sid = f"{case}_slice_{s}"
            with h5py.File(os.path.join(root, "data", "slices", f"{sid}.h5"), "w") as f:
                f.create_dataset("image", data=image)
                f.create_dataset("label", data=label)
                if scribble:
                    from mamba_unet_tpu.data.scribble import scribbles_from_mask

                    f.create_dataset("scribble",
                                     data=scribbles_from_mask(label, rng))
            train_ids.append(sid)

    def write_volumes(prefix: str, n: int, listname: str):
        ids = []
        for c in range(n):
            case = f"{prefix}{c:03d}"
            vol_img, vol_lab = [], []
            for s in range(slices_per_case):
                image, label = gen(s)
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
