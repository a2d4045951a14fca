"""Binary segmentation metrics (Dice, HD95, ASD/ASSD, NSD) in numpy/scipy.

The reference uses medpy (``/root/reference/code/val_2D.py:20-28``,
``code/utils/test_util.py:155-165``); medpy is not available here, so the
metrics are implemented from their definitions on top of
``scipy.ndimage.distance_transform_edt`` — the same algorithm medpy uses
(surface = set minus its erosion with the connectivity-1 structuring element;
distances = EDT of the complement of the other surface).

These run on host (numpy) on full-resolution volumes; the heavy part is the
EDT, which scipy does in O(voxels).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage


def _as_bool(x) -> np.ndarray:
    return np.asarray(x).astype(bool)


def dice_binary(pred, gt) -> float:
    """Dice coefficient 2|A∩B| / (|A|+|B|) (medpy.metric.binary.dc)."""
    pred, gt = _as_bool(pred), _as_bool(gt)
    denom = pred.sum() + gt.sum()
    if denom == 0:
        return 0.0
    return float(2.0 * np.logical_and(pred, gt).sum() / denom)


def _surface(mask: np.ndarray) -> np.ndarray:
    """Border voxels: mask minus its erosion (connectivity-1 structure)."""
    struct = ndimage.generate_binary_structure(mask.ndim, 1)
    eroded = ndimage.binary_erosion(mask, structure=struct, iterations=1)
    return mask ^ eroded


def surface_distances(
    result, reference, voxelspacing: Optional[Sequence[float]] = None
) -> np.ndarray:
    """Distances from every surface voxel of ``result`` to the surface of
    ``reference`` (one-directional; medpy ``__surface_distances``)."""
    result, reference = _as_bool(result), _as_bool(reference)
    if result.sum() == 0 or reference.sum() == 0:
        raise ValueError("surface distance undefined for empty masks")
    rs = _surface(result)
    ref_s = _surface(reference)
    dt = ndimage.distance_transform_edt(~ref_s, sampling=voxelspacing)
    return dt[rs]


def hd95(result, reference, voxelspacing=None) -> float:
    """95th-percentile symmetric Hausdorff distance (medpy hd95)."""
    d1 = surface_distances(result, reference, voxelspacing)
    d2 = surface_distances(reference, result, voxelspacing)
    return float(max(np.percentile(d1, 95), np.percentile(d2, 95)))


def asd(result, reference, voxelspacing=None) -> float:
    """Average (one-directional) surface distance (medpy asd)."""
    return float(surface_distances(result, reference, voxelspacing).mean())


def assd(result, reference, voxelspacing=None) -> float:
    """Average symmetric surface distance (medpy assd)."""
    d1 = surface_distances(result, reference, voxelspacing)
    d2 = surface_distances(reference, result, voxelspacing)
    return float(np.concatenate([d1, d2]).mean())


def nsd(result, reference, tolerance_mm: float = 1.0, voxelspacing=None) -> float:
    """Normalized surface Dice at ``tolerance_mm`` (surface_distance pkg's
    compute_surface_dice_at_tolerance, used by test_util.py:155-165):
    fraction of each surface lying within tolerance of the other."""
    result, reference = _as_bool(result), _as_bool(reference)
    rs, ref_s = _surface(result), _surface(reference)
    if rs.sum() == 0 or ref_s.sum() == 0:
        return 0.0
    dt_ref = ndimage.distance_transform_edt(~ref_s, sampling=voxelspacing)
    dt_res = ndimage.distance_transform_edt(~rs, sampling=voxelspacing)
    overlap = (dt_ref[rs] <= tolerance_mm).sum() + (dt_res[ref_s] <= tolerance_mm).sum()
    return float(overlap / (rs.sum() + ref_s.sum()))


def calculate_metric_percase(pred, gt) -> Tuple[float, float]:
    """(dice, hd95) with the reference's empty-pred guard (val_2D.py:20-28):
    empty prediction OR empty gt -> (0, 0)."""
    pred, gt = _as_bool(pred), _as_bool(gt)
    if pred.sum() > 0 and gt.sum() > 0:
        return dice_binary(pred, gt), hd95(pred, gt)
    return 0.0, 0.0


def calculate_metric_percase_full(
    pred, gt, voxelspacing=None, nsd_tolerance_mm: float = 1.0
) -> Tuple[float, float, float, float]:
    """(dice, hd95, nsd, asd) — the 3-D eval tuple (test_util.py:155-165)."""
    pred, gt = _as_bool(pred), _as_bool(gt)
    if pred.sum() == 0 or gt.sum() == 0:
        return 0.0, 0.0, 0.0, 0.0
    return (
        dice_binary(pred, gt),
        hd95(pred, gt, voxelspacing),
        nsd(pred, gt, nsd_tolerance_mm, voxelspacing),
        asd(pred, gt, voxelspacing),
    )
