"""Signed distance field of binary masks (host-side numpy/scipy).

Rebuild of the reference ``compute_sdf`` (``code/utils/util.py:224-255``,
dormant upstream — kept for inventory parity and SDF-regression methods):
per-sample normalized signed distance map where

    sdf = 0        on the segmentation boundary
    sdf in [-1,0)  inside the mask   (min-max normalized -EDT)
    sdf in (0, 1]  outside the mask  (min-max normalized +EDT)

The inner boundary is posmask minus its erosion (the reference uses
skimage ``find_boundaries(mode='inner')`` — same set with the default
connectivity-1 structuring element; image borders count as background).
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import binary_erosion, distance_transform_edt


def compute_sdf(img_gt: np.ndarray, out_shape=None) -> np.ndarray:
    """img_gt: (B, *spatial) binary masks -> (B, *spatial) float64 SDM."""
    img_gt = np.asarray(img_gt).astype(np.uint8)
    if out_shape is None:
        out_shape = img_gt.shape
    normalized_sdf = np.zeros(out_shape)

    for b in range(out_shape[0]):
        posmask = img_gt[b].astype(bool)
        if not posmask.any():
            continue
        negmask = ~posmask
        posdis = distance_transform_edt(posmask)
        negdis = distance_transform_edt(negmask)
        boundary = posmask & ~binary_erosion(posmask, border_value=0)
        pos_rng = np.max(posdis) - np.min(posdis)
        neg_rng = np.max(negdis) - np.min(negdis)
        sdf = (negdis - np.min(negdis)) / max(neg_rng, 1e-12) - (
            posdis - np.min(posdis)
        ) / max(pos_rng, 1e-12)
        sdf[boundary] = 0
        normalized_sdf[b] = sdf
    return normalized_sdf
