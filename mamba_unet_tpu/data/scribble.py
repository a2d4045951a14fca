"""Scribble annotations for weakly-supervised training (Weak-Mamba-UNet).

The reference repo names Weak-Mamba-UNet as its third headline model
(``/root/reference/README.md:27-38``) and publishes its results table
(``WeakMambaUNet.pdf`` Table 1), but ships no training code ("code in
progress" upstream).  This module supplies the data side of the paper's
setup: sparse scribble labels — one curve per annotated class — with every
unannotated pixel set to ``ignore_index = num_classes`` (the ACDC-scribble
convention of Valvano et al., where classes 0..3 are scribbled and 4 means
"unlabeled").

``scribbles_from_mask`` emulates human scribbles on dense masks so the
synthetic ACDC phantoms (``data/synthetic.py``) can drive the full
weakly-supervised protocol: for each class present in the slice it draws a
momentum random walk constrained to the (eroded) class region, giving
curve-like sparse annotations covering a few percent of each region.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.ndimage import binary_erosion

# 8-connected step directions for the walk.
_DIRS: Tuple[Tuple[int, int], ...] = (
    (-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1),
)


def _random_walk(mask: np.ndarray, rng: np.random.Generator,
                 n_steps: int) -> np.ndarray:
    """Boolean trace of a momentum random walk inside ``mask``.

    Keeps the current direction with p=0.7 (long strokes, like a human
    scribble) and re-rolls it whenever the next pixel would leave the mask.
    """
    trace = np.zeros_like(mask, dtype=bool)
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return trace
    i = int(rng.integers(len(ys)))
    y, x = int(ys[i]), int(xs[i])
    trace[y, x] = True
    d = _DIRS[int(rng.integers(8))]
    h, w = mask.shape
    for _ in range(n_steps):
        if rng.random() > 0.7:
            d = _DIRS[int(rng.integers(8))]
        ny, nx = y + d[0], x + d[1]
        if 0 <= ny < h and 0 <= nx < w and mask[ny, nx]:
            y, x = ny, nx
            trace[y, x] = True
        else:
            d = _DIRS[int(rng.integers(8))]
    return trace


def scribbles_from_mask(
    label: np.ndarray,
    rng: np.random.Generator,
    ignore_index: int = 4,
    erosion_iters: int = 2,
) -> np.ndarray:
    """Sparse scribble annotation for a dense (H, W) int mask.

    One random-walk curve per class present in the slice (including a
    background curve), drawn inside the class region eroded by
    ``erosion_iters`` so scribbles stay off the boundary — matching how the
    ACDC scribbles were collected.  All other pixels get ``ignore_index``.
    """
    label = np.asarray(label)
    out = np.full(label.shape, ignore_index, dtype=np.uint8)
    for k in np.unique(label):
        mask = label == k
        core = binary_erosion(mask, iterations=erosion_iters)
        if not core.any():
            core = mask
        npix = int(core.sum())
        # walk length ~ region scale; background regions are huge, cap them
        n_steps = int(np.clip(npix // 8, 15, 300))
        out[_random_walk(core, rng, n_steps)] = k
    return out
