"""Host-side numpy augmentations, matching the reference transforms exactly.

Ref: ``/root/reference/code/dataloaders/dataset.py:407-439`` (rot/flip,
rotate), :505-522 (RandomGenerator), :846-878 (WeakStrongAugment). The exact
order-0 ``scipy.ndimage.zoom``/``rotate`` index arithmetic is kept by calling
the same scipy functions on host (SURVEY §7.3 hard-part 3).

Outputs are channels-last: image (H, W, 1) float32, label (H, W) int64.
Each transform takes a ``numpy.random.Generator`` for reproducibility instead
of the reference's global ``random``/``np.random`` state.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage
from scipy.ndimage import zoom as nd_zoom


def random_rot_flip(
    rng: np.random.Generator,
    image: np.ndarray,
    label: Optional[np.ndarray] = None,
):
    k = int(rng.integers(0, 4))
    axis = int(rng.integers(0, 2))
    image = np.flip(np.rot90(image, k), axis=axis).copy()
    if label is None:
        return image
    label = np.flip(np.rot90(label, k), axis=axis).copy()
    return image, label


def random_rotate(rng: np.random.Generator, image: np.ndarray, label: np.ndarray,
                  label_cval: float = 0.0):
    """``label_cval`` fills the rotated-out corners of the label — 0 for
    dense masks; the ignore index (4) for scribbles, so rotation does not
    mint false background annotations."""
    angle = int(rng.integers(-20, 20))
    image = ndimage.rotate(image, angle, order=0, reshape=False)
    label = ndimage.rotate(label, angle, order=0, reshape=False, cval=label_cval)
    return image, label


def _resize_pair(image, label, output_size):
    x, y = image.shape
    fx, fy = output_size[0] / x, output_size[1] / y
    if (fx, fy) != (1.0, 1.0):
        image = nd_zoom(image, (fx, fy), order=0)
        label = nd_zoom(label, (fx, fy), order=0)
    return image, label


class RandomGenerator:
    """THE standard train transform (dataset.py:505-522): coin-flip
    rot90+flip, elif-coin rotate ±20°, order-0 zoom to patch size."""

    def __init__(self, output_size: Sequence[int], seed: int = 0,
                 label_cval: float = 0.0):
        self.output_size = tuple(output_size)
        self.rng = np.random.default_rng(seed)
        self.label_cval = label_cval

    def __call__(self, sample: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        image, label = sample["image"], sample["label"]
        if self.rng.random() > 0.5:
            image, label = random_rot_flip(self.rng, image, label)
        elif self.rng.random() > 0.5:
            image, label = random_rotate(self.rng, image, label,
                                         label_cval=self.label_cval)
        image, label = _resize_pair(image, label, self.output_size)
        return {
            "image": image.astype(np.float32)[..., None],
            "label": label.astype(np.int64),
        }


def color_jitter(rng: np.random.Generator, image: np.ndarray) -> np.ndarray:
    """Numpy stand-in for torchvision ColorJitter(.4,.4,.4,.1) on a grey
    image in [0,1]: random brightness/contrast/saturation-as-gain/jitter."""
    img = image.astype(np.float32)
    b = 1.0 + rng.uniform(-0.4, 0.4)  # brightness factor
    img = img * b
    c = 1.0 + rng.uniform(-0.4, 0.4)  # contrast about the mean
    img = (img - img.mean()) * c + img.mean()
    return np.clip(img, 0.0, 1.0)


class WeakStrongAugment:
    """weak = rot/flip; strong = color jitter of the weak view
    (dataset.py:846-878). Returns image, image_weak, image_strong, label_aug."""

    def __init__(self, output_size: Sequence[int], seed: int = 0):
        self.output_size = tuple(output_size)
        self.rng = np.random.default_rng(seed)

    def _resize(self, arr):
        x, y = arr.shape
        return nd_zoom(arr, (self.output_size[0] / x, self.output_size[1] / y), order=0)

    def __call__(self, sample: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        image, label = sample["image"], sample["label"]
        image = self._resize(image)
        label = self._resize(label)
        image_weak, label = random_rot_flip(self.rng, image, label)
        image_strong = color_jitter(self.rng, image_weak)
        return {
            "image": image.astype(np.float32)[..., None],
            "image_weak": image_weak.astype(np.float32)[..., None],
            "image_strong": image_strong.astype(np.float32)[..., None],
            "label_aug": label.astype(np.int64),
        }
