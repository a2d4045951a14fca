"""ctypes bindings for the native (C++) host data plane.

Builds ``native/augment.cpp`` with g++ on first use (cached .so next to the
source). ctypes foreign calls release the GIL, so native augmentation runs
concurrently with the Python training loop on this single-core host —
playing the role of the reference's 16 DataLoader worker processes.

Falls back silently when no compiler is available: ``available()`` gates it
and ``NativeRandomGenerator`` degrades to the scipy implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "augment.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libaugment.so")

_f32p = ctypes.POINTER(ctypes.c_float)
_i64p = ctypes.POINTER(ctypes.c_int64)


def _build() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True,
            )
        except (OSError, subprocess.CalledProcessError):
            return None
    lib = ctypes.CDLL(_SO)
    lib.nn_zoom_f32.argtypes = [_f32p, ctypes.c_int, ctypes.c_int,
                                _f32p, ctypes.c_int, ctypes.c_int]
    lib.nn_zoom_i64.argtypes = [_i64p, ctypes.c_int, ctypes.c_int,
                                _i64p, ctypes.c_int, ctypes.c_int]
    lib.rot90_flip_f32.argtypes = [_f32p, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_int, _f32p]
    lib.rot90_flip_i64.argtypes = [_i64p, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_int, _i64p]
    lib.augment_slice.argtypes = [_f32p, _i64p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                  _f32p, _i64p, ctypes.c_int, ctypes.c_int]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build()
    return _LIB


def available() -> bool:
    return _lib() is not None


def nn_zoom(arr: np.ndarray, out_shape: Sequence[int]) -> np.ndarray:
    """scipy.ndimage.zoom(order=0)-exact nearest resize, native."""
    lib = _lib()
    assert lib is not None
    h, w = arr.shape
    oh, ow = out_shape
    if arr.dtype == np.float32:
        out = np.empty((oh, ow), np.float32)
        lib.nn_zoom_f32(arr.ctypes.data_as(_f32p), h, w,
                        out.ctypes.data_as(_f32p), oh, ow)
    else:
        src = np.ascontiguousarray(arr, np.int64)
        out = np.empty((oh, ow), np.int64)
        lib.nn_zoom_i64(src.ctypes.data_as(_i64p), h, w,
                        out.ctypes.data_as(_i64p), oh, ow)
    return out


def rot90_flip(arr: np.ndarray, k: int, axis: int) -> np.ndarray:
    lib = _lib()
    assert lib is not None
    h, w = arr.shape
    oh, ow = (w, h) if k % 2 else (h, w)
    if arr.dtype == np.float32:
        out = np.empty((oh, ow), np.float32)
        lib.rot90_flip_f32(arr.ctypes.data_as(_f32p), h, w, k, axis,
                           out.ctypes.data_as(_f32p))
    else:
        src = np.ascontiguousarray(arr, np.int64)
        out = np.empty((oh, ow), np.int64)
        lib.rot90_flip_i64(src.ctypes.data_as(_i64p), h, w, k, axis,
                           out.ctypes.data_as(_i64p))
    return out


class NativeRandomGenerator:
    """Drop-in for data.augment.RandomGenerator with the hot path (rot90 +
    flip + order-0 zoom) fused in C++; the 25%-branch ±20° rotate stays on
    scipy (interpolated rotation is cold). Falls back entirely to the scipy
    transform when the native lib is unavailable."""

    def __init__(self, output_size: Sequence[int], seed: int = 0):
        from mamba_unet_tpu.data.augment import RandomGenerator

        self.output_size = tuple(output_size)
        self.rng = np.random.default_rng(seed)
        self._fallback = RandomGenerator(output_size, seed)
        self._native = available()

    def __call__(self, sample):
        if not self._native:
            return self._fallback(sample)
        from scipy import ndimage

        image = np.ascontiguousarray(sample["image"], np.float32)
        label = np.ascontiguousarray(sample["label"], np.int64)
        lib = _lib()
        do_rotflip = 0
        k = axis = 0
        if self.rng.random() > 0.5:
            do_rotflip = 1
            k = int(self.rng.integers(0, 4))
            axis = int(self.rng.integers(0, 2))
        elif self.rng.random() > 0.5:
            angle = int(self.rng.integers(-20, 20))
            image = np.ascontiguousarray(
                ndimage.rotate(image, angle, order=0, reshape=False))
            label = np.ascontiguousarray(
                ndimage.rotate(label, angle, order=0, reshape=False))
        h, w = image.shape
        oh, ow = self.output_size
        out_img = np.empty((oh, ow), np.float32)
        out_lab = np.empty((oh, ow), np.int64)
        lib.augment_slice(
            image.ctypes.data_as(_f32p), label.ctypes.data_as(_i64p), h, w,
            do_rotflip, k, axis,
            out_img.ctypes.data_as(_f32p), out_lab.ctypes.data_as(_i64p),
            oh, ow,
        )
        return {"image": out_img[..., None], "label": out_lab}
