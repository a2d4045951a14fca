"""Experiment infrastructure: snapshot dirs, tensorboard, code archiving,
resume discovery — the reference's cross-cutting conventions (SURVEY §2.13).

  * snapshot dir "../model/{exp}_{labeled_num}_labeled/{model}" with a
    self-archived copy of the package (shutil.copytree, ref
    train_fully_supervised_2D.py:204-211)
  * logging to snapshot/log.txt + stdout with ms timestamps (:213-215)
  * tensorboardX scalars and the x50-grey image trick (:123-160)
  * restore discovery: newest state_{N} checkpoint in a snapshot dir
    (util.py restore_model :96-131 equivalent, orbax-backed)
"""

from __future__ import annotations

import logging
import os
import shutil
import sys
from typing import Dict, Optional

import numpy as np

# RGB palette for label2color (utils/utils.py:87-92)
_PALETTE = np.asarray(
    [[0, 0, 0], [220, 20, 60], [0, 128, 0], [30, 144, 255], [255, 215, 0],
     [138, 43, 226], [255, 140, 0], [0, 206, 209], [128, 128, 0],
     [199, 21, 133], [70, 130, 180], [154, 205, 50], [205, 92, 92],
     [75, 0, 130]], np.uint8,
)


def snapshot_path(exp: str, labeled_num: Optional[int], model: str,
                  root: str = "../model") -> str:
    tag = f"{exp}_{labeled_num}_labeled" if labeled_num is not None else exp
    return os.path.join(root, tag, model)


def setup_experiment(snapshot_dir: str, archive_code: bool = True) -> None:
    """Create the snapshot dir, archive the package source, wire logging."""
    os.makedirs(snapshot_dir, exist_ok=True)
    if archive_code:
        src = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dst = os.path.join(snapshot_dir, "code")
        if not os.path.exists(dst):
            shutil.copytree(
                src, dst,
                ignore=shutil.ignore_patterns("__pycache__", "*.pyc"),
            )
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s.%(msecs)03d] %(message)s",
        datefmt="%H:%M:%S",
        handlers=[
            logging.FileHandler(os.path.join(snapshot_dir, "log.txt")),
            logging.StreamHandler(sys.stdout),
        ],
        force=True,
    )


def label2color(label: np.ndarray) -> np.ndarray:
    """(H, W) int labels -> (H, W, 3) uint8 RGB."""
    return _PALETTE[np.clip(label, 0, len(_PALETTE) - 1)]


class TensorboardLogger:
    """Thin tensorboardX wrapper; no-ops when tensorboardX is unavailable."""

    def __init__(self, log_dir: str):
        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(log_dir)
        except Exception:  # pragma: no cover - tb is present in this image
            self.writer = None

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        if self.writer is None:
            return
        for k, v in values.items():
            self.writer.add_scalar(k, float(v), step)

    def image_triplet(self, step: int, image: np.ndarray, pred: np.ndarray,
                      label: np.ndarray) -> None:
        """input / prediction / GT images; predictions use the reference's
        x50 grey-scaling trick for visibility."""
        if self.writer is None:
            return
        img = np.asarray(image)
        if img.ndim == 3:
            img = img[..., 0]
        self.writer.add_image("train/Image", img[None], step)
        self.writer.add_image("train/Prediction",
                              (np.asarray(pred) * 50).astype(np.uint8)[None],
                              step)
        self.writer.add_image("train/GroundTruth",
                              (np.asarray(label) * 50).astype(np.uint8)[None],
                              step)

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
