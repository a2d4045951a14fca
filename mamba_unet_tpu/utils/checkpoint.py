"""Orbax checkpointing of the train-state pytree.

Replaces the reference's ``torch.save(state_dict)`` files
(``/root/reference/code/train_fully_supervised_2D.py:162-180``: best-metric
ckpt + periodic iter ckpts) with orbax pytree checkpoints under
``{dir}/{step}``; the trainer keeps the reference's dual best/periodic cadence.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def _checkpointer() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def save_checkpoint(directory: str, step: int, tree: Any, name: str = "state") -> str:
    """Save ``tree`` under {directory}/{name}_{step}. Returns the path."""
    path = os.path.abspath(os.path.join(directory, f"{name}_{step}"))
    ckptr = _checkpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(directory: str, name: str = "state") -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for entry in os.listdir(directory):
        if entry.startswith(f"{name}_"):
            try:
                steps.append(int(entry.rsplit("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_checkpoint(
    directory: str, step: int, target: Any, name: str = "state"
) -> Any:
    """Restore into the structure of ``target`` (a matching pytree)."""
    path = os.path.abspath(os.path.join(directory, f"{name}_{step}"))
    ckptr = _checkpointer()
    return ckptr.restore(path, target)


def checkpoint_top_keys(
    directory: str, step: int, name: str = "state"
) -> Optional[set]:
    """Top-level keys of a saved tree via orbax metadata (no array reads),
    or None when the metadata is unreadable. Lets resume distinguish a
    LEGACY checkpoint (a key genuinely absent from the saved tree) from a
    CORRUPTED one (key present but restore fails) — a blanket
    try/except around the restore cannot tell these apart."""
    path = os.path.abspath(os.path.join(directory, f"{name}_{step}"))
    try:
        md = _checkpointer().metadata(path)
        return set(md.item_metadata.tree.keys())
    except Exception:
        return None


_BEST_MARKS_FILE = "best_marks.json"


def save_best_marks(directory: str, marks: Dict[str, float]) -> str:
    """Merge ``marks`` into {directory}/best_marks.json, atomically.

    The sidecar persists each best-metric high-water mark (keyed by the
    best-checkpoint name: ``best``/``best2``/``best3``) across kill-and-
    resume, so a resumed run cannot overwrite a better ``best_*`` lineage —
    the role of ``best_performance`` in the reference's rich checkpoint
    (``/root/reference/code/utils/util.py:54-94`` ``save_checkpoint_4_2C``,
    restored by ``train_Semi_Contrastive_Consistency.py:328-357``).
    Atomic via write-to-temp + ``os.replace`` so a kill mid-write leaves the
    previous marks intact.
    """
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, _BEST_MARKS_FILE)
    merged = load_best_marks(directory)
    merged.update({k: float(v) for k, v in marks.items()})
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def load_best_marks(directory: str) -> Dict[str, float]:
    """Read the best-marks sidecar; {} when absent or unreadable."""
    path = os.path.join(directory, _BEST_MARKS_FILE)
    try:
        with open(path) as f:
            got = json.load(f)
        return {str(k): float(v) for k, v in got.items()}
    except (OSError, ValueError, TypeError, AttributeError):
        # TypeError: non-numeric values ({"best": null} / lists);
        # AttributeError: top-level JSON not an object — both count as
        # "unreadable", per the contract above.
        return {}
