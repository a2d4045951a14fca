"""Orbax checkpointing of the train-state pytree.

Replaces the reference's ``torch.save(state_dict)`` files
(``/root/reference/code/train_fully_supervised_2D.py:162-180``: best-metric
ckpt + periodic iter ckpts) with orbax pytree checkpoints under
``{dir}/{step}``; the trainer keeps the reference's dual best/periodic cadence.
"""

from __future__ import annotations

import os
from typing import Any, Optional

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
