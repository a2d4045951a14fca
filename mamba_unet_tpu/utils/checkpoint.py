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


def load_model_snapshot(
    name: str,
    num_classes: int,
    patch_size,
    in_channels: int,
    directory: Optional[str],
    ckpt_name: Optional[str] = None,
    dtype=None,
):
    """Build a net via ``net_factory`` and restore inference variables from
    an orbax snapshot dir (the shared load of ``cli.test`` / ``cli.export``).

    ``ckpt_name`` selects a member of THIS snapshot only (multi-model
    trainers save ``best``/``best2``/``best3``); default tries ``best`` and
    falls back to the latest periodic ``state``. ``directory=None`` returns
    the seed-0 initialization (useful for structure-only consumers).
    ``dtype`` sets the net's COMPUTE dtype (e.g. ``jnp.bfloat16`` for
    bf16 serving — params stay fp32, checkpoints restore unchanged).
    Returns ``(model, variables)`` with ``variables`` holding ``params``
    (+ ``batch_stats`` when the net has any).
    """
    import jax.numpy as jnp

    from mamba_unet_tpu.models import net_factory  # lazy: avoid cycle

    kw = {"dtype": dtype} if dtype is not None else {}
    model = net_factory(name, num_classes=num_classes, **kw)
    sample = jnp.zeros((1, *patch_size, in_channels), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), sample)
    if directory:
        nm = ckpt_name or "best"
        step = latest_step(directory, nm)
        if step is None and ckpt_name is None:
            nm = "state"
            step = latest_step(directory)
        assert step is not None, f"no '{nm}' checkpoint under {directory}"
        target = {"params": variables["params"],
                  "batch_stats": variables.get("batch_stats", {})}
        restored = restore_checkpoint(directory, step, target, nm)
        variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
    return model, variables


_CTA_STATE_FILE = "cta_state.json"


def save_cta_state(directory: str, cta) -> str:
    """Persist a CTAugment policy's learned state (depth/th/decay + per-op
    bin rates) to {directory}/cta_state.json, atomically.

    The reference's rich contrastive checkpoint carries the CTA object
    (``save_checkpoint_4_2C`` docstring lists it and the restore at
    ``train_Semi_Contrastive_Consistency.py:328-358`` expects it back) —
    without it a resumed run forgets every learned augmentation rate.
    JSON (not pickle): human-inspectable and robust across versions.
    """
    import numpy as np

    os.makedirs(directory, exist_ok=True)
    sd = cta.state_dict()
    payload = {
        "depth": int(sd["depth"]),
        "th": float(sd["th"]),
        "decay": float(sd["decay"]),
        "rates": {k: [np.asarray(r).tolist() for r in bins]
                  for k, bins in sd["rates"].items()},
    }
    path = os.path.join(directory, _CTA_STATE_FILE)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def load_cta_state(directory: str, cta) -> bool:
    """Restore a CTAugment policy saved by ``save_cta_state``; returns True
    when a state file was found and loaded."""
    import numpy as np

    path = os.path.join(directory, _CTA_STATE_FILE)
    try:
        with open(path) as f:
            payload = json.load(f)
    except OSError:
        return False
    cta.load_state_dict({
        "depth": int(payload["depth"]),
        "th": float(payload["th"]),
        "decay": float(payload["decay"]),
        "rates": {k: tuple(np.asarray(r, dtype="f") for r in bins)
                  for k, bins in payload["rates"].items()},
    })
    return True


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
