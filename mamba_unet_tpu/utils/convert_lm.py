"""torch -> JAX conversion for Mamba LM checkpoints (state-spaces/mamba-*).

The reference loads HF checkpoints via ``mamba_ssm/utils/hf.py`` +
``MambaLMHeadModel.from_pretrained`` (mixer_seq_simple.py:232-242). This maps
that state-dict layout (``backbone.embedding.weight``,
``backbone.layers.{i}.mixer.*``, ``backbone.layers.{i}.norm.weight``,
``backbone.norm_f.weight``; lm_head tied to the embedding) onto
``models.mamba_lm.MambaLMHeadModel`` parameters. Zero-egress environment:
pass a local .pth/.bin path.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def lm_torch_key_for(path: Tuple[str, ...]):
    """flax param path -> (torch key, kind). kind: linear | raw | conv1d."""
    parts = list(path)
    leaf = parts.pop()
    head = parts[0] if parts else leaf
    if head == "embedding":
        return "backbone.embedding.weight", "raw"
    if head == "norm_f":
        return "backbone.norm_f.weight" if leaf == "scale" else \
            "backbone.norm_f.bias", "raw"
    if head.startswith("layers_"):
        i = int(head.split("_")[1])
        tp = f"backbone.layers.{i}"
        if parts[1] == "norm":
            return (f"{tp}.norm.weight" if leaf == "scale"
                    else f"{tp}.norm.bias"), "raw"
        if parts[1] == "mixer":
            if len(parts) >= 3 and parts[2] in ("in_proj", "out_proj"):
                if leaf == "kernel":
                    return f"{tp}.mixer.{parts[2]}.weight", "linear"
                return f"{tp}.mixer.{parts[2]}.bias", "raw"
            mapping = {
                "conv1d_weight": (f"{tp}.mixer.conv1d.weight", "conv1d"),
                "conv1d_bias": (f"{tp}.mixer.conv1d.bias", "raw"),
                "x_proj_weight": (f"{tp}.mixer.x_proj.weight", "raw"),
                "dt_proj_weight": (f"{tp}.mixer.dt_proj.weight", "raw"),
                "dt_proj_bias": (f"{tp}.mixer.dt_proj.bias", "raw"),
                "A_log": (f"{tp}.mixer.A_log", "raw"),
                "D": (f"{tp}.mixer.D", "raw"),
                # bimamba v2 mirrored set
                "conv1d_b_weight": (f"{tp}.mixer.conv1d_b.weight", "conv1d"),
                "conv1d_b_bias": (f"{tp}.mixer.conv1d_b.bias", "raw"),
                "x_proj_b_weight": (f"{tp}.mixer.x_proj_b.weight", "raw"),
                "dt_proj_b_weight": (f"{tp}.mixer.dt_proj_b.weight", "raw"),
                "dt_proj_b_bias": (f"{tp}.mixer.dt_proj_b.bias", "raw"),
                "A_b_log": (f"{tp}.mixer.A_b_log", "raw"),
                "D_b": (f"{tp}.mixer.D_b", "raw"),
            }
            if leaf in mapping:
                return mapping[leaf]
    return None


def _transform(v: np.ndarray, kind: str) -> np.ndarray:
    if kind == "linear":
        return v.T
    if kind == "conv1d":  # (d, 1, w) -> (d, w)
        return v[:, 0, :]
    return v


def convert_mamba_lm(torch_state: Dict[str, Any], params_template, pad_vocab=True):
    """Fill the MambaLMHeadModel 'params' subtree from a torch state dict.
    Vocab rows are zero-padded up to the template's padded size."""
    import jax

    sd = {k: np.asarray(v) for k, v in torch_state.items()}
    flat = jax.tree_util.tree_flatten_with_path(params_template)[0]
    updates, missing = {}, []
    for keypath, leaf in flat:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        m = lm_torch_key_for(path)
        if m is None or m[0] not in sd:
            missing.append("/".join(path))
            continue
        val = _transform(sd[m[0]], m[1])
        tgt = np.asarray(leaf)
        if path[-1] == "embedding" and pad_vocab and val.shape[0] < tgt.shape[0]:
            pad = np.zeros((tgt.shape[0] - val.shape[0], val.shape[1]),
                           val.dtype)
            val = np.concatenate([val, pad], axis=0)
        if val.shape != tgt.shape:
            missing.append("/".join(path) + f" (shape {val.shape} vs {tgt.shape})")
            continue
        updates[path] = val.astype(tgt.dtype)

    def build(keypath, leaf):
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        return updates.get(path, leaf)

    new = jax.tree_util.tree_map_with_path(build, params_template)
    return new, {"loaded": len(updates), "missing": missing}


def load_hf_snapshot(path: str, dtype=None):
    """Build a flax MambaLMHeadModel from a LOCAL HF snapshot directory —
    the zero-egress leg of ``MambaLMHeadModel.from_pretrained``
    (``/root/reference/mamba/mamba_ssm/utils/hf.py:1-25`` fetches the same
    two artifacts from the hub: ``config.json`` + weights).

    ``path`` must contain ``config.json`` and one of ``pytorch_model.bin`` /
    ``model.safetensors``. Returns ``(model, {"params": ...}, report)``.
    """
    import json
    import os

    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)

    bin_path = os.path.join(path, "pytorch_model.bin")
    st_path = os.path.join(path, "model.safetensors")
    if os.path.isfile(bin_path):
        import torch

        sd = {k: v.detach().cpu().numpy()
              for k, v in torch.load(bin_path, map_location="cpu",
                                     weights_only=True).items()}
    elif os.path.isfile(st_path):
        from safetensors.numpy import load_file  # optional dep

        sd = load_file(st_path)
    else:
        raise FileNotFoundError(
            f"no pytorch_model.bin or model.safetensors under {path}")

    import jax
    import jax.numpy as jnp

    from mamba_unet_tpu.models.mamba_lm import MambaLMHeadModel

    ssm_cfg = cfg.get("ssm_cfg", {}) or {}
    model = MambaLMHeadModel(
        vocab_size=cfg["vocab_size"],
        d_model=cfg["d_model"],
        n_layer=cfg["n_layer"],
        d_state=ssm_cfg.get("d_state", 16),
        rms_norm=cfg.get("rms_norm", True),
        pad_vocab_size_multiple=cfg.get("pad_vocab_size_multiple", 8),
        bimamba_type=ssm_cfg.get("bimamba_type", "none"),
        dtype=dtype or jnp.float32,
    )
    # real init as the template so any key the checkpoint lacks keeps a
    # sensible initialization rather than zeros
    template = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 4), jnp.int32))["params"]
    params, report = convert_mamba_lm(sd, template)
    return model, {"params": params}, report
