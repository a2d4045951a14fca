"""torch -> JAX checkpoint conversion for VSSM (Mamba-UNet) weights.

Replaces the reference's ``load_from`` pretrained-weight surgery
(``/root/reference/code/networks/vision_mamba.py:48-83``): map a torch
``state_dict`` of the reference VSSM onto this repo's flax parameter tree,
including the encoder->decoder key mirroring (``layers.i -> layers_up.(3-i)``)
used when loading ImageNet encoder-only checkpoints, and strict=False
semantics (shape mismatches and unknown keys are skipped and reported).

Layout transforms:
  torch Linear  (out, in)        -> flax Dense kernel (in, out)
  torch Conv2d  (out, in, kh, kw)-> flax Conv kernel (kh, kw, in, out)
  depthwise conv (d, 1, kh, kw)  -> (kh, kw, 1, d)
  LayerNorm weight/bias          -> scale/bias
  raw parameters (x_proj_weight, dt_projs_*, A_logs, Ds) -> unchanged
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def _t(x):
    return np.asarray(x)


def torch_key_for(path: Tuple[str, ...]) -> Optional[Tuple[str, str]]:
    """Map a flax param path (under the VSSM module) to (torch key, kind).

    kind: linear | conv | raw | norm_scale | norm_bias
    Returns None for paths with no torch counterpart.
    """
    parts = list(path)
    leaf = parts.pop()  # kernel | bias | scale | embedding | raw names
    if not parts:
        return None
    head = parts[0]

    def ln(prefix):
        if leaf == "scale":
            return f"{prefix}.weight", "raw"
        return f"{prefix}.bias", "raw"

    # --- stem / heads ---
    if head == "patch_embed":
        sub = parts[1]
        if sub == "proj":
            return (f"patch_embed.proj.{'weight' if leaf == 'kernel' else 'bias'}",
                    "conv" if leaf == "kernel" else "raw")
        if sub == "norm":
            return ln("patch_embed.norm")
    if head in ("norm", "norm_up"):
        return ln(head)
    if head == "up":
        sub = parts[1]
        if sub == "expand":
            return "up.expand.weight", "linear"
        if sub == "norm":
            return ln("up.norm")
    if head == "output":
        return "output.weight", "conv"

    # --- encoder stages / downsample ---
    _RAW_SS2D = ("x_proj_weight", "dt_projs_weight", "dt_projs_bias",
                 "A_logs", "Ds")

    def block_map(tprefix: str, rest: List[str]):
        sub = rest[0]
        # --- Swin blocks (nn/swin.py SwinBlock <-> the reference
        # swin_transformer_unet_skip_expand_decoder_sys.py:169-307) ---
        if sub in ("norm1", "norm2"):
            return ln(f"{tprefix}.{sub}")
        if sub == "attn":
            tp = f"{tprefix}.attn"
            if len(rest) == 1:
                if leaf == "relative_position_bias_table":
                    return f"{tp}.relative_position_bias_table", "raw"
                return None
            inner = rest[1]
            if inner in ("qkv", "proj"):
                if leaf == "kernel":
                    return f"{tp}.{inner}.weight", "linear"
                return f"{tp}.{inner}.bias", "raw"
            return None
        if sub in ("mlp_fc1", "mlp_fc2"):
            fc = "fc1" if sub == "mlp_fc1" else "fc2"
            if leaf == "kernel":
                return f"{tprefix}.mlp.{fc}.weight", "linear"
            return f"{tprefix}.mlp.{fc}.bias", "raw"
        # --- VSS blocks (nn/vss.py <-> mamba_sys.py:543-560) ---
        if sub == "ln_1":
            return ln(f"{tprefix}.ln_1")
        if sub == "self_attention":
            tp = f"{tprefix}.self_attention"
            if len(rest) == 1:
                # flax keeps the SS2D raw params directly under the module:
                # the param name is the leaf itself
                if leaf in _RAW_SS2D:
                    return f"{tp}.{leaf}", "raw"
                return None
            inner = rest[1]
            if inner in ("in_proj", "out_proj"):
                if leaf == "kernel":
                    return f"{tp}.{inner}.weight", "linear"
                return f"{tp}.{inner}.bias", "raw"
            if inner == "conv2d":
                if leaf == "kernel":
                    return f"{tp}.conv2d.weight", "depthwise"
                return f"{tp}.conv2d.bias", "raw"
            if inner == "out_norm":
                return ln(f"{tp}.out_norm")
            return None
        return None

    if head.startswith("layers_") and not head.startswith("layers_up_"):
        i = int(head.split("_")[1])
        if parts[1].startswith("blocks_"):
            j = int(parts[1].split("_")[1])
            return block_map(f"layers.{i}.blocks.{j}", parts[2:])
    if head.startswith("downsample_"):
        i = int(head.split("_")[1])
        sub = parts[1]
        if sub == "norm":
            return ln(f"layers.{i}.downsample.norm")
        if sub == "reduction":
            return f"layers.{i}.downsample.reduction.weight", "linear"

    # --- decoder ---
    if head == "first_expand":
        sub = parts[1]
        if sub == "expand":
            return "layers_up.0.expand.weight", "linear"
        if sub == "norm":
            return ln("layers_up.0.norm")
    if head.startswith("layers_up_"):
        i = int(head.split("_")[2])
        if parts[1].startswith("blocks_"):
            j = int(parts[1].split("_")[1])
            return block_map(f"layers_up.{i}.blocks.{j}", parts[2:])
    if head.startswith("upsample_"):
        i = int(head.split("_")[1])
        sub = parts[1]
        if sub == "expand":
            return f"layers_up.{i}.upsample.expand.weight", "linear"
        if sub == "norm":
            return ln(f"layers_up.{i}.upsample.norm")
    if head.startswith("concat_back_dim_"):
        i = int(head.split("_")[3])
        if leaf == "kernel":
            return f"concat_back_dim.{i}.weight", "linear"
        return f"concat_back_dim.{i}.bias", "raw"
    return None


def _transform(value: np.ndarray, kind: str) -> np.ndarray:
    if kind == "linear":
        return value.T
    if kind == "conv":
        return value.transpose(2, 3, 1, 0)
    if kind == "depthwise":
        return value.transpose(2, 3, 1, 0)
    return value


def mirror_encoder_keys(sd: Dict[str, np.ndarray], num_layers: int = 4):
    """ImageNet encoder-only ckpt: additionally map layers.i -> layers_up.(n-1-i)
    (vision_mamba.py:63-69)."""
    extra = {}
    for k, v in sd.items():
        if k.startswith("layers."):
            i = int(k.split(".")[1])
            mirrored = f"layers_up.{num_layers - 1 - i}" + k[len(f"layers.{i}"):]
            if mirrored not in sd:
                extra[mirrored] = v
    out = dict(sd)
    out.update(extra)
    return out


def convert_vssm(
    torch_state: Dict[str, Any],
    params_template: Dict[str, Any],
    mirror_decoder: bool = False,
    verbose: bool = False,
):
    """Fill ``params_template`` (the flax VSSM 'params' subtree) from a torch
    state_dict. Returns (new_params, report dict)."""
    import jax

    sd = {k: _t(v) for k, v in torch_state.items()}
    # full-model ckpts prefixed 'swin_unet.'/'mamba_unet.' etc: strip module
    # prefixes down to the VSSM root (the reference [17:] strip, :56)
    for prefix in ("mamba_unet.", "swin_unet.", "module."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):] if k.startswith(prefix) else k: v
                  for k, v in sd.items()}
    if mirror_decoder:
        sd = mirror_encoder_keys(sd)

    flat = jax.tree_util.tree_flatten_with_path(params_template)[0]
    loaded, skipped_shape, missing = [], [], []
    updates = {}
    for keypath, leaf in flat:
        path = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        mapping = torch_key_for(path)
        if mapping is None:
            missing.append("/".join(path))
            continue
        tkey, kind = mapping
        if tkey not in sd:
            missing.append("/".join(path))
            continue
        val = _transform(sd[tkey], kind)
        if tuple(val.shape) != tuple(np.shape(leaf)):
            skipped_shape.append((tkey, tuple(val.shape), tuple(np.shape(leaf))))
            continue
        updates[path] = val.astype(np.asarray(leaf).dtype)
        loaded.append(tkey)

    def build(keypath, leaf):
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        return updates.get(path, leaf)

    new_params = jax.tree_util.tree_map_with_path(build, params_template)
    report = {"loaded": loaded, "missing": missing, "shape_skipped": skipped_shape}
    if verbose:
        print(f"loaded {len(loaded)}, missing {len(missing)}, "
              f"shape-skipped {len(skipped_shape)}")
    return new_params, report


# The key map above covers Swin-UNet blocks too (same topology, same
# patch-ops/decoder naming; only the block internals differ) — so Swin
# conversion IS convert_vssm. Named alias for call-site clarity.
convert_swin_unet = convert_vssm


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth state dict (torch CPU) into numpy arrays. Handles the
    {'model': sd} wrapper used by the vmamba/swin pretrained files."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}
