"""Checkpoint-converter tests: fabricate a reference-style torch state_dict
from a flax VSSM tree (inverse transforms), convert back, require exact
round-trip and full coverage; check the encoder->decoder mirroring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_unet_tpu.models import VSSM
from mamba_unet_tpu.utils.convert import (
    _transform,
    convert_vssm,
    mirror_encoder_keys,
    torch_key_for,
)


def _inverse(val: np.ndarray, kind: str) -> np.ndarray:
    if kind == "linear":
        return val.T
    if kind in ("conv", "depthwise"):
        return val.transpose(3, 2, 0, 1)
    return val


@pytest.fixture(scope="module")
def vssm_params():
    m = VSSM(num_classes=4, depths=(1, 1), dims=(8, 16), drop_path_rate=0.0)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    return m.init(jax.random.key(0), x)["params"]


def _fabricate_torch_sd(params):
    sd = {}
    unmapped = []
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        path = tuple(k.key for k in keypath)
        mapping = torch_key_for(path)
        if mapping is None:
            unmapped.append("/".join(path))
            continue
        tkey, kind = mapping
        sd[tkey] = _inverse(np.asarray(leaf), kind)
    return sd, unmapped


def test_every_param_has_torch_key(vssm_params):
    _, unmapped = _fabricate_torch_sd(vssm_params)
    assert unmapped == [], unmapped


def test_roundtrip_exact(vssm_params):
    sd, _ = _fabricate_torch_sd(vssm_params)
    # perturb so we can detect that values actually flow
    sd = {k: v + 1.0 for k, v in sd.items()}
    new_params, report = convert_vssm(sd, vssm_params)
    assert report["missing"] == []
    assert report["shape_skipped"] == []
    for (kp, orig), (_, new) in zip(
        jax.tree_util.tree_flatten_with_path(vssm_params)[0],
        jax.tree_util.tree_flatten_with_path(new_params)[0],
    ):
        np.testing.assert_allclose(np.asarray(new), np.asarray(orig) + 1.0,
                                   err_msg=str(kp))


def test_shape_mismatch_skipped(vssm_params):
    sd, _ = _fabricate_torch_sd(vssm_params)
    bad_key = "output.weight"
    sd[bad_key] = np.zeros((7, 3, 1, 1), np.float32)
    new_params, report = convert_vssm(sd, vssm_params)
    assert any(k == bad_key for k, *_ in report["shape_skipped"])
    # the template value is kept for skipped entries
    np.testing.assert_array_equal(
        np.asarray(new_params["output"]["kernel"]),
        np.asarray(vssm_params["output"]["kernel"]),
    )


def test_mirror_encoder_keys():
    sd = {"layers.0.blocks.0.ln_1.weight": np.ones(3),
          "layers.3.blocks.0.ln_1.weight": np.zeros(3),
          "patch_embed.proj.weight": np.ones((4, 3, 4, 4))}
    out = mirror_encoder_keys(sd, num_layers=4)
    assert "layers_up.3.blocks.0.ln_1.weight" in out
    assert "layers_up.0.blocks.0.ln_1.weight" in out
    np.testing.assert_array_equal(out["layers_up.3.blocks.0.ln_1.weight"],
                                  sd["layers.0.blocks.0.ln_1.weight"])


def test_torch_load_integration(tmp_path, vssm_params):
    """End-to-end through torch.save / load_torch_checkpoint."""
    import torch

    from mamba_unet_tpu.utils.convert import load_torch_checkpoint

    sd, _ = _fabricate_torch_sd(vssm_params)
    tsd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    torch.save({"model": tsd}, str(tmp_path / "ckpt.pth"))
    loaded = load_torch_checkpoint(str(tmp_path / "ckpt.pth"))
    new_params, report = convert_vssm(loaded, vssm_params)
    assert report["missing"] == [] and report["shape_skipped"] == []
