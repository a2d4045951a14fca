"""Serving export round-trip: serialize -> deserialize -> same logits.

The artifact (``jax.export`` StableHLO, weights baked in, symbolic batch)
must reproduce the direct ``model.apply`` on the same platform (to
recompilation-level float tolerance) and serve multiple batch sizes from
one file — the deployment path the
torch reference lacks (it re-instantiates the Python net and
``load_state_dict``s, ``/root/reference/code/test_2D_fully.py:148-153``).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mamba_unet_tpu.utils.export import (
    export_predict,
    load_exported,
    make_predict_fn,
    save_exported,
)


class TinySeg(nn.Module):
    num_classes: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(8, (3, 3))(x)
        h = nn.relu(h)
        return nn.Conv(self.num_classes, (1, 1))(h)


def _init(model, patch=16, in_ch=1):
    x = jnp.zeros((1, patch, patch, in_ch), jnp.float32)
    return jax.jit(model.init)(jax.random.key(0), x)


def test_export_roundtrip_symbolic_batch(tmp_path, rng):
    model = TinySeg()
    variables = _init(model)
    exported = export_predict(model, variables, (16, 16))
    path = save_exported(exported, os.path.join(tmp_path, "m.jaxexport"))
    loaded = load_exported(path)
    direct = make_predict_fn(model, variables)
    for bsz in (2, 5):
        x = jnp.asarray(rng.normal(size=(bsz, 16, 16, 1)), jnp.float32)
        got = jax.jit(loaded.call)(x)
        want = direct(x)
        assert got.shape == (bsz, 16, 16, 4)
        # allclose, not bit-equal: the artifact is recompiled at load time
        # and XLA codegen may differ across compilations (observed on this
        # host via compile-cache machine-feature mismatches)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6)


def test_export_pinned_batch_rejects_other_sizes(tmp_path, rng):
    model = TinySeg()
    variables = _init(model)
    exported = export_predict(model, variables, (16, 16), batch=3)
    loaded = load_exported(
        save_exported(exported, os.path.join(tmp_path, "p.jaxexport")))
    x3 = jnp.asarray(rng.normal(size=(3, 16, 16, 1)), jnp.float32)
    assert jax.jit(loaded.call)(x3).shape == (3, 16, 16, 4)
    x4 = jnp.asarray(rng.normal(size=(4, 16, 16, 1)), jnp.float32)
    with pytest.raises(Exception):
        jax.jit(loaded.call)(x4)


def test_export_lm_generate_roundtrip(tmp_path):
    """The whole prefill + scan-decode generation loop ships as one
    artifact; greedy tokens from the loaded artifact must equal the direct
    ``generate()`` call (integer outputs — exact)."""
    from mamba_unet_tpu.models.mamba_lm import MambaLMHeadModel, generate
    from mamba_unet_tpu.utils.export import export_lm_generate

    model = MambaLMHeadModel(vocab_size=61, d_model=32, n_layer=2)
    ids0 = jnp.zeros((1, 6), jnp.int32)
    variables = jax.jit(model.init)(jax.random.key(0), ids0)
    exported = export_lm_generate(model, variables, prompt_len=6,
                                  max_new_tokens=5)
    loaded = load_exported(
        save_exported(exported, os.path.join(tmp_path, "lm.jaxexport")))
    for bsz in (2, 3):
        prompts = jnp.asarray(
            np.arange(bsz * 6).reshape(bsz, 6) % 61, jnp.int32)
        got = jax.jit(loaded.call)(prompts, jnp.uint32(7))
        want = generate(model, variables, prompts, max_new_tokens=5,
                        rng=jax.random.key(jnp.uint32(7)))
        assert got.shape == (bsz, 11)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # the prompt is echoed back unchanged
        np.testing.assert_array_equal(np.asarray(got[:, :6]),
                                      np.asarray(prompts))


def test_export_cli_smoke(tmp_path, rng):
    """cli.export (no checkpoint = seed-0 init) produces an artifact that
    matches rebuilding the same net + init directly."""
    from mamba_unet_tpu.cli.export import main
    from mamba_unet_tpu.utils import load_model_snapshot

    out = os.path.join(tmp_path, "unet.jaxexport")
    assert main(["--model", "unet", "--num_classes", "4",
                 "--patch_size", "16", "16", "--out", out]) == 0
    loaded = load_exported(out)
    model, variables = load_model_snapshot("unet", 4, (16, 16), 1, None)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 1)), jnp.float32)
    got = jax.jit(loaded.call)(x)
    want = make_predict_fn(model, variables)(x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6)


def test_export_cli_bf16_smoke(tmp_path, rng):
    """--bf16 serving export: artifact computes in bfloat16 (params fp32)
    but keeps the fp32 output ABI, and tracks the fp32 forward at
    bf16-level tolerance."""
    from mamba_unet_tpu.cli.export import main
    from mamba_unet_tpu.utils import load_model_snapshot

    out = os.path.join(tmp_path, "unet_bf16.jaxexport")
    assert main(["--model", "unet", "--num_classes", "4",
                 "--patch_size", "16", "16", "--bf16", "--out", out]) == 0
    loaded = load_exported(out)
    model, variables = load_model_snapshot("unet", 4, (16, 16), 1, None)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 1)), jnp.float32)
    got = jax.jit(loaded.call)(x)
    assert got.dtype == jnp.float32  # fp32 ABI regardless of compute dtype
    want = make_predict_fn(model, variables)(x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-2, atol=5e-2)
