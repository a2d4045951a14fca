"""Serving export: serialize a trained model's inference function to a
self-contained StableHLO artifact via ``jax.export``.

The torch reference has no deployment story beyond "unpickle the ``.pth``
into the Python class" (``/root/reference/code/test_2D_fully.py:148-153``
rebuilds ``net_factory(...)`` and ``load_state_dict``s into it); serving it
requires shipping the whole model zoo. Here the artifact is the compiler IR itself:
weights are baked in as StableHLO constants, and loading needs jax only —
no ``mamba_unet_tpu`` model code, no checkpoint tree, no config. That is
the TPU-native serving path: one file in, ``logits = f(images)`` out, with
a **symbolic batch dimension** so a single artifact serves any batch size
(XLA compiles per concrete shape at call time, cached thereafter).

Round-trip contract (``tests/test_export.py``): ``deserialize(serialize(e))``
reproduces the direct ``model.apply`` logits on the same platform (to
recompilation-level float tolerance — XLA codegen may differ across
compilations), at multiple batch sizes through one symbolic-batch artifact.

Measured on a v5e chip (ViM_seg 224², seed-0 weights, random inputs): the
Pallas-kernel artifact round-trips at max-abs logit diff 1.9e-06 under
``jax.config.update("jax_default_matmul_precision", "float32")``; under the
TPU DEFAULT matmul precision (fp32 matmuls ride the MXU as bf16 passes) two
compilations of the same graph legitimately differ by up to ~4e-2 on raw
logits (argmax maps 99.7% identical on random inputs — near-tie pixels of
an untrained net; trained, confident logits agree correspondingly better).
That is TPU matmul-precision semantics, not an artifact defect — pin the
precision when serving needs exact training-parity logits.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from jax import export as _jex


def make_predict_fn(model, variables):
    """``(B, H, W, C) -> logits`` closure over baked-in variables; multi-head
    models (deep supervision, URPC) export their main head, matching the
    ``cli.test`` inference protocol."""

    def fwd(x):
        import jax.numpy as _jnp

        from mamba_unet_tpu.ops.selective_scan_persistent import (
            inference_scan,
        )

        with inference_scan():  # trace-time: persistent fwd where eligible
            out = model.apply(variables, x)
        out = out[0] if isinstance(out, (tuple, list)) else out
        # fp32 output ABI regardless of the net's compute dtype (bf16
        # serving keeps callers' post-processing unchanged)
        return out.astype(_jnp.float32)

    return fwd


def export_predict(
    model,
    variables,
    patch_size,
    in_channels: int = 1,
    batch: Union[int, str] = "b",
    dtype=jnp.float32,
    platforms: Optional[Sequence[str]] = None,
) -> "_jex.Exported":
    """Export ``model``'s inference forward as a ``jax.export.Exported``.

    ``batch``: an int pins the batch dimension; a string (default ``"b"``)
    makes it symbolic so the artifact serves any batch size.
    ``platforms``: lowering targets (e.g. ``("tpu", "cpu")``); None = the
    current default backend. NB: Pallas-kernel paths lower to TPU-only
    custom calls — export Mamba models either for TPU, or with the XLA scan
    fallback (``scan_impl="xla"``/``"bidir"``) for CPU-servable artifacts.
    """
    if isinstance(batch, str):
        (b,) = _jex.symbolic_shape(batch)
    else:
        b = int(batch)
    spec = jax.ShapeDtypeStruct((b, *tuple(patch_size), in_channels), dtype)
    fwd = jax.jit(make_predict_fn(model, variables))
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return _jex.export(fwd, **kwargs)(spec)


def export_lm_generate(
    model,
    variables,
    prompt_len: int,
    max_new_tokens: int,
    batch: Union[int, str] = "b",
    temperature: float = 1.0,
    top_k: int = 1,
    top_p: float = 0.0,
    platforms: Optional[Sequence[str]] = None,
) -> "_jex.Exported":
    """Export the LM's fused prefill + ``lax.scan`` decode as ONE artifact:
    ``tokens[b, prompt_len + max_new_tokens] = f(input_ids[b, prompt_len],
    seed[])``.

    The whole generation loop ships inside the StableHLO (the reference
    needs CUDA-graph capture at RUNTIME for the same effect,
    ``/root/reference/mamba/mamba_ssm/utils/generation.py:243-377``; here it
    is a deployable file). Sampling config is baked in; the PRNG key is
    built inside from the ``seed`` scalar so the artifact's ABI is plain
    integer arrays.
    """
    from mamba_unet_tpu.models.mamba_lm import generate  # lazy: avoid cycle

    def fn(input_ids, seed):
        return generate(model, variables, input_ids,
                        max_new_tokens=max_new_tokens,
                        temperature=temperature, top_k=top_k, top_p=top_p,
                        rng=jax.random.key(seed))

    if isinstance(batch, str):
        (b,) = _jex.symbolic_shape(batch)
    else:
        b = int(batch)
    ids_spec = jax.ShapeDtypeStruct((b, int(prompt_len)), jnp.int32)
    seed_spec = jax.ShapeDtypeStruct((), jnp.uint32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return _jex.export(jax.jit(fn), **kwargs)(ids_spec, seed_spec)


def save_exported(exported: "_jex.Exported", path: str) -> str:
    """Write the serialized artifact; returns ``path``."""
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_exported(path: str) -> "_jex.Exported":
    """Read an artifact written by :func:`save_exported`. Call it with
    ``jax.jit(loaded.call)(images)`` — jit caches per concrete batch size."""
    with open(path, "rb") as f:
        return _jex.deserialize(bytearray(f.read()))
