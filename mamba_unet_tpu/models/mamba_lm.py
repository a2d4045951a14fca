"""Mamba language model: MixerModel + MambaLMHeadModel + jitted generation.

Rebuild of ``/root/reference/mamba/mamba_ssm/models/mixer_seq_simple.py``
(MixerModel :83-171, MambaLMHeadModel :173-246: embedding -> n x Block ->
norm -> TIED lm_head, vocab padded to a multiple of 8) and
``mamba_ssm/utils/generation.py`` (top-k/top-p/temperature sampling :39-91,
decode loop :93-201). The reference's CUDA-graph capture machinery
(:243-377) is obviated by XLA: the per-token step is one compiled function
driven by ``lax.scan``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mamba_unet_tpu.nn.mamba1d import MambaBlock


class MambaLMHeadModel(nn.Module):
    vocab_size: int
    d_model: int = 768
    n_layer: int = 24
    d_state: int = 16
    rms_norm: bool = True
    norm_epsilon: float = 1e-5
    pad_vocab_size_multiple: int = 8
    bimamba_type: str = "none"
    scan_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @property
    def padded_vocab(self) -> int:
        m = self.pad_vocab_size_multiple
        return -(-self.vocab_size // m) * m

    def setup(self):
        self.embedding = nn.Embed(
            self.padded_vocab, self.d_model,
            embedding_init=nn.initializers.normal(0.02), dtype=self.dtype,
        )
        self.blocks = [
            MambaBlock(
                d_model=self.d_model, d_state=self.d_state,
                rms_norm=self.rms_norm, norm_epsilon=self.norm_epsilon,
                bimamba_type=self.bimamba_type, scan_impl=self.scan_impl,
                dtype=self.dtype, name=f"layers_{i}",
            )
            for i in range(self.n_layer)
        ]
        norm_cls = nn.RMSNorm if self.rms_norm else nn.LayerNorm
        self.norm_f = norm_cls(epsilon=self.norm_epsilon, dtype=self.dtype)

    def _head(self, hidden):
        # tied lm_head: logits = h @ E^T (mixer_seq_simple.py:231-233)
        return self.embedding.attend(hidden).astype(jnp.float32)

    def __call__(self, input_ids: jnp.ndarray, deterministic: bool = True):
        """input_ids (B, L) -> logits (B, L, padded_vocab)."""
        h = self.embedding(input_ids)
        for blk in self.blocks:
            h = blk(h, deterministic)
        return self._head(self.norm_f(h))

    def prefill(self, input_ids: jnp.ndarray):
        """(B, L) -> (last-token logits (B, V), caches tuple-of-layers)."""
        h = self.embedding(input_ids)
        caches = []
        for blk in self.blocks:
            h, conv_state, ssm_state = blk.forward_with_cache(h)
            caches.append((conv_state, ssm_state))
        logits = self._head(self.norm_f(h[:, -1:]))[:, 0]
        return logits, tuple(caches)

    def decode_step(self, token: jnp.ndarray, caches):
        """token (B,) + caches -> (logits (B, V), new caches)."""
        h = self.embedding(token[:, None])
        new = []
        for blk, (conv_state, ssm_state) in zip(self.blocks, caches):
            h, conv_state, ssm_state = blk.step(h, conv_state, ssm_state)
            new.append((conv_state, ssm_state))
        logits = self._head(self.norm_f(h))[:, 0]
        return logits, tuple(new)


def _sample_token(rng, logits, temperature=1.0, top_k=1, top_p=0.0):
    """Top-k / top-p / temperature sampling (generation.py:39-91).
    top_k=1 -> greedy."""
    if top_k == 1:
        return jnp.argmax(logits, axis=-1)
    logits = logits / max(temperature, 1e-6)
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p > 0.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest set with cumulative prob >= top_p
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1)


@partial(
    jax.jit,
    static_argnames=("model", "max_new_tokens", "temperature", "top_k",
                     "top_p"),
)
def _generate_compiled(model, variables, input_ids, rng, max_new_tokens,
                       temperature, top_k, top_p):
    """ONE compiled program: prefill + the whole lax.scan decode + concat.

    The reference needs CUDA-graph capture (generation.py:243-377) to remove
    per-token launch overhead; here the entire generation is a single XLA
    executable — one host->device dispatch per generate() call, and the
    per-token loop body is compiled once (keyed on the model definition and
    the static sampling config, so repeated calls hit the jit cache)."""
    sample = partial(_sample_token, temperature=temperature, top_k=top_k,
                     top_p=top_p)
    logits, caches = model.apply(variables, input_ids, method="prefill")

    def body(carry, step_rng):
        token, caches = carry
        logits, caches = model.apply(
            variables, token, caches, method="decode_step"
        )
        nxt = sample(step_rng, logits)
        return (nxt, caches), nxt

    first = sample(rng, logits)
    rngs = jax.random.split(rng, max_new_tokens - 1)
    (_, _), rest = jax.lax.scan(body, (first, caches), rngs)
    new = jnp.concatenate([first[None], rest], axis=0)  # (T, B)
    return jnp.concatenate([input_ids, new.T], axis=1)


def generate(
    model: MambaLMHeadModel,
    variables,
    input_ids: jnp.ndarray,
    max_new_tokens: int = 20,
    temperature: float = 1.0,
    top_k: int = 1,
    top_p: float = 0.0,
    rng: Optional[jax.Array] = None,
):
    """Fused prefill + scan decode. Returns (B, L + max_new_tokens).

    flax Modules hash by definition, so the underlying compiled program is
    reused across calls with the same (model, lengths, sampling config)."""
    rng = rng if rng is not None else jax.random.key(0)
    return _generate_compiled(model, variables, input_ids, rng,
                              max_new_tokens, temperature, top_k, top_p)
