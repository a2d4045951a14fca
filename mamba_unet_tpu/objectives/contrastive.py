"""Contrastive loss family for the contrastive-consistency trainers.

Refs (``/root/reference/code/utils/losses.py``): ``ConLoss`` (patch-NCE,
:450-504), ``contrastive_loss_sup`` (:646-698 — the live duplicate; identical
math on projector features), ``info_nce_loss`` (:614-644), ``MocoLoss``
(dict-queue with 1056 cap, :700-763) and ``MocoLoss_list`` (:822-878).
``ConLoss_queue`` (:765-819) references an undefined attribute upstream
(latent crash); the working formulation here matches its evident intent
(patch-NCE against queued keys).

Functional jnp; the MoCo queue is a host-side OrderedDict keyed by dataset
index (non-jittable by nature — called eagerly like the reference).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_patches(feat: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) or (B, N, C) -> (B, np, dim), L1-normalized along dim
    (the reference normalizes with p=1 — kept faithfully)."""
    if feat.ndim == 4:
        b, h, w, c = feat.shape
        feat = feat.reshape(b, h * w, c)
    norm = jnp.sum(jnp.abs(feat), axis=-1, keepdims=True)
    return feat / jnp.maximum(norm, 1e-12)


def con_loss(feat_q: jnp.ndarray, feat_k: jnp.ndarray,
             temperature: float = 0.07) -> jnp.ndarray:
    """Patch-NCE: each patch's positive is the SAME patch in feat_k; negatives
    are the other patches of the same sample."""
    q = _flatten_patches(feat_q)
    k = jax.lax.stop_gradient(_flatten_patches(feat_k))
    b, n, d = q.shape
    l_pos = jnp.sum(q * k, axis=-1).reshape(-1, 1)          # (b*n, 1)
    l_neg = jnp.einsum("bnd,bmd->bnm", q, k)                # (b, n, n)
    eye = jnp.eye(n, dtype=bool)[None]
    l_neg = jnp.where(eye, -jnp.inf, l_neg).reshape(-1, n)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    return -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[:, 0])


# the reference defines contrastive_loss_sup twice; the surviving definition
# is the same patch-NCE math
contrastive_loss_sup = con_loss


def info_nce_loss(feats1: jnp.ndarray, feats2: jnp.ndarray) -> jnp.ndarray:
    """SimCLR-style NCE where example i's positive sits n/2 away (:614-644)."""
    a = feats1 / jnp.maximum(jnp.linalg.norm(feats1, axis=-1, keepdims=True), 1e-12)
    b = feats2 / jnp.maximum(jnp.linalg.norm(feats2, axis=-1, keepdims=True), 1e-12)
    sim = a @ b.T
    n = sim.shape[0]
    self_mask = jnp.eye(n, dtype=bool)
    sim = jnp.where(self_mask, -9e15, sim)
    pos_mask = jnp.roll(self_mask, shift=n // 2, axis=0)
    sim = sim / 0.07
    nll = -sim[pos_mask] + jax.nn.logsumexp(sim, axis=-1)
    return jnp.mean(nll)


def _cos(a, b, axis=-1):
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=axis, keepdims=True), 1e-12)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=axis, keepdims=True), 1e-12)
    return jnp.sum(an * bn, axis=axis)


class MocoLoss:
    """MoCo-style loss with a host-side key queue keyed by sample index.

    forward(feat_q (B, ...), feat_k (B, ...), idx (B,)) — positives are the
    matching keys, negatives the queued keys (current batch's stale entries
    evicted first); queue capped at 1056 (losses.py:752-756)."""

    def __init__(self, temperature: float = 0.07, use_queue: bool = True,
                 max_entries: int = 1056):
        self.temperature = temperature
        self.use_queue = use_queue
        self.max_entries = max_entries
        self.queue: "OrderedDict[str, np.ndarray]" = OrderedDict()

    def __call__(self, feat_q: jnp.ndarray, feat_k: jnp.ndarray, idx) -> jnp.ndarray:
        b = feat_q.shape[0]
        q = feat_q.reshape(b, -1)
        k = jax.lax.stop_gradient(feat_k.reshape(b, -1))
        idx = np.asarray(idx).reshape(-1)

        l_pos = _cos(q, k).reshape(-1, 1)
        if not self.use_queue or not self.queue:
            l_neg = _cos(q[:, None, :], k[None, :, :])
        else:
            for i in range(b):
                self.queue.pop(str(int(idx[i])), None)
            if self.queue:
                keys = jnp.asarray(np.stack(list(self.queue.values())))
                l_neg = _cos(q[:, None, :], keys[None, :, :])
            else:
                l_neg = _cos(q[:, None, :], k[None, :, :])
        logits = jnp.concatenate([l_pos, l_neg], axis=1) / self.temperature
        loss = -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[:, 0])

        if self.use_queue:
            k_host = np.asarray(k)
            for i in range(b):
                self.queue[str(int(idx[i]))] = k_host[i]
                if len(self.queue) > self.max_entries:
                    self.queue.popitem(last=False)
        return loss


def con_loss_queue(feat_q, queue_keys, feat_k_pos, temperature: float = 0.07):
    """Patch-NCE against an external key bank: positive = matching feat_k_pos,
    negatives = queue_keys (working form of losses.py:765-819)."""
    b = feat_q.shape[0]
    q = feat_q.reshape(b, -1)
    kp = jax.lax.stop_gradient(feat_k_pos.reshape(b, -1))
    bank = jax.lax.stop_gradient(queue_keys.reshape(queue_keys.shape[0], -1))
    l_pos = _cos(q, kp).reshape(-1, 1)
    l_neg = _cos(q[:, None, :], bank[None, :, :])
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    return -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[:, 0])
