"""LM evaluation harness for the Mamba language model.

TPU-native analog of ``/root/reference/mamba/evals/lm_harness_eval.py``,
which wraps ``MambaLMHeadModel`` as an lm-evaluation-harness ``HFLM`` model
(``MambaEvalWrapper``) and defers everything to ``lm_eval``'s CLI. Neither
``lm_eval`` nor hub access exists in this environment, so the harness's two
request primitives are implemented directly with jitted scoring:

  * ``loglikelihood(context_ids, continuation_ids)`` — the sum of
    continuation-token log-probs given the context, plus the harness's
    ``is_greedy`` exact-match flag (lm_eval.api.model.LM.loglikelihood
    semantics).
  * multiple-choice accuracy (``acc``: best raw loglikelihood; ``acc_norm``:
    best per-token-normalized, the harness's byte/token-length norm) and
    lambada-style last-word accuracy + perplexity.

Requests are padded to shape buckets so the scoring function compiles once
per bucket, and a whole batch of (context, continuation) pairs is scored in
ONE device call. If ``lm_eval`` IS importable, ``make_harness_adapter``
returns an ``LM`` subclass delegating to the same scorer.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import numpy as np


def _bucket(n: int, sizes=(32, 64, 128, 256, 512, 1024, 2048)) -> int:
    for s in sizes:
        if n <= s:
            return s
    return -(-n // 1024) * 1024


class LMEvaluator:
    """Batched, bucketed loglikelihood scoring of a flax MambaLMHeadModel."""

    def __init__(self, model, variables, batch_size: int = 8):
        import jax
        import jax.numpy as jnp

        self.model = model
        self.variables = variables
        self.batch_size = batch_size

        @partial(jax.jit, static_argnames=("model",))
        def _score(model, variables, ids, cont_mask):
            """ids (B, L) int32, cont_mask (B, L) — 1 on continuation tokens.
            Returns (sum logprob of continuation, greedy-match flag) per row.
            Token t is predicted from logits at t-1."""
            logits = model.apply(variables, ids)  # (B, L, V)
            logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
            tgt = ids[:, 1:]
            m = cont_mask[:, 1:].astype(jnp.float32)
            tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
            ll = jnp.sum(tok_lp * m, axis=-1)
            greedy = jnp.argmax(logp, axis=-1) == tgt
            is_greedy = jnp.all(jnp.where(m > 0, greedy, True), axis=-1)
            return ll, is_greedy

        self._score = _score

    def loglikelihood(
        self, requests: Sequence[Tuple[Sequence[int], Sequence[int]]]
    ) -> List[Tuple[float, bool]]:
        """requests: [(context_ids, continuation_ids)]. Returns
        [(loglikelihood, is_greedy)] in order, batched per length bucket."""
        import jax.numpy as jnp

        order = sorted(range(len(requests)),
                       key=lambda i: len(requests[i][0]) + len(requests[i][1]))
        out: List = [None] * len(requests)
        bs = self.batch_size
        for s in range(0, len(order), bs):
            idxs = order[s : s + bs]
            L = _bucket(max(len(requests[i][0]) + len(requests[i][1])
                            for i in idxs))
            ids = np.zeros((bs, L), np.int32)
            mask = np.zeros((bs, L), np.int32)
            for r, i in enumerate(idxs):
                ctx, cont = requests[i]
                seq = list(ctx) + list(cont)
                ids[r, : len(seq)] = seq
                mask[r, len(ctx) : len(seq)] = 1
            ll, greedy = self._score(
                self.model, self.variables, jnp.asarray(ids), jnp.asarray(mask)
            )
            ll, greedy = np.asarray(ll), np.asarray(greedy)
            for r, i in enumerate(idxs):
                out[i] = (float(ll[r]), bool(greedy[r]))
        return out

    # --- task drivers ----------------------------------------------------
    def multiple_choice(self, docs) -> dict:
        """docs: [{"context": ids, "choices": [ids...], "gold": int}].
        Returns {"acc", "acc_norm"} (lm-harness multiple-choice metrics)."""
        reqs, spans = [], []
        for d in docs:
            start = len(reqs)
            reqs.extend((d["context"], c) for c in d["choices"])
            spans.append((start, len(reqs)))
        scores = self.loglikelihood(reqs)
        acc = acc_norm = 0
        for d, (start, stop) in zip(docs, spans):
            lls = [scores[j][0] for j in range(start, stop)]
            lens = [max(len(c), 1) for c in d["choices"]]
            acc += int(int(np.argmax(lls)) == d["gold"])
            acc_norm += int(
                int(np.argmax([l / n for l, n in zip(lls, lens)])) == d["gold"]
            )
        n = max(len(docs), 1)
        return {"acc": acc / n, "acc_norm": acc_norm / n}

    def generate_until(
        self,
        requests: Sequence[Tuple[Sequence[int], dict]],
    ) -> List[List[int]]:
        """Token-level analog of the harness's ``generate_until``
        (``/root/reference/mamba/evals/lm_harness_eval.py:23-40`` inherits it
        from HFLM): each request is ``(context_ids, gen_kwargs)`` with
        ``gen_kwargs`` keys ``until`` (list of stop-token-id sequences),
        ``max_gen_toks`` (default 128), ``temperature``/``top_k``/``top_p``
        (default greedy). Returns the generated token ids per request,
        truncated BEFORE the first stop-sequence occurrence.

        Requests run one at a time at their NATIVE context length: an SSM
        cannot left-pad — pad tokens would flow through the recurrent state
        and corrupt it. Compilation is amortized by jit's shape cache
        instead (one compile per distinct (context_len, max_new) pair, hits
        thereafter), backed by the persistent compilation cache on disk."""
        import jax.numpy as jnp

        from mamba_unet_tpu.models.mamba_lm import generate

        out: List[List[int]] = []
        for ctx, kw in requests:
            kw = dict(kw or {})
            max_new = int(kw.get("max_gen_toks", 128))
            ids = jnp.asarray([list(ctx)], jnp.int32)
            full = generate(
                self.model, self.variables, ids,
                max_new_tokens=max_new,
                temperature=float(kw.get("temperature", 1.0)),
                top_k=int(kw.get("top_k", 1)),
                top_p=float(kw.get("top_p", 0.0)),
            )
            gen = np.asarray(full)[0, len(ctx):].tolist()
            for stop in kw.get("until", []) or []:
                stop = list(stop)
                for i in range(len(gen) - len(stop) + 1):
                    if gen[i : i + len(stop)] == stop:
                        gen = gen[:i]
                        break
            out.append(gen)
        return out

    def lambada(self, docs) -> dict:
        """docs: [{"context": ids, "target": ids}] (the final word's tokens).
        Returns {"acc": greedy exact-match rate, "ppl": e^(-mean ll/token)}."""
        reqs = [(d["context"], d["target"]) for d in docs]
        scores = self.loglikelihood(reqs)
        n_tok = sum(len(d["target"]) for d in docs)
        total_ll = sum(s[0] for s in scores)
        acc = sum(int(s[1]) for s in scores) / max(len(docs), 1)
        return {"acc": acc, "ppl": float(np.exp(-total_ll / max(n_tok, 1)))}


def make_harness_adapter(model, variables, batch_size: int = 8,
                         tokenizer=None):
    """If ``lm_eval`` is installed, return an ``LM`` subclass instance
    delegating to LMEvaluator (the MambaEvalWrapper role); else raise
    ImportError — callers gate on availability.

    ``tokenizer`` (optional, needs .encode/.decode) enables string-level
    ``generate_until`` requests as the harness issues them; without it,
    requests must already carry token ids."""
    from lm_eval.api.model import LM  # noqa: F401 (optional dep)

    ev = LMEvaluator(model, variables, batch_size)

    class MambaJaxLM(LM):
        def loglikelihood(self, requests):
            return ev.loglikelihood(
                [(r.args[0], r.args[1]) for r in requests]
            )

        def loglikelihood_rolling(self, requests):
            return [ev.loglikelihood([((), r.args[0])])[0] for r in requests]

        def generate_until(self, requests):
            outs = []
            for r in requests:
                ctx, kw = r.args[0], dict(r.args[1] or {})
                if tokenizer is not None and isinstance(ctx, str):
                    ids = tokenizer.encode(ctx)
                    until = kw.get("until", []) or []
                    kw["until"] = [tokenizer.encode(u) for u in until]
                    gen, = ev.generate_until([(ids, kw)])
                    text = tokenizer.decode(gen)
                    # token-boundary stops can leave a partial match — cut
                    # again at the string level (HFLM does the same)
                    for u in until:
                        idx = text.find(u)
                        if idx >= 0:
                            text = text[:idx]
                    outs.append(text)
                else:
                    gen, = ev.generate_until([(ctx, kw)])
                    outs.append(gen)
            return outs

    return MambaJaxLM()
