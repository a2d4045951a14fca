"""Mamba LM generation benchmark: prefill + per-token decode timing.

The shape of ``/root/reference/mamba/benchmarks/benchmark_generation_mamba_simple.py``
(:60-88): time prompt prefill and the steady-state decode loop. The
reference's CUDA-graph capture is obviated by XLA: the decode step is one
compiled function driven by lax.scan.

Usage: python benchmarks/benchmark_generation.py [--d_model 768 --n_layer 24]
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--vocab", type=int, default=50277)
    p.add_argument("--d_model", type=int, default=768)
    p.add_argument("--n_layer", type=int, default=24)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--promptlen", type=int, default=100)
    p.add_argument("--genlen", type=int, default=100)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mamba_unet_tpu.models.mamba_lm import MambaLMHeadModel, generate

    model = MambaLMHeadModel(vocab_size=args.vocab, d_model=args.d_model,
                             n_layer=args.n_layer)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, args.vocab,
                                          size=(args.batch, args.promptlen))
    )
    variables = jax.jit(model.init)(jax.random.key(0), ids)

    t0 = time.perf_counter()
    out = generate(model, variables, ids, max_new_tokens=args.genlen, top_k=1)
    _ = np.asarray(out)
    t_total = time.perf_counter() - t0
    print(f"compile+first generate: {t_total:.2f}s")

    t0 = time.perf_counter()
    out = generate(model, variables, ids, max_new_tokens=args.genlen, top_k=1)
    _ = np.asarray(out)
    t = time.perf_counter() - t0
    print(
        f"prompt {args.promptlen} gen {args.genlen} bs {args.batch}: "
        f"{t * 1000:.1f} ms total, {t * 1000 / args.genlen:.2f} ms/token"
    )


if __name__ == "__main__":
    main()
