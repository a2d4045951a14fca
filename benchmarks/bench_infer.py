"""Serving-path inference throughput: direct jit vs the exported artifact.

Validates that the `jax.export` StableHLO artifact (utils/export.py) serves
at the SAME throughput as the in-process jitted forward — the artifact is
the same compiled program, so any gap would be calling-convention overhead.

    python benchmarks/bench_infer.py [--model ViM_seg] [--batch 24]

Prints one JSON line: direct and artifact slices/s (median of 3 chained
20-batch windows, host-transfer synced), and the overhead percentage.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def _measure(fn, x, n_windows=3, n_steps=20):
    out = fn(x)
    _ = float(jnp.sum(out))  # sync through the tunnel (host transfer)
    rates = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            out = fn(x)
        _ = float(jnp.sum(out))
        dt = time.perf_counter() - t0
        rates.append(n_steps * x.shape[0] / dt)
    return float(np.median(rates))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="ViM_seg")
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--patch", type=int, default=224)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute serving (fp32 params/ABI)")
    args = p.parse_args()

    from mamba_unet_tpu.utils import load_model_snapshot
    from mamba_unet_tpu.utils.export import (
        export_predict,
        load_exported,
        make_predict_fn,
        save_exported,
    )

    model, variables = load_model_snapshot(
        args.model, 4, (args.patch, args.patch), 1, args.checkpoint,
        dtype=jnp.bfloat16 if args.bf16 else None)
    x = jnp.asarray(
        np.random.default_rng(0).normal(
            size=(args.batch, args.patch, args.patch, 1)), jnp.float32)

    direct = jax.jit(make_predict_fn(model, variables))
    direct_rate = _measure(direct, x)

    exported = export_predict(
        model, variables, (args.patch, args.patch), batch=args.batch)
    path = save_exported(exported, "/tmp/bench_infer.jaxexport")
    served = jax.jit(load_exported(path).call)
    served_rate = _measure(served, x)

    print(json.dumps({
        "model": args.model,
        "batch": args.batch,
        "direct_infer_slices_per_sec": round(direct_rate, 2),
        "artifact_infer_slices_per_sec": round(served_rate, 2),
        "artifact_overhead_pct": round(
            100.0 * (1 - served_rate / direct_rate), 2),
    }))


if __name__ == "__main__":
    main()
