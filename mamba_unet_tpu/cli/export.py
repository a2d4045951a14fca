"""Export CLI — serialize a trained snapshot to a serving artifact.

``python -m mamba_unet_tpu.cli.export --model unet --checkpoint snap/ \
    --out unet.jaxexport``

The artifact is a self-contained ``jax.export`` StableHLO function
(weights baked in, symbolic batch dimension): deployment loads it with
``mamba_unet_tpu.utils.export.load_exported`` (or plain jax) and needs no
model code or checkpoint tree — the serving path the torch reference lacks
(it re-instantiates the Python net and ``load_state_dict``s,
``/root/reference/code/test_2D_fully.py:148-153``).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def build_parser():
    p = argparse.ArgumentParser(description="Export a snapshot for serving")
    p.add_argument("--model", type=str, default="ViM_seg")
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--patch_size", type=int, nargs=2, default=[224, 224])
    p.add_argument("--in_channels", type=int, default=1)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="orbax snapshot dir (training --snapshot_dir); "
                        "omit to export the seed-0 initialization "
                        "(structure smoke only)")
    p.add_argument("--ckpt_name", type=str, default=None,
                   help="checkpoint name prefix (best/best2/best3; "
                        "default 'best' falling back to 'state')")
    p.add_argument("--out", type=str, required=True,
                   help="output artifact path")
    p.add_argument("--batch", type=str, default="b",
                   help="batch dimension: an integer pins it, anything "
                        "else exports a symbolic batch (default)")
    p.add_argument("--platforms", type=str, nargs="*", default=None,
                   help="lowering targets, e.g. --platforms tpu cpu "
                        "(default: current backend). Pallas scan paths are "
                        "TPU-only; use a CPU-servable scan_impl for cpu")
    p.add_argument("--bf16", action="store_true",
                   help="serve in bfloat16 compute (params stay fp32; "
                        "input/output ABI stays fp32) — faster on TPU at "
                        "bf16-level output tolerance")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.jax_cache")),
    )

    from mamba_unet_tpu.utils import load_model_snapshot
    from mamba_unet_tpu.utils.export import export_predict, save_exported

    if not args.checkpoint:
        logging.warning("no --checkpoint: exporting the seed-0 init")
    import jax.numpy as jnp

    model, variables = load_model_snapshot(
        args.model, args.num_classes, args.patch_size, args.in_channels,
        args.checkpoint, args.ckpt_name,
        dtype=jnp.bfloat16 if args.bf16 else None,
    )
    batch = int(args.batch) if args.batch.isdigit() else args.batch
    exported = export_predict(
        model, variables, args.patch_size, in_channels=args.in_channels,
        batch=batch, platforms=args.platforms,
    )
    path = save_exported(exported, args.out)
    logging.info(
        "exported %s -> %s (%.1f MiB, platforms=%s, in %s)",
        args.model, path, os.path.getsize(path) / 2**20,
        ",".join(exported.platforms), exported.in_avals,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
