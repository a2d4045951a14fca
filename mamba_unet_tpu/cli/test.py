"""Test/inference CLI — the ``test_2D_fully.py`` equivalent.

Per test case: slice inference at the training patch size (order-0 zoom in
and out), per-class (dice, hd95, asd), mean table; optional nii.gz export
with spacing (1, 1, 10) (ref :119-128) and optional write-back of the
prediction into the case h5 (the MAD data-generation path, ref :31-65
``pred_vim_224``).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="TPU-native Mamba-UNet testing")
    p.add_argument("--root_path", type=str, default="../data/ACDC")
    p.add_argument("--model", type=str, default="ViM_seg")
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--patch_size", type=int, nargs=2, default=[224, 224])
    p.add_argument("--checkpoint", type=str, required=False, default=None,
                   help="orbax checkpoint dir (snapshot_dir of training)")
    p.add_argument("--split", type=str, default="test", choices=["val", "test"])
    p.add_argument("--save_nii_dir", type=str, default=None)
    p.add_argument("--write_pred_key", type=str, default=None,
                   help="write predictions back into the case h5 under this key")
    return p


def run_inference(args) -> dict:
    import h5py
    import jax

    # honor JAX_PLATFORMS even when a TPU plugin force-registers itself
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.jax_cache")),
    )
    import jax.numpy as jnp

    from mamba_unet_tpu.data import VolumeDataset
    from mamba_unet_tpu.data.nifti import write_nifti
    from mamba_unet_tpu.eval.inference import test_single_volume
    from mamba_unet_tpu.eval.metrics import asd, dice_binary, hd95
    from mamba_unet_tpu.models import net_factory
    from mamba_unet_tpu.utils import latest_step, restore_checkpoint
    from scipy.ndimage import zoom as nd_zoom

    model = net_factory(args.model, num_classes=args.num_classes)
    sample = jnp.zeros((1, *args.patch_size, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), sample)
    if args.checkpoint:
        step = latest_step(args.checkpoint, "best")
        name = "best" if step is not None else "state"
        step = step if step is not None else latest_step(args.checkpoint)
        assert step is not None, f"no checkpoint under {args.checkpoint}"
        target = {"params": variables["params"],
                  "batch_stats": variables.get("batch_stats", {})}
        restored = restore_checkpoint(args.checkpoint, step, target, name)
        variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]

    @jax.jit
    def fwd(x):
        out = model.apply(variables, x)
        return out[0] if isinstance(out, (tuple, list)) else out

    ds = VolumeDataset(args.root_path, args.split)
    per_case = []
    for i in range(len(ds)):
        case = ds[i]
        image, label = case["image"], case["label"]
        z, xx, yy = image.shape
        ps = tuple(args.patch_size)
        slices = np.stack([
            nd_zoom(image[k], (ps[0] / xx, ps[1] / yy), order=0) for k in range(z)
        ]).astype(np.float32)[..., None]
        pad = (-z) % 8
        if pad:
            slices = np.concatenate(
                [slices, np.zeros((pad, *slices.shape[1:]), np.float32)]
            )
        logits = np.asarray(fwd(slices))[:z]
        pred_small = np.argmax(logits, axis=-1)
        pred = np.stack([
            nd_zoom(pred_small[k], (xx / ps[0], yy / ps[1]), order=0)
            for k in range(z)
        ])

        metrics = []
        for c in range(1, args.num_classes):
            p, g = pred == c, label == c
            if p.sum() > 0 and g.sum() > 0:
                metrics.append((dice_binary(p, g), hd95(p, g), asd(p, g)))
            else:
                metrics.append((0.0, 0.0, 0.0))
        per_case.append(metrics)
        logging.info("%s: dice %s", case["case"],
                     [round(m[0], 4) for m in metrics])

        if args.save_nii_dir:
            os.makedirs(args.save_nii_dir, exist_ok=True)
            write_nifti(
                os.path.join(args.save_nii_dir, f"{case['case']}_pred.nii.gz"),
                pred.astype(np.uint8).transpose(1, 2, 0), spacing=(1, 1, 10),
            )
            write_nifti(
                os.path.join(args.save_nii_dir, f"{case['case']}_gt.nii.gz"),
                label.astype(np.uint8).transpose(1, 2, 0), spacing=(1, 1, 10),
            )
        if args.write_pred_key:
            path = os.path.join(args.root_path, "data", f"{case['case']}.h5")
            with h5py.File(path, "a") as f:
                if args.write_pred_key in f:
                    del f[args.write_pred_key]
                f.create_dataset(args.write_pred_key, data=pred_small)

    arr = np.asarray(per_case)  # (cases, classes-1, 3)
    mean_by_class = arr.mean(axis=0)
    overall = arr.mean(axis=(0, 1))
    for c in range(arr.shape[1]):
        logging.info("class %d: dice %.4f hd95 %.4f asd %.4f", c + 1,
                     *mean_by_class[c])
    logging.info("MEAN: dice %.4f hd95 %.4f asd %.4f", *overall)
    return {
        "per_case": arr,
        "mean_by_class": mean_by_class,
        "mean": overall,
    }


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s",
                        datefmt="%H:%M:%S", stream=sys.stdout)
    run_inference(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
