"""Test/inference CLI — the ``test_2D_fully.py`` equivalent.

Per test case: slice inference at the training patch size (order-0 zoom in
and out), per-class (dice, hd95, asd), mean table; optional nii.gz export
with spacing (1, 1, 10) (ref :119-128) and optional write-back of the
prediction into the case h5 (the MAD data-generation path, ref :31-65
``pred_vim_224``). ``--denoiser_model``/``--denoiser_checkpoint`` enable
the stacked seg->denoiser protocol (``Inference_seg_ema_model`` /
``Inference_mad_model``, ref :172-308): argmax(den(softmax(seg(x)))), with
both raw-seg and denoised metric tables reported.
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
    p.add_argument("--denoiser_model", type=str, default=None,
                   help="stacked seg->denoiser inference (the reference's "
                        "Inference_seg_ema_model / Inference_mad_model, "
                        "test_2D_fully.py:172-308): a second model that eats "
                        "softmax(seg(x)); reports raw-seg AND denoised "
                        "metrics")
    p.add_argument("--denoiser_checkpoint", type=str, default=None,
                   help="orbax snapshot dir of the denoiser (e.g. a "
                        "mad_pretrain run)")
    p.add_argument("--ckpt_name", type=str, default=None,
                   help="checkpoint name prefix to load from the MAIN "
                        "snapshot only (default: 'best', falling back to "
                        "'state'); multi-model trainers save per-network "
                        "bests as best/best2/best3. The denoiser snapshot "
                        "loads its own 'best' (fallback 'state') unless "
                        "--denoiser_ckpt_name says otherwise")
    p.add_argument("--denoiser_ckpt_name", type=str, default=None,
                   help="checkpoint name prefix for the DENOISER snapshot "
                        "(e.g. best3 to pick the fine-tuned 'ema' denoiser "
                        "out of a mad_finetune snapshot, whose trio saves as "
                        "best=seg / best2=mad / best3=den)")
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
    from mamba_unet_tpu.data import VolumeDataset
    from mamba_unet_tpu.data.nifti import write_nifti
    from mamba_unet_tpu.eval.inference import test_single_volume
    from mamba_unet_tpu.eval.metrics import asd, dice_binary, hd95
    from mamba_unet_tpu.utils import load_model_snapshot
    from scipy.ndimage import zoom as nd_zoom

    def build(name, in_ch, ckpt, ckpt_name=None):
        """Build a net + load its snapshot. ``ckpt_name`` selects a member
        of THIS snapshot only — ``--ckpt_name best2`` must not leak into the
        denoiser load (which always takes its own 'best'/'state')."""
        return load_model_snapshot(
            name, args.num_classes, args.patch_size, in_ch, ckpt, ckpt_name
        )

    model, variables = build(args.model, 1, args.checkpoint, args.ckpt_name)
    den_model = den_variables = None
    if args.denoiser_model:
        den_model, den_variables = build(
            args.denoiser_model, args.num_classes, args.denoiser_checkpoint,
            args.denoiser_ckpt_name)

    def _main(out):
        return out[0] if isinstance(out, (tuple, list)) else out

    from mamba_unet_tpu.ops.selective_scan_persistent import inference_scan

    @jax.jit
    def fwd(x):
        with inference_scan():  # no-grad test: persistent scan forward
            return _main(model.apply(variables, x))

    @jax.jit
    def fwd_both(x):
        # the reference stacking: argmax(den(softmax(seg(x)))) —
        # val_2D.test_single_volume_for_trainLabel. One seg pass feeds both
        # the raw-seg and the denoised metric tables (the seg forward
        # dominates; running it twice per case doubled the test wall-clock).
        with inference_scan():
            seg = _main(model.apply(variables, x))
            den = _main(den_model.apply(den_variables,
                                        jax.nn.softmax(seg, axis=-1)))
        return seg, den

    def case_metrics(pred, label):
        metrics = []
        for c in range(1, args.num_classes):
            p, g = pred == c, label == c
            if p.sum() > 0 and g.sum() > 0:
                metrics.append((dice_binary(p, g), hd95(p, g), asd(p, g)))
            else:
                metrics.append((0.0, 0.0, 0.0))
        return metrics

    ds = VolumeDataset(args.root_path, args.split)
    per_case, per_case_den = [], []
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
        if den_model is not None:
            seg_logits, den_logits = fwd_both(slices)
            logits = np.asarray(seg_logits)[:z]
            den_logits = np.asarray(den_logits)[:z]
        else:
            logits = np.asarray(fwd(slices))[:z]
            den_logits = None
        pred_small = np.argmax(logits, axis=-1)

        def upsample(pred_s):
            return np.stack([
                nd_zoom(pred_s[k], (xx / ps[0], yy / ps[1]), order=0)
                for k in range(z)
            ])

        pred = upsample(pred_small)
        metrics = case_metrics(pred, label)
        per_case.append(metrics)
        logging.info("%s: dice %s", case["case"],
                     [round(m[0], 4) for m in metrics])

        if den_logits is not None:
            den_pred = upsample(np.argmax(den_logits, axis=-1))
            dm = case_metrics(den_pred, label)
            per_case_den.append(dm)
            logging.info("%s (denoised): dice %s", case["case"],
                         [round(m[0], 4) for m in dm])

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
    out = {
        "per_case": arr,
        "mean_by_class": mean_by_class,
        "mean": overall,
    }
    if per_case_den:
        darr = np.asarray(per_case_den)
        dmean_by_class = darr.mean(axis=0)
        doverall = darr.mean(axis=(0, 1))
        for c in range(darr.shape[1]):
            logging.info("class %d (denoised): dice %.4f hd95 %.4f asd %.4f",
                         c + 1, *dmean_by_class[c])
        logging.info("MEAN (denoised): dice %.4f hd95 %.4f asd %.4f",
                     *doverall)
        out.update(per_case_denoised=darr,
                   mean_by_class_denoised=dmean_by_class,
                   mean_denoised=doverall)
    return out


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s",
                        datefmt="%H:%M:%S", stream=sys.stdout)
    run_inference(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
