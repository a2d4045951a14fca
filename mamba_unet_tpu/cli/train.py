"""Training CLI — the single entry point replacing the reference's 18
``train_*.py`` scripts (SURVEY §2.11); the method flag selects the experiment
type. Defaults mirror ``train_fully_supervised_2D.py`` argparse.

Examples:
    python -m mamba_unet_tpu.cli.train --model unet --root_path ../data/ACDC
    python -m mamba_unet_tpu.cli.train --model ViM_seg --patch_size 224 224
    python -m mamba_unet_tpu.cli.train --model unet --synthetic --max_iterations 30
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import tempfile


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native Mamba-UNet training")
    p.add_argument("--root_path", type=str, default="../data/ACDC")
    p.add_argument("--exp", type=str, default="ACDC/Fully_Supervised")
    p.add_argument("--dataset", type=str, default="acdc",
                   choices=["acdc", "btcv"],
                   help="acdc = 2-D slice pipeline; btcv = 3-D volume "
                        "pipeline (MagicNet, train_Semi_MagicNet_3D_*)")
    p.add_argument("--model", type=str, default="unet")
    p.add_argument("--method", type=str, default="fully_supervised",
                   choices=["fully_supervised", "mean_teacher", "uamt",
                            "cross_teaching", "magicnet",
                            "contrastive_consistency", "mask_pretrain",
                            "mad_pretrain", "mad_finetune", "weak_scribble"])
    p.add_argument("--cfg", type=str, default=None,
                   help="yaml model config (configs/*.yaml)")
    p.add_argument("--opts", nargs="*", default=None,
                   help="config overrides: KEY VALUE pairs")
    p.add_argument("--cube_size", type=int, default=32)
    p.add_argument("--mask_recovery", action="store_true",
                   help="magicnet: add shuffle/mask recovery aux losses "
                        "(the _mask script variants; needs a model with "
                        "forward_mix_pos_mask, e.g. magicnet_2D_mask or "
                        "MambaUnetMask)")
    p.add_argument("--masked_rate", type=float, default=0.25)
    p.add_argument("--max_iterations", type=int, default=10000)
    p.add_argument("--batch_size", type=int, default=24)
    p.add_argument("--labeled_bs", type=int, default=8,
                   help="labeled half of each batch (semi-supervised methods)")
    p.add_argument("--labeled_num", type=int, default=140,
                   help="labeled patients (patients_to_slices table)")
    p.add_argument("--labeled_slices", type=int, default=None,
                   help="explicit labeled SLICE count (overrides the "
                        "patients_to_slices table; required granularity for "
                        "synthetic semi evidence runs)")
    p.add_argument("--base_lr", type=float, default=0.01)
    p.add_argument("--optimizer", type=str, default="sgd",
                   choices=["sgd", "adamw"],
                   help="sgd = the reference's poly-SGD; adamw = warmup "
                        "AdamW for FROM-SCRATCH ViM/ViT training (upstream "
                        "always warm-starts these from ImageNet weights; "
                        "from-scratch SGD collapses — docs/EVIDENCE.md)")
    p.add_argument("--weight_decay", type=float, default=None,
                   help="default: 1e-4 (sgd) / 0.05 (adamw)")
    p.add_argument("--model2", type=str, default=None,
                   help="second network for cross_teaching (default: same "
                        "architecture as --model, matching the reference "
                        "train_Semi_Mamba_UNet.py which builds both models "
                        "as ViM_seg; pass e.g. 'unet' to opt into a "
                        "CNN<->Mamba pairing); for weak_scribble the "
                        "default is ViT_seg (the paper's CNN+ViT+Mamba trio)")
    p.add_argument("--model3", type=str, default=None,
                   help="third network for weak_scribble (default ViM_seg; "
                        "WeakMambaUNet.pdf trains UNet + Swin-UNet + "
                        "Mamba-UNet jointly)")
    p.add_argument("--weak_pce_only", action="store_true",
                   help="weak_scribble ablation: scribble pCE alone, no "
                        "composite pseudo-label Dice (the paper's baseline)")
    p.add_argument("--patch_size", type=int, nargs="+", default=[256, 256],
                   help="2 ints (2-D) or 3 ints (3-D volumes)")
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--eval_every", type=int, default=200)
    p.add_argument("--consistency", type=float, default=0.1)
    p.add_argument("--consistency_rampup", type=float, default=200.0)
    p.add_argument("--snapshot_dir", type=str, default=None)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest periodic checkpoint in "
                        "--snapshot_dir (params+opt_state+step; "
                        "kill-and-resume, beyond the reference)")
    p.add_argument("--ckpt_every", type=int, default=3000,
                   help="periodic (resumable) checkpoint cadence")
    p.add_argument("--grad_accum_steps", type=int, default=1,
                   help="microbatches per optimizer update inside one jitted "
                        "step (activation memory scales with batch/k; the "
                        "reference's --accumulation-steps is parsed but dead "
                        "— here it is real). Single-model methods only; "
                        "multi-model trainers reject >1 loudly")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute dtype")
    p.add_argument("--scan_impl", type=str, default=None,
                   choices=["auto", "bidir", "tm", "pallas", "xla", "folded"],
                   help="selective-scan path override (ViM models; default "
                        "auto = bidir kernel on TPU)")
    p.add_argument("--drop_path", type=float, default=None,
                   help="stochastic depth rate override (ViM/ViT; the "
                        "reference default 0.2 assumes ImageNet warm-start — "
                        "use 0.0 when training from scratch)")
    p.add_argument("--pretrained_ckpt", type=str, default=None,
                   help="torch .pth to convert and load (utils.convert)")
    p.add_argument("--mad_model", type=str, default="unet",
                   help="denoiser model for mad_finetune (MAD_FineTuning.py)")
    p.add_argument("--seg_ckpt", type=str, default=None,
                   help="orbax snapshot dir to warm-start the seg model "
                        "(mad_finetune; loads the newest 'best' ckpt)")
    p.add_argument("--mad_ckpt", type=str, default=None,
                   help="orbax snapshot dir to warm-start the mad+den "
                        "denoisers (mad_finetune)")
    p.add_argument("--image_noise", type=float, default=1e-3,
                   help="one-hot epsilon for MAD label corruption")
    p.add_argument("--synthetic", action="store_true",
                   help="generate+use a synthetic ACDC-format dataset (smoke/bench)")
    p.add_argument("--synthetic_hard", action="store_true",
                   help="use the discriminating phantom (wobbly boundaries, "
                        "distractors, bias field, apical no-RV slices) — for "
                        "evidence runs where easy phantoms saturate")
    p.add_argument("--synthetic_spec", type=int, nargs=5, default=None,
                   metavar=("CASES", "SLICES", "VAL", "TEST", "SIZE"),
                   help="synthetic dataset scale: train cases, slices/case, "
                        "val vols, test vols, native slice size (default "
                        "8 8 2 0 <patch>; the full-protocol evidence run "
                        "uses the reference scale 140 9 20 40 256)")
    return p


def _make_tx(args):
    """--optimizer -> optax transform (None = the Trainer's reference
    poly-SGD). Applies to EVERY method, not just fully_supervised — a
    from-scratch ViM under any semi method collapses with poly-SGD exactly
    like the supervised case (docs/EVIDENCE.md)."""
    if args.optimizer == "adamw":
        from mamba_unet_tpu.train.optim import warmup_adamw

        return warmup_adamw(
            args.base_lr, args.max_iterations,
            weight_decay=(0.05 if args.weight_decay is None
                          else args.weight_decay),
        )
    return None


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(message)s",
        datefmt="%H:%M:%S",
        stream=sys.stdout,
    )

    # honor JAX_PLATFORMS even when a TPU plugin force-registers itself and
    # ignores the env var (the config update is the authoritative override)
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # persistent compile cache: full-model first compiles take minutes on a
    # remote-compile TPU; repeated runs must not pay twice
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.jax_cache")),
    )

    import jax.numpy as jnp

    from mamba_unet_tpu.data import (
        EpochShuffleSampler,
        Loader,
        RandomGenerator,
        SliceDataset,
        TwoStreamBatchSampler,
        VolumeDataset,
        make_synthetic_acdc,
        patients_to_slices,
    )
    from mamba_unet_tpu.models import net_factory
    from mamba_unet_tpu.train import TrainConfig, Trainer

    root = args.root_path
    if args.synthetic and args.dataset == "acdc":
        spec = args.synthetic_spec or [8, 8, 2, 0, args.patch_size[0]]
        cases, slices, n_val, n_test, size = spec
        hard_tag = "h" if args.synthetic_hard else ""
        scrib = args.method == "weak_scribble"
        if scrib:
            hard_tag += "w"
        root = os.path.join(
            tempfile.gettempdir(),
            f"synthetic_acdc_{cases}x{slices}v{n_val}t{n_test}s{size}{hard_tag}",
        )
        if not os.path.isfile(os.path.join(root, "train_slices.list")):
            make_synthetic_acdc(
                root,
                n_train_cases=cases,
                slices_per_case=slices,
                n_val_cases=n_val,
                n_test_cases=n_test,
                size=size,
                hard=args.synthetic_hard,
                scribble=scrib,
            )

    kwargs = {"num_classes": args.num_classes}
    if args.bf16:
        kwargs["dtype"] = jnp.bfloat16
    if args.drop_path is not None and args.model in ("ViM_seg", "ViT_seg",
                                                     "mambaunet",
                                                     "MambaUnetMask"):
        kwargs["drop_path_rate"] = args.drop_path
    if args.scan_impl is not None and args.model in ("ViM_seg", "mambaunet",
                                                     "MambaUnetMask",
                                                     "segmamba"):
        kwargs["scan_impl"] = args.scan_impl
    if args.method in ("magicnet", "mask_pretrain"):
        kwargs.update(cube_size=args.cube_size,
                      patch_size=args.patch_size[0])
    if args.method == "mad_pretrain":
        # the denoiser eats near-one-hot label stacks (MAD_Pretrain.py:
        # in_chns=num_classes)
        kwargs["in_chns"] = args.num_classes
    if args.cfg:
        from mamba_unet_tpu.utils.config import build_model_from_config, get_config

        model = build_model_from_config(
            get_config(args.cfg, args.opts), num_classes=args.num_classes,
            img_size=args.patch_size[0], drop_path_rate=args.drop_path,
        )
    else:
        model = net_factory(args.model, **kwargs)

    cfg = TrainConfig(
        base_lr=args.base_lr,
        max_iterations=args.max_iterations,
        batch_size=args.batch_size,
        patch_size=tuple(args.patch_size),
        num_classes=args.num_classes,
        eval_every=args.eval_every,
        seed=args.seed,
        snapshot_dir=args.snapshot_dir,
        resume=args.resume,
        ckpt_every=args.ckpt_every,
        grad_accum_steps=args.grad_accum_steps,
        in_channels=(args.num_classes if args.method == "mad_pretrain" else 1),
    )

    if args.dataset == "btcv":
        # --- the 3-D MagicNet volume pipeline ---------------------------
        # (train_Semi_MagicNet_3D_for_BTCV.py:114-393: TwoStream volume
        # batches, RandomCrop to patch, MagicNetTrainer, sliding-window
        # validation — assembled here end-to-end)
        from mamba_unet_tpu.data.btcv import (
            Compose3D,
            RandomCrop3D,
            VolumeTrainDataset,
            make_synthetic_btcv,
        )
        from mamba_unet_tpu.train.magicnet import MagicNetTrainer

        assert args.method == "magicnet", (
            "--dataset btcv drives the MagicNet 3-D pipeline; pass "
            "--method magicnet --model magicnet"
        )
        assert len(cfg.patch_size) == 3, "--patch_size needs 3 ints for btcv"
        if args.synthetic:
            root = os.path.join(tempfile.gettempdir(), "synthetic_btcv")
            if not os.path.isfile(os.path.join(root, "train.list")):
                make_synthetic_btcv(root, n_train=12, n_val=1,
                                    size=args.patch_size[0])
        train_ds = VolumeTrainDataset(
            root, "train.list",
            transform=Compose3D([RandomCrop3D(cfg.patch_size, seed=args.seed)]),
        )
        val_ds = VolumeTrainDataset(root, "val.list")
        n_labeled = (min(args.labeled_num, len(train_ds) - 1)
                     if not args.synthetic else max(2, len(train_ds) // 3))
        sampler = TwoStreamBatchSampler(
            range(n_labeled), range(n_labeled, len(train_ds)),
            cfg.batch_size, cfg.batch_size - args.labeled_bs, seed=args.seed,
        )
        trainer = MagicNetTrainer(model, cfg, labeled_bs=args.labeled_bs,
                                  cube_size=args.cube_size,
                                  mask_recovery=args.mask_recovery,
                                  masked_rate=args.masked_rate,
                                  tx=_make_tx(args))
        result = trainer.fit(Loader(train_ds, sampler), val_ds)
        logging.info("done: %d iterations, best val dice %.4f",
                     result["iterations"], result["best_dice"])
        # end-of-run protocol (train_Semi_MagicNet_3D_for_BTCV.py:328-337,
        # 416-417): full sliding-window eval of the SAVED best model + the
        # per-case metric array dump next to the snapshot
        trainer.final_validation(val_ds)
        return 0

    mad_transform = None
    if args.method == "mad_pretrain":
        from mamba_unet_tpu.data.mad_augment import MADPretrainTransform

        mad_transform = MADPretrainTransform(
            cfg.patch_size, num_classes=args.num_classes,
            error_val=args.image_noise, seed=args.seed,
        )
        train_ds = SliceDataset(root, transform=mad_transform)
    elif args.method == "mad_finetune":
        from mamba_unet_tpu.data.mad_augment import MADFineTuneTransform

        train_ds = SliceDataset(root, transform=MADFineTuneTransform(
            cfg.patch_size, num_classes=args.num_classes,
            error_val=args.image_noise, seed=args.seed,
        ))
    elif args.method == "weak_scribble":
        # scribble supervision (Weak-Mamba-UNet): the h5 'scribble' key is
        # the train label; rotation fills corners with the ignore index
        train_ds = SliceDataset(
            root, sup_type="scribble",
            transform=RandomGenerator(cfg.patch_size, seed=args.seed,
                                      label_cval=args.num_classes),
        )
    else:
        # --labeled_slices with fully_supervised = the labeled-only
        # baseline of the semi papers' tables (train on just that subset)
        n_sup = (args.labeled_slices
                 if args.method == "fully_supervised" else None)
        train_ds = SliceDataset(
            root, num=n_sup,
            transform=RandomGenerator(cfg.patch_size, seed=args.seed)
        )
    val_ds = VolumeDataset(root, "val")

    cta = cta_transform = None
    if args.method == "contrastive_consistency":
        from mamba_unet_tpu.data.cta_transform import CTATransform
        from mamba_unet_tpu.data.ctaugment import CTAugment

        cta = CTAugment(seed=args.seed)
        cta_transform = CTATransform(tuple(args.patch_size), cta,
                                     seed=args.seed)
        train_ds = SliceDataset(root, transform=cta_transform)

    if args.method == "weak_scribble":
        # every slice carries (sparse) labels — plain shuffle, no two-stream
        from mamba_unet_tpu.train.weak import WeakScribbleTrainer

        def _build_net(name):
            kw2 = {"num_classes": args.num_classes}
            if args.bf16:
                kw2["dtype"] = jnp.bfloat16
            if name == "ViT_seg":
                kw2["img_size"] = args.patch_size[0]
            if args.drop_path is not None and name in ("ViM_seg", "ViT_seg",
                                                       "mambaunet"):
                kw2["drop_path_rate"] = args.drop_path
            if args.scan_impl is not None and name in ("ViM_seg", "mambaunet"):
                kw2["scan_impl"] = args.scan_impl
            return net_factory(name, **kw2)

        sampler = EpochShuffleSampler(len(train_ds), cfg.batch_size,
                                      seed=args.seed)
        trainer = WeakScribbleTrainer(
            model, cfg,
            model2=_build_net(args.model2 or "ViT_seg"),
            model3=_build_net(args.model3 or "ViM_seg"),
            pce_only=args.weak_pce_only,
            tx=_make_tx(args),
        )
    elif args.method in ("fully_supervised", "mask_pretrain", "mad_pretrain",
                         "mad_finetune"):
        sampler = EpochShuffleSampler(len(train_ds), cfg.batch_size, seed=args.seed)
        if args.method == "mask_pretrain":
            from mamba_unet_tpu.train.mask_pretrain import MaskPretrainTrainer

            trainer = MaskPretrainTrainer(model, cfg, cube_size=args.cube_size)
        elif args.method == "mad_pretrain":
            from mamba_unet_tpu.train.mad import MADPretrainTrainer

            trainer = MADPretrainTrainer(model, cfg, transform=mad_transform)
        elif args.method == "mad_finetune":
            from mamba_unet_tpu.train.mad import MADFineTuneTrainer
            from mamba_unet_tpu.utils import latest_step, restore_checkpoint

            mad_model = net_factory(args.mad_model,
                                    num_classes=args.num_classes,
                                    in_chns=args.num_classes)
            trainer = MADFineTuneTrainer(model, mad_model, cfg)

            def _warm(st, ckpt_dir):
                """Load the newest best/periodic params into a TrainState
                (MAD_FineTuning.py:60-95 warm-start)."""
                for name in ("best", "state"):
                    step = latest_step(ckpt_dir, name=name)
                    if step is not None:
                        tgt = {"params": st.params,
                               "batch_stats": st.batch_stats}
                        got = restore_checkpoint(ckpt_dir, step, tgt, name=name)
                        logging.info("warm-start %s_%d from %s",
                                     name, step, ckpt_dir)
                        return st.replace(params=got["params"],
                                          batch_stats=got["batch_stats"])
                logging.warning("no checkpoint found in %s", ckpt_dir)
                return st

            ms = trainer.mad_state
            if args.seg_ckpt:
                ms = ms.replace(seg=_warm(ms.seg, args.seg_ckpt))
                trainer.state = ms.seg
            if args.mad_ckpt:
                ms = ms.replace(mad=_warm(ms.mad, args.mad_ckpt),
                                den=_warm(ms.den, args.mad_ckpt))
            trainer.mad_state = ms
        else:
            trainer = Trainer(model, cfg, tx=_make_tx(args))
    else:
        if args.labeled_slices is not None:
            n_labeled = max(2, args.labeled_slices)
        elif args.synthetic:
            n_labeled = max(2, len(train_ds) // 4)
        else:
            n_labeled = patients_to_slices("ACDC", args.labeled_num)
        n_labeled = min(n_labeled, len(train_ds) - 1)
        sampler = TwoStreamBatchSampler(
            range(n_labeled),
            range(n_labeled, len(train_ds)),
            cfg.batch_size,
            cfg.batch_size - args.labeled_bs,
            seed=args.seed,
        )
        if args.method == "magicnet":
            from mamba_unet_tpu.train.magicnet import MagicNetTrainer

            trainer = MagicNetTrainer(model, cfg, labeled_bs=args.labeled_bs,
                                      cube_size=args.cube_size,
                                      mask_recovery=args.mask_recovery,
                                      masked_rate=args.masked_rate,
                                      tx=_make_tx(args))
        elif args.method == "contrastive_consistency":
            from mamba_unet_tpu.train.contrastive_cc import (
                ContrastiveConsistencyTrainer,
            )

            trainer = ContrastiveConsistencyTrainer(
                model, cfg, labeled_bs=args.labeled_bs, tx=_make_tx(args),
            )
        else:
            from mamba_unet_tpu.train.methods import build_semi_method

            model2 = None
            if args.method == "cross_teaching" and args.model2:
                # default (no --model2): a second instance of the SAME
                # architecture, as in the reference train_Semi_Mamba_UNet.py
                # (both model1 and model2 are ViM_seg there; a CNN partner
                # appears only in its commented-out code). --model2 unet
                # opts into the CNN<->Mamba pairing.
                kw2 = {"num_classes": args.num_classes}
                if args.bf16:
                    kw2["dtype"] = jnp.bfloat16
                model2 = net_factory(args.model2, **kw2)
            trainer = build_semi_method(args, model, cfg, tx=_make_tx(args),
                                        model2=model2)

    if args.pretrained_ckpt:
        # the reference's load_from warm-start (vision_mamba.py:48-83)
        from mamba_unet_tpu.utils.convert import (
            convert_vssm,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(args.pretrained_ckpt)
        params = dict(trainer.state.params)
        root_key = next((k for k in ("vssm", "swin_unet") if k in params), None)
        sub = params[root_key] if root_key else params
        new_sub, report = convert_vssm(sd, sub, mirror_decoder=True)
        logging.info("pretrained: loaded %d tensors, %d missing, %d shape-skipped",
                     len(report["loaded"]), len(report["missing"]),
                     len(report["shape_skipped"]))
        if root_key:
            params[root_key] = new_sub
        else:
            params = new_sub
        trainer.state = trainer.state.replace(params=params)

    loader = Loader(train_ds, sampler)
    if args.method == "contrastive_consistency":
        result = trainer.fit(loader, val_ds, cta=cta,
                             cta_transform=cta_transform)
    else:
        result = trainer.fit(loader, val_ds)
    logging.info(
        "done: %d iterations, best val dice %.4f",
        result["iterations"], result["best_dice"],
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
