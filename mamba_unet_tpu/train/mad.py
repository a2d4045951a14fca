"""MAD trainers: label-denoiser pretraining and the stacked fine-tuning.

Refs: ``/root/reference/code/MAD_Pretrain.py`` (UNet with in_chns=num_classes
trained on corrupted-one-hot-label -> clean label, CE+Dice) and
``MAD_FineTuning.py:95-150`` (seg_model + mad_model + third 'ema' denoiser,
three SGD states, loss = sum of three 0.5*(CE+Dice) terms; the mad model eats
softmax(seg)/cached-pred blends, the 'ema' model eats softmax(seg)).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from mamba_unet_tpu.objectives.losses import supervised_ce_dice
from mamba_unet_tpu.train.optim import poly_sgd
from mamba_unet_tpu.train.state import TrainState, create_train_state
from mamba_unet_tpu.train.trainer import TrainConfig, Trainer

class MADPretrainTrainer(Trainer):
    """MAD pretraining IS the base fully-supervised step (corrupted one-hot
    label in, clean label target) — only the VALIDATION protocol differs:
    the denoiser is evaluated on corrupted label slices, not images
    (val_2D.py:54-78). ``transform`` supplies ``mask_label_only``."""

    def __init__(self, model, config: TrainConfig, transform=None, **kw):
        self.transform = transform
        super().__init__(model, config, **kw)

    def evaluate(self, val_dataset, detailed: bool = False):
        import numpy as np

        from mamba_unet_tpu.eval import test_single_volume_mad

        cfg = self.config
        pf = self.predict_fn()
        metrics = []
        for i in range(len(val_dataset)):
            v = val_dataset[i]
            metrics.append(test_single_volume_mad(
                v["label"], pf, cfg.num_classes,
                corrupt_fn=self.transform.mask_label_only,
                patch_size=cfg.patch_size, batch_size=cfg.eval_batch_size,
            ))
        arr = np.asarray(metrics)
        mean_dice = float(arr[:, :, 0].mean())
        if detailed:
            return mean_dice, arr.mean(axis=0)
        return mean_dice


class MADState(struct.PyTreeNode):
    step: jnp.ndarray
    seg: TrainState
    mad: TrainState
    den: TrainState  # the reference's (misnamed) 'ema' third model


class MADFineTuneTrainer(Trainer):
    """Stacked fine-tuning: seg -> softmax -> {mad (blend with mask_label),
    den}; three independently-optimized models; summed loss.

    NOTE a reference defect NOT replicated: MAD_FineTuning.py:118 computes
    ``mad_outputs_soft = softmax(seg_outputs)`` — the mad Dice term there is
    accidentally evaluated on the SEG model's softmax. Here the mad Dice uses
    the mad model's own output (the evident intent)."""

    supports_grad_accum = False  # three-model stacked step, not the base step

    def __init__(self, seg_model, mad_model, config: TrainConfig, **kw):
        self.mad_model = mad_model
        super().__init__(seg_model, config, **kw)
        cfg = config
        x_seg = jnp.zeros((cfg.batch_size, *cfg.patch_size, 1), jnp.float32)
        x_mad = jnp.zeros(
            (cfg.batch_size, *cfg.patch_size, cfg.num_classes), jnp.float32
        )
        mk = lambda m, x, seed: create_train_state(
            m, jax.random.key(seed), x, poly_sgd(cfg.base_lr, cfg.max_iterations)
        )
        self.mad_state = MADState(
            step=jnp.zeros((), jnp.int32),
            seg=self.state,
            mad=mk(mad_model, x_mad, cfg.seed + 1),
            den=mk(mad_model, x_mad, cfg.seed + 2),
        )
        self._mad_step = jax.jit(self._train_step3, donate_argnums=(0,))
        self._den_predict = None

    def den_predict_fn(self):
        """Jitted denoiser forward on the 'den' (reference 'ema') model."""
        if self._den_predict is None:

            @jax.jit
            def fwd(params, batch_stats, x):
                v = {"params": params}
                if batch_stats:
                    v["batch_stats"] = batch_stats
                out = self.mad_model.apply(v, x)
                return out[0] if isinstance(out, (tuple, list)) else out

            self._den_predict = fwd
        st = self.mad_state.den
        return lambda x: self._den_predict(st.params, st.batch_stats, x)

    def evaluate(self, val_dataset, detailed: bool = False):
        """Stacked validation: argmax(den(softmax(seg(x)))) vs label
        (val_2D.py:80-103 test_single_volume_for_trainLabel)."""
        import numpy as np

        from mamba_unet_tpu.eval import test_single_volume_stacked

        cfg = self.config
        seg_fn = self.predict_fn()
        den_fn = self.den_predict_fn()
        metrics = []
        for i in range(len(val_dataset)):
            v = val_dataset[i]
            metrics.append(test_single_volume_stacked(
                v["image"], v["label"], seg_fn, den_fn, cfg.num_classes,
                patch_size=cfg.patch_size, batch_size=cfg.eval_batch_size,
            ))
        arr = np.asarray(metrics)
        mean_dice = float(arr[:, :, 0].mean())
        if detailed:
            return mean_dice, arr.mean(axis=0)
        return mean_dice

    def _apply_train(self, model, st: TrainState, params, x, rng):
        mutable = ["batch_stats"] if st.batch_stats else []
        v = {"params": params}
        if st.batch_stats:
            v["batch_stats"] = st.batch_stats
        out = model.apply(v, x, deterministic=False,
                          rngs={"dropout": rng}, mutable=mutable)
        if mutable:
            logits, upd = out
            return logits, upd["batch_stats"]
        return out, None

    def _train_step3(self, ms: MADState, batch):
        cfg = self.config
        rng = jax.random.fold_in(jax.random.key(cfg.seed), ms.step)
        r1, r2, r3 = jax.random.split(rng, 3)
        image, label = batch["image"], batch["label"]
        mask_label = batch.get("mask_label")  # (B, H, W, C) cached/corrupted

        def loss_fn(p_seg, p_mad, p_den):
            seg_out, bs_seg = self._apply_train(self.model, ms.seg, p_seg,
                                                image, r1)
            seg_soft = jax.nn.softmax(seg_out, axis=-1)
            # mad input detaches seg (MAD_FineTuning.py:114 .detach()); the
            # 'ema'/den input does NOT (:121 feeds seg_outputs_soft live), so
            # the den loss backpropagates into the seg model too.
            mask_in = jax.lax.stop_gradient(seg_soft)
            blend = mask_in if mask_label is None else jax.nn.softmax(
                (mask_in + mask_label) / 2.0, axis=-1
            )
            mad_out, bs_mad = self._apply_train(self.mad_model, ms.mad, p_mad,
                                                blend, r2)
            den_out, bs_den = self._apply_train(self.mad_model, ms.den, p_den,
                                                seg_soft, r3)
            seg_loss = supervised_ce_dice(seg_out, label)
            mad_loss = supervised_ce_dice(mad_out, label)
            den_loss = supervised_ce_dice(den_out, label)
            total = seg_loss + mad_loss + den_loss
            return total, (bs_seg, bs_mad, bs_den,
                           {"loss_total": total, "loss_seg": seg_loss,
                            "loss_mad": mad_loss, "loss_den": den_loss})

        (loss, (bs1, bs2, bs3, logs)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(ms.seg.params, ms.mad.params, ms.den.params)
        return MADState(
            step=ms.step + 1,
            seg=ms.seg.apply_gradients(grads[0], bs1),
            mad=ms.mad.apply_gradients(grads[1], bs2),
            den=ms.den.apply_gradients(grads[2], bs3),
        ), logs

    # --- checkpoint/resume ------------------------------------------------
    # The reference persists the fine-tuned trio in ONE best checkpoint
    # ({seg,ema,mad}_state_dict, MAD_FineTuning.py:188-219). Here the trio's
    # best params save under best/best2/best3 (seg/mad/den) — loadable by
    # ``cli/test.py --ckpt_name``; the periodic tree carries all three full
    # states for kill-and-resume (which the reference lacks).

    def _periodic_tree(self):
        ms = self.mad_state
        return {"step": ms.step,
                "seg_params": ms.seg.params,
                "seg_batch_stats": ms.seg.batch_stats,
                "seg_opt": ms.seg.opt_state,
                "mad_params": ms.mad.params,
                "mad_batch_stats": ms.mad.batch_stats,
                "mad_opt": ms.mad.opt_state,
                "den_params": ms.den.params,
                "den_batch_stats": ms.den.batch_stats,
                "den_opt": ms.den.opt_state}

    def try_resume(self) -> int:
        from mamba_unet_tpu.parallel import replicated
        from mamba_unet_tpu.train.trainer import log
        from mamba_unet_tpu.utils import latest_step, restore_checkpoint

        cfg = self.config
        if not (cfg.resume and cfg.snapshot_dir):
            return 0
        step = latest_step(cfg.snapshot_dir)
        if step is None:
            return 0
        got = restore_checkpoint(cfg.snapshot_dir, step, self._periodic_tree())

        def step_copy():
            # four step leaves live in the donated MADState — each needs its
            # own buffer (duplicate donation is an error)
            return jnp.array(got["step"])

        ms = self.mad_state
        self.mad_state = jax.device_put(
            MADState(
                step=step_copy(),
                seg=ms.seg.replace(step=step_copy(), params=got["seg_params"],
                                   batch_stats=got["seg_batch_stats"],
                                   opt_state=got["seg_opt"]),
                mad=ms.mad.replace(step=step_copy(), params=got["mad_params"],
                                   batch_stats=got["mad_batch_stats"],
                                   opt_state=got["mad_opt"]),
                den=ms.den.replace(step=step_copy(), params=got["den_params"],
                                   batch_stats=got["den_batch_stats"],
                                   opt_state=got["den_opt"]),
            ),
            replicated(self.mesh),
        )
        self.state = self.mad_state.seg
        log.info("resumed MAD fine-tune from %s @ step %d",
                 cfg.snapshot_dir, step)
        return int(step)

    def fit(self, train_loader, val_dataset=None):
        import time

        import numpy as np

        from mamba_unet_tpu.train.trainer import log
        from mamba_unet_tpu.utils import save_best_marks, save_checkpoint

        cfg = self.config
        history = []
        it = self.try_resume()
        (best,) = self._load_best_marks() if cfg.resume else (0.0,)
        t0 = time.time()
        for batch in train_loader:
            if it >= cfg.max_iterations:
                break
            dev = {
                "image": jax.device_put(batch["image"], self._bsh),
                "label": jax.device_put(batch["label"], self._bsh),
            }
            if "mask_label" in batch:
                dev["mask_label"] = jax.device_put(batch["mask_label"], self._bsh)
            self.mad_state, logs = self._mad_step(self.mad_state, dev)
            self.state = self.mad_state.seg
            it += 1
            if it % cfg.log_every == 0 or it == 1:
                log.info("iter %d loss %.4f (seg %.4f mad %.4f den %.4f)",
                         it, float(logs["loss_total"]), float(logs["loss_seg"]),
                         float(logs["loss_mad"]), float(logs["loss_den"]))
                history.append({"iter": it, "loss": float(logs["loss_total"])})
            if val_dataset is not None and it % cfg.eval_every == 0:
                dice = self.evaluate(val_dataset)
                history.append({"iter": it, "val_dice": dice})
                log.info("iter %d val dice %.4f (best %.4f)", it, dice, best)
                if dice > best:
                    best = dice
                    if cfg.snapshot_dir:
                        # the trio saves at the SAME step under three names —
                        # the reference's single {seg,ema,mad} best file
                        ms = self.mad_state
                        for name, st in (("best", ms.seg), ("best2", ms.mad),
                                         ("best3", ms.den)):
                            save_checkpoint(
                                cfg.snapshot_dir, it,
                                {"params": st.params,
                                 "batch_stats": st.batch_stats},
                                name=name,
                            )
                        save_best_marks(cfg.snapshot_dir, {"best": best})
            if cfg.snapshot_dir and it % cfg.ckpt_every == 0:
                save_checkpoint(cfg.snapshot_dir, it, self._periodic_tree())
        return {"best_dice": best, "iterations": it, "history": history}
