"""Contrastive-consistency trainer: dual models + CTAugment + projectors.

Rebuild of ``/root/reference/code/train_Semi_Contrastive_Consistency.py``
(:420-560 loss block):

  * weak/strong CTAugment views; labels follow the weak ops,
  * sup: CE+Dice (unhalved sum) on both models' weak outputs (labeled),
  * pseudo-labels: per-pixel channel min-max normalize of each model's weak
    softmax, confidence mask at 0.95, ensemble mean, argmax,
  * unsup: CE+Dice of each model's STRONG outputs vs the ensemble pseudo,
  * contrastive: patch-NCE between projector_3(weak1) / projector_4(weak2)
    on labeled; cross pairs projector_1(weak1)/projector_4(strong2) and
    projector_2(weak2)/projector_3(strong1) on unlabeled — projectors 1/2
    are EMA copies of 3/4 (decay .999),
  * loss = sup + w1*(contrast_l + unsup) + w2*contrast_u with
    w_i = consistency_i * sigmoid_rampup(iter//150, 200),
  * CTA policy refreshed per epoch (and on unfavorable crops); bin rates
    updated with proximity 1 - 0.5*mean(epoch half-losses).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mamba_unet_tpu.models.small_nets import Projectors
from mamba_unet_tpu.objectives.contrastive import con_loss
from mamba_unet_tpu.objectives.losses import (
    cross_entropy_loss,
    dice_loss_from_labels,
)
from mamba_unet_tpu.train.methods import _apply_train, _main_head, rampup_weight
from mamba_unet_tpu.train.state import TrainState, create_train_state, ema_update
from mamba_unet_tpu.train.trainer import TrainConfig, Trainer


class CCState(struct.PyTreeNode):
    step: jnp.ndarray
    s1: TrainState
    s2: TrainState
    p3: TrainState
    p4: TrainState
    p1_params: object  # EMA of p3
    p2_params: object  # EMA of p4


def _minmax_normalize(soft):
    """Per-pixel channel min-max (the script's normalize, :233-238)."""
    mn = soft.min(axis=-1, keepdims=True)
    mx = soft.max(axis=-1, keepdims=True)
    return (soft - mn) / jnp.maximum(mx, 1e-12)


class ContrastiveConsistencyTrainer(Trainer):
    supports_grad_accum = False  # EMA + cross-model step, not the base step

    def __init__(self, model, config: TrainConfig, model2=None,
                 labeled_bs: int = 12, conf_thresh: float = 0.95,
                 consistency1: float = 1.0, consistency2: float = 0.1,
                 consistency_rampup: float = 200.0, ema_decay: float = 0.999,
                 projector_ndf: int = 8, mask_recovery: bool = False,
                 mask_cube_size: int = 32, mask_weight: float = 1.0, **kw):
        # mask_recovery: the _mask script variant
        # (train_Semi_Contrastive_Consistency_mask.py:266-269) — adds
        # shuffled+masked recovery MSE on model1's mix-out head; requires a
        # model with forward_mix_pos_mask (e.g. magicnet_2D_mask).
        self.mask_recovery = mask_recovery
        self.mask_cube_size = mask_cube_size
        self.mask_weight = mask_weight
        self.labeled_bs = labeled_bs
        self.conf_thresh = conf_thresh
        self.consistency1 = consistency1
        self.consistency2 = consistency2
        self.consistency_rampup = consistency_rampup
        self.ema_decay = ema_decay
        self.model2 = model2 if model2 is not None else model
        super().__init__(model, config, **kw)
        cfg = config
        if mask_recovery:
            # mask models keep extra heads untouched by __call__ — re-init
            # through init_all so every parameter exists
            sample0 = jnp.zeros((cfg.batch_size, *cfg.patch_size, 1),
                                jnp.float32)
            variables = jax.jit(
                lambda r, x: model.init(r, x, method="init_all")
            )(jax.random.key(cfg.seed), sample0)
            self.state = TrainState(
                step=jnp.zeros((), jnp.int32),
                params=variables["params"],
                batch_stats=variables.get("batch_stats", {}),
                opt_state=self.tx.init(variables["params"]),
                tx=self.tx,
            )
        sample = jnp.zeros((cfg.batch_size, *cfg.patch_size, 1), jnp.float32)
        proj_in = jnp.zeros(
            (cfg.batch_size, *cfg.patch_size, cfg.num_classes), jnp.float32
        )
        self.projector = Projectors(input_nc=cfg.num_classes, ndf=projector_ndf)
        # model2/projectors follow --optimizer like model1 (methods.py:223);
        # self.tx is the resolved tx (given tx, else reference poly-SGD)
        mk = lambda m, x, seed: create_train_state(
            m, jax.random.key(seed), x, self.tx,
        )
        s2 = mk(self.model2, sample, cfg.seed + 1)
        p3 = mk(self.projector, proj_in, cfg.seed + 2)
        p4 = mk(self.projector, proj_in, cfg.seed + 3)
        self.cc = CCState(
            step=jnp.zeros((), jnp.int32),
            s1=self.state, s2=s2, p3=p3, p4=p4,
            p1_params=jax.tree_util.tree_map(jnp.copy, p3.params),
            p2_params=jax.tree_util.tree_map(jnp.copy, p4.params),
        )
        self._cc_step = jax.jit(self._train_step_cc, donate_argnums=(0,))

    def _proj(self, st: TrainState, params, x, rng):
        return _apply_train(self.projector, st.variables(params), x, rng)[0]

    def _train_step_cc(self, cc: CCState, batch):
        cfg = self.config
        lb = self.labeled_bs
        rng = jax.random.fold_in(jax.random.key(cfg.seed), cc.step)
        rngs = jax.random.split(rng, 8)
        weak, strong, label = (batch["image_weak"], batch["image_strong"],
                               batch["label_aug"])

        def loss_fn(params1, params2, params3, params4):
            ow1, bs1 = _apply_train(self.model, cc.s1.variables(params1),
                                    weak, rngs[0])
            os1, _ = _apply_train(self.model, cc.s1.variables(params1),
                                  strong, rngs[1])
            ow2, bs2 = _apply_train(self.model2, cc.s2.variables(params2),
                                    weak, rngs[2])
            os2, _ = _apply_train(self.model2, cc.s2.variables(params2),
                                  strong, rngs[3])
            ow1, os1 = _main_head(ow1), _main_head(os1)
            ow2, os2 = _main_head(ow2), _main_head(os2)
            sw1 = jax.nn.softmax(ow1, axis=-1)
            sw2 = jax.nn.softmax(ow2, axis=-1)

            # confidence-masked ensemble pseudo-labels
            def masked(soft):
                nrm = _minmax_normalize(soft)
                return nrm * (nrm > self.conf_thresh)

            ens = jax.lax.stop_gradient((masked(sw1) + masked(sw2)) / 2.0)
            pseudo = jnp.argmax(ens, axis=-1)

            sup = (
                cross_entropy_loss(ow1[:lb], label[:lb])
                + dice_loss_from_labels(sw1[:lb], label[:lb])
                + cross_entropy_loss(ow2[:lb], label[:lb])
                + dice_loss_from_labels(sw2[:lb], label[:lb])
            )
            unsup = (
                cross_entropy_loss(os1[lb:], pseudo[lb:])
                + dice_loss_from_labels(jax.nn.softmax(os1[lb:], -1), pseudo[lb:])
                + cross_entropy_loss(os2[lb:], pseudo[lb:])
                + dice_loss_from_labels(jax.nn.softmax(os2[lb:], -1), pseudo[lb:])
            )

            f_l_q = self._proj(cc.p3, params3, ow1[:lb], rngs[4])
            f_l_k = self._proj(cc.p4, params4, ow2[:lb], rngs[5])
            contrast_l = con_loss(f_l_q, f_l_k)

            f_q1 = self._proj(cc.p3, cc.p1_params, ow1[lb:], rngs[6])
            f_k1 = self._proj(cc.p4, params4, os2[lb:], rngs[6])
            f_q2 = self._proj(cc.p4, cc.p2_params, ow2[lb:], rngs[7])
            f_k2 = self._proj(cc.p3, params3, os1[lb:], rngs[7])
            contrast_u = con_loss(f_q1, f_k1) + con_loss(f_q2, f_k2)

            w1 = rampup_weight(cc.step, self.consistency1,
                               self.consistency_rampup)
            w2 = rampup_weight(cc.step, self.consistency2,
                               self.consistency_rampup)
            total = sup + w1 * contrast_l + w1 * unsup + w2 * contrast_u
            logs = {"loss_total": total, "loss_sup": sup, "loss_unsup": unsup,
                    "loss_contrast_l": contrast_l, "loss_contrast_u": contrast_u}

            if self.mask_recovery:
                # _mask variant: shuffle/mask recovery on model1's global
                # embedding head (masked_loss.py via the mask MagicNet)
                from mamba_unet_tpu.objectives.masked import (
                    make_masked_input,
                    make_shuffled_input,
                    recovery_mse,
                )

                r_s, r_m = jax.random.split(rngs[4])
                v1 = cc.s1.variables(params1)

                def mix_head(x, pos_embed=None, vis=None):
                    out, _ = self.model.apply(
                        v1, x, pos_embed, vis, method="forward_mix_pos_mask",
                        deterministic=False, mutable=["batch_stats"],
                        rngs={"dropout": rngs[5]},
                    )
                    return out

                clean = mix_head(weak)
                shuffled, perms = make_shuffled_input(r_s, weak,
                                                      self.mask_cube_size)
                masked, vis = make_masked_input(r_m, weak,
                                                self.mask_cube_size)
                rec = recovery_mse(clean, mix_head(
                    shuffled, pos_embed=perms.astype(jnp.float32)))
                rec = rec + recovery_mse(clean, mix_head(masked, vis=vis))
                total = total + self.mask_weight * rec
                logs = dict(logs, loss_total=total, loss_mask_recovery=rec)
            return total, (bs1, bs2, logs)

        (loss, (bs1, bs2, logs)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3), has_aux=True
        )(cc.s1.params, cc.s2.params, cc.p3.params, cc.p4.params)

        s1 = cc.s1.apply_gradients(grads[0], bs1)
        s2 = cc.s2.apply_gradients(grads[1], bs2)
        p3 = cc.p3.apply_gradients(grads[2])
        p4 = cc.p4.apply_gradients(grads[3])
        return CCState(
            step=cc.step + 1, s1=s1, s2=s2, p3=p3, p4=p4,
            p1_params=ema_update(cc.p1_params, p3.params, cc.step,
                                 self.ema_decay),
            p2_params=ema_update(cc.p2_params, p4.params, cc.step,
                                 self.ema_decay),
        ), logs

    # --- checkpoint/resume ------------------------------------------------
    # The reference's contrastive script has the RICHEST save/restore of the
    # whole zoo: save_checkpoint_4_2C persists model+optimizer+both
    # projectors+best mark per network (util.py:54-94, called at
    # train_Semi_Contrastive_Consistency.py:633-690) and auto-restores on
    # start (:328-358). Here ONE periodic orbax tree carries both models,
    # all four projector states (trained p3/p4 + EMA p1/p2) and the step;
    # the learned CTAugment policy rides in a cta_state.json sidecar.

    def _periodic_tree(self):
        c = self.cc
        return {"step": c.step,
                "params1": c.s1.params, "batch_stats1": c.s1.batch_stats,
                "opt_state1": c.s1.opt_state,
                "params2": c.s2.params, "batch_stats2": c.s2.batch_stats,
                "opt_state2": c.s2.opt_state,
                "p3_params": c.p3.params, "p3_opt": c.p3.opt_state,
                "p4_params": c.p4.params, "p4_opt": c.p4.opt_state,
                "p1_params": c.p1_params, "p2_params": c.p2_params}

    def try_resume(self) -> int:
        """Restore both models + projector trio states from the newest
        periodic checkpoint (reference auto-restore,
        train_Semi_Contrastive_Consistency.py:328-358)."""
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
            # every state needs its OWN step buffer: the donated CCState
            # holds five step leaves and duplicate donation is an error
            return jnp.array(got["step"])

        c = self.cc
        self.cc = jax.device_put(
            CCState(
                step=step_copy(),
                s1=c.s1.replace(step=step_copy(), params=got["params1"],
                                batch_stats=got["batch_stats1"],
                                opt_state=got["opt_state1"]),
                s2=c.s2.replace(step=step_copy(), params=got["params2"],
                                batch_stats=got["batch_stats2"],
                                opt_state=got["opt_state2"]),
                p3=c.p3.replace(step=step_copy(), params=got["p3_params"],
                                opt_state=got["p3_opt"]),
                p4=c.p4.replace(step=step_copy(), params=got["p4_params"],
                                opt_state=got["p4_opt"]),
                p1_params=got["p1_params"],
                p2_params=got["p2_params"],
            ),
            replicated(self.mesh),
        )
        self.state = self.cc.s1
        log.info("resumed contrastive-CC from %s @ step %d",
                 cfg.snapshot_dir, step)
        return int(step)

    def predict_fn2(self):
        """Jitted slice-inference fn for model 2."""
        cc = self.cc

        @jax.jit
        def fwd(params, batch_stats, x):
            v = {"params": params}
            if batch_stats:
                v["batch_stats"] = batch_stats
            out = self.model2.apply(v, x)
            return out[0] if isinstance(out, (tuple, list)) else out

        return lambda x: fwd(cc.s2.params, cc.s2.batch_stats, x)

    def evaluate2(self, val_dataset):
        """Model-2 val Dice (the reference evaluates both models,
        train_Semi_Contrastive_Consistency.py:596-676)."""
        from mamba_unet_tpu.eval import evaluate_slice_volumes

        cfg = self.config
        arr = evaluate_slice_volumes(
            (val_dataset[i] for i in range(len(val_dataset))),
            self.predict_fn2(), cfg.num_classes,
            patch_size=cfg.patch_size, batch_size=cfg.eval_batch_size,
        )
        return float(arr[:, :, 0].mean())

    def fit(self, train_loader, val_dataset=None, cta=None, cta_transform=None):
        import time

        from mamba_unet_tpu.train.trainer import log
        from mamba_unet_tpu.utils import (
            load_cta_state,
            save_best_marks,
            save_checkpoint,
            save_cta_state,
        )

        cfg = self.config
        history = []
        epoch_errors = []
        it = self.try_resume()
        best, best2 = (self._load_best_marks(("best", "best2"))
                       if cfg.resume else (0.0, 0.0))
        if it and cta is not None and cfg.snapshot_dir:
            # the learned augmentation policy is part of the reference's
            # restore contract — resuming without it forgets every rate
            if load_cta_state(cfg.snapshot_dir, cta):
                if cta_transform is not None:
                    cta_transform.refresh_policies()
                log.info("restored CTAugment policy rates from %s",
                         cfg.snapshot_dir)
        t0 = time.time()
        per_epoch = max(len(train_loader), 1)
        for batch in train_loader:
            if it >= cfg.max_iterations:
                break
            dev = {k: jax.device_put(batch[k], self._bsh)
                   for k in ("image_weak", "image_strong", "label_aug")}
            self.cc, logs = self._cc_step(self.cc, dev)
            self.state = self.cc.s1
            it += 1
            epoch_errors.append(0.5 * float(logs["loss_total"]))

            # unfavorable-crop policy refresh (:413-419)
            if cta_transform is not None:
                nz = np.count_nonzero(np.asarray(batch["label"])) / batch[
                    "label"].size
                nz_aug = np.count_nonzero(np.asarray(batch["label_aug"])) / batch[
                    "label_aug"].size
                if nz > 0 and nz_aug < 0.005:
                    log.info("refreshing policy (unfavorable crop)")
                    cta_transform.refresh_policies()

            if it % per_epoch == 0 and cta is not None and cta_transform is not None:
                proximity = 1.0 - 0.5 * float(np.mean(epoch_errors))
                cta.update_rates(cta_transform.ops_weak, proximity)
                cta.update_rates(cta_transform.ops_strong, proximity)
                cta_transform.refresh_policies()
                epoch_errors = []

            if it % cfg.log_every == 0 or it == 1:
                log.info(
                    "iter %d loss %.4f (sup %.4f unsup %.4f cl %.4f cu %.4f)",
                    it, float(logs["loss_total"]), float(logs["loss_sup"]),
                    float(logs["loss_unsup"]), float(logs["loss_contrast_l"]),
                    float(logs["loss_contrast_u"]),
                )
                history.append({"iter": it, "loss": float(logs["loss_total"])})
            if val_dataset is not None and it % cfg.eval_every == 0:
                dice = self.evaluate(val_dataset)
                dice2 = self.evaluate2(val_dataset)
                history.append({"iter": it, "val_dice": dice,
                                "val_dice2": dice2})
                log.info("iter %d val dice m1 %.4f m2 %.4f", it, dice, dice2)
                if dice > best:
                    best = dice
                    if cfg.snapshot_dir:
                        save_checkpoint(
                            cfg.snapshot_dir, it,
                            {"params": self.cc.s1.params,
                             "batch_stats": self.cc.s1.batch_stats},
                            name="best",
                        )
                        save_best_marks(cfg.snapshot_dir, {"best": best})
                if dice2 > best2:
                    best2 = dice2
                    if cfg.snapshot_dir:
                        save_checkpoint(
                            cfg.snapshot_dir, it,
                            {"params": self.cc.s2.params,
                             "batch_stats": self.cc.s2.batch_stats},
                            name="best2",
                        )
                        save_best_marks(cfg.snapshot_dir, {"best2": best2})
            if cfg.snapshot_dir and it % cfg.ckpt_every == 0:
                save_checkpoint(cfg.snapshot_dir, it, self._periodic_tree())
                if cta is not None:
                    # the policy sidecar travels with the periodic tree so a
                    # kill between the two loses at most one cadence of rates
                    save_cta_state(cfg.snapshot_dir, cta)
        return {"best_dice": best, "best_dice2": best2, "iterations": it,
                "history": history}
