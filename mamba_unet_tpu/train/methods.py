"""Semi-supervised training methods: mean teacher, UAMT, cross teaching.

Each is a Trainer subclass overriding the jitted step, with exact reference
loss composition:

  * MeanTeacher (``train_mean_teacher_2D.py:190-222``): sup 0.5*(CE+Dice) on
    the labeled slice; MSE(student, EMA-teacher on noised input) on the
    unlabeled slice, gated off before iteration 1000, weighted by
    0.1 * sigmoid_rampup(iter//150, 200); EMA decay min(1-1/(t+1), .99).
  * UAMT (``train_uncertainty_aware_mean_teacher_2D.py:150-196``): T=8
    MC-noise teacher passes -> mean softmax -> predictive entropy; mask
    consistency where entropy < (0.75+0.25*rampup(iter, max_iter))*ln(2);
    consistency = sum(mask*mse)/(2*sum(mask)+1e-16).
  * CrossTeaching / Semi-Mamba-UNet (``train_Semi_Mamba_UNet.py:205-250``):
    two models; each gets sup CE+Dice on labeled + rampup-weighted Dice on the
    OTHER model's argmax pseudo-labels on unlabeled + 0.5*ConstraLoss; summed
    loss, independent SGD states.

The batch layout follows TwoStreamBatchSampler: first ``labeled_bs`` items
labeled, the rest unlabeled.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from mamba_unet_tpu.objectives import (
    constra_loss,
    cross_entropy_loss,
    dice_loss_from_labels,
)
from mamba_unet_tpu.train.optim import poly_sgd
from mamba_unet_tpu.train.state import TrainState, create_train_state, ema_update
from mamba_unet_tpu.train.trainer import TrainConfig, Trainer


def rampup_weight(step, consistency: float = 0.1, rampup: float = 200.0):
    """In-graph 0.1 * sigmoid_rampup(step // 150, 200)."""
    t = jnp.clip((step // 150).astype(jnp.float32) / rampup, 0.0, 1.0)
    return consistency * jnp.exp(-5.0 * (1.0 - t) ** 2)


def _apply_train(model, variables, x, rng):
    """Train-mode apply; returns (logits, new_batch_stats or None)."""
    mutable = ["batch_stats"] if "batch_stats" in variables else []
    out = model.apply(
        variables, x, deterministic=False, rngs={"dropout": rng}, mutable=mutable
    )
    if mutable:
        logits, upd = out
        return logits, upd["batch_stats"]
    return out, None


def _main_head(logits):
    return logits[0] if isinstance(logits, (tuple, list)) else logits


def _sup_ce_dice(logits, labels):
    soft = jax.nn.softmax(logits, axis=-1)
    return 0.5 * (
        cross_entropy_loss(logits, labels) + dice_loss_from_labels(soft, labels)
    )


class MeanTeacherTrainer(Trainer):
    supports_grad_accum = False  # EMA-teacher step, not the base step

    def __init__(self, model, config: TrainConfig, labeled_bs: int = 8,
                 consistency: float = 0.1, consistency_rampup: float = 200.0,
                 ema_decay: float = 0.99, warmup_iters: int = 1000, **kw):
        self.labeled_bs = labeled_bs
        self.consistency = consistency
        self.consistency_rampup = consistency_rampup
        self.ema_decay = ema_decay
        self.warmup_iters = warmup_iters
        super().__init__(model, config, **kw)
        # add EMA copy of initial params
        self.state = self.state.replace(
            ema_params=jax.tree_util.tree_map(jnp.copy, self.state.params)
        )
        self._step = jax.jit(self._train_step, donate_argnums=(0,))

    def _teacher_inputs(self, rng, unlabeled):
        noise = jnp.clip(
            0.1 * jax.random.normal(rng, unlabeled.shape), -0.2, 0.2
        )
        return unlabeled + noise

    def _train_step(self, state: TrainState, batch):
        lb = self.labeled_bs
        rng = jax.random.fold_in(jax.random.key(self.config.seed), state.step)
        r_student, r_teacher, r_noise = jax.random.split(rng, 3)
        image, label = batch["image"], batch["label"]
        unlabeled = image[lb:]

        ema_in = self._teacher_inputs(r_noise, unlabeled)
        ema_vars = state.variables(state.ema_params)
        ema_logits, _ = _apply_train(self.model, ema_vars, ema_in, r_teacher)
        ema_soft = jax.nn.softmax(
            jax.lax.stop_gradient(_main_head(ema_logits)), axis=-1
        )

        def loss_fn(params):
            logits, new_bs = _apply_train(
                self.model, state.variables(params), image, r_student
            )
            logits = _main_head(logits)
            sup = _sup_ce_dice(logits[:lb], label[:lb])
            soft = jax.nn.softmax(logits[lb:], axis=-1)
            cons = jnp.mean((soft - ema_soft) ** 2)
            cons = jnp.where(state.step < self.warmup_iters, 0.0, cons)
            w = rampup_weight(state.step, self.consistency, self.consistency_rampup)
            total = sup + w * cons
            return total, {"batch_stats": new_bs,
                           "logs": {"loss_total": total, "loss_sup": sup,
                                    "loss_cons": cons, "cons_weight": w}}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, aux.get("batch_stats"))
        state = state.replace(
            ema_params=ema_update(state.ema_params, state.params,
                                  state.step, self.ema_decay)
        )
        return state, aux["logs"]


class UAMTTrainer(MeanTeacherTrainer):
    """Uncertainty-aware mean teacher: entropy-masked consistency, T=8."""

    T: int = 8

    def _train_step(self, state: TrainState, batch):
        lb = self.labeled_bs
        cfg = self.config
        rng = jax.random.fold_in(jax.random.key(cfg.seed), state.step)
        r_student, r_teacher, *r_mc = jax.random.split(rng, 2 + self.T)
        image, label = batch["image"], batch["label"]
        unlabeled = image[lb:]

        ema_vars = state.variables(state.ema_params)
        ema_logits, _ = _apply_train(
            self.model, ema_vars, self._teacher_inputs(r_mc[0], unlabeled), r_teacher
        )
        ema_logits = jax.lax.stop_gradient(_main_head(ema_logits))

        # T MC passes with fresh noise for the uncertainty estimate
        def mc_pass(r):
            out, _ = _apply_train(
                self.model, ema_vars, self._teacher_inputs(r, unlabeled), r_teacher
            )
            return jax.nn.softmax(jax.lax.stop_gradient(_main_head(out)), axis=-1)

        preds = jnp.mean(jnp.stack([mc_pass(r) for r in r_mc]), axis=0)
        uncertainty = -jnp.sum(preds * jnp.log(preds + 1e-6), axis=-1, keepdims=True)

        threshold = (
            0.75
            + 0.25 * jnp.exp(
                -5.0 * (1.0 - jnp.clip(
                    state.step.astype(jnp.float32) / cfg.max_iterations, 0.0, 1.0
                )) ** 2
            )
        ) * jnp.log(2.0)
        mask = (uncertainty < threshold).astype(jnp.float32)

        def loss_fn(params):
            logits, new_bs = _apply_train(
                self.model, state.variables(params), image, r_student
            )
            logits = _main_head(logits)
            sup = _sup_ce_dice(logits[:lb], label[:lb])
            dist = (
                jax.nn.softmax(logits[lb:], axis=-1)
                - jax.nn.softmax(ema_logits, axis=-1)
            ) ** 2
            cons = jnp.sum(mask * dist) / (2.0 * jnp.sum(mask) + 1e-16)
            w = rampup_weight(state.step, self.consistency, self.consistency_rampup)
            total = sup + w * cons
            return total, {"batch_stats": new_bs,
                           "logs": {"loss_total": total, "loss_sup": sup,
                                    "loss_cons": cons, "cons_weight": w}}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, aux.get("batch_stats"))
        state = state.replace(
            ema_params=ema_update(state.ema_params, state.params,
                                  state.step, self.ema_decay)
        )
        return state, aux["logs"]


class CrossState(struct.PyTreeNode):
    step: jnp.ndarray
    s1: TrainState
    s2: TrainState


class CrossTeachingTrainer(Trainer):
    """Semi-Mamba-UNet: two networks cross-teaching + contrastive stat loss.

    Checkpoint protocol mirrors ``train_Semi_Mamba_UNet.py:283-352``: BOTH
    models are evaluated every ``eval_every``, each keeps its own best-Dice
    checkpoint (``best`` / ``best2``), and a periodic checkpoint carries both
    param/opt states for kill-and-resume (which the reference lacks — its
    30k-iteration semi runs restart from zero)."""

    supports_grad_accum = False  # two-model cross step, not the base step

    def __init__(self, model, config: TrainConfig, model2=None, labeled_bs: int = 8,
                 consistency: float = 0.1, consistency_rampup: float = 200.0, **kw):
        self.labeled_bs = labeled_bs
        self.consistency = consistency
        self.consistency_rampup = consistency_rampup
        # Same architecture by default; separate params come from a different
        # init key (apply is pure, so sharing the module object is fine).
        self.model2 = model2 if model2 is not None else model
        super().__init__(model, config, **kw)
        cfg = config
        sample = jnp.zeros((cfg.batch_size, *cfg.patch_size, 1), jnp.float32)
        # model 2 trains under the same optimizer choice as model 1 (the CLI
        # --optimizer flag rides in through kw["tx"])
        tx2 = kw.get("tx") or poly_sgd(cfg.base_lr, cfg.max_iterations)
        s2 = create_train_state(
            self.model2, jax.random.key(cfg.seed + 1), sample, tx2
        )
        self.cross = CrossState(step=jnp.zeros((), jnp.int32), s1=self.state, s2=s2)
        self._cross_step = jax.jit(self._train_step2, donate_argnums=(0,))

    def _train_step2(self, cross: CrossState, batch):
        lb = self.labeled_bs
        rng = jax.random.fold_in(jax.random.key(self.config.seed), cross.step)
        r1, r2 = jax.random.split(rng)
        image, label = batch["image"], batch["label"]

        def loss_fn(params1, params2):
            out1, bs1 = _apply_train(
                self.model, cross.s1.variables(params1), image, r1
            )
            out2, bs2 = _apply_train(
                self.model2, cross.s2.variables(params2), image, r2
            )
            out1, out2 = _main_head(out1), _main_head(out2)
            soft1 = jax.nn.softmax(out1, axis=-1)
            soft2 = jax.nn.softmax(out2, axis=-1)

            sup1 = _sup_ce_dice(out1[:lb], label[:lb])
            sup2 = _sup_ce_dice(out2[:lb], label[:lb])

            pseudo1 = jnp.argmax(jax.lax.stop_gradient(soft1[lb:]), axis=-1)
            pseudo2 = jnp.argmax(jax.lax.stop_gradient(soft2[lb:]), axis=-1)
            ps1 = dice_loss_from_labels(soft1[lb:], pseudo2)
            ps2 = dice_loss_from_labels(soft2[lb:], pseudo1)

            con = constra_loss(out1, out2)
            w = rampup_weight(cross.step, self.consistency, self.consistency_rampup)
            m1 = sup1 + w * ps1 + 0.5 * con
            m2 = sup2 + w * ps2 + 0.5 * con
            total = m1 + m2
            logs = {"loss_total": total, "loss_model1": m1, "loss_model2": m2,
                    "loss_constra": con, "cons_weight": w}
            return total, (bs1, bs2, logs)

        (loss, (bs1, bs2, logs)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(cross.s1.params, cross.s2.params)
        s1 = cross.s1.apply_gradients(grads[0], bs1)
        s2 = cross.s2.apply_gradients(grads[1], bs2)
        return CrossState(step=cross.step + 1, s1=s1, s2=s2), logs

    def predict_fn2(self):
        """Jitted slice-inference fn for model 2."""
        cross = self.cross

        @jax.jit
        def fwd(params, batch_stats, x):
            v = {"params": params}
            if batch_stats:
                v["batch_stats"] = batch_stats
            out = self.model2.apply(v, x)
            return out[0] if isinstance(out, (tuple, list)) else out

        return lambda x: fwd(cross.s2.params, cross.s2.batch_stats, x)

    def evaluate2(self, val_dataset):
        """Model-2 val Dice (the reference evaluates both models,
        train_Semi_Mamba_UNet.py:318-352)."""
        from mamba_unet_tpu.eval import evaluate_slice_volumes

        cfg = self.config
        arr = evaluate_slice_volumes(
            (val_dataset[i] for i in range(len(val_dataset))),
            self.predict_fn2(), cfg.num_classes,
            patch_size=cfg.patch_size, batch_size=cfg.eval_batch_size,
        )
        return float(arr[:, :, 0].mean())

    def _periodic_tree(self):
        c = self.cross
        return {"step": c.step,
                "params1": c.s1.params, "batch_stats1": c.s1.batch_stats,
                "opt_state1": c.s1.opt_state,
                "params2": c.s2.params, "batch_stats2": c.s2.batch_stats,
                "opt_state2": c.s2.opt_state}

    def try_resume(self) -> int:
        """Restore BOTH models (+opt states) from the newest periodic
        checkpoint — beyond-reference: the 30k-iter semi runs become
        preemption-safe."""
        from mamba_unet_tpu.utils import latest_step, restore_checkpoint

        cfg = self.config
        if not (cfg.resume and cfg.snapshot_dir):
            return 0
        step = latest_step(cfg.snapshot_dir)
        if step is None:
            return 0
        got = restore_checkpoint(cfg.snapshot_dir, step, self._periodic_tree())
        from mamba_unet_tpu.parallel import replicated

        def step_copy():
            # each state needs its OWN buffer — the step leaf appears three
            # times in the donated CrossState and duplicate donation is an
            # error
            return jnp.array(got["step"])

        self.cross = jax.device_put(
            CrossState(
                step=step_copy(),
                s1=self.cross.s1.replace(
                    step=step_copy(), params=got["params1"],
                    batch_stats=got["batch_stats1"],
                    opt_state=got["opt_state1"],
                ),
                s2=self.cross.s2.replace(
                    step=step_copy(), params=got["params2"],
                    batch_stats=got["batch_stats2"],
                    opt_state=got["opt_state2"],
                ),
            ),
            replicated(self.mesh),
        )
        self.state = self.cross.s1
        from mamba_unet_tpu.train.trainer import log

        log.info("resumed both models from %s @ step %d", cfg.snapshot_dir, step)
        return int(step)

    def fit(self, train_loader, val_dataset=None):
        # reuse the base loop by proxying state through CrossState
        import time

        from mamba_unet_tpu.train.trainer import log
        from mamba_unet_tpu.utils import save_best_marks, save_checkpoint

        cfg = self.config
        # model 1 (the headline) / model 2 high-water marks; persisted in the
        # best_marks.json sidecar so resume can't overwrite a better lineage
        best_dice, best_dice2 = (
            self._load_best_marks(("best", "best2")) if cfg.resume
            else (0.0, 0.0)
        )
        history = []
        it = it0 = self.try_resume()
        t0 = time.time()
        for batch in train_loader:
            if it >= cfg.max_iterations:
                break
            batch = {
                "image": jax.device_put(batch["image"], self._bsh),
                "label": jax.device_put(batch["label"], self._bsh),
            }
            self.cross, logs = self._cross_step(self.cross, batch)
            self.state = self.cross.s1
            it += 1
            if it % cfg.log_every == 0 or it == 1:
                log.info("iter %d loss %.4f (m1 %.4f m2 %.4f) (%.1f it/s)",
                         it, float(logs["loss_total"]), float(logs["loss_model1"]),
                         float(logs["loss_model2"]), (it - it0) / (time.time() - t0))
                history.append({"iter": it, "loss": float(logs["loss_total"])})
            if val_dataset is not None and it % cfg.eval_every == 0:
                dice = self.evaluate(val_dataset)
                dice2 = self.evaluate2(val_dataset)
                log.info("iter %d val mean dice m1 %.4f m2 %.4f", it, dice, dice2)
                history.append({"iter": it, "val_dice": dice,
                                "val_dice2": dice2})
                if dice > best_dice:
                    best_dice = dice
                    if cfg.snapshot_dir:
                        save_checkpoint(
                            cfg.snapshot_dir, it,
                            {"params": self.cross.s1.params,
                             "batch_stats": self.cross.s1.batch_stats},
                            name="best",
                        )
                        save_best_marks(cfg.snapshot_dir, {"best": best_dice})
                if dice2 > best_dice2:
                    best_dice2 = dice2
                    if cfg.snapshot_dir:
                        save_checkpoint(
                            cfg.snapshot_dir, it,
                            {"params": self.cross.s2.params,
                             "batch_stats": self.cross.s2.batch_stats},
                            name="best2",
                        )
                        save_best_marks(cfg.snapshot_dir,
                                        {"best2": best_dice2})
            if cfg.snapshot_dir and it % cfg.ckpt_every == 0:
                save_checkpoint(cfg.snapshot_dir, it, self._periodic_tree())
        return {"best_dice": best_dice, "best_dice2": best_dice2,
                "iterations": it, "history": history}


def build_semi_method(args, model, cfg: TrainConfig, tx=None, model2=None):
    """CLI dispatcher (``--method``)."""
    common = dict(
        labeled_bs=args.labeled_bs,
        consistency=args.consistency,
        consistency_rampup=args.consistency_rampup,
        tx=tx,
    )
    if args.method == "mean_teacher":
        return MeanTeacherTrainer(model, cfg, **common)
    if args.method == "uamt":
        return UAMTTrainer(model, cfg, **common)
    if args.method == "cross_teaching":
        return CrossTeachingTrainer(model, cfg, model2=model2, **common)
    raise ValueError(f"unknown method {args.method}")
