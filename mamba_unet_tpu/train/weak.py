"""Weak-Mamba-UNet: scribble-supervised multi-view cross-teaching.

The reference names Weak-Mamba-UNet as its third headline model
(``/root/reference/README.md:27-38``) and publishes its results
(``WeakMambaUNet.pdf`` Table 1: Dice 0.9171 on scribble-ACDC) but ships no
training code ("code in progress" upstream).  This trainer implements the
paper's method (WeakMambaUNet.pdf §2):

  * THREE architecturally-distinct networks — a CNN UNet, a ViT Swin-UNet,
    and a VMamba Mamba-UNet — each trained on the SAME scribble-annotated
    batches (no unlabeled stream; every slice carries sparse labels).
  * L_pce (Eq. 2): cross-entropy over scribble-annotated pixels only
    (ignore_index = num_classes, the ACDC-scribble "unlabeled" value).
  * A composite dense pseudo label (Eq. 3):
    ``Y_pseudo = argmax(alpha*p_cnn + beta*p_vit + gamma*p_mamba)`` with
    (alpha, beta, gamma) drawn fresh each iteration from the uniform simplex
    (Dirichlet(1,1,1)) — the paper's random weighting perturbation.
  * L_dice (Eq. 4): Dice of each network's softmax against Y_pseudo.
  * L_total = sum_i (L_pce^i + L_dice^i) (Eq. 1); three independent
    optimizer states.

Protocol (paper §3, identical to the reference 2-D scripts): 30k iterations,
val every 200 on dense-label volumes, best-Dice checkpoint per network
(``best``/``best2``/``best3``), periodic three-model checkpoint for
kill-and-resume (beyond-reference, as in CrossTeachingTrainer).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from mamba_unet_tpu.objectives import (
    cross_entropy_loss,
    dice_loss_from_labels,
)
from mamba_unet_tpu.train.methods import _apply_train, _main_head
from mamba_unet_tpu.train.optim import poly_sgd
from mamba_unet_tpu.train.state import TrainState, create_train_state
from mamba_unet_tpu.train.trainer import TrainConfig, Trainer


class TriState(struct.PyTreeNode):
    step: jnp.ndarray
    s1: TrainState
    s2: TrainState
    s3: TrainState


class WeakScribbleTrainer(Trainer):
    """Three-network scribble-supervised trainer (Weak-Mamba-UNet)."""

    supports_grad_accum = False  # three-network trio step, not the base step

    def __init__(self, model, config: TrainConfig, model2, model3,
                 ignore_index: int = None, pce_only: bool = False, **kw):
        self.model2 = model2
        self.model3 = model3
        self.ignore_index = (config.num_classes if ignore_index is None
                             else ignore_index)
        # the paper's ablation baseline (WeakMambaUNet.pdf Table 2 "pCE"):
        # scribble CE alone, no composite pseudo-label Dice
        self.pce_only = pce_only
        super().__init__(model, config, **kw)
        cfg = config
        sample = jnp.zeros((cfg.batch_size, *cfg.patch_size, 1), jnp.float32)

        def make(m, seed_offset):
            tx = kw.get("tx") or poly_sgd(cfg.base_lr, cfg.max_iterations)
            return create_train_state(m, jax.random.key(cfg.seed + seed_offset),
                                      sample, tx)

        self.tri = TriState(step=jnp.zeros((), jnp.int32), s1=self.state,
                            s2=make(model2, 1), s3=make(model3, 2))
        self._tri_step = jax.jit(self._train_step3, donate_argnums=(0,))

    def _train_step3(self, tri: TriState, batch) -> Tuple[TriState, Dict]:
        rng = jax.random.fold_in(jax.random.key(self.config.seed), tri.step)
        r1, r2, r3, r_mix = jax.random.split(rng, 4)
        image, scrib = batch["image"], batch["label"]
        models = (self.model, self.model2, self.model3)
        states = (tri.s1, tri.s2, tri.s3)
        rngs = (r1, r2, r3)
        # Eq. 3's random simplex weights: fresh each iteration
        mix = jax.random.dirichlet(r_mix, jnp.ones((3,), jnp.float32))

        def loss_fn(p1, p2, p3):
            outs, bss = [], []
            for m, s, p, r in zip(models, states, (p1, p2, p3), rngs):
                o, bs = _apply_train(m, s.variables(p), image, r)
                outs.append(_main_head(o))
                bss.append(bs)
            softs = [jax.nn.softmax(o, axis=-1) for o in outs]
            pseudo = jnp.argmax(
                jax.lax.stop_gradient(
                    mix[0] * softs[0] + mix[1] * softs[1] + mix[2] * softs[2]
                ),
                axis=-1,
            )
            pces = [cross_entropy_loss(o, scrib, ignore_index=self.ignore_index)
                    for o in outs]
            if self.pce_only:
                dices = [jnp.zeros(()) for _ in softs]
            else:
                dices = [dice_loss_from_labels(s, pseudo) for s in softs]
            per_model = [pce + d for pce, d in zip(pces, dices)]
            total = sum(per_model)
            logs = {"loss_total": total,
                    "loss_model1": per_model[0], "loss_model2": per_model[1],
                    "loss_model3": per_model[2],
                    "loss_pce": sum(pces), "loss_pseudo_dice": sum(dices)}
            return total, (tuple(bss), logs)

        (_, (bss, logs)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(tri.s1.params, tri.s2.params, tri.s3.params)
        s1 = tri.s1.apply_gradients(grads[0], bss[0])
        s2 = tri.s2.apply_gradients(grads[1], bss[1])
        s3 = tri.s3.apply_gradients(grads[2], bss[2])
        return TriState(step=tri.step + 1, s1=s1, s2=s2, s3=s3), logs

    # --- eval for models 2/3 -------------------------------------------
    def _predict_for(self, model, state):
        # cache one jitted forward per model (mirrors Trainer._predict) so
        # the every-eval call doesn't retrace
        fwd = self._predict_cache.get(id(model)) if hasattr(
            self, "_predict_cache") else None
        if fwd is None:
            if not hasattr(self, "_predict_cache"):
                self._predict_cache = {}

            @jax.jit
            def fwd(params, batch_stats, x):
                v = {"params": params}
                if batch_stats:
                    v["batch_stats"] = batch_stats
                out = model.apply(v, x)
                return out[0] if isinstance(out, (tuple, list)) else out

            self._predict_cache[id(model)] = fwd

        return lambda x: fwd(state.params, state.batch_stats, x)

    def evaluate_model(self, val_dataset, model, state) -> float:
        from mamba_unet_tpu.eval import evaluate_slice_volumes

        cfg = self.config
        arr = evaluate_slice_volumes(
            (val_dataset[i] for i in range(len(val_dataset))),
            self._predict_for(model, state), cfg.num_classes,
            patch_size=cfg.patch_size, batch_size=cfg.eval_batch_size,
        )
        return float(arr[:, :, 0].mean())

    # --- checkpoint/resume ----------------------------------------------
    def _periodic_tree(self):
        t = self.tri
        out = {"step": t.step}
        for i, s in enumerate((t.s1, t.s2, t.s3), start=1):
            out[f"params{i}"] = s.params
            out[f"batch_stats{i}"] = s.batch_stats
            out[f"opt_state{i}"] = s.opt_state
        return out

    def try_resume(self) -> int:
        from mamba_unet_tpu.parallel import replicated
        from mamba_unet_tpu.utils import latest_step, restore_checkpoint

        cfg = self.config
        if not (cfg.resume and cfg.snapshot_dir):
            return 0
        step = latest_step(cfg.snapshot_dir)
        if step is None:
            return 0
        got = restore_checkpoint(cfg.snapshot_dir, step, self._periodic_tree())

        def fresh_step():
            # every donated leaf needs its own buffer
            return jnp.array(got["step"])

        def load(s, i):
            return s.replace(step=fresh_step(), params=got[f"params{i}"],
                             batch_stats=got[f"batch_stats{i}"],
                             opt_state=got[f"opt_state{i}"])

        self.tri = jax.device_put(
            TriState(step=fresh_step(), s1=load(self.tri.s1, 1),
                     s2=load(self.tri.s2, 2), s3=load(self.tri.s3, 3)),
            replicated(self.mesh),
        )
        self.state = self.tri.s1
        from mamba_unet_tpu.train.trainer import log

        log.info("resumed 3 models from %s @ step %d", cfg.snapshot_dir, step)
        return int(step)

    # --- the loop --------------------------------------------------------
    def fit(self, train_loader, val_dataset=None) -> Dict[str, Any]:
        import time

        from mamba_unet_tpu.train.trainer import log
        from mamba_unet_tpu.utils import save_best_marks, save_checkpoint

        cfg = self.config
        names = ("best", "best2", "best3")
        # per-network high-water marks, persisted across kill-and-resume in
        # the best_marks.json sidecar
        best = self._load_best_marks(names) if cfg.resume else [0.0, 0.0, 0.0]
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
            self.tri, logs = self._tri_step(self.tri, batch)
            self.state = self.tri.s1
            it += 1
            if it % cfg.log_every == 0 or it == 1:
                log.info(
                    "iter %d loss %.4f (m1 %.4f m2 %.4f m3 %.4f) (%.1f it/s)",
                    it, float(logs["loss_total"]), float(logs["loss_model1"]),
                    float(logs["loss_model2"]), float(logs["loss_model3"]),
                    (it - it0) / (time.time() - t0),
                )
                history.append({"iter": it, "loss": float(logs["loss_total"])})
            if val_dataset is not None and it % cfg.eval_every == 0:
                models = (self.model, self.model2, self.model3)
                states = (self.tri.s1, self.tri.s2, self.tri.s3)
                dices = [self.evaluate_model(val_dataset, m, s)
                         for m, s in zip(models, states)]
                log.info("iter %d val mean dice m1 %.4f m2 %.4f m3 %.4f",
                         it, *dices)
                history.append({"iter": it, "val_dice": dices[0],
                                "val_dice2": dices[1], "val_dice3": dices[2]})
                for i, d in enumerate(dices):
                    if d > best[i] and cfg.snapshot_dir:
                        save_checkpoint(
                            cfg.snapshot_dir, it,
                            {"params": states[i].params,
                             "batch_stats": states[i].batch_stats},
                            name=names[i],
                        )
                        save_best_marks(cfg.snapshot_dir, {names[i]: d})
                    best[i] = max(best[i], d)
            if cfg.snapshot_dir and it % cfg.ckpt_every == 0:
                save_checkpoint(cfg.snapshot_dir, it, self._periodic_tree())
        return {"best_dice": best[0], "best_dice2": best[1],
                "best_dice3": best[2], "iterations": it, "history": history}
