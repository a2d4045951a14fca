"""The generic Trainer: one jitted, mesh-sharded train step + the reference's
train/eval/checkpoint protocol.

Replaces the reference's 18 copy-pasted per-method ``train()`` loops (SURVEY
§2.11) with one driver parameterized by a *method* — a function building the
loss from (model, variables, batch, rng, step). The default method is the
fully-supervised 0.5*(CE+Dice) of ``train_fully_supervised_2D.py:111-113``.

Protocol faithfully kept (train_fully_supervised_2D.py:118-180):
  * poly LR per iteration (in the optax chain),
  * eval every ``eval_every`` iterations on the val volumes (order-0 zoom
    slice inference), tracking mean Dice over classes 1..C-1,
  * best-Dice checkpoint + periodic checkpoint every ``ckpt_every``.

TPU-native: batch sharded over the mesh ``data`` axis, params replicated,
state donated, models applied with bf16 compute if built so.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mamba_unet_tpu.eval import test_single_volume
from mamba_unet_tpu.objectives import supervised_ce_dice
from mamba_unet_tpu.parallel import batch_sharding, make_mesh, replicated
from mamba_unet_tpu.train.optim import poly_lr, poly_sgd
from mamba_unet_tpu.train.state import TrainState, create_train_state
from mamba_unet_tpu.utils import save_best_marks, save_checkpoint

log = logging.getLogger("mamba_unet_tpu")


@dataclasses.dataclass
class TrainConfig:
    base_lr: float = 0.01
    max_iterations: int = 10_000
    batch_size: int = 24
    patch_size: Tuple[int, int] = (256, 256)
    num_classes: int = 4
    eval_every: int = 200
    ckpt_every: int = 3000
    eval_batch_size: int = 16
    in_channels: int = 1  # model input channels (MAD denoisers eat C=classes)
    seed: int = 1337
    snapshot_dir: Optional[str] = None
    log_every: int = 50
    tensorboard: bool = False
    resume: bool = False
    # Gradient accumulation: split each batch into k microbatches inside ONE
    # jitted step (lax.scan over fwd+bwd, grads averaged, one optimizer
    # update) — peak activation memory scales with batch_size/k, enabling
    # effective batches beyond HBM. The reference PARSES
    # --accumulation-steps but never uses it (dead config,
    # /root/reference/code/config.py:102-104; SURVEY §2.9) — here it is
    # real. step/LR/eval semantics are unchanged (one loop iteration = one
    # optimizer update). NB: grads are the gradient of the MEAN of
    # per-microbatch losses — identical to the full-batch gradient for
    # batch-mean losses (CE/MSE); the batch-holistic Dice term becomes
    # per-microbatch Dice (the reference's semantics at the smaller batch).
    grad_accum_steps: int = 1


def fully_supervised_loss(model, variables, batch, rng, step):
    """0.5*(CE + Dice) on the whole batch; handles multi-head models by
    training on the main head."""
    mutable = ["batch_stats"] if "batch_stats" in variables else []
    out = model.apply(
        variables,
        batch["image"],
        deterministic=False,
        rngs={"dropout": rng},
        mutable=mutable,
    )
    if mutable:
        logits, updates = out
        new_bs = updates["batch_stats"]
    else:
        logits, new_bs = out, None
    if isinstance(logits, (tuple, list)):
        logits = logits[0]
    loss = supervised_ce_dice(logits, batch["label"])
    return loss, {"batch_stats": new_bs, "logs": {"loss_total": loss}}


class Trainer:
    # Subclasses whose jitted step is NOT the base microbatch-scannable
    # _train_step (multi-model methods: mean teacher, cross-teaching, ...)
    # set this False so grad_accum_steps>1 fails loudly instead of being
    # silently ignored.
    supports_grad_accum: bool = True

    def __init__(
        self,
        model,
        config: TrainConfig,
        method: Callable = fully_supervised_loss,
        mesh=None,
        tx=None,
    ):
        self.model = model
        self.config = config
        if config.grad_accum_steps > 1:
            if not self.supports_grad_accum:
                raise ValueError(
                    f"{type(self).__name__} does not support "
                    "grad_accum_steps>1: its train step is not the base "
                    "microbatch-scannable step"
                )
            if config.batch_size % config.grad_accum_steps:
                raise ValueError(
                    f"batch_size={config.batch_size} not divisible by "
                    f"grad_accum_steps={config.grad_accum_steps}"
                )
        self.method = method
        self.mesh = mesh if mesh is not None else make_mesh()
        self.tx = tx if tx is not None else poly_sgd(
            config.base_lr, config.max_iterations
        )
        self._predict = None
        self.state: Optional[TrainState] = None

        cfg = self.config
        sample = jnp.zeros(
            (cfg.batch_size, *cfg.patch_size, cfg.in_channels), jnp.float32
        )
        self.state = create_train_state(
            model, jax.random.key(cfg.seed), sample, self.tx
        )
        # Replicate state over the mesh; shard incoming batches on "data".
        rep = replicated(self.mesh)
        self.state = jax.device_put(self.state, rep)
        self._bsh = batch_sharding(self.mesh)

        self._step = jax.jit(self._train_step, donate_argnums=(0,))

    # --- jitted step ---------------------------------------------------
    def _train_step(self, state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rng = jax.random.fold_in(jax.random.key(self.config.seed), state.step)
        k = self.config.grad_accum_steps

        def loss_fn(params, batch_stats, mb, mb_rng):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            loss, aux = self.method(
                self.model, variables, mb, mb_rng, state.step
            )
            return loss, aux

        if k <= 1:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch, rng
            )
            new_bs = aux.get("batch_stats")
            logs = dict(aux.get("logs", {}))
        else:
            # microbatch scan: fwd+bwd once per microbatch (activations for
            # ONE microbatch live at a time), grads accumulated fp32-wise in
            # a param-sized tree, averaged, ONE optimizer update.
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((k, x.shape[0] // k) + x.shape[1:]),
                batch,
            )

            def body(carry, xs):
                g_acc, bs = carry
                mb, i = xs
                (loss, aux), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, bs, mb, jax.random.fold_in(rng, i))
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                bs = aux.get("batch_stats") or bs
                return (g_acc, bs), dict(aux.get("logs", {}))

            g0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (g_sum, new_bs), logs_mb = jax.lax.scan(
                body, (g0, state.batch_stats), (micro, jnp.arange(k))
            )
            grads = jax.tree_util.tree_map(lambda g: g / k, g_sum)
            logs = jax.tree_util.tree_map(
                lambda x: jnp.mean(x, axis=0), logs_mb
            )
            new_bs = new_bs if new_bs else None

        state = state.apply_gradients(grads, new_bs)
        logs["lr"] = poly_lr(self.config.base_lr, self.config.max_iterations)(
            state.step
        )
        return state, logs

    # --- eval ----------------------------------------------------------
    def predict_fn(self):
        """Jitted (B, ps, ps, 1) -> logits fn for slice inference."""
        if self._predict is None:
            variables_treedef = None

            @jax.jit
            def fwd(params, batch_stats, x):
                from mamba_unet_tpu.ops.selective_scan_persistent import (
                    inference_scan,
                )

                v = {"params": params}
                if batch_stats:
                    v["batch_stats"] = batch_stats
                with inference_scan():  # no-grad eval: persistent scan fwd
                    out = self.model.apply(v, x)
                return out[0] if isinstance(out, (tuple, list)) else out

            self._predict = fwd
        state = self.state
        return lambda x: self._predict(state.params, state.batch_stats, x)

    def evaluate(self, val_dataset, detailed: bool = False):
        """Mean Dice over val volumes x foreground classes (val_2D protocol).
        All volumes' slices are streamed through the device in one batched
        pass (only the global tail padded — see evaluate_slice_volumes).
        ``detailed=True`` additionally returns per-class (dice, hd95) means —
        the reference's per-class val scalars (train_*_2D.py:150-160)."""
        from mamba_unet_tpu.eval import evaluate_slice_volumes

        cfg = self.config
        arr = evaluate_slice_volumes(
            (val_dataset[i] for i in range(len(val_dataset))),
            self.predict_fn(), cfg.num_classes,
            patch_size=cfg.patch_size, batch_size=cfg.eval_batch_size,
        )  # (cases, classes-1, 2)
        mean_dice = float(arr[:, :, 0].mean())
        if detailed:
            return mean_dice, arr.mean(axis=0)  # (classes-1, 2)
        return mean_dice

    # --- resume ----------------------------------------------------------
    def _host_state(self) -> Dict[str, Any]:
        """Extra HOST-side state to ride in the periodic checkpoint (beyond
        the TrainState fields) — e.g. MagicNet's organ-class histogram.
        Keys must not collide with TrainState field names."""
        return {}

    def _restore_host_state(self, tree: Dict[str, Any]) -> None:
        """Inverse of ``_host_state``: re-install restored host-side state.
        ``tree`` holds only the host keys actually present in the saved
        checkpoint (legacy checkpoints may predate a host key)."""

    def _periodic_tree(self) -> Dict[str, Any]:
        """The pytree saved every ``ckpt_every`` and restored by resume.
        EMA-teacher methods extend it with ``ema_params`` — the reference's
        rich checkpoint carries the full method state the same way
        (util.py:54-94 ``save_checkpoint_4_2C``)."""
        tree = {"params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
                "step": self.state.step}
        if self.state.ema_params is not None:
            tree["ema_params"] = self.state.ema_params
        tree.update(self._host_state())
        return tree

    def try_resume(self) -> int:
        """Restore the newest periodic checkpoint (params/batch_stats/
        opt_state/step, + ema_params for EMA-teacher methods) from
        snapshot_dir; returns the restored step or 0. The reference's
        restore_model latest-ckpt scan (util.py:96-131). Legacy periodic
        checkpoints written before ema_params was part of the tree restore
        with the teacher RE-SEEDED from the restored student (correct up to
        EMA lag — far better than the random teacher a fresh init gives)."""
        from mamba_unet_tpu.utils import (
            checkpoint_top_keys,
            latest_step,
            restore_checkpoint,
        )

        cfg = self.config
        if not (cfg.resume and cfg.snapshot_dir):
            return 0
        step = latest_step(cfg.snapshot_dir)
        if step is None:
            return 0
        target = self._periodic_tree()
        # Legacy detection by STRUCTURE (orbax metadata), not by catching
        # restore failures: a corrupted new-format checkpoint must surface
        # its real error, not silently resume with the EMA teacher replaced
        # by a student copy.
        saved_keys = checkpoint_top_keys(cfg.snapshot_dir, step)
        host_keys = set(self._host_state())
        if saved_keys is not None:
            # host keys absent from the saved tree (legacy checkpoint):
            # keep the live value rather than failing the whole restore
            for k in host_keys - saved_keys:
                target.pop(k)
        if ("ema_params" in target and saved_keys is not None
                and "ema_params" not in saved_keys):
            legacy = {k: v for k, v in target.items() if k != "ema_params"}
            restored = restore_checkpoint(cfg.snapshot_dir, step, legacy)
            restored["ema_params"] = jax.tree_util.tree_map(
                jnp.copy, restored["params"]
            )
            log.warning(
                "periodic checkpoint at step %d predates ema_params; "
                "re-seeding the EMA teacher from the restored student", step
            )
        else:
            restored = restore_checkpoint(cfg.snapshot_dir, step, target)
        host = {k: restored.pop(k) for k in host_keys if k in restored}
        # re-assert replication: orbax restores arrays committed to the
        # default device, and a committed single-device leaf conflicts with
        # mesh-sharded batches inside the donated jit step
        self.state = jax.device_put(self.state.replace(**restored),
                                    replicated(self.mesh))
        self._restore_host_state(host)
        log.info("resumed from %s @ step %d", cfg.snapshot_dir, step)
        return step

    def _load_best_marks(self, names=("best",)):
        """Best-Dice high-water marks from the sidecar (0.0 when absent) —
        so a resumed run cannot overwrite a better ``best_*`` lineage."""
        from mamba_unet_tpu.utils import load_best_marks

        marks = (load_best_marks(self.config.snapshot_dir)
                 if self.config.snapshot_dir else {})
        return [float(marks.get(n, 0.0)) for n in names]

    # --- the loop ------------------------------------------------------
    def fit(self, train_loader, val_dataset=None) -> Dict[str, Any]:
        cfg = self.config
        history = []
        it = it0 = self.try_resume()
        # Marks load whenever resume is REQUESTED, not only when a periodic
        # checkpoint was found: a run killed after a best save but before the
        # first periodic save leaves marks + best_* but no state_* — gating
        # on it0 would reset best to 0.0 and let the first eval overwrite
        # the better best lineage (which cli/test.py then loads).
        (best_dice,) = self._load_best_marks() if cfg.resume else (0.0,)
        tb = None
        if cfg.tensorboard and cfg.snapshot_dir:
            from mamba_unet_tpu.utils.experiment import TensorboardLogger

            tb = TensorboardLogger(f"{cfg.snapshot_dir}/log")
        t0 = time.time()
        for batch in train_loader:
            if it >= cfg.max_iterations:
                break
            batch = {
                "image": jax.device_put(batch["image"], self._bsh),
                "label": jax.device_put(batch["label"], self._bsh),
            }
            self.state, logs = self._step(self.state, batch)
            it += 1
            if it % cfg.log_every == 0 or it == 1:
                loss = float(logs["loss_total"])
                lr = float(logs["lr"]) if "lr" in logs else float("nan")
                log.info(
                    "iter %d loss %.4f lr %.5f (%.1f it/s)",
                    it, loss, lr, (it - it0) / (time.time() - t0),
                )
                history.append({"iter": it, "loss": loss})
                if tb is not None:
                    tb.scalars(it, {"info/total_loss": loss, "info/lr": lr})
            if val_dataset is not None and it % cfg.eval_every == 0:
                dice, per_class = self.evaluate(val_dataset, detailed=True)
                log.info("iter %d val mean dice %.4f (best %.4f)", it, dice, best_dice)
                history.append({"iter": it, "val_dice": dice})
                if tb is not None:
                    scalars = {"info/val_mean_dice": dice,
                               "info/val_mean_hd95": float(per_class[:, 1].mean())}
                    for c in range(per_class.shape[0]):
                        scalars[f"info/val_{c + 1}_dice"] = float(per_class[c, 0])
                        scalars[f"info/val_{c + 1}_hd95"] = float(per_class[c, 1])
                    tb.scalars(it, scalars)
                if dice > best_dice:
                    best_dice = dice
                    if cfg.snapshot_dir:
                        save_checkpoint(
                            cfg.snapshot_dir, it,
                            {"params": self.state.params,
                             "batch_stats": self.state.batch_stats},
                            name="best",
                        )
                        save_best_marks(cfg.snapshot_dir, {"best": best_dice})
            if cfg.snapshot_dir and it % cfg.ckpt_every == 0:
                save_checkpoint(cfg.snapshot_dir, it, self._periodic_tree())
        if tb is not None:
            tb.close()
        return {"best_dice": best_dice, "iterations": it, "history": history}
