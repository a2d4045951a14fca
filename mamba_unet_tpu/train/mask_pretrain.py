"""Self-supervised mask pretraining: shuffled + masked recovery + location.

Ref: ``/root/reference/code/train_Semi_MagicNet_2D_mask_pretrain.py:188-191``:
loss = shuffled_recovery + mask_recovery + 0.1 * cube_location_loss, no
labels consumed — pure SSL warm-start for the mask MagicNet.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mamba_unet_tpu.objectives.cube import get_patch_list
from mamba_unet_tpu.objectives.losses import cross_entropy_loss
from mamba_unet_tpu.objectives.masked import (
    make_masked_input,
    make_shuffled_input,
    recovery_mse,
)
from mamba_unet_tpu.train.state import TrainState
from mamba_unet_tpu.train.trainer import TrainConfig, Trainer


class MaskPretrainTrainer(Trainer):
    supports_grad_accum = False  # masked-recon step, not the base step

    def __init__(self, model, config: TrainConfig, cube_size: int = 32,
                 masked_rate: float = 0.25, loc_weight: float = 0.1, **kw):
        self.cube_size = cube_size
        self.masked_rate = masked_rate
        self.loc_weight = loc_weight
        super().__init__(model, config, **kw)
        sample = jnp.zeros(
            (config.batch_size, *config.patch_size, 1), jnp.float32
        )
        variables = jax.jit(
            lambda r, x: model.init(r, x, method="init_all")
        )(jax.random.key(config.seed), sample)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            tx=self.tx,
        )
        self._step = jax.jit(self._train_step, donate_argnums=(0,))

    def _train_step(self, state: TrainState, batch):
        cfg = self.config
        rng = jax.random.fold_in(jax.random.key(cfg.seed), state.step)
        r_shuf, r_mask, r_bn = jax.random.split(rng, 3)
        image = batch["image"]
        bsz = image.shape[0]
        nb = image.shape[1] // self.cube_size
        P = nb * nb

        shuffled, perms = make_shuffled_input(r_shuf, image, self.cube_size)
        masked, vis = make_masked_input(r_mask, image, self.cube_size,
                                        self.masked_rate)

        def loss_fn(params):
            v = state.variables(params)

            def head(x, pos_embed=None, mask=None):
                out, upd = self.model.apply(
                    v, x, pos_embed, mask, method="forward_mix_pos_mask",
                    deterministic=False, mutable=["batch_stats"],
                    rngs={"dropout": r_bn},
                )
                return out, upd["batch_stats"]

            clean, bs = head(image)
            shuf_out, _ = head(shuffled, pos_embed=perms.astype(jnp.float32))
            mask_out, _ = head(masked, mask=vis)
            shuffled_loss = recovery_mse(clean, shuf_out)
            mask_loss = recovery_mse(clean, mask_out)

            # cube-location task on the clean image
            patches = get_patch_list(image, self.cube_size)
            flat_p = patches.reshape(bsz * P, *patches.shape[2:])
            feats = self.model.apply(v, flat_p, method="forward_encoder")
            bott = feats[-1].reshape(bsz * P, -1)
            loc_logits, _ = self.model.apply(
                v, bott, method="forward_location", deterministic=False,
                mutable=["batch_stats"], rngs={"dropout": r_bn},
            )
            loc = cross_entropy_loss(loc_logits, jnp.tile(jnp.arange(P), bsz))

            total = shuffled_loss + mask_loss + self.loc_weight * loc
            return total, {"batch_stats": bs,
                           "logs": {"loss_total": total,
                                    "loss_shuffled": shuffled_loss,
                                    "loss_mask": mask_loss, "loss_loc": loc}}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads, aux["batch_stats"])
        return state, aux["logs"]
