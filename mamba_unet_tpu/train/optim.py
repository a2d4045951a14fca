"""Optimizer: SGD(momentum .9, wd 1e-4) with per-iteration poly LR decay —
the hardcoded optimization of every reference script
(``/root/reference/code/train_fully_supervised_2D.py:118-120``):

    lr_t = base_lr * (1 - iter/max_iter)^0.9

torch-SGD semantics: weight decay added to the gradient BEFORE the momentum
buffer, update = -lr * buf.
"""

from __future__ import annotations

import optax


def poly_lr(base_lr: float, max_iters: int, power: float = 0.9):
    def schedule(count):
        frac = 1.0 - count / max_iters
        return base_lr * (frac**power)

    return schedule


def poly_sgd(
    base_lr: float = 0.01,
    max_iters: int = 10_000,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    power: float = 0.9,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(poly_lr(base_lr, max_iters, power)),
    )


def warmup_adamw(
    base_lr: float = 1e-3,
    max_iters: int = 10_000,
    weight_decay: float = 0.05,
    warmup_iters: int = 250,
    power: float = 0.9,
) -> optax.GradientTransformation:
    """AdamW + linear warmup + poly decay — for training the transformer/
    Mamba models FROM SCRATCH. The reference never does this (every ViM/ViT
    script warm-starts from ImageNet weights, vision_mamba.py:48-83, and its
    yacs TRAIN.* AdamW section is dead config); upstream VMamba itself
    pretrains with AdamW + warmup, and from-scratch SGD at the reference's
    lr collapses the VSSM to the background class (docs/EVIDENCE.md)."""
    sched = optax.join_schedules(
        [
            optax.linear_schedule(0.0, base_lr, warmup_iters),
            poly_lr(base_lr, max(max_iters - warmup_iters, 1), power),
        ],
        [warmup_iters],
    )
    return optax.adamw(sched, weight_decay=weight_decay)
