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
