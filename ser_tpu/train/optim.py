"""Optimizer — torch-Adam semantics with StepLR scheduling.

The reference uses ``torch.optim.Adam(lr, weight_decay=2e-5)`` +
``StepLR(step_size=test_step, gamma=lr_decay)`` stepped per epoch
(``model_trainer.py:82-83,92``). torch's Adam applies weight decay as
L2-coupled (added to the gradient *before* the moment updates), unlike
optax.adamw's decoupled decay — so we chain ``add_decayed_weights`` before
``scale_by_adam``. The learning rate is injected per-epoch so the schedule is
exactly StepLR: ``lr = lr0 * gamma^floor((epoch-1)/step_size)``.
"""

from __future__ import annotations

import optax


def torch_adam(weight_decay: float = 2e-5, b1=0.9, b2=0.999, eps=1e-8):
    """Adam with torch-style coupled weight decay; lr injected at update."""
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
            optax.scale(-learning_rate),
        )
    )(learning_rate=0.0)


def step_lr(base_lr: float, gamma: float, step_size: int):
    """StepLR(epoch) — epoch is 1-based as in the reference train loop."""

    def lr_at(epoch: int) -> float:
        return base_lr * (gamma ** ((epoch - 1) // step_size))

    return lr_at
