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


def _mask_dead_params(inner):
    """torch semantics for structurally-unused parameters.

    torch's Adam SKIPS any param whose ``.grad is None`` — i.e. params not
    in the autograd graph. The reference declares many dead/parity-only
    params (onlysp's ``crossatt_a2l.*``, the encoder's ``pos_ffn.fc``, the
    dormant MARN recurrence, ...) and they stay frozen at init for the
    whole training run. In JAX a structurally-unused param comes back as
    an EXACT all-zeros gradient leaf, and without this wrapper the coupled
    weight decay would turn that into ``-lr*sign(p)`` per step (Adam's
    first-step normalization), drifting dead params toward zero at full
    learning-rate speed. Masking rule: a leaf with all-zero gradient gets
    a zero update (measured: one unmasked step moved ~700k dead
    coordinates by ~lr on MARN1_onlysp). A LIVE param that happens to see
    an all-zero gradient for one step (fully-padded batch) is frozen for
    that step too, where torch would apply pure weight decay — a
    documented edge deviation the reference data never hits."""
    import jax
    import jax.numpy as jnp

    def init(params):
        return inner.init(params)

    def update(grads, state, params=None, **extra):
        upd, state = inner.update(grads, state, params, **extra)
        upd = jax.tree_util.tree_map(
            lambda u, g: jnp.where(jnp.any(g != 0), u, jnp.zeros_like(u)),
            upd, grads)
        return upd, state

    return optax.GradientTransformation(init, update)


def torch_adam(weight_decay: float = 2e-5, b1=0.9, b2=0.999, eps=1e-8):
    """Adam with torch-style coupled weight decay; lr injected at update.

    Wrapped in ``_mask_dead_params`` so structurally-dead parameters stay
    frozen exactly like torch's grad-is-None skip."""
    return optax.inject_hyperparams(
        lambda learning_rate: _mask_dead_params(optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
            optax.scale(-learning_rate),
        ))
    )(learning_rate=0.0)


def step_lr(base_lr: float, gamma: float, step_size: int):
    """StepLR(epoch) — epoch is 1-based as in the reference train loop."""

    def lr_at(epoch: int) -> float:
        return base_lr * (gamma ** ((epoch - 1) // step_size))

    return lr_at
