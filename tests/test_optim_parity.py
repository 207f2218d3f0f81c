"""torch-Adam + StepLR semantics vs torch.optim oracles."""

import jax.numpy as jnp
import numpy as np

from ser_tpu.train.optim import step_lr, torch_adam


def test_adam_matches_torch_per_step():
    import torch

    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((4, 6)).astype(np.float32)
    grads = [rng.standard_normal((4, 6)).astype(np.float32) for _ in range(5)]
    lr, wd = 1e-3, 2e-5

    # torch oracle (reference optimizer config, model_trainer.py:82)
    pt = torch.nn.Parameter(torch.tensor(p0.copy()))
    opt = torch.optim.Adam([pt], lr=lr, weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        pt.grad = torch.tensor(g)
        opt.step()

    # ours
    tx = torch_adam(weight_decay=wd)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        state.hyperparams["learning_rate"] = jnp.float32(lr)
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = {"w": params["w"] + updates["w"]}

    np.testing.assert_allclose(np.asarray(params["w"]),
                               pt.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_dead_param_frozen_like_torch_grad_none():
    """torch's Adam skips params with grad None — the reference's dead /
    parity-only params (onlysp crossatt_a2l.*, encoder pos_ffn.fc, ...)
    stay at init for the whole run. Our structurally-dead leaves come back
    as exact all-zero gradients; the _mask_dead_params wrapper must freeze
    them (without it, coupled wd + Adam's first-step normalization drifts
    them by ~lr per step). Live leaves in the same tree keep torch parity."""
    import torch

    rng = np.random.default_rng(1)
    p_live = rng.standard_normal((3, 5)).astype(np.float32)
    p_dead = rng.standard_normal((4, 2)).astype(np.float32)
    lr, wd = 1e-3, 2e-5

    # torch oracle: dead param never receives a grad -> never updated
    t_live = torch.nn.Parameter(torch.tensor(p_live.copy()))
    t_dead = torch.nn.Parameter(torch.tensor(p_dead.copy()))
    opt = torch.optim.Adam([t_live, t_dead], lr=lr, weight_decay=wd)
    gs = [rng.standard_normal((3, 5)).astype(np.float32) for _ in range(3)]
    for g in gs:
        opt.zero_grad()
        t_live.grad = torch.tensor(g)
        opt.step()

    tx = torch_adam(weight_decay=wd)
    params = {"live": jnp.asarray(p_live), "dead": jnp.asarray(p_dead)}
    state = tx.init(params)
    for g in gs:
        state.hyperparams["learning_rate"] = jnp.float32(lr)
        grads = {"live": jnp.asarray(g),
                 "dead": jnp.zeros_like(params["dead"])}
        updates, state = tx.update(grads, state, params)
        params = {k: params[k] + updates[k] for k in params}

    np.testing.assert_array_equal(np.asarray(params["dead"]), p_dead)
    np.testing.assert_allclose(np.asarray(params["live"]),
                               t_live.detach().numpy(),
                               rtol=1e-5, atol=1e-7)


def test_steplr_matches_torch_schedule():
    import torch

    base_lr, gamma, step_size = 1e-3, 0.98, 3
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=base_lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=step_size,
                                            gamma=gamma)
    ours = step_lr(base_lr, gamma, step_size)
    # the reference calls scheduler.step(epoch - 1) then reads the lr
    # (model_trainer.py:92-93)
    for epoch in range(1, 12):
        sched.step(epoch - 1)
        torch_lr = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(ours(epoch), torch_lr, rtol=1e-10)
