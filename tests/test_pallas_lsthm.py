"""Fused Pallas recurrence == lax.scan recurrence (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from ser_tpu.data.synthetic import synthetic_batch
from ser_tpu.models.marn_onlysp import MARN1OnlySP, MARNCellOnlySP


def test_pallas_cell_matches_scan():
    L, B = 11, 5
    batch = synthetic_batch(L=L, B=B, seed=2)
    x_l = jnp.asarray(batch["acouf"])  # any [L,B,100] features
    x_a = jnp.asarray(batch["acouf"][:, :, ::-1].copy())
    qmask = jnp.asarray(batch["qmask"])

    scan_cell = MARNCellOnlySP(pallas="off")
    key = jax.random.PRNGKey(0)
    params = scan_cell.init({"params": key, "dropout": key},
                            x_l, x_a, qmask, deterministic=True)["params"]

    y_scan = scan_cell.apply({"params": params}, x_l, x_a, qmask,
                             deterministic=True)
    pallas_cell = MARNCellOnlySP(pallas="interpret")
    y_pallas = pallas_cell.apply({"params": params}, x_l, x_a, qmask,
                                 deterministic=True)

    assert y_pallas.shape == y_scan.shape
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_scan),
                               rtol=1e-5, atol=1e-5)


def test_pallas_full_model_matches_scan():
    L, B = 9, 3
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(L=L, B=B, seed=4).items() if k != "vid"}
    textf = (batch["r1"] + batch["r2"] + batch["r3"] + batch["r4"]) / 4
    x = jnp.concatenate([textf, batch["acouf"]], axis=-1)

    scan_model = MARN1OnlySP(n_classes=6)
    key = jax.random.PRNGKey(1)
    params = scan_model.init(
        {"params": key, "dropout": key},
        x, batch["qmask"], batch["umask"], deterministic=True)["params"]

    logp_scan = scan_model.apply(
        {"params": params}, x, batch["qmask"], batch["umask"],
        deterministic=True)[0]

    import flax.linen as nn

    class PallasModel(MARN1OnlySP):
        pass

    # swap the cells to pallas-interpret via module substitution
    import ser_tpu.models.marn_onlysp as mod

    orig = mod.MARNCellOnlySP
    try:
        mod.MARNCellOnlySP = lambda name: orig(pallas="interpret", name=name)
        logp_pallas = MARN1OnlySP(n_classes=6).apply(
            {"params": params}, x, batch["qmask"], batch["umask"],
            deterministic=True)[0]
    finally:
        mod.MARNCellOnlySP = orig

    np.testing.assert_allclose(np.asarray(logp_pallas),
                               np.asarray(logp_scan), rtol=1e-5, atol=1e-5)


def test_bidir_kernel_matches_fused_scan():
    """The direction-batched kernel == the direction-vmapped scan step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ser_tpu.models.marn_onlysp import _eval_step
    from ser_tpu.ops.pallas.lsthm import lsthm_onlysp_recurrence_bidir

    T, B, H = 9, 3, 128
    rng = np.random.default_rng(11)
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    sp = rng.integers(0, 2, size=(T, 2, B))
    qm = np.zeros((T, 2, B, 2), np.float32)
    qm[np.arange(T)[:, None, None], np.arange(2)[None, :, None],
       np.arange(B)[None, None, :], sp] = 1
    seqs = (f(T, 2, B, 4 * H), f(T, 2, B, 4 * H), f(T, 2, B, 3 * H),
            jnp.asarray(qm))
    consts = (f(2, 3 * H, 4 * H), f(2, 4 * H), f(2, 3 * H, 4 * H),
              f(2, 4 * H), f(2, H, 3 * H), f(2, 3 * H), f(2, H), f(2, H))

    out = lsthm_onlysp_recurrence_bidir(seqs, consts, interpret=True)

    init = tuple(jnp.zeros((2, B, H)) for _ in range(5)) + (
        jnp.zeros((2, B, 2, H)),)
    _, ys = jax.lax.scan(
        lambda c, xs: jax.vmap(_eval_step, in_axes=(0, 0, 0))(consts, c, xs),
        init, seqs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ys),
                               rtol=1e-5, atol=1e-5)


def test_stacked_eval_path_matches_scan_full_model():
    """config.ONLYSP_STACKED='interpret': the production eval fast path
    (gather -> stacked kernel) == the fused-scan eval path, end to end
    through MARN1OnlySP (encoders, seq attentions, head included)."""
    from ser_tpu import config

    L, B = 9, 3
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(L=L, B=B, seed=6).items() if k != "vid"}
    textf = (batch["r1"] + batch["r2"] + batch["r3"] + batch["r4"]) / 4
    x = jnp.concatenate([textf, batch["acouf"]], axis=-1)

    model = MARN1OnlySP(n_classes=6)
    key = jax.random.PRNGKey(3)
    params = model.init(
        {"params": key, "dropout": key},
        x, batch["qmask"], batch["umask"], deterministic=True)["params"]

    logp_scan = model.apply(
        {"params": params}, x, batch["qmask"], batch["umask"],
        deterministic=True)[0]

    old = config.ONLYSP_STACKED
    try:
        config.ONLYSP_STACKED = "interpret"
        logp_stacked = model.apply(
            {"params": params}, x, batch["qmask"], batch["umask"],
            deterministic=True)[0]
    finally:
        config.ONLYSP_STACKED = old

    np.testing.assert_allclose(np.asarray(logp_stacked),
                               np.asarray(logp_scan), rtol=1e-5, atol=1e-5)


import pytest


@pytest.mark.parametrize("B", [3, 56])
def test_bidir_stacked_kernel_matches_fused_scan(B):
    """The ROW-stacked direction kernel == the direction-vmapped scan step.
    B=3: per-direction pad to 8, single attention block; B=56: R=112
    engages the attention i-chunking (IC=64)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ser_tpu.models.marn_onlysp import _eval_step
    from ser_tpu.ops.pallas.lsthm import (
        lsthm_onlysp_recurrence_bidir_stacked)

    T, H = 9, 128
    rng = np.random.default_rng(12)
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    sp = rng.integers(0, 2, size=(T, 2, B))
    qm = np.zeros((T, 2, B, 2), np.float32)
    qm[np.arange(T)[:, None, None], np.arange(2)[None, :, None],
       np.arange(B)[None, None, :], sp] = 1
    seqs = (f(T, 2, B, 4 * H), f(T, 2, B, 4 * H), f(T, 2, B, 3 * H),
            jnp.asarray(qm))
    consts = (f(2, 3 * H, 4 * H), f(2, 4 * H), f(2, 3 * H, 4 * H),
              f(2, 4 * H), f(2, H, 3 * H), f(2, 3 * H), f(2, H), f(2, H))

    out = lsthm_onlysp_recurrence_bidir_stacked(seqs, consts, interpret=True)

    init = tuple(jnp.zeros((2, B, H)) for _ in range(5)) + (
        jnp.zeros((2, B, 2, H)),)
    _, ys = jax.lax.scan(
        lambda c, xs: jax.vmap(_eval_step, in_axes=(0, 0, 0))(consts, c, xs),
        init, seqs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ys),
                               rtol=1e-5, atol=1e-5)


def test_onlysp_stacked_gate():
    """config.onlysp_stacked: off/on/auto decisions (auto requires the TPU
    backend, so it is False under the CPU test runner regardless of shape)."""
    from ser_tpu import config

    old = config.ONLYSP_STACKED
    try:
        config.ONLYSP_STACKED = "off"
        assert not config.onlysp_stacked(31, 2, True)
        config.ONLYSP_STACKED = "on"
        assert config.onlysp_stacked(31, 2, True)
        assert not config.onlysp_stacked(31, 3, True)   # P != 2
        assert not config.onlysp_stacked(31, 2, False)  # dims off
        config.ONLYSP_STACKED = "auto"
        # CPU backend here: the auto gate must refuse even at good shapes
        assert not config.onlysp_stacked(31, 2, True)
    finally:
        config.ONLYSP_STACKED = old


def test_force_scan_context():
    from ser_tpu import config

    old = config.ONLYSP_STACKED
    try:
        config.ONLYSP_STACKED = "on"
        with config.force_scan():
            assert config.ONLYSP_STACKED == "off"
            assert not config.onlysp_stacked(31, 2, True)
        assert config.ONLYSP_STACKED == "on"
    finally:
        config.ONLYSP_STACKED = old
