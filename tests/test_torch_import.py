"""Torch-checkpoint importer round trip (product surface, VERDICT r1 #2).

Saves a reference-format checkpoint exactly the way the reference trainer
does — ``torch.save`` of the whole ModelTrainer state dict, so every key is
prefixed ``model.`` (``/root/reference/model_trainer.py:170-171``) — then
imports it through ``ModelTrainer.load_parameters(torch_format=True)`` and
checks per-utterance logit parity. Also checks the tolerant-load semantics
(unknown keys and shape mismatches are warned + skipped).

Skipped when /root/reference is not mounted.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = [
    pytest.mark.medium,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REFERENCE, "model")),
        reason="reference checkout not available",
    ),
]


def _shim_reference():
    sys.modules.setdefault("imp", types.ModuleType("imp"))
    models_pkg = types.ModuleType("models")
    models_pkg.__path__ = [os.path.join(REFERENCE, "model")]
    sys.modules.setdefault("models", models_pkg)
    att_pkg = types.ModuleType("attention")
    att_pkg.__path__ = [os.path.join(REFERENCE, "attention:")]
    sys.modules.setdefault("attention", att_pkg)


def test_trainer_checkpoint_roundtrip(tmp_path):
    _shim_reference()
    import torch

    from models.lsthm_onlysp import MARN1_onlysp

    torch.manual_seed(21)
    ref = MARN1_onlysp(6)
    ref.eval()

    # save exactly like the reference trainer: whole-module state dict with
    # the model under the "model." prefix
    sd = {f"model.{k}": v for k, v in ref.state_dict().items()}
    path = tmp_path / "model_0001.model"
    torch.save(sd, str(path))

    rng = np.random.default_rng(0)
    L, B = 10, 3
    x = rng.standard_normal((L, B, 1124)).astype(np.float32)
    umask = np.ones((B, L), np.float32)
    sp = rng.integers(0, 2, size=(L, B))
    qmask = np.zeros((L, B, 2), np.float32)
    qmask[np.arange(L)[:, None], np.arange(B)[None, :], sp] = 1.0
    with torch.no_grad():
        ref_logp, _, _ = ref(
            torch.tensor(x), torch.tensor(qmask), torch.tensor(umask))

    from ser_tpu.train.trainer import ModelTrainer

    trainer = ModelTrainer(model="MARN1_onlysp", n_classes=6)
    trainer.load_parameters(str(path), torch_format=True)

    import jax.numpy as jnp

    logp = trainer._forward(
        trainer.params,
        {"r1": jnp.asarray(x[:, :, :1024]), "r2": jnp.asarray(x[:, :, :1024]),
         "r3": jnp.asarray(x[:, :, :1024]), "r4": jnp.asarray(x[:, :, :1024]),
         "acouf": jnp.asarray(x[:, :, 1024:]), "qmask": jnp.asarray(qmask),
         "umask": jnp.asarray(umask)},
        deterministic=True)
    np.testing.assert_allclose(
        np.asarray(logp), ref_logp.numpy(), rtol=1e-3, atol=3e-4)
    assert (np.asarray(logp).argmax(1) == ref_logp.numpy().argmax(1)).all()


def test_tolerant_import_warnings(tmp_path):
    _shim_reference()
    import torch

    from models.lsthm_onlysp import MARN1_onlysp

    torch.manual_seed(22)
    ref = MARN1_onlysp(6)
    sd = ref.state_dict()
    # corrupt: drop one key, mis-size another (reference load_parameters
    # tolerates both with prints, model_trainer.py:180-186)
    del sd["w"]
    sd["v"] = torch.ones(7)
    path = tmp_path / "partial.model"
    torch.save(sd, str(path))

    from ser_tpu.compat.torch_import import import_torch_checkpoint
    from ser_tpu.train.trainer import ModelTrainer

    trainer = ModelTrainer(model="MARN1_onlysp", n_classes=6)
    before_w = np.asarray(trainer.params["w"]).copy()
    before_v = np.asarray(trainer.params["v"]).copy()
    before_v1 = np.asarray(trainer.params["v1"]).copy()

    logs = []
    new_params = import_torch_checkpoint(
        trainer.params, str(path), "MARN1_onlysp", log=logs.append)

    # dropped key: warned at conversion, value untouched
    assert any("w" in m and "not in the checkpoint" in m for m in logs)
    np.testing.assert_array_equal(np.asarray(new_params["w"]), before_w)
    # mis-sized key: warned at merge, value untouched
    assert any(m.startswith("Wrong parameter length: v,") for m in logs)
    np.testing.assert_array_equal(np.asarray(new_params["v"]), before_v)
    # a healthy sibling was loaded (v1 is ones-init in both, so check via
    # a key whose torch init differs from ours deterministically)
    assert np.asarray(new_params["v1"]).shape == before_v1.shape
    got = np.asarray(new_params["nn_out_3"]["kernel"])
    want = sd["nn_out.3.weight"].numpy().T
    np.testing.assert_allclose(got, want, rtol=1e-6)
