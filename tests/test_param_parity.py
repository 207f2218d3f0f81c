"""Parameter-count parity vs the reference PyTorch models.

Imports the reference in place (no code copied) via package shims for its
broken import names ('models' -> model/, 'attention' -> 'attention:') and
asserts every zoo model has EXACTLY the reference's parameter count —
including declared-but-unused parameters. Skipped when /root/reference is
not mounted.
"""

import os
import sys
import types

import pytest

REFERENCE = "/root/reference"

pytestmark = [
    pytest.mark.medium,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REFERENCE, "model")),
        reason="reference checkout not available",
    ),
]


@pytest.fixture(scope="module")
def ref_counts():
    sys.modules.setdefault("imp", types.ModuleType("imp"))  # removed in py3.12
    models_pkg = types.ModuleType("models")
    models_pkg.__path__ = [os.path.join(REFERENCE, "model")]
    sys.modules.setdefault("models", models_pkg)
    att_pkg = types.ModuleType("attention")
    att_pkg.__path__ = [os.path.join(REFERENCE, "attention:")]
    sys.modules.setdefault("attention", att_pkg)

    from models.DialogueRNN import BiModel as TBiModel
    from models.HybridRNN import MARN as TMARN
    from models.HybridRNN_AT import MARN as TMARN_AT
    from models.HybridRNN_ATV import MARN as TMARN_ATV
    from models.lsthm_azs import MARN1_azs
    from models.lsthm_cf import MARN1_cf
    from models.lsthm_la import MARN1_la
    from models.lsthm_mf import MARN1_mf
    from models.lsthm_newz import MARN1_newz
    from models.lsthm_no_en import MARN1_no_en
    from models.lsthm_nsps import MARN1_nsps
    from models.lsthm_onlysp import MARN1_onlysp
    from models.lsthm_sp import MARN1_sp
    from models.lsthm_sps import MARN1_sps
    from models.lstm import BiLSTM as TBiLSTM

    ref = {
        "MARN1_onlysp": MARN1_onlysp(6),
        "MARN1_sp": MARN1_sp(6),
        "MARN1_sps": MARN1_sps(6),
        "MARN1_nsps": MARN1_nsps(6, "IEMOCAP"),
        "MARN1_no_en": MARN1_no_en(6, "IEMOCAP"),
        "MARN1_cf": MARN1_cf(6),
        "MARN1_mf": MARN1_mf(6),
        "MARN1_la": MARN1_la(6),
        "MARN1_azs": MARN1_azs(6),
        "MARN1_newz": MARN1_newz(),
        "BiLSTM": TBiLSTM(),
        "MARN": TMARN(),
        "MARN_AT": TMARN_AT(),
        "MARN_ATV": TMARN_ATV(),
        "DialogueRNN": TBiModel(
            712, 500, 500, 300, 300, n_classes=6, listener_state=True,
            context_attention="general", dropout_rec=0.1, dropout=0.1),
    }
    return {k: sum(p.numel() for p in m.parameters()) for k, m in ref.items()}


@pytest.mark.parametrize("name", [
    "MARN1_onlysp", "MARN1_sp", "MARN1_sps", "MARN1_nsps", "MARN1_no_en",
    "MARN1_cf", "MARN1_mf", "MARN1_la", "MARN1_azs", "MARN1_newz",
    "BiLSTM", "MARN", "MARN_AT", "MARN_ATV", "DialogueRNN",
])
def test_param_count_matches_reference(name, ref_counts):
    import jax
    import jax.numpy as jnp

    from ser_tpu.data.synthetic import synthetic_batch
    from ser_tpu.models.registry import get_model_spec

    spec = get_model_spec(name)
    model = spec.build(6, "IEMOCAP")
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(L=8, B=2).items() if k != "vid"}
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, *args,
                        deterministic=True)["params"]
    ours = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert ours == ref_counts[name], (
        f"{name}: ours={ours} ref={ref_counts[name]} "
        f"(diff {ours - ref_counts[name]:+d})"
    )
