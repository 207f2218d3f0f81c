"""Golden-logit regression: fixed-seed outputs of ALL 15 zoo models.

SURVEY §4's recommended fixed-seed golden test: any refactor of the ops or
model layers that changes the math (rather than just the schedule) trips
this. Goldens are stored as summary statistics (robust to benign float
reassociation at 1e-5, sensitive to real changes).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ser_tpu.data.synthetic import synthetic_batch
from ser_tpu.models.registry import get_model_spec

# Recorded from the initial verified implementation (CPU, seed 0/1, L=10,B=3).
GOLDEN = {
    "sum": -323.77112,
    "abs_mean": 1.7987285,
    "row0": [-1.8989418, -2.0445075, -1.7849554,
             -1.6298325, -1.6480781, -1.8039771],
}

# DialogueRNN golden (CPU, seed 0/1, L=10, B=3): pins the recurrence +
# matchatt math across refactors of the generic/fast2 paths (the fast2
# equivalence test only compares the two paths against each other).
GOLDEN_DRNN = {"sum": -322.61975, "abs_mean": 1.7923319}

# Every remaining zoo entry (any refactor of the shared scaffolding —
# _fused_directions touches all 15 models — trips one of these even when
# the flagship happens to survive). Notable shapes:
#   sps:  per-party dual-LSTM compaction + re-attention head, log-probs
#   ATV/AT/BiLSTM/MARN: SOFTMAX-PROB rows (sum is the shape-invariant
#         L*B=30 there — std + row0 carry the math); AT is 7-class
#   newz: unidirectional EMA z-update, raw-logit head
GOLDEN_MORE = {
    "MARN1_sps": {"sum": -333.01416, "std": 0.3413273,
                  "row0": [-2.1827567, -2.0957849, -1.7608767,
                           -1.5693736, -1.3767908, -2.0261726]},
    "MARN_ATV": {"sum": 30.0, "std": 0.0164202,
                 "row0": [0.152716, 0.1409864, 0.1658236,
                          0.1809386, 0.1846417, 0.1748937]},
    "MARN1_newz": {"sum": 0.49188, "std": 0.0931045,
                   "row0": [-0.0663448, -0.147727, 0.0172506,
                            0.0899341, 0.1054326, 0.0486565]},
    "MARN1_sp": {"sum": -323.23642, "std": 0.0903852,
                 "row0": [-1.8795588, -1.9533595, -1.746417,
                          -1.7276329, -1.710605, -1.7562747]},
    "MARN1_cf": {"sum": -323.26920, "std": 0.0924606,
                 "row0": [-1.87342, -1.9578102, -1.7417539,
                          -1.7269387, -1.7114799, -1.7626113]},
    "MARN1_mf": {"sum": -323.30444, "std": 0.0942514,
                 "row0": [-1.8311437, -2.0266347, -1.7546129,
                          -1.7857983, -1.6128123, -1.7836252]},
    "MARN1_la": {"sum": -323.15985, "std": 0.0855602,
                 "row0": [-1.8683175, -1.95594, -1.7558956,
                          -1.7447687, -1.6988271, -1.7495644]},
    "MARN1_azs": {"sum": -323.32120, "std": 0.0956179,
                  "row0": [-1.8613381, -1.9685134, -1.7202553,
                           -1.7422266, -1.7163379, -1.7661058]},
    "MARN1_nsps": {"sum": -324.57990, "std": 0.1536412,
                   "row0": [-1.9420027, -2.0267687, -1.7298894,
                            -1.6926204, -1.6876686, -1.7229869]},
    "MARN1_no_en": {"sum": -323.91623, "std": 0.1264159,
                    "row0": [-1.9272089, -1.9811542, -1.7457818,
                             -1.7288244, -1.7089748, -1.6956314]},
    "BiLSTM": {"sum": 30.0, "std": 0.0166916,
               "row0": [0.1541664, 0.1433671, 0.1751863,
                        0.1693494, 0.1814831, 0.1764476]},
    "MARN": {"sum": 30.0, "std": 0.0151349,
             "row0": [0.1552681, 0.1426235, 0.1726987,
                      0.1726588, 0.182409, 0.1743418]},
    "MARN_AT": {"sum": 30.0, "std": 0.0131436,
                "row0": [0.1381899, 0.1185317, 0.1421707, 0.147998,
                         0.1614399, 0.1514371, 0.1402327]},
}


def _compute(model_name="MARN1_onlysp"):
    spec = get_model_spec(model_name)
    model = spec.build(6, "IEMOCAP")
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(L=10, B=3, seed=0).items() if k != "vid"}
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(1)
    params = model.init({"params": key, "dropout": key}, *args,
                        deterministic=True)["params"]
    out = model.apply({"params": params}, *args, deterministic=True)
    return np.asarray(spec.extract_logp(out))


def test_golden_logits():
    logp = _compute()
    assert abs(float(logp.sum()) - GOLDEN["sum"]) < 2e-3
    assert abs(float(np.abs(logp).mean()) - GOLDEN["abs_mean"]) < 1e-4
    np.testing.assert_allclose(logp[0], GOLDEN["row0"], atol=2e-5)


def test_golden_logits_dialogue_rnn():
    logp = _compute("DialogueRNN")
    assert abs(float(logp.sum()) - GOLDEN_DRNN["sum"]) < 2e-3
    assert abs(float(np.abs(logp).mean()) - GOLDEN_DRNN["abs_mean"]) < 1e-4


import pytest  # noqa: E402

pytestmark = pytest.mark.medium


@pytest.mark.parametrize("name", sorted(GOLDEN_MORE))
def test_golden_logits_variants(name):
    g = GOLDEN_MORE[name]
    logp = _compute(name)
    assert abs(float(logp.sum()) - g["sum"]) < 2e-3
    assert abs(float(logp.std()) - g["std"]) < 1e-4
    np.testing.assert_allclose(logp[0], g["row0"], atol=2e-5)


if __name__ == "__main__":
    # regenerate goldens: run on CPU! (python tests/test_golden.py)
    for name in ("MARN1_onlysp", "DialogueRNN", *sorted(GOLDEN_MORE)):
        logp = _compute(name)
        print(name, "sum:", float(logp.sum()),
              "abs_mean:", float(np.abs(logp).mean()),
              "std:", float(logp.std()))
        print("  row0:", [round(float(v), 7) for v in logp[0]])
