"""Golden-logit regression: fixed-seed flagship outputs stay stable.

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


if __name__ == "__main__":
    # regenerate goldens
    for name in ("MARN1_onlysp", "DialogueRNN"):
        logp = _compute(name)
        print(name, "sum:", float(logp.sum()))
        print(name, "abs_mean:", float(np.abs(logp).mean()))
        if name == "MARN1_onlysp":
            print("row0:", logp[0].tolist())
