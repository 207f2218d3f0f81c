"""IN-MODEL cost of the flagship's post-recurrence tail, three ways.

r3's decomposition estimated the tail (4 seq cross-attentions + head) as a
RESIDUAL of standalone measurements and got ~36% of the eval pass; the
standalone tail measured with properly-scaled windows is ~0.04 ms at
[110, 31] (~3%). This script settles it inside the real model:

  full            — production eval pass (sequential tail)
  full_paired     — config.TAIL_PAIRED=True (pair-batched tail)
  tail_ablated    — models.marn_onlysp._ABLATE_TAIL: attentions zeroed
                    (head still runs), so full - ablated == the 4
                    attentions' in-model cost

Usage: python scripts/profile_tail_inmodel.py [L B]
"""

from __future__ import annotations

import json
import os as _os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, _os.path.dirname(_os.path.abspath(
    globals().get("__file__", "scripts/x"))))
from _bench_util import per_pass_seconds  # noqa: E402


def main():
    import jax

    if _os.environ.get("SER_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ser_tpu import config
    from ser_tpu.data.synthetic import synthetic_batch
    from ser_tpu.models import marn_onlysp
    from ser_tpu.models.registry import get_model_spec

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 110
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 31
    batch = synthetic_batch(L=L, B=B, seed=1, min_len=20)
    tb = {k: jnp.asarray(v) for k, v in batch.items() if k != "vid"}

    spec = get_model_spec("MARN1_onlysp")
    model = spec.build(6, "IEMOCAP")
    args = spec.make_inputs(tb)
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key, "dropout": key}, *args, deterministic=True)["params"]

    def measure():
        @jax.jit
        def loop(p, n):
            def body(i, acc):
                logp = model.apply(
                    {"params": p}, args[0] + 1e-30 * acc, args[1], args[2],
                    deterministic=True)[0]
                return jnp.sum(logp)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        return per_pass_seconds(lambda n: loop(params, n)) * 1e3

    results = {"L": L, "B": B}
    results["full_ms"] = measure()

    old = config.TAIL_PAIRED
    config.TAIL_PAIRED = True
    try:
        results["full_paired_ms"] = measure()
    finally:
        config.TAIL_PAIRED = old

    marn_onlysp._ABLATE_TAIL = True
    try:
        results["tail_ablated_ms"] = measure()
    finally:
        marn_onlysp._ABLATE_TAIL = False

    results["tail_inmodel_ms"] = round(
        results["full_ms"] - results["tail_ablated_ms"], 4)
    results["tail_share_pct"] = round(
        100.0 * results["tail_inmodel_ms"] / results["full_ms"], 1)
    print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
