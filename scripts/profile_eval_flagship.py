"""Eval-pass decomposition for the flagship at the bench headline shape.

Answers: at [L=110, B=31] (bench.py's IEMOCAP eval shape), how much of the
eval pass is (a) the bidirectional recurrence scan, (b) the encoders +
linear_in, (c) the seq cross-attentions + head?  This bounds what any
further recurrence-kernel work (e.g. a row-stacked Pallas variant) can buy
on the headline number.

Timing per CLAUDE.md: on-device fori_loop chaining with a data dependency,
per-pass = (t_K - t_1)/(K - 1), min-of-3.

Usage: python scripts/profile_eval_flagship.py [L B]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(
    _os.path.dirname(_os.path.abspath(globals().get("__file__", "scripts/x")))))
from _bench_util import per_pass_seconds  # noqa: E402


def main():
    import jax

    if _os.environ.get("SER_FORCE_CPU"):  # CPU smoke (tests / relay outage)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ser_tpu.data.synthetic import synthetic_batch
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
    results = {"L": L, "B": B}

    # ---- full eval pass -----------------------------------------------------
    @jax.jit
    def full_loop(p, n):
        def body(i, acc):
            logp = model.apply(
                {"params": p}, args[0] + 1e-30 * acc, args[1], args[2],
                deterministic=True)[0]
            return jnp.sum(logp)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    results["eval_full_ms"] = per_pass_seconds(
        lambda n: full_loop(params, n)) * 1e3

    # ---- recurrence alone (fused bidirectional scan, gather-mode inputs) ----
    from ser_tpu.models.marn_onlysp import MARNCellOnlySP, _eval_step
    from ser_tpu.ops.masking import reverse_seq

    cell = MARNCellOnlySP()
    xl = jax.random.normal(jax.random.PRNGKey(3), (L, B, 100))
    xa = jax.random.normal(jax.random.PRNGKey(4), (L, B, 100))
    qm = tb["qmask"]
    um = tb["umask"]
    cp = {"params": cell.init({"params": key, "dropout": key},
                              xl, xa, qm, True, mode="gather")["params"]}

    def recur(p, xl_in, xa_in):
        # gather per direction, stack, one scan with a direction-vmapped
        # step — exactly what _fused_directions does on the eval path.
        rxl, rxa = reverse_seq(xl_in, um), reverse_seq(xa_in, um)
        rqm = reverse_seq(qm, um)
        seqs_f, consts = cell.apply(p, xl_in, xa_in, qm, True, mode="gather")
        seqs_b, _ = cell.apply(p, rxl, rxa, rqm, True, mode="gather")
        seqs = jax.tree_util.tree_map(
            lambda a, b: jnp.stack([a, b], axis=1), seqs_f, seqs_b)
        consts2 = jax.tree_util.tree_map(
            lambda a: jnp.stack([a, a]), consts)
        z2 = lambda *s: jnp.zeros((2,) + s, xl_in.dtype)
        init = tuple(z2(B, 128) for _ in range(5)) + (z2(B, 2, 128),)

        def step(carry, xs):
            return jax.vmap(_eval_step, in_axes=(0, 0, 0))(
                consts2, carry, xs)

        _, ys = jax.lax.scan(step, init, seqs)
        return jnp.sum(ys)

    @jax.jit
    def scan_loop(p, x, n):
        def body(i, acc):
            return acc + recur(p, x + 1e-30 * acc, xa)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    results["recurrence_bidir_ms"] = per_pass_seconds(
        lambda n: scan_loop(cp, xl, n)) * 1e3

    # ---- encoders + linear_in (the pre-recurrence stack) --------------------
    from ser_tpu.ops.encoder import EncoderLayer
    from ser_tpu.ops.layers import TorchLinear

    enc = EncoderLayer(100, 40, 8, 40, 40)
    xe = jax.random.normal(jax.random.PRNGKey(5), (B, L, 100))
    ep = enc.init({"params": key, "dropout": key}, xe, deterministic=True)

    @jax.jit
    def enc_loop(p, x, n):
        def body(i, acc):
            y, _ = enc.apply(p, x + 1e-30 * acc, deterministic=True)
            y, _ = enc.apply(p, x + y, deterministic=True)
            return jnp.sum(y)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    # x2: text + audio (each applies the shared layer twice, already inside)
    results["encoders_ms"] = 2 * per_pass_seconds(
        lambda n: enc_loop(ep, xe, n)) * 1e3

    lin = TorchLinear(100)
    xr = jax.random.normal(jax.random.PRNGKey(6), (B, L, 1024))
    lp = lin.init(key, xr)

    @jax.jit
    def lin_loop(p, x, n):
        def body(i, acc):
            return jnp.sum(lin.apply(p, x + 1e-30 * acc))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    results["linear_in_ms"] = per_pass_seconds(
        lambda n: lin_loop(lp, xr, n)) * 1e3

    results["residual_head_attn_ms"] = (
        results["eval_full_ms"] - results["recurrence_bidir_ms"]
        - results["encoders_ms"] - results["linear_in_ms"])
    print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
