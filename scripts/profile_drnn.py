"""DialogueRNN P==2 fast-path measurement (config.DRNN_FAST2).

The reference updates all B*P party rows with p_cell/l_cell and keeps only
the speaker / listener rows (ref ``model/DialogueRNN.py:139-152``); the fast
path computes just the kept rows (half the recurrent matmul rows). That only
pays once B*P spills past one 128-row MXU tile, so this script measures both
paths at both production shapes:

  eval  [L=108, B=31]  (bench.py's IEMOCAP eval composition, B*P = 62)
  train [L=110, B=80]  (reference batch_size default,       B*P = 160)

Timing: on-device chained fori_loop, per-pass = (t_K - t_1)/(K - 1), min of
3 (the axon relay makes naive timing meaningless — see CLAUDE.md).

Usage:  python scripts/profile_drnn.py
"""

from __future__ import annotations

import os as _os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, _os.path.dirname(_os.path.abspath(
    globals().get("__file__", "scripts/x"))))

from _bench_util import per_pass_seconds  # noqa: E402


def build(L, B):
    import jax
    import jax.numpy as jnp

    from ser_tpu.data.synthetic import synthetic_batch
    from ser_tpu.models.registry import get_model_spec

    spec = get_model_spec("DialogueRNN")
    model = spec.build(6, "IEMOCAP")
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(L=L, B=B, seed=1, min_len=20).items()
             if k != "vid"}
    args = spec.make_inputs(batch)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, *args,
                        deterministic=True)["params"]
    return spec, model, params, batch, args


def eval_pass(L, B):
    import jax
    import jax.numpy as jnp

    spec, model, params, batch, args = build(L, B)

    def loop(params, x, rest, n):
        def body(i, acc):
            out = model.apply({"params": params},
                              x + (1e-30 * acc).astype(x.dtype), *rest,
                              deterministic=True)
            return jnp.sum(out[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    jloop = jax.jit(loop, static_argnums=3)
    return per_pass_seconds(
        lambda n: jloop(params, args[0], args[1:], n))


def train_pass(L, B):
    import jax
    import jax.numpy as jnp

    from ser_tpu.train.losses import masked_loss

    spec, model, params, batch, args = build(L, B)
    labels = batch["label"].reshape(-1)
    umask = batch["umask"]

    def loss_fn(p, x, rest, rng):
        out = model.apply({"params": p}, x, *rest, deterministic=False,
                          rngs={"dropout": rng})
        return masked_loss(spec.extract_logp(out), labels, umask)

    def loop(p, x, rest, rng, n):
        def body(i, carry):
            acc, rng = carry
            rng, sub = jax.random.split(rng)
            loss, grads = jax.value_and_grad(loss_fn)(
                p, x + (1e-30 * acc).astype(x.dtype), rest, sub)
            leafsum = sum(jnp.sum(g.astype(jnp.float32))
                          for g in jax.tree_util.tree_leaves(grads))
            return loss.astype(jnp.float32) + 1e-30 * leafsum, rng
        out, _ = jax.lax.fori_loop(
            0, n, body, (jnp.float32(0), jax.random.PRNGKey(7)))
        return out

    jloop = jax.jit(loop, static_argnums=4)
    return per_pass_seconds(lambda n: jloop(params, args[0], args[1:], None, n))


def main(cases=None):
    from ser_tpu import config

    all_cases = {
        "eval-generic": ("eval", 108, 31, False),
        "eval-fast2": ("eval", 108, 31, True),
        "train-generic": ("train", 110, 80, False),
        "train-fast2": ("train", 110, 80, True),
    }
    try:
        for name in (cases or all_cases):
            shape_name, L, B, mode = all_cases[name]
            config.DRNN_FAST2 = mode
            te = (eval_pass(L, B) if shape_name == "eval"
                  else train_pass(L, B))
            print(f"{shape_name:5s} L={L} B={B} "
                  f"{'fast2' if mode else 'generic':7s} {te*1e3:8.3f} ms",
                  flush=True)
    finally:
        config.DRNN_FAST2 = "auto"


if __name__ == "__main__":
    main(sys.argv[1:] or None)
