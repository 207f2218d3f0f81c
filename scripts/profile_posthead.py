"""Decompose + attack the flagship's POST-recurrence tail.

profile_eval_flagship.py showed the eval pass at [110, 31] is ~63%
recurrence and ~36% "everything after": the 4 sequence cross-attentions
(2x CrossAttentionSeq then 2x CrossAttentionReSeq,
ref ``lsthm_onlysp.py:287-293``) plus the MLP head. Each attention is
~7 small ops on [31, 110, 128]-sized operands, and the two chains are
structurally identical with different weights — a candidate for PAIR
BATCHING: stack both attentions of a stage on a leading axis so each
stage is 4 batched einsums instead of 8 small ones (identical math,
just horizontal fusion XLA's dot-merger may or may not already do).

This script measures, standalone at the flagship tail shapes:
  (a) the production tail math (module-equivalent pure function),
  (b) the pair-batched tail,
  (c) the attention stack alone / head alone (decomposition),
and prints maxerr(a vs b) so the batched form is proven exact.

Usage: python scripts/profile_posthead.py [L B]
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

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 110
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 31
    DK = 128
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 24)
    x_l = jax.random.normal(ks[0], (L, B, 100))
    x_a = jax.random.normal(ks[1], (L, B, 100))
    h = jax.random.normal(ks[2], (L, B, 1024))

    # Random (not ones) weights so the softmaxes are non-degenerate and a
    # math error in the batched form cannot hide.
    def w(i, *shape):
        return jax.random.normal(ks[i], shape) * 0.05

    # stage 1: two CrossAttentionSeq (dh=100 -> dk=dv=128)
    Wq1, Wk1, Wv1 = w(3, 100, DK), w(4, 100, DK), w(5, 100, DK)
    Wq2, Wk2, Wv2 = w(6, 100, DK), w(7, 100, DK), w(8, 100, DK)
    # stage 2: two CrossAttentionReSeq (q from 100-d, k/v from 128-d)
    Rq1, Rk1, Rv1 = w(9, 100, DK), w(10, DK, DK), w(11, DK, DK)
    Rq2, Rk2, Rv2 = w(12, 100, DK), w(13, DK, DK), w(14, DK, DK)
    H1, b1 = w(15, 1280, 32), w(16, 32)
    H2, b2 = w(17, 32, 6), w(18, 6)
    wv4 = jnp.asarray([1.1, 0.9, 1.05, 0.95])  # w, v, v1, v2

    scale = 1.0 / (DK ** 0.5)

    def one_attn(x1, x2, Wq, Wk, Wv):
        # CrossAttentionSeq math (eval mode): time-major in/out.
        x1b = jnp.swapaxes(x1, 0, 1)
        x2b = jnp.swapaxes(x2, 0, 1)
        q = jnp.matmul(x1b, Wq)
        k = jnp.matmul(x2b, Wk)
        v = jnp.matmul(x2b, Wv)
        attn = jax.nn.softmax(
            jnp.einsum("bqd,bkd->bqk", q * scale, k), axis=-1)
        return jnp.swapaxes(jnp.einsum("bqk,bkd->bqd", attn, v), 0, 1)

    def head(feats):
        o = jnp.maximum(jnp.matmul(feats, H1) + b1, 0.0)
        o = jnp.matmul(o, H2) + b2
        lp = jax.nn.log_softmax(o, axis=2)
        return jnp.swapaxes(lp, 0, 1).reshape(-1, 6)

    def tail_prod(x_l, x_a, h):
        wf, vf, v1, v2 = wv4[0], wv4[1], wv4[2], wv4[3]
        a1 = one_attn(wf * x_l, vf * x_a, Wq1, Wk1, Wv1)
        a2 = one_attn(vf * x_a, wf * x_l, Wq2, Wk2, Wv2)
        a1 = one_attn(vf * x_a, v1 * a1, Rq1, Rk1, Rv1)
        a2 = one_attn(wf * x_l, v2 * a2, Rq2, Rk2, Rv2)
        return head(jnp.concatenate([h, a1, a2], axis=-1))

    # ---- pair-batched: both attentions of a stage as ONE batched einsum ---
    def pair_attn(x1s, x2s, Wq, Wk, Wv):
        # x1s/x2s: [2, B, L, D*] batch-major; W*: [2, D*, DK]
        q = jnp.einsum("sbld,sdk->sblk", x1s, Wq)
        k = jnp.einsum("sbld,sdk->sblk", x2s, Wk)
        v = jnp.einsum("sbld,sdk->sblk", x2s, Wv)
        attn = jax.nn.softmax(
            jnp.einsum("sbqk,sbmk->sbqm", q * scale, k), axis=-1)
        return jnp.einsum("sbqm,sbmk->sbqk", attn, v)

    def tail_batched(x_l, x_a, h):
        wf, vf, v1, v2 = wv4[0], wv4[1], wv4[2], wv4[3]
        xl_b = jnp.swapaxes(wf * x_l, 0, 1)  # [B, L, 100]
        xa_b = jnp.swapaxes(vf * x_a, 0, 1)
        s1 = pair_attn(
            jnp.stack([xl_b, xa_b]), jnp.stack([xa_b, xl_b]),
            jnp.stack([Wq1, Wq2]), jnp.stack([Wk1, Wk2]),
            jnp.stack([Wv1, Wv2]))
        s2 = pair_attn(
            jnp.stack([xa_b, xl_b]),
            jnp.stack([v1, v2])[:, None, None, None] * s1,
            jnp.stack([Rq1, Rq2]), jnp.stack([Rk1, Rk2]),
            jnp.stack([Rv1, Rv2]))
        a1 = jnp.swapaxes(s2[0], 0, 1)
        a2 = jnp.swapaxes(s2[1], 0, 1)
        return head(jnp.concatenate([h, a1, a2], axis=-1))

    def attn_outputs(x_l, x_a):
        # Real a1/a2 tensors for the head-only decomposition (ADVICE r3:
        # feeding hh[..., :128] aliases instead would time an extra
        # slice/alias rather than the true three-buffer concat).
        wf, vf, v1, v2 = wv4[0], wv4[1], wv4[2], wv4[3]
        a1 = one_attn(wf * x_l, vf * x_a, Wq1, Wk1, Wv1)
        a2 = one_attn(vf * x_a, wf * x_l, Wq2, Wk2, Wv2)
        a1 = one_attn(vf * x_a, v1 * a1, Rq1, Rk1, Rv1)
        a2 = one_attn(wf * x_l, v2 * a2, Rq2, Rk2, Rv2)
        return a1, a2

    ref = tail_prod(x_l, x_a, h)
    got = tail_batched(x_l, x_a, h)
    maxerr = float(jnp.max(jnp.abs(ref - got)))

    def loop(fn, *xs):
        # Perturb EVERY input with the carry so loop-invariant code motion
        # applies symmetrically to all variants (an xs[0]-only dependency
        # would let XLA hoist the x_a-only projections in the sequential
        # tail but not in the pair-batched one, biasing the A/B).
        @jax.jit
        def run(n, *xs):
            def body(i, acc):
                return jnp.sum(fn(*[x + 1e-30 * acc for x in xs]))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return per_pass_seconds(lambda n: run(n, *xs)) * 1e3

    results = {
        "L": L, "B": B, "maxerr_batched": maxerr,
        "tail_prod_ms": loop(tail_prod, x_l, x_a, h),
        "tail_batched_ms": loop(tail_batched, x_l, x_a, h),
        "attn_stack_prod_ms": loop(
            lambda xl, xa: one_attn(
                wv4[1] * xa, wv4[2] * one_attn(
                    wv4[0] * xl, wv4[1] * xa, Wq1, Wk1, Wv1),
                Rq1, Rk1, Rv1), x_l, x_a),
        "head_only_ms": loop(
            lambda hh, a1, a2: head(jnp.concatenate([hh, a1, a2], axis=-1)),
            h, *attn_outputs(x_l, x_a)),
    }
    print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
