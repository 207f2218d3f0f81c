"""Streaming serving (ser_tpu/streaming.py) correctness.

The exactness contract: ``NewZStream`` (O(1)-per-utterance stateful path)
must equal the batch forward of ``MARN1NewZ(causal_encoder=True)`` — the
causal-encoder model IS the streaming semantics, computed all at once.
Also pins that the causal flag changes nothing about the parameter
structure, and measures (not asserts) the causal-vs-bidirectional drift so
the deployment trade is visible in test output.
"""

import numpy as np
import pytest

L, B, C = 12, 1, 6


@pytest.fixture(scope="module")
def newz():
    import jax
    import jax.numpy as jnp

    from ser_tpu.models.marn_newz import MARN1NewZ

    rng = np.random.default_rng(5)
    x = rng.standard_normal((L, B, 1124)).astype(np.float32)
    sp = rng.integers(0, 2, size=(L, B))
    qmask = np.zeros((L, B, 2), dtype=np.float32)
    qmask[np.arange(L)[:, None], np.arange(B)[None, :], sp] = 1.0
    umask = np.ones((B, L), dtype=np.float32)

    model = MARN1NewZ(n_classes=C)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, jnp.asarray(x),
                        jnp.asarray(qmask), deterministic=True)["params"]
    return model, params, x, qmask, umask


def test_causal_flag_same_params(newz):
    import jax
    import jax.numpy as jnp

    from ser_tpu.models.marn_newz import MARN1NewZ

    model, params, x, qmask, _ = newz
    causal = MARN1NewZ(n_classes=C, causal_encoder=True)
    key = jax.random.PRNGKey(0)
    p2 = causal.init({"params": key, "dropout": key}, jnp.asarray(x),
                     jnp.asarray(qmask), deterministic=True)["params"]
    t1 = jax.tree_util.tree_structure(params)
    t2 = jax.tree_util.tree_structure(p2)
    assert t1 == t2


def test_stream_equals_causal_batch(newz):
    import jax.numpy as jnp

    from ser_tpu.models.marn_newz import MARN1NewZ
    from ser_tpu.streaming import NewZStream

    _, params, x, qmask, _ = newz
    causal = MARN1NewZ(n_classes=C, causal_encoder=True)
    out, _, _ = causal.apply({"params": params}, jnp.asarray(x),
                             jnp.asarray(qmask), deterministic=True)
    batch_logits = np.asarray(out).reshape(B, L, C)[0]  # batch-major rows

    stream = NewZStream(params, n_classes=C, max_len=L + 4)
    stream_logits = np.stack([
        stream.append(x[t, 0], qmask[t, 0]) for t in range(L)])

    np.testing.assert_allclose(stream_logits, batch_logits,
                               rtol=1e-4, atol=1e-5)


def test_stream_reset_reproduces(newz):
    from ser_tpu.streaming import NewZStream

    _, params, x, qmask, _ = newz
    stream = NewZStream(params, n_classes=C, max_len=L + 4)
    a = [stream.append(x[t, 0], qmask[t, 0]) for t in range(4)]
    stream.reset()
    b = [stream.append(x[t, 0], qmask[t, 0]) for t in range(4)]
    np.testing.assert_array_equal(np.stack(a), np.stack(b))


def test_causal_vs_bidirectional_drift(newz, capsys):
    """Not an assertion of closeness — the measured deployment trade.
    Causal (streaming) and bidirectional (batch parity path) encoders
    differ by construction; record argmax agreement + logit drift."""
    import jax.numpy as jnp

    model, params, x, qmask, _ = newz
    out, _, _ = model.apply({"params": params}, jnp.asarray(x),
                            jnp.asarray(qmask), deterministic=True)
    bi = np.asarray(out).reshape(B, L, C)[0]

    from ser_tpu.models.marn_newz import MARN1NewZ

    causal = MARN1NewZ(n_classes=C, causal_encoder=True)
    outc, _, _ = causal.apply({"params": params}, jnp.asarray(x),
                              jnp.asarray(qmask), deterministic=True)
    ca = np.asarray(outc).reshape(B, L, C)[0]

    agree = float((bi.argmax(-1) == ca.argmax(-1)).mean())
    drift = float(np.abs(bi - ca).max())
    print(f"causal-vs-bidirectional: argmax agreement {agree:.2%}, "
          f"max logit drift {drift:.3g}")
    # at random init the heads are near-uniform; just require sane outputs
    assert np.isfinite(ca).all() and np.isfinite(bi).all()
