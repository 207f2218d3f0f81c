"""Masking ops vs python-loop oracles (the reference's literal semantics)."""

import jax.numpy as jnp
import numpy as np

from ser_tpu.ops.masking import reverse_seq, scatter_parties, select_parties


def reverse_seq_oracle(x, umask):
    """Literal reference behavior (model/lsthm_onlysp.py:306-320)."""
    L, B = x.shape[:2]
    out = np.zeros_like(x)
    lengths = umask.sum(1).astype(int)
    for b in range(B):
        c = lengths[b]
        out[:c, b] = x[:c, b][::-1]
    return out


def test_reverse_seq_oracle():
    rng = np.random.default_rng(0)
    L, B, D = 11, 5, 7
    x = rng.standard_normal((L, B, D)).astype(np.float32)
    lengths = rng.integers(1, L + 1, size=B)
    umask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)

    got = np.asarray(reverse_seq(jnp.asarray(x), jnp.asarray(umask)))
    np.testing.assert_allclose(got, reverse_seq_oracle(x, umask), atol=1e-6)


def test_reverse_seq_involution_on_valid():
    rng = np.random.default_rng(1)
    L, B, D = 8, 3, 4
    x = rng.standard_normal((L, B, D)).astype(np.float32)
    lengths = np.array([8, 5, 2])
    umask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    twice = np.asarray(
        reverse_seq(reverse_seq(jnp.asarray(x), jnp.asarray(umask)),
                    jnp.asarray(umask))
    )
    mask3 = umask.T[:, :, None]
    np.testing.assert_allclose(twice * mask3, x * mask3, atol=1e-6)


def test_select_parties_matches_argmax_gather():
    rng = np.random.default_rng(2)
    B, P, D = 6, 2, 5
    q = rng.standard_normal((B, P, D)).astype(np.float32)
    idx = rng.integers(0, P, size=B)
    qmask = np.zeros((B, P), dtype=np.float32)
    qmask[np.arange(B), idx] = 1.0
    # padded rows: all-zero qmask -> torch argmax picks 0
    qmask[0] = 0.0
    idx[0] = 0

    got = np.asarray(select_parties(jnp.asarray(q), jnp.asarray(qmask)))
    expected = q[np.arange(B), idx]
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_scatter_parties():
    rng = np.random.default_rng(3)
    B, P, D = 4, 2, 3
    q = rng.standard_normal((B, P, D)).astype(np.float32)
    new = rng.standard_normal((B, D)).astype(np.float32)
    qmask = np.zeros((B, P), dtype=np.float32)
    qmask[np.arange(B), [0, 1, 1, 0]] = 1.0
    qmask[2] = 0.0  # padded row: q untouched

    got = np.asarray(scatter_parties(jnp.asarray(q), jnp.asarray(qmask),
                                     jnp.asarray(new)))
    expected = q.copy()
    expected[0, 0] = new[0]
    expected[1, 1] = new[1]
    expected[3, 0] = new[3]
    np.testing.assert_allclose(got, expected, atol=1e-6)
