"""Mask-aware sequence ops — branch-free, jit-compatible.

The reference implements these with Python loops over the batch
(``/root/reference/model/lsthm_onlysp.py:306-320`` for masked reversal and
``:201-206`` for per-row speaker gather). Here both are single gathers /
einsums with static shapes so they fuse under XLA.
"""

from __future__ import annotations

import jax.numpy as jnp


def reverse_seq(x, umask):
    """Mask-aware sequence reversal.

    Flips the first ``c_b = sum(umask[b])`` steps of every sequence and zeroes
    the tail, exactly like the reference's per-dialogue ``torch.flip`` +
    ``pad_sequence`` (``model/lsthm_onlysp.py:306-320``).

    Args:
      x: [L, B, ...] time-major sequence.
      umask: [B, L] validity mask (1 for real utterances).

    Returns:
      [L, B, ...] with each valid prefix reversed, zeros at padded steps.
    """
    L, B = x.shape[0], x.shape[1]
    lengths = jnp.sum(umask, axis=1).astype(jnp.int32)  # [B]
    t = jnp.arange(L, dtype=jnp.int32)[:, None]  # [L, 1]
    c = lengths[None, :]  # [1, B]
    idx = jnp.where(t < c, c - 1 - t, t)  # [L, B]
    # Gather along time for each batch column.
    gathered = jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=0
    )
    valid = (t < c).astype(x.dtype).reshape((L, B) + (1,) * (x.ndim - 2))
    return gathered * valid


def select_parties(q, qmask_t):
    """Gather each row's current speaker memory.

    Matches ``_select_parties`` + ``torch.argmax`` semantics
    (``model/lsthm_onlysp.py:177-179,201-206``): for all-zero qmask rows
    (padded steps) torch's argmax picks party 0, so we re-derive a one-hot
    from argmax rather than multiplying by the raw mask.

    Args:
      q: [B, P, D] per-party memories.
      qmask_t: [B, P] speaker one-hot at the current step.

    Returns:
      [B, D] selected memories.
    """
    idx = jnp.argmax(qmask_t, axis=1)
    onehot = jnp.asarray(
        idx[:, None] == jnp.arange(q.shape[1])[None, :], dtype=q.dtype
    )
    return jnp.einsum("bp,bpd->bd", onehot, q)


def scatter_parties(q, qmask_t, new_state):
    """Masked scatter of the speaker state back into the party memory.

    Matches ``q = q * (1 - qmask) + q_s * qmask``
    (``model/lsthm_onlysp.py:183-185``) — uses the *raw* qmask, so padded
    steps (all-zero rows) leave q untouched.

    Args:
      q: [B, P, D] party memories.
      qmask_t: [B, P] raw speaker mask at the current step.
      new_state: [B, D] updated state for the active speaker.

    Returns:
      [B, P, D] updated memories.
    """
    m = qmask_t[:, :, None]
    return q * (1.0 - m) + new_state[:, None, :] * m


def seq_lengths(umask):
    """[B] int32 lengths from a [B, L] mask."""
    return jnp.sum(umask, axis=1).astype(jnp.int32)
