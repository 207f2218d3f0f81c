"""Determinism (ref ``/root/reference/utils.py:123-130``).

JAX is deterministic-by-construction under jit (no cudnn nondeterminism to
pin); seeding here covers host-side RNGs (python/numpy shuffling) and
returns the root JAX PRNG key everything else derives from.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
