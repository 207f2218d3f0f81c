"""Tensor parallelism over a 2-D (dp, tp) mesh.

The scaling-book recipe, applied: build a ``Mesh`` with a data axis and a
model axis, annotate the *weights* with ``NamedSharding``s (output-feature
dim on 'tp'), hand the jitted step those shardings, and let XLA's SPMD
partitioner propagate activation shardings and insert the collectives
(all-gather before gate slicing, psum after contracting a sharded feature
dim) over ICI. No manual collective is written anywhere.

At the reference's model sizes (~2.6M params, H=128) TP is *latency*
head-room, not a memory necessity — DP over dialogues remains the default
(``parallel/mesh.py``). This module exists so the same train step scales
unchanged when the hidden sizes do: the sharding rules are shape-driven,
not name-driven.

Sharding rules (``param_spec``):
- matmul kernels ``[in, out]``: ``P(None, 'tp')`` when ``out`` divides
  evenly over the tp axis (output-feature / column parallelism — gate
  blocks of the fused ``[.., 4H]`` LSTHM kernels each stay whole on a
  device when tp | H);
- 1-D vectors ``[out]``: ``P('tp')`` under the same divisibility. This
  covers biases (matching their kernel's output sharding) and — because
  the rules are shape-driven — also LayerNorm scales and ones-init
  attention vectors of divisible length. That is mathematically sound
  under SPMD (elementwise uses stay sharded; LN's feature reduction needs
  a cross-shard collective whenever the *activations* are feature-sharded,
  wherever the scale lives) and keeps the rule free of name special-cases.
- everything else (scalars, odd-length vectors): replicated ``P()``.

pp/sp/ep status: pipeline parallelism has no stage structure to cut at
two LSTHM layers; sequence parallelism is unnecessary at L≈110 (the
encoder's [B, h, L, L] attention fits trivially); there are no experts.
Documented as out of scope in SURVEY §5.7/§5.8 terms rather than
simulated for show.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ser_tpu.parallel.mesh import BATCH_MAJOR_KEYS, TIME_MAJOR_KEYS


def make_mesh_2d(n_dp, n_tp, platform=None):
    """Build a (dp, tp) mesh from the first n_dp*n_tp devices."""
    devices = jax.devices(platform) if platform else jax.devices()
    n = n_dp * n_tp
    if len(devices) < n:
        raise ValueError(
            f"need {n} devices for a ({n_dp}, {n_tp}) mesh, have "
            f"{len(devices)}; for CPU simulation set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N")
    grid = np.asarray(devices[:n]).reshape(n_dp, n_tp)
    return Mesh(grid, ("dp", "tp"))


def param_spec(leaf, n_tp):
    """PartitionSpec for one param leaf (shape-driven, see module doc)."""
    if leaf.ndim == 2 and leaf.shape[1] % n_tp == 0 and leaf.shape[1] >= n_tp:
        return P(None, "tp")
    if leaf.ndim == 1 and leaf.shape[0] % n_tp == 0 and leaf.shape[0] >= n_tp:
        return P("tp")
    return P()


def shard_params(params, mesh):
    """Place a param pytree on the mesh per ``param_spec``; opt states and
    other pytrees shard the same way (leaf shapes match params').

    Multi-process (multi-host slice): every process holds the full host
    value (same-seed init), and ``jax.make_array_from_callback`` hands each
    local device exactly its shard — ``device_put`` cannot target
    non-addressable devices.
    """
    n_tp = mesh.shape["tp"]
    multiproc = jax.process_count() > 1

    def place(x):
        sharding = NamedSharding(mesh, param_spec(x, n_tp))
        if not multiproc:
            return jax.device_put(x, sharding)
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])

    return jax.tree_util.tree_map(place, params)


def param_shardings(params, mesh):
    """The NamedSharding pytree matching ``shard_params`` (for in/out
    shardings of a jitted step)."""
    n_tp = mesh.shape["tp"]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, param_spec(x, n_tp)), params)


def batch_sharding_2d(mesh):
    """Batch dict shardings: dialogues over 'dp', features replicated over
    'tp' (every tp group sees the full batch shard)."""
    out = {}
    for k in TIME_MAJOR_KEYS:
        out[k] = NamedSharding(mesh, P(None, "dp"))
    for k in BATCH_MAJOR_KEYS:
        out[k] = NamedSharding(mesh, P("dp"))
    return out


def shard_batch_2d(batch, mesh):
    """Multi-process note: each process must pass its LOCAL dp rows (see
    EpochLoader process sharding); contiguity with the (dp, tp) grid holds
    when n_tp divides the per-process device count (process-major
    jax.devices() order)."""
    from ser_tpu.parallel.mesh import assemble_batch

    return assemble_batch(batch, batch_sharding_2d(mesh))
