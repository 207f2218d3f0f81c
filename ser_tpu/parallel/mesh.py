"""Data-parallel mesh over dialogues.

The reference has no distributed backend at all (SURVEY §2.0: the
``torch.distributed`` import at ``train.py:12`` is dead). The TPU-native
replacement is first-class here: a 1-D ``jax.sharding.Mesh`` over a 'dp'
axis, batches sharded over dialogues, parameters replicated, and gradient
all-reduce left to XLA's SPMD partitioner (jit + NamedSharding inserts the
psum over ICI automatically). The models are ~2.6M params, so pure DP over
dialogues is the correct parallelism; TP/PP/EP are intentionally out of
scope (nothing to shard at this size).

Batch layout reminder: feature fields are time-major [L, B, .] (shard axis
1); umask/label are batch-first [B, L] (shard axis 0).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TIME_MAJOR_KEYS = ("r1", "r2", "r3", "r4", "visuf", "acouf", "qmask", "wav")
BATCH_MAJOR_KEYS = ("umask", "label", "wav_len")


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up: ``jax.distributed.initialize`` wrapper (DCN).

    On a single host this is a no-op; on a multi-host slice pass the
    coordinator/process info (or rely on the TPU env autodetection).
    """
    if num_processes is None and coordinator_address is None:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process environment
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(n_devices=None, axis="dp", platform=None):
    """Build a 1-D data-parallel mesh.

    Args:
      n_devices: number of devices (default: all available).
      platform: restrict to a platform ('cpu' to use the virtual host mesh).
    """
    devices = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)} "
                f"({[d.platform for d in devices]}); for CPU simulation set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh, axis="dp"):
    """Per-key NamedShardings for a batch dict."""
    out = {}
    for k in TIME_MAJOR_KEYS:
        out[k] = NamedSharding(mesh, P(None, axis))
    for k in BATCH_MAJOR_KEYS:
        out[k] = NamedSharding(mesh, P(axis))
    return out


def shard_batch(batch, mesh, axis="dp"):
    """Place a host batch onto the mesh, sharded over dialogues.

    The batch dim must be divisible by the mesh size (collate pads to the
    full batch size, so pick batch_size % n_devices == 0).
    """
    shardings = batch_sharding(mesh, axis)
    return {
        k: jax.device_put(v, shardings[k])
        for k, v in batch.items()
        if k in shardings
    }


def replicate_params(tree, mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
