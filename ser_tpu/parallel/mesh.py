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


def local_batch_slice(process_index=None, process_count=None):
    """This process's contiguous row range [lo, hi) of a global batch of
    ``B`` dialogues, as a function: size -> slice.

    Multi-host data loading (SURVEY §5.8): every process shuffles with the
    same seed (so the global batch composition matches single-process math
    exactly), then loads only its own B/process_count rows. Rows are
    contiguous and process-major, matching the device order of a mesh built
    from ``jax.devices()`` (process 0's devices first), which is what
    ``jax.make_array_from_process_local_data`` expects.
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count

    def slicer(batch_size):
        if batch_size % n:
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"{n} processes")
        k = batch_size // n
        return slice(p * k, (p + 1) * k)

    return slicer


def shard_batch(batch, mesh, axis="dp"):
    """Place a host batch onto the mesh, sharded over dialogues.

    Single-process (one host sees every device): a plain sharded
    ``device_put`` of the full batch. Multi-process (a real multi-host
    slice, DCN between hosts): each process passes only its LOCAL rows
    (see ``EpochLoader(process_index=..., process_count=...)``) and the
    global array is assembled with
    ``jax.make_array_from_process_local_data`` — no host ever materializes
    or transfers the full batch.

    The global batch dim must be divisible by the mesh size (collate pads
    to the full batch size, so pick batch_size % n_devices == 0).
    """
    return assemble_batch(batch, batch_sharding(mesh, axis))


def assemble_batch(batch, shardings):
    """Place a batch dict per ``shardings``. Single-process: sharded
    device_put of the full arrays. Multi-process: each process passes its
    LOCAL rows and the global array is assembled with
    ``jax.make_array_from_process_local_data`` (used by both the 1-D dp
    and the 2-D (dp, tp) paths)."""
    nproc = jax.process_count()
    if nproc == 1:
        return {
            k: jax.device_put(v, shardings[k])
            for k, v in batch.items()
            if k in shardings
        }
    out = {}
    for k, v in batch.items():
        if k not in shardings:
            continue
        v = np.asarray(v)
        gshape = list(v.shape)
        bdim = 1 if k in TIME_MAJOR_KEYS else 0
        gshape[bdim] *= nproc
        out[k] = jax.make_array_from_process_local_data(
            shardings[k], v, tuple(gshape))
    return out


def replicate_params(tree, mesh):
    """Replicate a pytree (params/opt state) across the mesh.

    Multi-process: every process holds identical host values (same seed ->
    same init), so each contributes its full copy as its local shards.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x), np.shape(x)),
        tree)
