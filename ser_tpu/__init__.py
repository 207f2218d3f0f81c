"""ser_tpu — TPU-native multimodal speaker-emotion-recognition framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
``MallVilliers/Multimodal-Framework-for-speaker-emotion-recognition`` (ERC on
IEMOCAP/MELD with the LSTHM model family), re-designed TPU-first:

- dialogue recurrences are ``jax.lax.scan`` loops with fused gate matmuls,
- cross-modal rank-1 attention is algebraically collapsed from the reference's
  O(B*D^3) batched-matmul form to an O(B*D^2) fused elementwise kernel,
- data parallelism is a ``jax.sharding.Mesh`` + ``shard_map`` over dialogues,
- everything is jit-compiled with static shapes (bucketed padding).

Package layout:
    ser_tpu.data      pickle-schema datasets, padded batching, synthetic data
    ser_tpu.ops       kernel layer: cells, attention, encoder, masking, pallas
    ser_tpu.models    the model zoo (MARN1_* family, DialogueRNN, BiLSTM, MARN)
    ser_tpu.train     losses, metrics, optimizer, trainer, checkpointing
    ser_tpu.parallel  device mesh + sharded train/eval steps
    ser_tpu.utils     seeding, paths, confusion-matrix reports, profiling
"""

__version__ = "0.1.0"
