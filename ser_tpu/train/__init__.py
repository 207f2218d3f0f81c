"""Training layer: losses, metrics, optimizer, trainer, checkpointing."""

from ser_tpu.train.losses import info_nce, masked_loss  # noqa: F401
from ser_tpu.train.metrics import weighted_accuracy, weighted_f1  # noqa: F401
