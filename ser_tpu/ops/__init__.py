"""Kernel layer: fused cells, attention ops, encoder, masking."""

from ser_tpu.ops import attention, cells, encoder, init, layers, masking  # noqa: F401
