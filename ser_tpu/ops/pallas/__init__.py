"""Pallas TPU kernels: fused audio front-end and recurrence fast paths."""
