"""Data layer: pickle-schema datasets, padded batching, synthetic data."""

from ser_tpu.data.collate import collate  # noqa: F401
from ser_tpu.data.loaders import get_loaders  # noqa: F401
from ser_tpu.data.synthetic import generate_iemocap_pickles, synthetic_batch  # noqa: F401
