"""Utilities: seeding, paths, confusion-matrix reports."""

from ser_tpu.utils.seeding import seed_everything  # noqa: F401
from ser_tpu.utils.paths import init_args  # noqa: F401
