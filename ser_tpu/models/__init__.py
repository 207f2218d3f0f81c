"""Model zoo, keyed by the reference's --model strings."""

from ser_tpu.models.registry import available_models, get_model_spec  # noqa: F401
