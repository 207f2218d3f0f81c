"""Interop with the reference PyTorch framework (checkpoint import)."""

from ser_tpu.compat.torch_import import (  # noqa: F401
    convert_state_dict,
    import_torch_checkpoint,
    load_torch_state_dict,
)
