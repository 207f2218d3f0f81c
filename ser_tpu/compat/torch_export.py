"""Torch-checkpoint exporter — the reverse of ``torch_import``.

Converts this framework's flax param pytree into a reference-layout torch
state dict so a model trained HERE can be handed back to the reference
stack (``/root/reference/model_trainer.py:173-187`` tolerant load, or a
direct ``module.load_state_dict``) and verified independently:

    export_torch_checkpoint(trainer.params, "model_0042.model",
                            "MARN1_onlysp")

Rather than maintaining 15 hand-written inverse converters (which would
drift from the importer), the importer's CONVERTERS are *traced*: each
converter is run against a fake state dict that records, for every flax
leaf it produces, which torch key it read and which transform it applied
(identity / transpose / flatten). Exporting then just inverts the
transform per leaf:

- ``t``    (torch ``[out, in]`` -> flax ``[in, out]``): transpose back.
- ``flat`` (torch ``[1, D]`` rank-1 attention vectors -> flax ``[D]``,
  see ``/root/reference/model/lsthm_sp.py:52-54``): reshape to ``[1, D]``.
- ``id``: copied as-is.

By construction export o import == identity on every parameter the
importer covers — and the importer's coverage is pinned by
``tests/test_param_parity.py`` + ``tests/test_logit_parity.py``.

Keys are prefixed with ``model.`` by default, matching what the reference
actually writes (``torch.save(self.state_dict())`` on the whole
ModelTrainer wrapper whose model lives at ``self.model``,
``model_trainer.py:30-72,170-171``), so the exported file round-trips
through BOTH loaders: the reference's ``load_parameters`` and ours.
"""

from __future__ import annotations

import numpy as np

from ser_tpu.compat.torch_import import CONVERTERS
from ser_tpu.train.checkpoint import flatten_params


class _AllKeys:
    """Pretends every torch key exists, so optional-bias presence checks
    (``if f"{prefix}.bias" in s.sd``) take the 'present' branch during
    tracing; leaves the actual model doesn't have are dropped at export."""

    def __contains__(self, key):
        return True


class _Ref:
    """A traced leaf: which torch key it came from + the transform used."""

    __slots__ = ("key", "transform")

    def __init__(self, key, transform):
        self.key = key
        self.transform = transform


class _TraceSD:
    """Duck-types torch_import._SD but records accesses instead of reading."""

    def __init__(self):
        self.sd = _AllKeys()
        self.missing = []
        self.consumed = set()

    def __call__(self, key):
        return _Ref(key, "id")

    def t(self, key):
        return _Ref(key, "t")

    def flat(self, key):
        return _Ref(key, "flat")


def _flatten_refs(tree, prefix="", sep="/"):
    """Flatten the traced nested dict with the same a/b/c naming that
    checkpoint.flatten_params produces for flax param pytrees."""
    out = {}
    for k, v in tree.items():
        name = f"{prefix}{sep}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten_refs(v, name, sep))
        elif isinstance(v, _Ref):
            out[name] = v
        elif v is None:  # converter pruned an absent optional
            continue
        else:
            raise TypeError(f"unexpected traced leaf at {name}: {type(v)}")
    return out


def trace_converter(model_name):
    """flax flat name -> _Ref(torch key, transform) for one model."""
    if model_name not in CONVERTERS:
        raise KeyError(
            f"no torch converter for '{model_name}'; "
            f"available: {sorted(CONVERTERS)}")
    return _flatten_refs(CONVERTERS[model_name](_TraceSD()))


def _invert(value, transform):
    v = np.asarray(value)
    if transform == "t":
        return v.T
    if transform == "flat":
        # the only .flat() users are the rank-1 attention vectors, stored
        # [1, D] in the reference (lsthm_sp.py:52-54)
        return v.reshape(1, -1)
    return v


def export_state_dict(params, model_name, prefix="model.", log=print):
    """flax params -> numpy state dict in the reference's key layout.

    Parameters the traced converter doesn't know (none today — coverage is
    enforced by tests) are reported via ``log`` and skipped, mirroring the
    tolerant-load spirit of the import direction.
    """
    mapping = trace_converter(model_name)
    flat = flatten_params(params)
    sd = {}
    for fname, ref in mapping.items():
        if fname not in flat:
            continue  # optional leaf (e.g. a bias) absent from this model
        sd[prefix + ref.key] = _invert(flat[fname], ref.transform)
    for fname in sorted(set(flat) - set(mapping)):
        log(f"{fname} has no reference-layout home; not exported.")
    return sd


def export_torch_checkpoint(params, path, model_name, prefix="model.",
                            log=print):
    """Write ``params`` as a torch ``.model`` file the reference stack can
    load (``model_trainer.py:173-187``). Returns the exported key list."""
    import torch

    sd = export_state_dict(params, model_name, prefix=prefix, log=log)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)
    return sorted(sd)
