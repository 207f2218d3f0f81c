"""String-keyed model factory + per-family calling conventions.

Mirrors the reference's factory (``/root/reference/model_trainer.py:35-72``)
where a ``--model`` string selects the class, and the trainer feeds every
model ``cat(textf, acouf)`` with textf = mean of the four RoBERTa views
(``model_trainer.py:104-105``). Legacy 100-d-text variants slice the first
100/200 dims themselves — we preserve that live behavior exactly.

Each entry provides:
  build(n_classes, dataset) -> flax Module
  make_inputs(batch) -> tuple of positional model args (jnp arrays)
  outputs 'logp' as the first return value, already [B*L, C] log-probs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp


def _default_extract_logp(out):
    return out[0] if isinstance(out, tuple) else out


@dataclass(frozen=True)
class ModelSpec:
    name: str
    build: Callable  # (n_classes, dataset) -> nn.Module
    make_inputs: Callable  # (batch dict) -> tuple of arrays
    logp_layout: str = "bl"  # 'bl': [B*L, C] rows; 'tb': [L*B, C] rows
    extract_logp: Callable = _default_extract_logp  # model output -> [N, C]
    # True iff the model returns (logp, feat, feat) with [L, B, D] modality
    # feature sequences — the shape the reference's commented-out InfoNCE
    # hook consumes (model_trainer.py:111-115). DialogueRNN's extra outputs
    # are attention maps, not features, so it must stay False.
    feature_outputs: bool = False


_REGISTRY: dict[str, ModelSpec] = {}


def register(spec: ModelSpec):
    _REGISTRY[spec.name] = spec
    return spec


def get_model_spec(name: str) -> ModelSpec:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model '{name}'; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def available_models():
    return sorted(_REGISTRY)


def _marn1_inputs(batch):
    """Live-trainer convention (``model_trainer.py:104-105``):
    x = cat(mean(r1..r4), acouf) [L, B, 1124], plus qmask, umask."""
    textf = (batch["r1"] + batch["r2"] + batch["r3"] + batch["r4"]) / 4
    x = jnp.concatenate([textf, batch["acouf"]], axis=-1)
    return (x, batch["qmask"], batch["umask"])


def _trimodal_inputs(batch):
    """Legacy trimodal convention (``model_trainer_d.py:63-64``):
    x = cat(textf_100, acouf, visuf) [L, B, 712]. The live pickles carry
    RoBERTa views, so textf_100 is the RoBERTa mean's first 100 dims."""
    textf = (batch["r1"] + batch["r2"] + batch["r3"] + batch["r4"]) / 4
    x = jnp.concatenate(
        [textf[..., :100], batch["acouf"], batch["visuf"]], axis=-1
    )
    return (x, batch["qmask"], batch["umask"])


def _register_all():
    from ser_tpu.models.bilstm import BiLSTM
    from ser_tpu.models.dialogue_rnn import register_dialogue_rnn
    from ser_tpu.models.hybrid_rnn import register_hybrid_rnn
    from ser_tpu.models.marn_newz import MARN1NewZ
    from ser_tpu.models.marn_onlysp import MARN1OnlySP
    from ser_tpu.models.marn_variants import register_variants

    register(
        ModelSpec(
            name="MARN1_onlysp",
            build=lambda n_classes, dataset: MARN1OnlySP(n_classes=n_classes),
            make_inputs=_marn1_inputs,
            feature_outputs=True,
        )
    )
    register(
        ModelSpec(
            name="MARN1_newz",
            build=lambda n_classes, dataset: MARN1NewZ(n_classes=6),
            make_inputs=_marn1_inputs,
            feature_outputs=True,
        )
    )
    register(
        ModelSpec(
            name="BiLSTM",
            build=lambda n_classes, dataset: BiLSTM(n_classes=6),
            make_inputs=_marn1_inputs,
            feature_outputs=True,
        )
    )
    register_variants(register, ModelSpec, _marn1_inputs)
    register_dialogue_rnn(register, ModelSpec, _trimodal_inputs)
    register_hybrid_rnn(register, ModelSpec, _trimodal_inputs, _marn1_inputs)


_register_all()
