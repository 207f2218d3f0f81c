"""Torch-checkpoint importer — the product surface for reference ``.model``
files.

The reference evaluates/resumes from checkpoints written by
``torch.save(self.state_dict())`` on the whole ModelTrainer module
(``/root/reference/model_trainer.py:170-187``, ``train.py:52-58,64-66``).
This module converts such a state dict into this framework's flax param
pytree so a user can evaluate or fine-tune a real trained reference
checkpoint directly:

    params = import_torch_checkpoint(params, "model_0042.model",
                                     "MARN1_onlysp")

Layout conventions: torch ``nn.Linear`` stores ``[out, in]`` kernels — flax
uses ``[in, out]``, so every kernel is transposed; torch RNN cells store
``weight_ih/weight_hh`` — mapped to the fused ``*_ih_kernel/*_hh_kernel``
pairs of ``ser_tpu.ops.cells``; rank-1 attention vectors ``Wq/Wk/Wv`` are
``[1, D]`` parameters flattened to ``[D]``.

Missing keys and shape mismatches are tolerated with the reference's warning
semantics (``model_trainer.py:180-186``): the matching template entries keep
their current values. A legacy ``module.`` prefix (DataParallel fossil,
``model_trainer.py:179``) and the ModelTrainer-level ``model.`` prefix are
stripped.
"""

from __future__ import annotations

import numpy as np

from ser_tpu.train.checkpoint import flatten_params, unflatten_into


# ---------------------------------------------------------------------------
# State-dict access with tolerant missing-key handling.
# ---------------------------------------------------------------------------

class _SD:
    """Numpy view over a torch state dict; records missing keys."""

    def __init__(self, sd):
        self.sd = sd
        self.missing = []
        self.consumed = set()

    def __call__(self, key):
        if key not in self.sd:
            self.missing.append(key)
            return None
        self.consumed.add(key)
        v = self.sd[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    def t(self, key):
        v = self(key)
        return None if v is None else v.T

    def flat(self, key):
        v = self(key)
        return None if v is None else v.reshape(-1)


def _prune(tree):
    """Drop None leaves / empty subtrees from a nested dict."""
    if isinstance(tree, dict):
        out = {k: _prune(v) for k, v in tree.items()}
        out = {k: v for k, v in out.items() if v is not None}
        return out or None
    return tree


# ---------------------------------------------------------------------------
# Shared sub-module converters (torch prefix -> flax subtree / flat names).
# ---------------------------------------------------------------------------

def _linear(s, prefix):
    out = {"kernel": s.t(f"{prefix}.weight")}
    if f"{prefix}.bias" in s.sd:
        out["bias"] = s(f"{prefix}.bias")
    return out


def _lin_kb(s, prefix, name):
    return {
        f"{name}_kernel": s.t(f"{prefix}.weight"),
        f"{name}_bias": s(f"{prefix}.bias"),
    }


def _rnn_kb(s, prefix, name):
    return {
        f"{name}_ih_kernel": s.t(f"{prefix}.weight_ih"),
        f"{name}_ih_bias": s(f"{prefix}.bias_ih"),
        f"{name}_hh_kernel": s.t(f"{prefix}.weight_hh"),
        f"{name}_hh_bias": s(f"{prefix}.bias_hh"),
    }


def _encoder(s, prefix):
    return {
        "slf_attn": {
            "w_qs": {"kernel": s.t(f"{prefix}.slf_attn.w_qs.weight")},
            "w_ks": {"kernel": s.t(f"{prefix}.slf_attn.w_ks.weight")},
            "w_vs": {"kernel": s.t(f"{prefix}.slf_attn.w_vs.weight")},
            "fc": {"kernel": s.t(f"{prefix}.slf_attn.fc.weight")},
            "layer_norm": {
                "scale": s(f"{prefix}.slf_attn.layer_norm.weight"),
                "bias": s(f"{prefix}.slf_attn.layer_norm.bias"),
            },
        },
        "pos_ffn": {
            "w_1": _linear(s, f"{prefix}.pos_ffn.w_1"),
            "w_2": _linear(s, f"{prefix}.pos_ffn.w_2"),
            "fc": _linear(s, f"{prefix}.pos_ffn.fc"),
            "layer_norm": {
                "scale": s(f"{prefix}.pos_ffn.layer_norm.weight"),
                "bias": s(f"{prefix}.pos_ffn.layer_norm.bias"),
            },
        },
    }


def _crossatt(s, prefix):
    return {w: s(f"{prefix}.{w}") for w in ("Wq", "Wk", "Wv")}


def _crossatt_ln(s, prefix):
    p = _crossatt(s, prefix)
    p["layer_norm"] = {
        "scale": s(f"{prefix}.layer_norm.weight"),
        "bias": s(f"{prefix}.layer_norm.bias"),
    }
    return p


def _rank1_atts(s, prefix):
    p = {}
    for att in ("crossatt_l2a", "crossatt_a2l"):
        for w in ("Wq", "Wk", "Wv"):
            p[f"{att}_{w}"] = s.flat(f"{prefix}.{att}.{w}")
    return p


def _seq_atts(s, prefix):
    return {att: _crossatt(s, f"{prefix}.{att}")
            for att in ("crossatt_l2a", "crossatt_a2l")}


def _lsthm4(s, prefix, name, mats=("W", "U", "V", "S")):
    p = {}
    for mat in mats:
        p.update(_lin_kb(s, f"{prefix}.{mat}", f"{name}_{mat}"))
    return p


def _bilstm(s, prefix):
    p = {}
    for suf in ("", "_reverse"):
        p[f"weight_ih_l0{suf}_kernel"] = s.t(f"{prefix}.weight_ih_l0{suf}")
        p[f"weight_ih_l0{suf}_bias"] = s(f"{prefix}.bias_ih_l0{suf}")
        p[f"weight_hh_l0{suf}_kernel"] = s.t(f"{prefix}.weight_hh_l0{suf}")
        p[f"weight_hh_l0{suf}_bias"] = s(f"{prefix}.bias_hh_l0{suf}")
    return p


# ---------------------------------------------------------------------------
# Per-model converters (state dict -> flax params).
# ---------------------------------------------------------------------------

def _onlysp_cell(s, prefix):
    p = {}
    for mod in ("l", "a"):
        p.update(_lsthm4(s, f"{prefix}.lsthm_{mod}", f"lsthm_{mod}"))
    p.update(_rnn_kb(s, f"{prefix}.gru_s", "gru_s"))
    for cell in ("lstm_q0", "lstm_q1", "lstm_s"):
        p.update(_rnn_kb(s, f"{prefix}.{cell}", cell))
    p.update(_rank1_atts(s, prefix))
    return p


def _convert_onlysp(s):
    return {
        "linear_in": _linear(s, "linear_in"),
        "encoder_l": _encoder(s, "encoder_l"),
        "encoder_a": _encoder(s, "encoder_a"),
        "marn_cell_f": _onlysp_cell(s, "marn_cell_f"),
        "marn_cell_b": _onlysp_cell(s, "marn_cell_b"),
        "crossatt_l2a": _crossatt(s, "crossatt_l2a"),
        "crossatt_a2l": _crossatt(s, "crossatt_a2l"),
        "crossatt_l2a_1": _crossatt(s, "crossatt_l2a_1"),
        "crossatt_a2l_1": _crossatt(s, "crossatt_a2l_1"),
        "w": s("w"), "v": s("v"), "v1": s("v1"), "v2": s("v2"),
        "linear": _linear(s, "linear"),
        "nn_out_0": _linear(s, "nn_out.0"),
        "nn_out_3": _linear(s, "nn_out.3"),
    }


def _sps_cell(s, prefix):
    p = {}
    for mod in ("l", "a"):
        p.update(_lsthm4(s, f"{prefix}.lsthm_{mod}", f"lsthm_{mod}"))
    for cell in ("lstm_q0", "lstm_q1", "lstm_s"):
        p.update(_rnn_kb(s, f"{prefix}.{cell}", cell))
    p.update(_rank1_atts(s, prefix))
    return p


def _convert_sps(s):
    return {
        "linear_in": _linear(s, "linear_in"),
        "encoder_l": _encoder(s, "encoder_l"),
        "encoder_a": _encoder(s, "encoder_a"),
        "marn_cell_f": _sps_cell(s, "marn_cell_f"),
        "marn_cell_b": _sps_cell(s, "marn_cell_b"),
        "crossatt_l2a": _crossatt(s, "crossatt_l2a"),
        "crossatt_a2l": _crossatt(s, "crossatt_a2l"),
        "crossatt_l2a_1": _crossatt(s, "crossatt_l2a_1"),
        "crossatt_a2l_1": _crossatt(s, "crossatt_a2l_1"),
        "w": s("w"), "v": s("v"), "v1": s("v1"), "v2": s("v2"),
        "fc_0": _linear(s, "fc.0"),
        "nn_out_0": _linear(s, "nn_out.0"),
        "nn_out_3": _linear(s, "nn_out.3"),
    }


def _sp_cell(s, prefix):
    p = {}
    p.update(_lsthm4(s, f"{prefix}.lsthm_l", "lsthm_l"))
    p.update(_lsthm4(s, f"{prefix}.lsthm_a", "lsthm_a"))
    p.update(_lsthm4(s, f"{prefix}.lsthm_q", "lsthm_q"))
    p.update(_rnn_kb(s, f"{prefix}.lstm_s", "lstm_s"))
    p.update(_rank1_atts(s, prefix))
    return p


def _convert_sp(s):
    return {
        "encoder_l": _encoder(s, "encoder_l"),
        "encoder_a": _encoder(s, "encoder_a"),
        "marn_cell_f": _sp_cell(s, "marn_cell_f"),
        "marn_cell_b": _sp_cell(s, "marn_cell_b"),
        "crossatt_l2a": _crossatt(s, "crossatt_l2a"),
        "crossatt_a2l": _crossatt(s, "crossatt_a2l"),
        "linear": _linear(s, "linear"),
        "nn_out_0": _linear(s, "nn_out.0"),
        "nn_out_3": _linear(s, "nn_out.3"),
    }


def _cf_cell(s, prefix):
    p = {}
    p.update(_lsthm4(s, f"{prefix}.lsthm_l", "lsthm_l"))
    p.update(_lsthm4(s, f"{prefix}.lsthm_a", "lsthm_a"))
    p.update(_rnn_kb(s, f"{prefix}.lstm_s", "lstm_s"))
    p.update(_rank1_atts(s, prefix))
    return p


def _convert_cf(s):
    return {
        "encoder_l": _encoder(s, "encoder_l"),
        "encoder_a": _encoder(s, "encoder_a"),
        "marn_cell_f": _cf_cell(s, "marn_cell_f"),
        "marn_cell_b": _cf_cell(s, "marn_cell_b"),
        "crossatt_l2a": _crossatt(s, "crossatt_l2a"),
        "crossatt_a2l": _crossatt(s, "crossatt_a2l"),
        "linear": _linear(s, "linear"),
        "nn_out_0": _linear(s, "nn_out.0"),
        "nn_out_3": _linear(s, "nn_out.3"),
    }


def _mf_cell(s, prefix):
    p = {}
    p.update(_lsthm4(s, f"{prefix}.lsthm_l", "lsthm_l"))
    p.update(_lsthm4(s, f"{prefix}.lsthm_a", "lsthm_a"))
    p.update(_rnn_kb(s, f"{prefix}.lstm_s", "lstm_s"))
    p.update(_seq_atts(s, prefix))
    p["encoder_l"] = _encoder(s, f"{prefix}.encoder_l")
    p["encoder_a"] = _encoder(s, f"{prefix}.encoder_a")
    return p


def _convert_mf(s):
    return {
        "marn_cell_f": _mf_cell(s, "marn_cell_f"),
        "marn_cell_b": _mf_cell(s, "marn_cell_b"),
        "linear": _linear(s, "linear"),
        "nn_out_0": _linear(s, "nn_out.0"),
        "nn_out_3": _linear(s, "nn_out.3"),
    }


def _la_cell(s, prefix):
    p = _mf_cell(s, prefix)
    p.update(_rnn_kb(s, f"{prefix}.lstm_la_l", "lstm_la_l"))
    p.update(_rnn_kb(s, f"{prefix}.lstm_la_a", "lstm_la_a"))
    return p


def _convert_la(s):
    return {
        "marn_cell_f": _la_cell(s, "marn_cell_f"),
        "marn_cell_b": _la_cell(s, "marn_cell_b"),
        "linear": _linear(s, "linear"),
        "nn_out_0": _linear(s, "nn_out.0"),
        "nn_out_3": _linear(s, "nn_out.3"),
    }


def _convert_azs(s):
    return {
        "marn_cell_f": _cf_cell(s, "marn_cell_f"),
        "marn_cell_b": _cf_cell(s, "marn_cell_b"),
        "marn_cell_f_encoder_l": _encoder(s, "marn_cell_f.encoder_l"),
        "marn_cell_f_encoder_a": _encoder(s, "marn_cell_f.encoder_a"),
        "marn_cell_b_encoder_l": _encoder(s, "marn_cell_b.encoder_l"),
        "marn_cell_b_encoder_a": _encoder(s, "marn_cell_b.encoder_a"),
        "linear": _linear(s, "linear"),
        "nn_out_0": _linear(s, "nn_out.0"),
        "nn_out_3": _linear(s, "nn_out.3"),
    }


def _nsps_cell(s, prefix):
    p = {}
    p.update(_lsthm4(s, f"{prefix}.lsthm_l", "lsthm_l"))
    p.update(_lsthm4(s, f"{prefix}.lsthm_a", "lsthm_a"))
    p.update(_rnn_kb(s, f"{prefix}.gru_s", "gru_s"))
    p.update(_rnn_kb(s, f"{prefix}.gru_l", "gru_l"))
    p.update(_rank1_atts(s, prefix))
    return p


def _convert_nsps(s):
    return {
        "linear_in": _linear(s, "linear_in"),
        "encoder_l": _encoder(s, "encoder_l"),
        "encoder_a": _encoder(s, "encoder_a"),
        "marn_cell_f": _nsps_cell(s, "marn_cell_f"),
        "marn_cell_b": _nsps_cell(s, "marn_cell_b"),
        "crossatt_l2a": _crossatt_ln(s, "crossatt_l2a"),
        "crossatt_a2l": _crossatt_ln(s, "crossatt_a2l"),
        "p": s("p"),
        "fc_0": _linear(s, "fc.0"),
        "fc2_0": _linear(s, "fc2.0"),
        "nn_out_0": _linear(s, "nn_out.0"),
        "nn_out_3": _linear(s, "nn_out.3"),
    }


def _convert_newz(s):
    p = {
        "encoder_l": _encoder(s, "encoder_l"),
        "encoder_a": _encoder(s, "encoder_a"),
        "encoder_v": _encoder(s, "encoder_v"),
        "w": s("w"),
        "nn_out_0": _linear(s, "nn_out.0"),
        "nn_out_3": _linear(s, "nn_out.3"),
    }
    p.update(_lsthm4(s, "lsthm_l", "lsthm_l"))
    p.update(_lsthm4(s, "lsthm_a", "lsthm_a"))
    p.update(_lin_kb(s, "S", "S"))
    p.update(_lin_kb(s, "att.0", "att_0"))
    p.update(_lin_kb(s, "att_l.0", "att_l_0"))
    p.update(_lin_kb(s, "att_a.0", "att_a_0"))
    p.update(_lin_kb(s, "att_cross_modal.0", "att_cross_modal_0"))
    p.update(_lin_kb(s, "fc_z.0", "fc_z_0"))
    p.update(_lin_kb(s, "fc.0", "fc_0"))
    p.update(_lin_kb(s, "fc.3", "fc_3"))
    p.update(_lin_kb(s, "g_attention.trans.0", "g_attention_trans_0"))
    p.update(_lin_kb(s, "g_attention.trans.3", "g_attention_trans_3"))
    return p


def _convert_bilstm(s):
    return {
        "encoder_l": _encoder(s, "encoder_l"),
        "encoder_a": _encoder(s, "encoder_a"),
        "lstm_l": _bilstm(s, "lstm_l"),
        "lstm_a": _bilstm(s, "lstm_a"),
        "nn_out_0": _linear(s, "nn_out.0"),
        "nn_out_3": _linear(s, "nn_out.3"),
    }


def _marn_common(s, mods):
    p = {
        "att_0_kernel": s.t("att.0.weight"),
        "att_0_bias": s("att.0.bias"),
        "fc_0_kernel": s.t("fc.0.weight"),
        "fc_0_bias": s("fc.0.bias"),
        "fc_3_kernel": s.t("fc.3.weight"),
        "fc_3_bias": s("fc.3.bias"),
        "nn_out_0": _linear(s, "nn_out.0"),
        "nn_out_3": _linear(s, "nn_out.3"),
    }
    for m in mods:
        p[f"encoder_{m}"] = _encoder(s, f"encoder_{m}")
        p.update(_lsthm4(s, f"lsthm_{m}", f"lsthm_{m}", mats=("W", "U", "V")))
        p[f"reduce_dim_nn_{m}_0_kernel"] = s.t(f"reduce_dim_nn_{m}.0.weight")
        p[f"reduce_dim_nn_{m}_0_bias"] = s(f"reduce_dim_nn_{m}.0.bias")
    return p


def _convert_marn(s):
    p = _marn_common(s, ("l", "a"))
    p["lstm_l"] = _bilstm(s, "lstm_l")
    p["lstm_a"] = _bilstm(s, "lstm_a")
    return p


def _convert_marn_at(s):
    return _marn_common(s, ("l", "a"))


def _convert_marn_atv(s):
    return _marn_common(s, ("l", "a", "v"))


def _drnn_scan(s, prefix, listener_state=True):
    p = {}
    cells = ("g_cell", "p_cell", "e_cell") + (
        ("l_cell",) if listener_state else ())
    for cell in cells:
        p.update(_rnn_kb(s, f"{prefix}.dialogue_cell.{cell}", cell))
    p["attention_transform_kernel"] = \
        s.t(f"{prefix}.dialogue_cell.attention.transform.weight")
    if f"{prefix}.dialogue_cell.attention.transform.bias" in s.sd:
        p["attention_transform_bias"] = \
            s(f"{prefix}.dialogue_cell.attention.transform.bias")
    return p


def _convert_dialogue_rnn(s):
    return {
        "dialog_rnn_f": _drnn_scan(s, "dialog_rnn_f"),
        "dialog_rnn_r": _drnn_scan(s, "dialog_rnn_r"),
        "matchatt_transform_kernel": s.t("matchatt.transform.weight"),
        "matchatt_transform_bias": s("matchatt.transform.bias"),
        "linear": _linear(s, "linear"),
        "smax_fc": _linear(s, "smax_fc"),
    }


CONVERTERS = {
    "MARN1_onlysp": _convert_onlysp,
    "MARN1_sps": _convert_sps,
    "MARN1_sp": _convert_sp,
    "MARN1_cf": _convert_cf,
    "MARN1_mf": _convert_mf,
    "MARN1_la": _convert_la,
    "MARN1_azs": _convert_azs,
    "MARN1_nsps": _convert_nsps,
    "MARN1_no_en": _convert_nsps,
    "MARN1_newz": _convert_newz,
    "BiLSTM": _convert_bilstm,
    "MARN": _convert_marn,
    "MARN_AT": _convert_marn_at,
    "MARN_ATV": _convert_marn_atv,
    "DialogueRNN": _convert_dialogue_rnn,
}


# ---------------------------------------------------------------------------
# Public API.
# ---------------------------------------------------------------------------

def strip_prefixes(sd):
    """Strip 'module.' (DataParallel fossil, model_trainer.py:179) and the
    ModelTrainer wrapper's 'model.' prefix from every key."""
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("model."):
            k = k[len("model."):]
        out[k] = v
    return out


def load_torch_state_dict(path):
    """Load a reference ``.model`` checkpoint into a numpy state dict."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):  # a whole module was pickled
        sd = sd.state_dict()
    return strip_prefixes(sd)


def convert_state_dict(model_name, sd, log=print):
    """Convert a (prefix-stripped) torch state dict to flax params for
    ``model_name``. Missing torch keys are skipped with a warning; the
    returned tree contains only the parameters that were present."""
    if model_name not in CONVERTERS:
        raise KeyError(
            f"no torch importer for '{model_name}'; "
            f"available: {sorted(CONVERTERS)}")
    s = _SD(sd)
    params = _prune(CONVERTERS[model_name](s)) or {}
    for key in s.missing:
        log(f"{key} is not in the checkpoint.")
    for key in sorted(set(sd) - s.consumed):
        log(f"{key} is not in the model.")
    return params


def import_torch_checkpoint(params, path, model_name, log=print):
    """Tolerantly merge a reference torch checkpoint into ``params``.

    Reproduces the reference's partial-load semantics
    (``model_trainer.py:173-187``): unknown/missing names and shape
    mismatches are skipped with a warning, everything else is copied.
    Returns the new param pytree.
    """
    sd = load_torch_state_dict(path)
    converted = convert_state_dict(model_name, sd, log=log)
    self_flat = flatten_params(params)
    got_flat = flatten_params(converted)

    accepted = {}
    for name, value in got_flat.items():
        if name not in self_flat:
            log(f"{name} is not in the model.")
            continue
        if tuple(self_flat[name].shape) != tuple(value.shape):
            log(f"Wrong parameter length: {name}, model: "
                f"{tuple(self_flat[name].shape)}, loaded: "
                f"{tuple(value.shape)}")
            continue
        accepted[name] = value
    return unflatten_into(params, accepted)
